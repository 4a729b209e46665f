"""Compaction: file-count collapse, byte-sizing, row fidelity, and
stat-tightness of the sorted variant."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from grader_etl_spark.io import load
from grader_etl_spark.plans.compaction import compact, dir_bytes, n_data_files


@pytest.fixture(scope="module")
def fragmented(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("frag") / "documents")
    load(spark, sf_dir, "documents").repartition(40).write.parquet(src)
    return src


def test_compact_collapses_small_files(spark, fragmented, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("out") / "documents")
    before_rows = spark.read.parquet(fragmented).count()
    target = max(1, dir_bytes(fragmented))  # everything fits one file
    out = compact(spark, fragmented, dst, target_bytes=target)
    assert n_data_files(fragmented) == 40
    assert n_data_files(dst) <= 2
    assert out.count() == before_rows


def test_compact_respects_target_sizing(spark, fragmented, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("out") / "documents")
    target = max(1, dir_bytes(fragmented) // 4)
    compact(spark, fragmented, dst, target_bytes=target)
    # ceil(size/target) = 4 (± encoding drift after the rewrite).
    assert 3 <= n_data_files(dst) <= 6


def test_sorted_compaction_keeps_disjoint_ranges(spark, fragmented, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("out") / "documents")
    target = max(1, dir_bytes(fragmented) // 3)
    compact(spark, fragmented, dst, target_bytes=target, sort_cols=["doc_id"])
    # Per-file doc_id ranges must not overlap (repartitionByRange).
    stats = (
        spark.read.parquet(dst)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in stats)
    for (_, prev_hi), (cur_lo, _) in zip(spans, spans[1:]):
        assert cur_lo > prev_hi

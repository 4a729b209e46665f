"""Storage-layout invariants (plans/layout.py): partition directory
structure, one file per day, partition pruning in the read plan."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from grader_etl_spark.io import load
from grader_etl_spark.plans.layout import ingest_events, read_day

SF = "/root/testdata/sf0.001"
DAY = "2024-01-15"


def _store(spark, tmp_path) -> str:
    path = str(tmp_path / "events_store")
    ingest_events(spark, SF, path)
    return path


def test_directory_per_day_and_one_file_each(spark, tmp_path):
    path = _store(spark, tmp_path)
    days = sorted(d for d in os.listdir(path) if d.startswith("event_date="))
    src_days = {
        r["d"].isoformat()
        for r in load(spark, SF, "events").select(F.to_date("ts").alias("d")).distinct().collect()
    }
    assert {d.split("=", 1)[1] for d in days} == src_days
    for d in days:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: expected 1 compacted file, got {len(files)}"


def test_day_read_prunes_partitions(spark, tmp_path):
    path = _store(spark, tmp_path)
    day_df = read_day(spark, path, DAY)

    plan = day_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan

    # inputFiles() reflects the pre-pruning FileIndex; the executed
    # scan node's metrics show what was actually read.
    jdf = day_df._jdf
    n_rows = len(jdf.collect())
    scan = jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    assert scan.metrics().apply("numFiles").value() == 1  # 1 of ~30 day dirs
    assert scan.metrics().apply("numPartitions").value() == 1

    expected = load(spark, SF, "events").filter(F.to_date("ts") == F.lit(DAY).cast("date")).count()
    assert n_rows == expected


def test_within_day_rows_are_time_sorted(spark, tmp_path):
    path = _store(spark, tmp_path)
    ts = [r["ts"] for r in read_day(spark, path, DAY).select("ts").collect()]
    assert ts == sorted(ts), "rows inside a day file should be time-clustered"


def test_zorder_bounds_both_columns(spark, sf_dir, tmp_path):
    """Z-order vs single-column sort, measured from the real parquet
    footers: average per-file (max-min)/global_range for the SECOND
    key must be far tighter under Z-ordering (single-column sort
    leaves it ~1.0 — every file spans the whole range), while the
    first key stays usefully bounded."""
    import glob

    import pyarrow.parquet as pq

    from grader_etl_spark.io import load
    from grader_etl_spark.plans.layout import write_zordered

    li = load(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"])
    n_files = 8

    sorted_path = str(tmp_path / "sorted")
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    z_path = str(tmp_path / "zorder")
    write_zordered(li, z_path, "l_partkey", "l_suppkey", n_files)

    def mean_norm_range(path: str, col: str) -> float:
        spans, lo, hi = [], [], []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmin = min(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append(fmax - fmin)
            lo.append(fmin)
            hi.append(fmax)
        return (sum(spans) / len(spans)) / max(max(hi) - min(lo), 1)

    # Single-column sort: second key unbounded per file (~1.0).
    assert mean_norm_range(sorted_path, "l_suppkey") > 0.8
    # Z-order: BOTH keys bounded well below the full range per file.
    assert mean_norm_range(z_path, "l_suppkey") < 0.6
    assert mean_norm_range(z_path, "l_partkey") < 0.6


def test_dynamic_partition_pruning_fires_on_dim_join(spark, tmp_path):
    """Dynamic partition pruning: joining the date-partitioned store
    against a FILTERED dim must inject a dynamicpruningexpression into
    the fact scan's PartitionFilters — at 100 TB this is the
    difference between scanning one day's partitions and scanning the
    table because the qualifying dates are only known at runtime."""
    import contextlib
    import io

    import pyspark.sql.functions as F

    from grader_etl_spark.io import load

    fact = str(tmp_path / "dpp_fact")
    (
        load(spark, "/root/testdata/sf0.001", "events", columns=["event_id", "ts", "value"])
        .withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .parquet(fact)
    )
    dim = (
        spark.createDataFrame([("2024-01-05", "special"), ("2024-01-06", "normal")],
                              "d string, tag string")
        .select(F.col("d").cast("date").alias("event_date"), "tag")
        .filter(F.col("tag") == "special")
    )
    joined = spark.read.parquet(fact).join(dim, "event_date").groupBy("event_date").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruningexpression" in plan
    rows = joined.collect()
    assert len(rows) == 1 and str(rows[0]["event_date"]) == "2024-01-05"


def test_point_lookup_layout_writes_bloom_filters(spark, tmp_path):
    """Bloom bitsets must land in the footer for high-cardinality
    keys, must NOT be written for fully-dictionary-encoded columns
    (parquet-mr's adaptive skip), and the probed read stays correct
    with the equality filter pushed to the scan."""
    import os

    import pyspark.sql.functions as F

    from grader_etl_spark.plans.layout import write_point_lookup_layout

    df = spark.range(200_000).select(
        F.md5(F.col("id").cast("string")).alias("doc_id"),   # high-card
        (F.col("id") % 100).cast("string").alias("lang"),    # dict-encoded
        F.col("id").alias("x"),
    ).coalesce(1)

    def _bytes(p):
        d = str(tmp_path / p)
        return sum(os.path.getsize(os.path.join(d, f))
                   for f in os.listdir(d) if f.endswith(".parquet"))

    df.write.parquet(str(tmp_path / "plain"))
    write_point_lookup_layout(df, str(tmp_path / "bloom"), bloom_cols={"doc_id": 200_000})
    write_point_lookup_layout(df, str(tmp_path / "dict_only"), bloom_cols={"lang": 100})

    # ~1.2 bytes/key bitset => a six-figure delta, not noise
    assert _bytes("bloom") - _bytes("plain") > 100_000
    # adaptive skip: all-dictionary column carries no bitset
    assert abs(_bytes("dict_only") - _bytes("plain")) < 2_000

    key = spark.read.parquet(str(tmp_path / "bloom")).limit(1).collect()[0].doc_id
    scan = spark.read.parquet(str(tmp_path / "bloom")).filter(F.col("doc_id") == key)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan
    assert scan.count() == 1

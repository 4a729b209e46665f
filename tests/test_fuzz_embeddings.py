"""Differential fuzzing for the embeddings family (see
test_fuzz_oracle.py for the rationale): seeded random 64-dim float32
corpora with shapes the fixture generator never emits — exact
duplicate vectors, a single-member label, near-zero and large-norm
vectors — through the ANN / similarity / quantization operators in
both engines.
"""

from __future__ import annotations

import importlib.util
import os
import random

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _oracle_check():
    spec = importlib.util.spec_from_file_location(
        "oracle_check", os.path.join(_REPO, "tools", "oracle_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


QUERIES = [
    "q_ann_cosine",
    "q_ann_lsh",
    "q_embedding_norm_outliers",
    "q_embedding_quantize",
    "q_neardup_embedding",
    "q_label_centroids",
    "q_nearest_centroid_confusion",
    "q_centroid_distance",
    "q_semdedup",
]

_DIM = 64  # the LSH plane literals are 64-wide; the dim is part of the contract


def _vectors(seed: int) -> list[tuple[int, list[float], int]]:
    rng = random.Random(seed)
    rows = []
    for i in range(80):
        v = [rng.gauss(0, 1) for _ in range(_DIM)]
        rows.append((i, v, rng.randrange(9)))
    # exact duplicates (near-dup operators must fire)
    rows.append((80, list(rows[5][1]), rows[5][2]))
    rows.append((81, list(rows[5][1]), rows[5][2]))
    # near-zero vector (tiny but non-zero norm: fixture vectors are
    # never exactly zero, and cosine-of-zero is engine-undefined)
    rows.append((82, [1e-30] * _DIM, 9))
    # large-norm vector
    rows.append((83, [rng.gauss(0, 100) for _ in range(_DIM)], 9))
    return rows


@pytest.fixture(scope="module")
def oc():
    return _oracle_check()


@pytest.mark.parametrize("seed", [5, 17])
def test_embedding_family_matches_oracle_on_random_vectors(
    spark, tmp_path_factory, oc, seed
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from grader_etl_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    rows = _vectors(seed)
    sf_dir = str(tmp_path_factory.mktemp(f"fuzzemb_{seed}"))
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    failures = []
    for name in QUERIES:
        spec = REGISTRY[name]
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            odf = con.execute(spec.oracle).df()
            problems = oc.compare(name, sdf, odf)
        except Exception as exc:
            problems = [f"exception: {exc!r}"[:300]]
        if problems:
            failures.append(f"{name}: {problems}")
    assert not failures, "\n".join(failures)

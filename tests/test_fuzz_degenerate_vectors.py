"""Committed slice of the DEGENERATE-EMBEDDING probe: NULL vectors,
empty arrays, all-zero vectors, and NaN components mixed into a valid
corpus — embedding-model failure rows every 100 TB pipeline sees.

Before the fix these crashed 12 of 13 vector operators on BOTH
engines (Spark: ANSI /0 on the zero norm and NULL-poisoned folds;
DuckDB: list_inner_product rejects NULL elements). The fix is
three-fold (BASELINE.md §degenerate-embedding):

- ``io.valid_vectors`` — the defensive vector load (drop NULL/empty
  vectors and NULL/NaN components) applied at every embedding scan,
  mirrored by ``io.VALID_VECTORS_SQL`` in every oracle;
- zero-NORM vectors pass the gate (valid input, undefined cosine) and
  flow as NULL via try_divide in every cosine spelling, with DESC
  NULLS LAST pinned in the rank-window oracles;
- MMR excludes NULL-relevance candidates on both sides (no direction
  ⇒ not rankable).
"""

from __future__ import annotations

import importlib.util
import os
import random

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "q_ann_cosine",
    "q_ann_lsh",
    "q_array_algebra",
    "q_centroid_distance",
    "q_embedding_covariance",
    "q_embedding_norm_outliers",
    "q_embedding_quantize",
    "q_hard_negatives",
    "q_label_centroids",
    "q_mmr_select",
    "q_neardup_embedding",
    "q_nearest_centroid_confusion",
    "q_rank_fusion",
    "q_semdedup",
]

_DIM = 64  # fixture embedding dimension (LSH planes / PCA literals)


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory):
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("degenvec"))
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents"):
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
    rng = random.Random(3)
    vecs = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(_DIM)], i % 5)
        for i in range(40)
    ]
    vecs.append((40, None, 0))                               # NULL vector
    vecs.append((41, [], 1))                                 # empty array
    vecs.append((42, [0.0] * _DIM, 2))                       # zero norm
    vecs.append((43, [float("nan")] + [0.5] * (_DIM - 1), 3))  # NaN component
    pq.write_table(pa.table({
        "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
        "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
        "label": pa.array([v[2] for v in vecs], pa.int32()),
    }), f"{d}/embeddings.parquet")
    return d


@pytest.fixture(scope="module")
def degen_con(degen_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{degen_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_vector_family_survives_degenerate_embeddings(spark, degen_dir, degen_con, name):
    from grader_etl_spark.registry import REGISTRY, load_all_operators

    oc = _load("tools/oracle_check.py", "degen_oc")
    load_all_operators()
    sdf = REGISTRY[name].fn(spark, degen_dir).toPandas()
    odf = degen_con.execute(REGISTRY[name].oracle).df()
    problems = oc.compare(name, sdf, odf)
    assert not problems, f"{name} diverged on degenerate embeddings: {problems}"


def test_valid_vectors_drops_exactly_the_degenerates(spark, degen_dir):
    from grader_etl_spark.io import load, valid_vectors

    emb = load(spark, degen_dir, "embeddings")
    kept = {r["vec_id"] for r in valid_vectors(emb).select("vec_id").collect()}
    assert kept == set(range(40)) | {42}  # zero vector is VALID input

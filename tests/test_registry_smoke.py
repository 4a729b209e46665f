"""Registry contract smoke: every registered query executes at
sf0.001 with a stable non-empty schema, and the oracle coverage is
exactly as declared (only the 4 float-iterative pipelines — k-means
and its IVF/recall consumers, plus the eigendecomposition PCA — are
rows-only; every sketch with an integer-deterministic core is
value-oracled).
"""

from __future__ import annotations

import pytest

from grader_etl_spark.registry import REGISTRY, all_oracles, all_queries

ROWS_ONLY_BY_DESIGN = {
    # Float-order-sensitive pipelines (cross-engine IEEE reduction
    # order) — every integer-deterministic pipeline is value-oracled
    # via the md5_32 cross-engine hash (functions/hashing.py).
    "q_kmeans_embeddings",  # iterative Lloyd's; invariants in test_clustering.py
    "q_ann_ivf",  # k-means cell layout; recall in test_similarity.py
    # Driver-side eigh of the d×d covariance; eigendecomposition isn't
    # SQL — semantics pinned vs numpy's full PCA in test_pca.py.
    "q_pca_project",
    # Inherits q_ann_ivf's float-order sensitivity (it IS the audit of
    # that path); mean-recall floor in test_similarity.py.
    "q_ann_recall",
    # (q_ann_lsh and q_bpe_train graduated to value oracles: exact
    # dyadic plane literals / unrolled integer merge rounds.)
}


def test_oracle_coverage_is_total_except_approximate():
    qs = all_queries()
    oracles = all_oracles()
    assert set(qs) - set(oracles) == ROWS_ONLY_BY_DESIGN


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_executes(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    df.limit(5).collect()  # plan executes end-to-end


def test_every_rewritten_oracle_still_parses_in_duckdb(sf_dir):
    """Round-7 hardening gate for the registration-time CAST rewriter:
    every registered oracle (post-rewrite) must still EXPLAIN cleanly
    against DuckDB with the driver's view set — a silently mangled
    rewrite fails HERE with the query's name, not as an opaque driver
    hash mismatch."""
    import duckdb

    from grader_etl_spark.io import TABLES
    from grader_etl_spark.registry import all_oracles

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name, sql in sorted(all_oracles().items()):
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as ex:
            failures.append(f"{name}: {ex}")
    assert not failures, "\n".join(failures)


def test_cast_rewriter_hardening():
    """String-literal parens don't confuse the scanner; unbalanced
    CASTs raise at registration; /*exact*/ opts out of the varchar
    route."""
    import pytest

    from grader_etl_spark.registry import _stable_double_casts as rw

    # parens inside a quoted literal (with '' escape) are not depth
    s = "SELECT CAST(strpos(v, '(''x))') + d AS DOUBLE) FROM t"
    assert rw(s) == (
        "SELECT CAST(CAST(strpos(v, '(''x))') + d AS VARCHAR) AS DOUBLE) FROM t"
    )
    # bare x stays direct; /*exact*/ marker stays direct
    assert rw("CAST(x AS DOUBLE)") == "CAST(x AS DOUBLE)"
    assert rw("CAST(y /*exact*/ AS DOUBLE)") == "CAST(y /*exact*/ AS DOUBLE)"
    # other operands reroute
    assert rw("CAST(y AS DOUBLE)") == "CAST(CAST(y AS VARCHAR) AS DOUBLE)"
    # unbalanced paren raises with context instead of mangling
    with pytest.raises(ValueError, match="unbalanced parentheses"):
        rw("SELECT CAST(a + (b AS DOUBLE FROM t")
    with pytest.raises(ValueError, match="unterminated string"):
        rw("SELECT CAST(a || 'oops AS DOUBLE) FROM t")

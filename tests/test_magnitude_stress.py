"""Adversarial-magnitude differential test for the decimal-accumulation
discipline (ADVICE r3): the committed fuzz generators top out at
o_totalprice ≈ 4e5, far below the regime where Σ(x·yc) leaves 64-bit
range. This generator pushes prices to ~1e12 with order dates pinned
late in the window (day ordinal ≈ 2400), so the trend-slope sufficient
statistic Σ(x·yc) exceeds 9.2e18 — a silent long wraparound with ANSI
off in the pre-fix spelling — and verifies Spark stays hash-equal to
the DuckDB (HUGEINT-summing) oracle there.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _gen(base: str, seed: int = 7) -> str:
    rng = random.Random(seed)
    os.makedirs(base, exist_ok=True)
    n_cust, n_ord = 20, 400
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array([f"Customer#{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(
                    [rng.randrange(5) for _ in range(n_cust)], pa.int32()
                ),
                "c_acctbal": pa.array([0.0] * n_cust),
                "c_mktsegment": pa.array(["BUILDING"] * n_cust),
            }
        ),
        os.path.join(base, "customer.parquet"),
    )
    day0 = dt.datetime(1995, 1, 1)
    # Dates in the last stretch of the window (x ≈ 2200-2400) and
    # 10-13 digit prices: per daily row x·yc ≈ 2e17-2e18 in cent·day
    # units, so a few hundred rows push Σ(x·yc) far past int64.
    odates = [day0 + dt.timedelta(days=rng.randrange(2200, 2400)) for _ in range(n_ord)]
    prices = [round(rng.uniform(1e10, 1e12), 2) for _ in range(n_ord)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    [rng.randrange(n_cust) for _ in range(n_ord)], pa.int64()
                ),
                "o_orderstatus": pa.array(["F"] * n_ord),
                "o_totalprice": pa.array(prices),
                "o_orderdate": pa.array(odates, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
            }
        ),
        os.path.join(base, "orders.parquet"),
    )
    return base


@pytest.fixture(scope="module")
def stress_dir(tmp_path_factory):
    return _gen(str(tmp_path_factory.mktemp("magstress")))


def _oracle_df(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _assert_parity(spark, sf_dir: str, name: str):
    import __spark_entry__ as e

    from tools.oracle_check import compare

    sdf = e.queries()[name](spark, sf_dir).toPandas()
    odf = _oracle_df(sf_dir, e.oracle_sql()[name])
    problems = compare(name, sdf, odf)
    assert not problems, f"{name} diverged at adversarial magnitudes: {problems}"


def test_trend_slope_exact_past_int64(spark, stress_dir):
    """Σ(x·yc) here genuinely exceeds int64 (the long-sum spelling
    wraps); the decimal accumulation must stay bit-equal to HUGEINT."""
    import pyspark.sql.functions as F

    from grader_etl_spark.io import load

    orders = load(spark, stress_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    cust = load(spark, stress_dir, "customer", columns=["c_custkey", "c_nationkey"])
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_nationkey",
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("x"),
        )
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long").alias("yc"))
    )
    sxy_exact = daily.groupBy().agg(
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("yc").cast("decimal(18,0)")).alias("s")
    ).collect()[0]["s"]
    assert abs(int(sxy_exact)) > 2**63, (
        "generator must reach the past-int64 regime for this test to mean anything"
    )
    _assert_parity(spark, stress_dir, "q_trend_slope")


def test_bootstrap_ci_parity_at_magnitude(spark, stress_dir):
    _assert_parity(spark, stress_dir, "q_bootstrap_ci")

"""Differential fuzzing for the time-series and statistics families.

Same rationale as test_fuzz_oracle.py / test_fuzz_relational.py: the
gate only ever compares engines on ONE generator's fixtures, and the
window/statistics operators are exactly the ones whose machinery can
overfit a benign data shape — divisions by a variance that is never
zero, windows over timestamps that never tie, series that never have
a single point, histograms whose min never equals max. This module
replays the query-vs-oracle comparison on seeded random tables that
force those shapes:

- a user with ONE event (single-point EWMA/Holt/autocorr series),
- a user whose values are all CONSTANT (zero variance -> z-score /
  runs-test / autocorr denominators hit zero),
- tied timestamps carrying DIFFERENT values (any window ordered by
  ts alone would be nondeterministic -> cross-engine mismatch),
- a lineitem return-flag whose prices are all EQUAL (runs test with
  one run, histogram bucket over a degenerate range),
- an orders stretch with CONSTANT totalprice (flat CUSUM series).
"""

from __future__ import annotations

import datetime as dt
import importlib.util
import os
import random

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(relpath: str, name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _oracle_check():
    return _load("tools/oracle_check.py", "oracle_check")


def _relational_fuzz():
    return _load("tests/test_fuzz_relational.py", "fuzz_relational_gen")


EVENT_QUERIES = [
    "q_ewma",
    "q_gap_fill",
    "q_holt_trend",
    "q_twap",
    "q_ohlc_daily",
    "q_sliding_window",
    "q_active_users",
    "q_disorder_profile",
    "q_autocorr_daily",
    "q_mad_outliers",
    "q_zscore_outliers",
    "q_winsorize",
]
TABLE_QUERIES = [
    "q_cusum_changepoint",
    "q_seasonality_dow",
    "q_trend_slope",
    "q_histogram",
    "q_theil_sen",
    "q_runs_test",
]

_ETYPE = ["signup", "click", "purchase", "error", "view"]
_FLAGS = ["A", "N", "R"]
_STATUS = ["F", "O", "P"]


def _gen_dir(tmp, seed: int) -> str:
    """Relational fuzz tables with events/orders/lineitem replaced by
    time-series-adversarial versions (dims + customer are reused)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    sf_dir = _relational_fuzz()._gen_dir(tmp, seed)

    def write(name, cols):
        pq.write_table(pa.table(cols), f"{sf_dir}/{name}.parquet")

    # ---- events ----------------------------------------------------
    t0 = dt.datetime(2024, 1, 1)
    rows: list[tuple[int, dt.datetime, float]] = []
    # user 0: a single event (one-point series).
    rows.append((0, t0 + dt.timedelta(hours=5), 42.5))
    # user 1: 40 events, ALL at one timestamp, ALL the same value
    # (maximal ties + zero variance + zero-duration TWAP interval).
    rows += [(1, t0 + dt.timedelta(days=2), 7.0)] * 40
    # user 2: distinct timestamps, CONSTANT value (zero variance with
    # a real time axis).
    rows += [
        (2, t0 + dt.timedelta(hours=6 * i), 13.25) for i in range(30)
    ]
    # user 3: tied timestamps carrying DIFFERENT values — any window
    # ordered by ts alone is nondeterministic here.
    for i in range(10):
        ts = t0 + dt.timedelta(days=5, hours=i)
        vals = rng.sample(range(100), 3)
        rows += [(3, ts, float(v)) for v in vals]
    # users 4-11: random series with empty days in between (gap-fill)
    # and frequent value ties (quantile/rank boundaries).
    for u in range(4, 12):
        for _ in range(rng.randint(2, 60)):
            ts = t0 + dt.timedelta(
                days=rng.choice([0, 1, 2, 3, 10, 11, 25]),
                seconds=rng.randrange(86400),
            )
            rows.append((u, ts, float(rng.choice([0, 1, 5, 5, 5, 250]))))
    rng.shuffle(rows)
    write(
        "events",
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(
                [rng.choice(_ETYPE) for _ in rows]
            ),
            "value": pa.array([r[2] for r in rows]),
            "props": pa.array(
                ['{"k": %d}' % rng.randrange(100) for _ in rows]
            ),
        },
    )

    # ---- orders ----------------------------------------------------
    # Daily series with a long CONSTANT-price stretch (flat CUSUM),
    # a single-order customer (39), and several empty weekdays.
    day0 = dt.datetime(1995, 1, 1)
    n_ord = 150
    custs = [39] + [rng.randrange(30) for _ in range(n_ord - 1)]
    odates, prices = [], []
    for i in range(n_ord):
        odates.append(day0 + dt.timedelta(days=rng.choice(
            [d for d in range(400) if d % 7 not in (2, 5)]
        )))
        prices.append(50_000.0 if i < 60 else round(rng.uniform(1000, 400000), 2))
    _PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    write(
        "orders",
        {
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(custs, pa.int64()),
            "o_orderstatus": pa.array([rng.choice(_STATUS) for _ in range(n_ord)]),
            "o_totalprice": pa.array(prices),
            "o_orderdate": pa.array(odates, pa.timestamp("us")),
            "o_orderpriority": pa.array([rng.choice(_PRIO) for _ in range(n_ord)]),
        },
    )

    # ---- lineitem --------------------------------------------------
    # Flag A: constant price (one "run", degenerate histogram range if
    # a flag-scoped histogram ever lands). Flag N: a SINGLE row.
    # Flag R: random with heavy ties. Quantities tie on few values.
    n_part = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/part.parquet'"
    ).fetchone()[0]
    n_supp = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/supplier.parquet'"
    ).fetchone()[0]
    lines: list[tuple[int, int, str, float]] = []
    for i in range(120):
        lines.append((rng.randrange(100), i, "A", 5000.0))
    lines.append((3, 500, "N", 123.45))
    for i in range(120):
        lines.append(
            (rng.randrange(100), 600 + i, "R", float(rng.choice([900, 900, 2500, 105000])))
        )
    write(
        "lineitem",
        {
            "l_orderkey": pa.array([ok for ok, _, _, _ in lines], pa.int64()),
            "l_partkey": pa.array([rng.randrange(n_part) for _ in lines], pa.int64()),
            "l_suppkey": pa.array([rng.randrange(n_supp) for _ in lines], pa.int64()),
            "l_linenumber": pa.array([ln for _, ln, _, _ in lines], pa.int32()),
            "l_quantity": pa.array([float(rng.choice([1, 1, 25, 50])) for _ in lines]),
            "l_extendedprice": pa.array([px for _, _, _, px in lines]),
            "l_discount": pa.array([round(rng.randrange(11) / 100, 2) for _ in lines]),
            "l_tax": pa.array([round(rng.randrange(9) / 100, 2) for _ in lines]),
            "l_returnflag": pa.array([fl for _, _, fl, _ in lines]),
            "l_linestatus": pa.array([rng.choice(_STATUS[:2]) for _ in lines]),
            "l_shipdate": pa.array(
                [day0 + dt.timedelta(days=rng.randrange(2400)) for _ in lines],
                pa.timestamp("us"),
            ),
        },
    )
    return sf_dir


@pytest.fixture(scope="module")
def oc():
    return _oracle_check()


@pytest.mark.parametrize("seed", [307, 419])
def test_timeseries_and_stats_match_oracle_on_adversarial_tables(
    spark, tmp_path_factory, oc, seed
):
    from grader_etl_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    sf_dir = _gen_dir(tmp_path_factory.mktemp(f"fuzzts_{seed}"), seed)
    con = duckdb.connect()
    for t in (
        "region", "nation", "part", "supplier",
        "customer", "orders", "lineitem", "events",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name in EVENT_QUERIES + TABLE_QUERIES:
        spec = REGISTRY[name]
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            odf = con.execute(spec.oracle).df()
            problems = oc.compare(name, sdf, odf)
        except Exception as exc:  # surface which query, keep checking the rest
            problems = [f"exception: {exc!r}"[:300]]
        if problems:
            failures.append(f"{name}: {problems}")
    assert not failures, "\n".join(failures)

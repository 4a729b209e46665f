"""Differential fuzzing for the relational and events families.

Same rationale as test_fuzz_oracle.py (the gate only ever saw one
generator's fixtures), applied to the TPC-H-shaped and events
operators: seeded random fact tables over the REAL dimension fixtures,
with adversarial shapes the generator never emits — customers with no
orders, orders with no lineitems, one heavily skewed customer, users
whose events all share one timestamp, malformed passback props — run
through both engines and compared with the oracle_check comparator.
"""

from __future__ import annotations

import datetime as dt
import importlib.util
import os
import random
import shutil

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = "/root/testdata/sf0.001"
_DIMS = ("region", "nation", "part", "supplier")


def _oracle_check():
    spec = importlib.util.spec_from_file_location(
        "oracle_check", os.path.join(_REPO, "tools", "oracle_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


RELATIONAL = [
    "q_group_agg",
    "q_pricing_summary",
    "q_daily_report",
    "q_join_inner",
    "q_join_outer",
    "q_join_semi",
    "q_join_anti",
    "q_topk",
    "q_window_rank",
    "q_rollup",
    "q_brand_affinity",
    "q_yoy_revenue",
]
EVENTS = [
    "q_sessionize",
    "q_session_window",
    "q_max_concurrency",
    "q_funnel",
    "q_markov_transitions",
    "q_user_entropy",
    "q_passback_parse",
    "q_json_extract",
    "q_string_agg",
]
# Behavior / insights / lifecycle battery over the same tables: the
# operators with sequence logic (funnels, paths, streaks, attribution,
# SCD2/CDC timelines), survival/decay math, and statistical tests
# whose denominators (variances, rank ties, cohort sizes) the skewed/
# childless/single-timestamp shapes above actually stress.
BEHAVIOR = [
    "q_cohort_retention",
    "q_retention_curve",
    "q_funnel_latency",
    "q_window_funnel",
    "q_top_paths",
    "q_attribution_last_touch",
    "q_attribution_linear",
    "q_cdc_apply",
    "q_scd2_timeline",
    "q_point_in_time",
    "q_longest_streak",
    "q_order_gap_distribution",
    "q_kaplan_meier",
    "q_decay_ltv",
    "q_rfm_segments",
    "q_power_user_curve",
    "q_new_vs_returning",
    "q_spearman_corr",
    "q_benford",
    "q_ks_test",
    "q_anomaly_dow",
    "q_audience_overlap",
    "q_ab_test",
    "q_power_analysis",
    "q_did_lift",
    "q_gini_nations",
    "q_theil_index",
    "q_market_concentration",
    "q_weighted_quantiles",
    "q_cohort_revenue",
]

_FLAGS = ["A", "N", "R"]
_STATUS = ["F", "O", "P"]
_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_SEG = ["MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "BUILDING"]
_ETYPE = ["signup", "click", "purchase", "error", "view"]


def _zipf_pick(rng: random.Random, n: int, hot_frac: float = 0.5):
    """Key sampler for the hot-key shape: key 0 with probability
    ``hot_frac``, the rest ~ 1/rank (zipf tail) over 1..n-1."""
    if rng.random() < hot_frac:
        return 0
    # inverse-CDF-ish zipf tail without scipy: weight 1/k
    r = rng.random() * sum(1.0 / k for k in range(1, n))
    acc = 0.0
    for k in range(1, n):
        acc += 1.0 / k
        if r <= acc:
            return k
    return n - 1


def _gen_dir(
    tmp,
    seed: int,
    price_scale: float = 1.0,
    key_skew: bool = False,
    with_nulls: bool = False,
) -> str:
    """``price_scale`` multiplies every money/value column (o_totalprice,
    l_extendedprice, c_acctbal, events.value) — at 1e6 the tables reach
    the adversarial-magnitude regime (prices ~4e11, group sums ~1e14)
    where any leftover narrow decimal cast or 64-bit product sum
    diverges cross-engine (the q_trend_slope sxy class).

    ``key_skew`` is the ZIPF/HOT-KEY shape: one customer with ~50% of
    orders (zipf tail behind it), one part/supplier pair dominating
    lineitem, one user with ~50% of events at RANDOM timestamps (the
    base shape's user-0 has one frozen timestamp — different stress),
    one event_type at ~70%, and a regenerated ``part`` catalog where
    ONE brand holds half the rows (degenerate fuzzy-blocking key).
    Exposes AQE skew-join paths, window-per-key operators, and every
    per-key denominator."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    sf_dir = str(tmp)
    for t in _DIMS:
        shutil.copy(f"{_SRC}/{t}.parquet", f"{sf_dir}/{t}.parquet")
    n_part = duckdb.sql(f"SELECT count(*) FROM '{_SRC}/part.parquet'").fetchone()[0]
    n_supp = duckdb.sql(f"SELECT count(*) FROM '{_SRC}/supplier.parquet'").fetchone()[0]

    def write(name, cols):
        pq.write_table(pa.table(cols), f"{sf_dir}/{name}.parquet")

    if key_skew:
        # Regenerate part: brand 0 holds HALF the catalog; names drawn
        # from small pools so near-matches (levenshtein<=4) actually
        # occur inside the giant block.
        adjs = ["cold", "warm", "small", "large", "dark", "light", "old", "new"]
        nouns = ["widget", "bolt", "gear", "valve", "pump", "ring"]
        types = ["ECONOMY", "PROMO", "STANDARD", "DELUXE"]
        brands = [
            "Brand#0" if rng.random() < 0.5 else f"Brand#{rng.randrange(1, 25)}"
            for _ in range(n_part)
        ]
        write(
            "part",
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array(
                    [f"{rng.choice(adjs)} {rng.choice(nouns)}" for _ in range(n_part)]
                ),
                "p_brand": pa.array(brands),
                "p_type": pa.array([rng.choice(types) for _ in range(n_part)]),
                "p_size": pa.array(
                    [rng.randint(1, 50) for _ in range(n_part)], pa.int32()
                ),
                "p_retailprice": pa.array(
                    [round(900 + 0.1 * i, 2) for i in range(n_part)]
                ),
            },
        )

    n_cust = 40
    write(
        "customer",
        {
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": pa.array([f"Customer#{i}" for i in range(n_cust)]),
            "c_nationkey": pa.array(
                [rng.randrange(25) for _ in range(n_cust)], pa.int32()
            ),
            "c_acctbal": pa.array(
                [
                    None
                    if with_nulls and rng.random() < 0.1
                    else round(rng.uniform(-900, 9000) * price_scale, 2)
                    for _ in range(n_cust)
                ]
            ),
            "c_mktsegment": pa.array([rng.choice(_SEG) for _ in range(n_cust)]),
        },
    )

    # orders: customer 0 is heavily skewed; customers 30-39 have NONE.
    # zipf shape: cust 0 takes ~50% and the rest follow a 1/rank tail.
    n_ord = 120
    if key_skew:
        custs = [_zipf_pick(rng, 30) for _ in range(n_ord)]
    else:
        custs = [0 if rng.random() < 0.3 else rng.randrange(30) for _ in range(n_ord)]
    day0 = dt.datetime(1995, 1, 1)
    odates = [day0 + dt.timedelta(days=rng.randrange(2400)) for _ in range(n_ord)]
    write(
        "orders",
        {
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(custs, pa.int64()),
            "o_orderstatus": pa.array([rng.choice(_STATUS) for _ in range(n_ord)]),
            "o_totalprice": pa.array(
                [round(rng.uniform(1000, 400000) * price_scale, 2) for _ in range(n_ord)]
            ),
            "o_orderdate": pa.array(odates, pa.timestamp("us")),
            "o_orderpriority": pa.array([rng.choice(_PRIO) for _ in range(n_ord)]),
        },
    )

    # lineitem: orders 100-119 have NO lines (exercises semi/anti/outer)
    lines = []
    for ok in range(100):
        for ln in range(1, rng.randint(1, 5) + 1):
            lines.append((ok, ln))
    write(
        "lineitem",
        {
            "l_orderkey": pa.array([ok for ok, _ in lines], pa.int64()),
            "l_partkey": pa.array(
                [
                    _zipf_pick(rng, n_part, 0.4) if key_skew else rng.randrange(n_part)
                    for _ in lines
                ],
                pa.int64(),
            ),
            "l_suppkey": pa.array(
                [
                    _zipf_pick(rng, n_supp, 0.3) if key_skew else rng.randrange(n_supp)
                    for _ in lines
                ],
                pa.int64(),
            ),
            "l_linenumber": pa.array([ln for _, ln in lines], pa.int32()),
            "l_quantity": pa.array([float(rng.randint(1, 50)) for _ in lines]),
            "l_extendedprice": pa.array(
                [round(rng.uniform(900, 105000) * price_scale, 2) for _ in lines]
            ),
            "l_discount": pa.array(
                [round(rng.randrange(11) / 100, 2) for _ in lines]
            ),
            "l_tax": pa.array([round(rng.randrange(9) / 100, 2) for _ in lines]),
            "l_returnflag": pa.array([rng.choice(_FLAGS) for _ in lines]),
            "l_linestatus": pa.array([rng.choice(_STATUS[:2]) for _ in lines]),
            "l_shipdate": pa.array(
                [
                    odates[ok] + dt.timedelta(days=rng.randrange(1, 90))
                    for ok, _ in lines
                ],
                pa.timestamp("us"),
            ),
        },
    )

    # events: user 0's events all share ONE timestamp (zero-length
    # sessions / max concurrency). props stays fixture-realistic valid
    # JSON: the passback oracles extract from the RAW column, and the
    # dual-syntax stress is synthesized inside q_passback_parse itself
    # (odd-id rewrite) — malformed props are outside the generator's
    # contract and are covered by tests/test_passback.py instead.
    n_ev = 300
    t0 = dt.datetime(2024, 1, 1)
    if key_skew:
        # user 0 holds ~50% of events at RANDOM timestamps (stresses
        # window-per-key state: sessions, streaks, paths, entropy all
        # concentrate on one partition key); one event_type at ~70%.
        uids = [_zipf_pick(rng, 12) for _ in range(n_ev)]
        tss = [t0 + dt.timedelta(seconds=rng.randrange(30 * 86400)) for _ in uids]
        etypes = [
            "view" if rng.random() < 0.7 else rng.choice(_ETYPE) for _ in range(n_ev)
        ]
    else:
        uids = [0 if rng.random() < 0.2 else rng.randrange(12) for _ in range(n_ev)]
        tss = [
            t0 + dt.timedelta(seconds=0 if u == 0 else rng.randrange(30 * 86400))
            for u in uids
        ]
        etypes = [rng.choice(_ETYPE) for _ in range(n_ev)]
    # with_nulls: the REAL-WORLD-nullable event columns go NULL at
    # ~10% (value, props) and ~5% (event_type) — the relational half
    # of the nulls shape. Join keys and timestamps stay NOT NULL (the
    # TPC-H/contract columns the validation gate guarantees).
    props = [
        None
        if with_nulls and rng.random() < 0.1
        else '{"k": %d}' % rng.randrange(100)
        for _ in range(n_ev)
    ]
    if with_nulls:
        etypes = [None if rng.random() < 0.05 else e for e in etypes]
    write(
        "events",
        {
            "event_id": pa.array(range(n_ev), pa.int64()),
            "ts": pa.array(tss, pa.timestamp("us")),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(etypes),
            "value": pa.array(
                [
                    None
                    if with_nulls and rng.random() < 0.1
                    else round(rng.uniform(0, 350) * price_scale, 2)
                    for _ in range(n_ev)
                ]
            ),
            "props": pa.array(props),
        },
    )
    return sf_dir


@pytest.fixture(scope="module")
def oc():
    return _oracle_check()


@pytest.mark.parametrize("seed", [101, 211])
def test_relational_and_events_match_oracle_on_random_tables(
    spark, tmp_path_factory, oc, seed
):
    from grader_etl_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    sf_dir = _gen_dir(tmp_path_factory.mktemp(f"fuzzrel_{seed}"), seed)
    con = duckdb.connect()
    for t in list(_DIMS) + ["customer", "orders", "lineitem", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name in RELATIONAL + EVENTS + BEHAVIOR:
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

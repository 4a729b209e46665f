"""Extended differential-fuzz campaign over the COMBINED adversarial
tables: every oracled registry query runs against its DuckDB oracle on
a fresh seeded dataset per seed, cycling the corpus shape
(random / adversarial / dup-heavy) across seeds.

This is the ad-hoc wide-net companion of the committed two-seed
`tests/test_fuzz_sweep.py` (kept narrow to bound suite time): run it
with as many seeds as patience allows before a release. The round-3
campaign ran seeds 311-1709 (~15 seed/shape combos x 265 queries)
and surfaced three real envelope bugs, all fixed in-tree — see
BASELINE.md "Robustness probes".

    python tools/fuzz_campaign.py 311 409 503 ...
    python tools/fuzz_campaign.py --shape degenerate-vectors 101 103 107
    python tools/fuzz_campaign.py --shape nulls+magnitude 211 223

``--shape`` pins one shape for every seed; shapes compose with "+"
(see SHAPES below) so the interaction pairings that found the round-5
corr-of-constant / negative-variance / concat_ws-of-nothing bugs are a
first-class campaign axis.

Exit code 1 if any query/seed mismatches. Tables land under
/tmp/fuzz_campaign_data; ~2-3 min per seed on local[32].
"""
import importlib.util
import os
import sys
import time

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = ("region", "nation", "part", "supplier", "customer", "orders",
          "lineitem", "events", "documents", "embeddings")
SHAPES = (
    "random", "adversarial", "dup-heavy", "magnitude", "zipf", "unicode",
    "nulls", "empty", "one", "degenerate-vectors",
)

# Shapes COMPOSE with "+" (``--shape nulls+magnitude``): each part
# contributes its axis — magnitude scales money columns, zipf skews
# keys, nulls seeds NULL rows, empty/one truncate the facts,
# degenerate-vectors injects embedding-model failure rows — and the
# corpus takes the first corpus-affecting part. The round-5 ad-hoc
# interaction probes (nulls x magnitude, one x nulls) found three real
# bugs the single axes couldn't; this makes those pairings a repeatable
# campaign axis instead of a one-off script.
_CORPUS_PARTS = ("adversarial", "dup-heavy", "unicode", "nulls")

_EMB_DIM = 64  # fixture embedding dimension (LSH plane literals are 64-wide)


def _degenerate_vector_rows(start_id, rng):
    """Embedding-model failure rows (BASELINE.md §degenerate-embedding):
    NULL vector, empty array, zero norm, NaN component, NULL component,
    all-NaN — mixed with one valid control row so the gate's KEEP side
    is exercised in the same batch as its DROP side."""
    nan = float("nan")
    return [
        (start_id + 0, None, 0),
        (start_id + 1, [], 1),
        (start_id + 2, [0.0] * _EMB_DIM, 2),
        (start_id + 3, [nan] + [0.5] * (_EMB_DIM - 1), 3),
        (start_id + 4, [rng.gauss(0, 1) if i != 7 else None for i in range(_EMB_DIM)], 4),
        (start_id + 5, [nan] * _EMB_DIM, 5),
        (start_id + 6, [rng.gauss(0, 1) for _ in range(_EMB_DIM)], 6),
    ]


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


fo = _load("tests/test_fuzz_oracle.py", "camp_fo")
fr = _load("tests/test_fuzz_relational.py", "camp_fr")
fe = _load("tests/test_fuzz_embeddings.py", "camp_fe")
oc = _load("tools/oracle_check.py", "camp_oc")


def gen_combined(base, seed, shape):
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(base, f"s{seed}")
    os.makedirs(d, exist_ok=True)
    parts = shape.split("+")
    # "magnitude": same random shapes but every money column scaled 1e6
    # (prices ~4e11, group sums ~1e14) — stresses decimal-width and
    # product-sum discipline repo-wide; corpus shape stays "random".
    # "zipf": extreme KEY skew — one customer/user/part/brand holding
    # 30-50% of its table (AQE skew paths, window-per-key state) and a
    # hot shingle in EVERY document (the prefix filter's degenerate
    # posting list).
    sf_dir = fr._gen_dir(
        d,
        seed,
        price_scale=1e6 if "magnitude" in parts else 1.0,
        key_skew="zipf" in parts,
        with_nulls="nulls" in parts,
    )
    corpus_shape = next(
        (p for p in _CORPUS_PARTS if p in parts),
        "hot" if "zipf" in parts else "random",
    )
    rows = fo._corpus(seed, corpus_shape)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    }), os.path.join(sf_dir, "documents.parquet"))
    vr = fe._vectors(seed)
    if "empty" in parts or "one" in parts:
        # EMPTY shape: every fact table truncated to zero rows with
        # its schema intact (real dims stay) — empty partitions,
        # empty days, and empty corpora are routine at 100 TB, and
        # zero-row global aggregates are where ANSI /0, grand-total
        # grouping sets, and driver-side min()-of-nothing live.
        # ONE shape: single-row facts — n-1 = 0 variance denominators,
        # 1x1 contingency tables, one-sided ECDFs, zero MADs.
        n_keep = 0 if "empty" in parts else 1
        for t in ("orders", "lineitem", "events", "documents"):
            f = os.path.join(sf_dir, f"{t}.parquet")
            pq.write_table(pq.read_table(f).slice(0, n_keep), f)
        vr = vr[:n_keep]
    if "degenerate-vectors" in parts:
        # injected AFTER any truncation: "one + degenerate" is a tiny
        # corpus that is MOSTLY garbage vectors — the harshest ratio
        # for the valid_vectors gate and every downstream denominator
        vr = vr + _degenerate_vector_rows(1000, random.Random(seed * 7 + 1))
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in vr], pa.int64()),
        "embedding": pa.array([r[1] for r in vr], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in vr], pa.int32()),
    }), os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def main():
    args = sys.argv[1:]
    forced_shape = None
    if args and args[0] == "--shape":  # pin one shape for every seed
        forced_shape = args[1]
        args = args[2:]
    seeds = [int(s) for s in args] or [311, 409, 503]
    from grader_etl_spark.registry import (
        REGISTRY, clear_session_memos, load_all_operators,
    )
    from grader_etl_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    load_all_operators()
    names = sorted(n for n in REGISTRY if REGISTRY[n].oracle is not None)
    base = "/tmp/fuzz_campaign_data"
    total_fail = 0
    for k, seed in enumerate(seeds):
        shape = forced_shape or SHAPES[k % len(SHAPES)]
        sf_dir = gen_combined(base, seed, shape)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        t0 = time.time()
        fails = []
        for name in names:
            spec = REGISTRY[name]
            try:
                sdf = spec.fn(spark, sf_dir).toPandas()
                odf = con.execute(spec.oracle).df()
                problems = oc.compare(name, sdf, odf)
            except Exception as exc:
                problems = [f"exception: {exc!r}"[:500]]
            if problems:
                fails.append(f"  {name}: {problems}")
        print(
            f"seed {seed} shape={shape}: {len(names) - len(fails)}/{len(names)} ok "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        for f in fails:
            print(f, flush=True)
        total_fail += len(fails)
        clear_session_memos()
        spark.catalog.clearCache()
        con.close()
    print(f"CAMPAIGN DONE: {total_fail} failures across {len(seeds)} seeds", flush=True)
    return 1 if total_fail else 0


if __name__ == "__main__":
    sys.exit(main())

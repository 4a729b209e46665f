"""Extended-seed runs of the four TARGETED fuzz families on their own
specialized generators (the shapes the combined campaign can't make:
hand-crafted time-series degeneracies, zero/duplicate vectors, skewed
childless relational tables, the three corpus shapes).

Companion of tools/fuzz_campaign.py — that one runs EVERY oracled
query on combined tables; this one re-runs each family's curated
query list on its own worst-case generator at fresh seeds:

    python tools/fuzz_families.py 421 521

Each seed runs the documents family at all three corpus shapes plus
the relational, time-series, and embedding families. Exit 1 on any
mismatch. The round-3 run (seeds 421/521 + 331/433/541/643/751/853
equivalents) was clean — see BASELINE.md "Robustness probes".
"""
import importlib.util
import os
import sys
import time

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


fo = _load("tests/test_fuzz_oracle.py", "fam_fo")
fr = _load("tests/test_fuzz_relational.py", "fam_fr")
ft = _load("tests/test_fuzz_timeseries.py", "fam_ft")
fe = _load("tests/test_fuzz_embeddings.py", "fam_fe")
oc = _load("tools/oracle_check.py", "fam_oc")


def check(spark, registry, names, sf_dir, con, label):
    fails = []
    t0 = time.time()
    for name in names:
        spec = registry[name]
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            odf = con.execute(spec.oracle).df()
            problems = oc.compare(name, sdf, odf)
        except Exception as exc:
            problems = [f"exception: {exc!r}"[:500]]
        if problems:
            fails.append(f"  {name}: {problems}")
    print(
        f"{label}: {len(names) - len(fails)}/{len(names)} ok "
        f"({time.time() - t0:.0f}s)",
        flush=True,
    )
    for f in fails:
        print(f, flush=True)
    return len(fails)


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq
    from grader_etl_spark.registry import (
        REGISTRY, clear_session_memos, load_all_operators,
    )
    from grader_etl_spark.session import get_spark

    seeds = [int(s) for s in sys.argv[1:]] or [421, 521]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    load_all_operators()
    base = "/tmp/fuzz_families_data"
    total = 0

    def reset(con):
        con.close()
        clear_session_memos()
        spark.catalog.clearCache()

    for seed in seeds:
        for shape in ("adversarial", "dup-heavy", "random"):
            d = os.path.join(base, f"doc_{shape}_{seed}")
            os.makedirs(d, exist_ok=True)
            rows = fo._corpus(seed, shape)
            pq.write_table(pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }), os.path.join(d, "documents.parquet"))
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
            )
            total += check(spark, REGISTRY, list(fo.QUERIES), d, con, f"doc {shape}/{seed}")
            reset(con)

        d = os.path.join(base, f"rel_{seed}")
        os.makedirs(d, exist_ok=True)
        sf_dir = fr._gen_dir(d, seed)
        con = duckdb.connect()
        for t in list(fr._DIMS) + ["customer", "orders", "lineitem", "events"]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        total += check(
            spark, REGISTRY, list(fr.RELATIONAL + fr.EVENTS + fr.BEHAVIOR),
            sf_dir, con, f"rel {seed}",
        )
        reset(con)

        d = os.path.join(base, f"ts_{seed}")
        os.makedirs(d, exist_ok=True)
        sf_dir = ft._gen_dir(d, seed)
        con = duckdb.connect()
        for t in ("region", "nation", "part", "supplier",
                  "customer", "orders", "lineitem", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        total += check(
            spark, REGISTRY, list(ft.EVENT_QUERIES + ft.TABLE_QUERIES),
            sf_dir, con, f"ts {seed}",
        )
        reset(con)

        d = os.path.join(base, f"emb_{seed}")
        os.makedirs(d, exist_ok=True)
        vr = fe._vectors(seed)
        pq.write_table(pa.table({
            "vec_id": pa.array([r[0] for r in vr], pa.int64()),
            "embedding": pa.array([r[1] for r in vr], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in vr], pa.int32()),
        }), os.path.join(d, "embeddings.parquet"))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
        )
        total += check(spark, REGISTRY, list(fe.QUERIES), d, con, f"emb {seed}")
        reset(con)

    print(f"FAMILIES DONE: {total} failures", flush=True)
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())

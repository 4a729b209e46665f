"""Per-query SHUFFLE-VOLUME audit: bytes and records through every
exchange, read from the SQL status store after a noop-sink execution.

PLANS.md counts exchanges (plan shape); the scale probes measure wall
ratios (noisy on a shared host). This audits the third dimension —
how many bytes actually cross the wire — which is the quantity that
becomes the bottleneck at 100 TB and, unlike wall time, is
deterministic run-to-run. Run it at two scale factors and the ratio
shows each query's shuffle-volume growth directly:

    python tools/shuffle_audit.py [--sf DIR] [query ...]
    python tools/shuffle_audit.py --ratio /root/testdata/sf0.01 \
        /root/testdata/sf0.1 q_group_agg ...

Output: per query — executions triggered, exchange count, total
shuffle bytes written, total shuffle records, and bytes/record.
A query whose shuffle bytes grow ~linearly with input while its
RESULT stays small is map-side-combine healthy; one whose bytes grow
like the pre-aggregation input is shuffling too early.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grader_etl_spark.registry import REGISTRY, all_queries  # noqa: E402
from grader_etl_spark.session import get_spark  # noqa: E402

_UNITS = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3, "TiB": 1024**4}


def _parse_total(s: str) -> float:
    """Metric strings are either '3,200' or
    'total (min, med, max ...)\\n83.2 KiB (2.6 KiB, ...)'."""
    line = s.split("\n")[-1].strip()
    m = re.match(r"([\d.,]+)\s*(B|KiB|MiB|GiB|TiB)?", line)
    if not m:
        return 0.0
    val = float(m.group(1).replace(",", ""))
    return val * _UNITS.get(m.group(2) or "B", 1)


def _exec_ids(store) -> set[int]:
    out = set()
    lst = store.executionsList()
    for i in range(lst.size()):
        out.add(lst.apply(i).executionId())
    return out


def _shuffle_totals(spark, exec_ids: set[int]) -> dict:
    store = spark._jsparkSession.sharedState().statusStore()
    tot_bytes = tot_records = n_exch = 0
    for eid in exec_ids:
        metric_vals = {}
        it = store.executionMetrics(eid).iterator()
        while it.hasNext():
            kv = it.next()
            metric_vals[kv._1()] = kv._2()
        nodes = store.planGraph(eid).allNodes()
        for i in range(nodes.size()):
            n = nodes.apply(i)
            if n.name() != "Exchange":
                continue
            ms, got = n.metrics(), {}
            for j in range(ms.size()):
                m = ms.apply(j)
                v = metric_vals.get(m.accumulatorId())
                if v is not None:
                    got[m.name()] = v
            if "shuffle bytes written" in got:
                n_exch += 1
                tot_bytes += _parse_total(got["shuffle bytes written"])
                tot_records += _parse_total(got.get("shuffle records written", "0"))
    return {"exchanges": n_exch, "bytes": int(tot_bytes), "records": int(tot_records)}


def audit(spark, names: list[str], sf_dir: str) -> dict[str, dict]:
    from grader_etl_spark.registry import clear_session_memos

    store = spark._jsparkSession.sharedState().statusStore()
    out: dict[str, dict] = {}
    for name in names:
        clear_session_memos(spark)  # each query pays (and shows) its own build
        spark.catalog.clearCache()
        before = _exec_ids(store)
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        import time

        time.sleep(0.3)  # status store is event-bus async
        new = _exec_ids(store) - before
        t = _shuffle_totals(spark, new)
        t["executions"] = len(new)
        out[name] = t
    return out


def _fmt(b: float) -> str:
    for u in ("B", "KiB", "MiB", "GiB"):
        if b < 1024:
            return f"{b:.1f} {u}"
        b /= 1024
    return f"{b:.1f} TiB"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--ratio", nargs=2, metavar=("SMALL", "BIG"), default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="grader-etl-spark-shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()
    names = args.names or sorted(REGISTRY)

    if args.ratio:
        small, big = args.ratio
        a = audit(spark, names, small)
        b = audit(spark, names, big)
        print(f"{'query':30s} {'exch':>4s} {'bytes@small':>12s} {'bytes@big':>12s} "
              f"{'ratio':>6s} {'rec ratio':>9s}")
        for n in names:
            br = b[n]["bytes"] / a[n]["bytes"] if a[n]["bytes"] else float("nan")
            rr = b[n]["records"] / a[n]["records"] if a[n]["records"] else float("nan")
            print(f"{n:30s} {b[n]['exchanges']:>4d} {_fmt(a[n]['bytes']):>12s} "
                  f"{_fmt(b[n]['bytes']):>12s} {br:>6.2f} {rr:>9.2f}")
        return

    res = audit(spark, names, args.sf)
    print(f"{'query':30s} {'execs':>5s} {'exch':>4s} {'shuffle bytes':>13s} "
          f"{'records':>12s} {'B/rec':>7s}")
    for n, t in sorted(res.items(), key=lambda kv: -kv[1]["bytes"]):
        bpr = t["bytes"] / t["records"] if t["records"] else 0
        print(f"{n:30s} {t['executions']:>5d} {t['exchanges']:>4d} "
              f"{_fmt(t['bytes']):>13s} {t['records']:>12,d} {bpr:>7.1f}")


if __name__ == "__main__":
    main()

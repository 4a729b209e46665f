"""Model-based MERGE invariant: any SEQUENCE of merges (upsert /
delete / insert-only, mixed prune modes) leaves the parquet table
equal to a dict model applying the same MERGE semantics row-by-row —
the stateful twin of tests/test_merge.py's example-based pins, in the
same spirit as the dedup property test (hypothesis-generated
scenarios, few examples, each a full multi-step lifecycle).

The model: {key: (value, partition)}. upsert = replace-or-add;
delete = remove matched; insert-only = add unmatched. Partition
values come from a tiny alphabet so steps collide with earlier
partitions; keys from a tiny space so matches/moves actually happen.
Moves (a key re-appearing under a different partition) force
prune_with_source_partitions=False on that step — the documented
contract.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from grader_etl_spark.plans.merge import merge_into

SCHEMA = "k int, v string, day string"

row_st = st.tuples(
    st.integers(min_value=0, max_value=7),              # key
    st.text(alphabet="xyz", min_size=1, max_size=3),    # value
    st.sampled_from(["d1", "d2", "d3"]),                # partition
)


def _dedupe(rows: list[tuple]) -> list[tuple]:
    seen, out = set(), []
    for r in rows:
        if r[0] not in seen:
            seen.add(r[0])
            out.append(r)
    return out


step_st = st.tuples(
    st.sampled_from(["upsert", "delete", "insert_only"]),
    st.lists(row_st, min_size=0, max_size=6).map(_dedupe),
)
scenario_st = st.lists(step_st, min_size=1, max_size=4)


def _apply_model(model: dict, op: str, rows: list[tuple]) -> None:
    for k, v, day in rows:
        if op == "upsert":
            model[k] = (v, day)
        elif op == "delete":
            model.pop(k, None)
        elif op == "insert_only":
            model.setdefault(k, (v, day))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(scenario=scenario_st)
def test_merge_sequence_matches_dict_model(spark, tmp_path_factory, scenario):
    path = str(tmp_path_factory.mktemp("merge_model") / "t")
    model: dict[int, tuple[str, str]] = {}
    for op, rows in scenario:
        src = spark.createDataFrame(rows, SCHEMA) if rows else \
            spark.createDataFrame([], SCHEMA)
        # a key changing partition needs the unpruned discovery mode
        moved = any(k in model and model[k][1] != day for k, _, day in rows)
        kwargs = dict(keys=["k"], partition_col="day",
                      prune_with_source_partitions=not moved)
        if op == "upsert":
            merge_into(spark, path, src, when_matched="update",
                       when_not_matched="insert", **kwargs)
        elif op == "delete":
            merge_into(spark, path, src, when_matched="delete",
                       when_not_matched=None, **kwargs)
        else:
            merge_into(spark, path, src, when_matched=None,
                       when_not_matched="insert", **kwargs)
        _apply_model(model, op, rows)

        try:
            actual = {(r.k, r.v, r.day) for r in spark.read.parquet(path).collect()}
        except Exception:
            actual = set()  # table never created (all-empty prefix)
        expected = {(k, v, day) for k, (v, day) in model.items()}
        assert actual == expected, f"after {op} {rows}"

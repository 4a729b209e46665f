"""Delta-parity merge clauses (plans/merge.py round 7): predicate-
gated WHEN MATCHED (``when_matched_condition``), partial-column SET
(``update_cols``), and multi-column partitioning
(``partition_cols``) — example pins, a DuckDB oracle for the
conditional algebra, nested-layout crash recovery, and a hypothesis
dict-model for sequences mixing all three."""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from grader_etl_spark.plans import manifest as M
from grader_etl_spark.plans.merge import MergeStats, _InjectedCrash, merge_into, recover

SCHEMA = "k int, v string, ts int, day string"


def _target(spark, path):
    rows = [
        (1, "a", 10, "d1"), (2, "b", 20, "d1"),
        (3, "c", 30, "d2"), (4, "d", 40, "d2"),
    ]
    spark.createDataFrame(rows, SCHEMA).write.partitionBy("day").parquet(path)


def _rows(spark, path):
    return {(r.k, r.v, r.ts, r.day) for r in spark.read.parquet(path).collect()}


# ---------------------------------------------------------------------------
# when_matched_condition
# ---------------------------------------------------------------------------


def test_conditional_update_only_newer_rows_win(spark, tmp_path):
    """The CDC staple: WHEN MATCHED AND s.ts > t.ts THEN UPDATE — a
    stale replay must not clobber a newer row, while inserts are not
    gated by the condition."""
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame(
        [(1, "A", 99, "d1"),   # newer: updates
         (3, "stale", 5, "d2"),  # older: target kept
         (9, "i", 1, "d2")],   # unmatched: inserted regardless of ts
        SCHEMA,
    )
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       when_matched_condition="s.ts > t.ts")
    assert stats == MergeStats(inserted=1, updated=1, deleted=0, partitions_rewritten=2)
    assert _rows(spark, path) == {
        (1, "A", 99, "d1"), (2, "b", 20, "d1"),
        (3, "c", 30, "d2"), (4, "d", 40, "d2"), (9, "i", 1, "d2"),
    }


def test_conditional_delete(spark, tmp_path):
    """WHEN MATCHED AND <cond> THEN DELETE: only matches passing the
    predicate are removed."""
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame(
        [(1, "x", 0, "d1"), (2, "x", 0, "d1"), (3, "x", 0, "d2")], SCHEMA
    )
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       when_matched="delete", when_not_matched=None,
                       when_matched_condition="t.ts >= 20")
    assert (stats.deleted, stats.inserted) == (2, 0)
    assert _rows(spark, path) == {(1, "a", 10, "d1"), (4, "d", 40, "d2")}


def test_conditional_matches_duckdb_oracle(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    src_rows = [(1, "A", 99, "d1"), (2, "B", 1, "d1"), (4, "D", 41, "d2"), (8, "h", 8, "d2")]
    src = spark.createDataFrame(src_rows, SCHEMA)
    merge_into(spark, path, src, keys=["k"], partition_col="day",
               when_matched_condition="s.ts > t.ts")

    con = duckdb.connect()
    t2 = str(tmp_path / "t2")
    _target(spark, t2)
    con.execute(
        f"CREATE TABLE tgt AS SELECT k, v, ts, day FROM "
        f"read_parquet('{t2}/*/*.parquet', hive_partitioning=1)"
    )
    con.execute("CREATE TABLE src(k int, v varchar, ts int, day varchar)")
    con.executemany("INSERT INTO src VALUES (?,?,?,?)", src_rows)
    expected = set(map(tuple, con.execute("""
        SELECT t.k, t.v, t.ts, t.day FROM tgt t
        WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.k = t.k AND s.ts > t.ts)
        UNION ALL
        SELECT s.k, s.v, s.ts, s.day FROM src s JOIN tgt t ON s.k = t.k AND s.ts > t.ts
        UNION ALL
        SELECT s.k, s.v, s.ts, s.day FROM src s WHERE s.k NOT IN (SELECT k FROM tgt)
    """).fetchall()))
    assert _rows(spark, path) == expected


def test_condition_without_matched_clause_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(1, "x", 0, "d1")], SCHEMA)
    with pytest.raises(ValueError, match="when_matched_condition"):
        merge_into(spark, path, src, keys=["k"], partition_col="day",
                   when_matched=None, when_not_matched="insert",
                   when_matched_condition="s.ts > t.ts")


def test_conditional_noop_when_nothing_passes(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(1, "stale", 0, "d1")], SCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       when_matched="update", when_not_matched=None,
                       when_matched_condition="s.ts > t.ts")
    assert stats.noop
    assert not os.path.exists(path + ".merge-journal")


# ---------------------------------------------------------------------------
# update_cols (partial-column SET)
# ---------------------------------------------------------------------------


def test_partial_update_narrow_changes_feed(spark, tmp_path):
    """SET v = s.v only: the source is a narrow (k, v, day) feed; ts
    is preserved from the target row."""
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(1, "NEW", "d1"), (3, "NEW3", "d2")],
                                "k int, v string, day string")
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       when_not_matched=None, update_cols=["v"])
    assert (stats.updated, stats.inserted) == (2, 0)
    assert _rows(spark, path) == {
        (1, "NEW", 10, "d1"), (2, "b", 20, "d1"),
        (3, "NEW3", 30, "d2"), (4, "d", 40, "d2"),
    }


def test_partial_update_with_insert_needs_full_source(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    narrow = spark.createDataFrame([(1, "x", "d1")], "k int, v string, day string")
    with pytest.raises(ValueError, match="insert clause"):
        merge_into(spark, path, narrow, keys=["k"], partition_col="day",
                   update_cols=["v"])
    # full-width source: matched rows get only v updated (ts kept),
    # unmatched rows insert whole
    full = spark.createDataFrame([(1, "X", 999, "d1"), (9, "i", 9, "d2")], SCHEMA)
    stats = merge_into(spark, path, full, keys=["k"], partition_col="day",
                       update_cols=["v"])
    assert (stats.updated, stats.inserted) == (1, 1)
    rows = _rows(spark, path)
    assert (1, "X", 10, "d1") in rows          # ts NOT updated
    assert (9, "i", 9, "d2") in rows           # insert takes whole source row


def test_partial_update_composes_with_condition(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame(
        [(1, "W", 99, "d1"), (2, "L", 0, "d1")],
        "k int, v string, ts int, day string",
    )
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       when_not_matched=None, update_cols=["v"],
                       when_matched_condition="s.ts > t.ts")
    assert stats.updated == 1
    rows = _rows(spark, path)
    assert (1, "W", 10, "d1") in rows and (2, "b", 20, "d1") in rows


def test_update_cols_refuses_keys_and_partition_cols(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(1, "x", 0, "d1")], SCHEMA)
    with pytest.raises(ValueError, match="may not include keys or partition"):
        merge_into(spark, path, src, keys=["k"], partition_col="day",
                   update_cols=["day"])
    with pytest.raises(ValueError, match="may not include keys or partition"):
        merge_into(spark, path, src, keys=["k"], partition_col="day",
                   update_cols=["k"])


def test_partial_update_idempotent_rerun(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(1, "NEW", "d1")], "k int, v string, day string")
    merge_into(spark, path, src, keys=["k"], partition_col="day",
               when_not_matched=None, update_cols=["v"])
    first = _rows(spark, path)
    merge_into(spark, path, src, keys=["k"], partition_col="day",
               when_not_matched=None, update_cols=["v"])
    assert _rows(spark, path) == first


# ---------------------------------------------------------------------------
# multi-column partitioning
# ---------------------------------------------------------------------------

MSCHEMA = "k int, v string, day string, src string"


def _mtarget(spark, path):
    rows = [
        (1, "a", "d1", "web"), (2, "b", "d1", "app"),
        (3, "c", "d2", "web"), (4, "d", "d2", "app"),
    ]
    spark.createDataFrame(rows, MSCHEMA).write.partitionBy("day", "src").parquet(path)


def _mrows(spark, path):
    return {(r.k, r.v, r.day, r.src) for r in spark.read.parquet(path).collect()}


def _mfiles(path):
    out = {}
    for root, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                s = os.stat(p)
                out[os.path.relpath(p, path)] = (s.st_mtime_ns, s.st_size)
    return out


def test_multi_col_upsert_touches_only_matching_leaves(spark, tmp_path):
    path = str(tmp_path / "t")
    _mtarget(spark, path)
    before = _mfiles(path)
    src = spark.createDataFrame([(3, "C2", "d2", "web"), (9, "i", "d3", "web")], MSCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_cols=["day", "src"])
    assert stats == MergeStats(inserted=1, updated=1, deleted=0, partitions_rewritten=2)
    assert _mrows(spark, path) == {
        (1, "a", "d1", "web"), (2, "b", "d1", "app"),
        (3, "C2", "d2", "web"), (4, "d", "d2", "app"),
        (9, "i", "d3", "web"),
    }
    after = _mfiles(path)
    untouched = {f: s for f, s in before.items()
                 if not f.startswith("day=d2/src=web")}
    assert untouched and all(after[f] == s for f, s in untouched.items())
    assert M.mismatches(path) == []
    assert set(M.load_manifest(path)["partitions"]) == {
        "day=d1/src=app", "day=d1/src=web", "day=d2/src=app",
        "day=d2/src=web", "day=d3/src=web",
    }


def test_multi_col_delete_prunes_empty_ancestors(spark, tmp_path):
    path = str(tmp_path / "t")
    _mtarget(spark, path)
    src = spark.createDataFrame([(3, "x", "d2", "web"), (4, "x", "d2", "app")], MSCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_cols=["day", "src"],
                       when_matched="delete", when_not_matched=None)
    assert stats.deleted == 2
    assert not os.path.isdir(os.path.join(path, "day=d2"))  # empty parent gone
    assert _mrows(spark, path) == {(1, "a", "d1", "web"), (2, "b", "d1", "app")}
    assert M.mismatches(path) == []


def test_multi_col_create_and_crash_recovery(spark, tmp_path):
    path = str(tmp_path / "t")
    src = spark.createDataFrame(
        [(1, "a", "d1", "web"), (2, "b", "d1", "app"), (3, "c", "d2", "web")], MSCHEMA
    )
    with pytest.raises(_InjectedCrash):
        merge_into(spark, path, src, keys=["k"], partition_cols=["day", "src"],
                   _crash_after_swaps=1)
    assert recover(path) is True
    assert _mrows(spark, path) == {
        (1, "a", "d1", "web"), (2, "b", "d1", "app"), (3, "c", "d2", "web")
    }
    assert M.mismatches(path) == []
    leftovers = [d for d in os.listdir(tmp_path) if ".merge-" in d]
    assert leftovers == []


def test_multi_col_moved_key_unpruned_mode(spark, tmp_path):
    path = str(tmp_path / "t")
    _mtarget(spark, path)
    # key 1 moves from (d1, web) to (d2, app)
    src = spark.createDataFrame([(1, "moved", "d2", "app")], MSCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_cols=["day", "src"],
                       prune_with_source_partitions=False)
    assert stats.updated == 1
    rows = _mrows(spark, path)
    assert (1, "moved", "d2", "app") in rows
    assert sum(1 for k, *_ in rows if k == 1) == 1


def test_multi_col_refuses_single_col_table(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a", "d1", "web")], MSCHEMA) \
        .write.partitionBy("day").parquet(path)
    src = spark.createDataFrame([(2, "b", "d2", "app")], MSCHEMA)
    with pytest.raises(ValueError, match="refuses to overwrite"):
        merge_into(spark, path, src, keys=["k"], partition_cols=["day", "src"])


def test_exactly_one_partition_arg_required(spark, tmp_path):
    src = spark.createDataFrame([(1, "a", "d1", "web")], MSCHEMA)
    with pytest.raises(ValueError, match="exactly one"):
        merge_into(spark, str(tmp_path / "t"), src, keys=["k"])
    with pytest.raises(ValueError, match="exactly one"):
        merge_into(spark, str(tmp_path / "t"), src, keys=["k"],
                   partition_col="day", partition_cols=["day", "src"])


def test_multi_col_null_partition_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    _mtarget(spark, path)
    src = spark.createDataFrame([(9, "x", "d1", None)], MSCHEMA)
    with pytest.raises(ValueError, match="NULL partition"):
        merge_into(spark, path, src, keys=["k"], partition_cols=["day", "src"])


# ---------------------------------------------------------------------------
# hypothesis model: sequences mixing conditional / partial / multi-col
# ---------------------------------------------------------------------------

mrow_st = st.tuples(
    st.integers(min_value=0, max_value=5),            # key
    st.text(alphabet="xy", min_size=1, max_size=2),   # value
    st.integers(min_value=0, max_value=9),            # ts (condition input)
    st.sampled_from(["d1", "d2"]),                    # day
    st.sampled_from(["web", "app"]),                  # src
)


def _dedupe(rows):
    seen, out = set(), []
    for r in rows:
        if r[0] not in seen:
            seen.add(r[0])
            out.append(r)
    return out


mstep_st = st.tuples(
    st.sampled_from(["upsert", "newer_wins", "partial_v", "delete_if_old"]),
    st.lists(mrow_st, min_size=0, max_size=5).map(_dedupe),
)
mscenario_st = st.lists(mstep_st, min_size=1, max_size=4)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(scenario=mscenario_st)
def test_clause_sequences_match_dict_model(spark, tmp_path_factory, scenario):
    """Model: {k: (v, ts, day, src)}. upsert = replace-or-add;
    newer_wins = conditional upsert (s.ts > t.ts gates the update,
    inserts ungated); partial_v = SET v only on match, no insert;
    delete_if_old = delete matches with t.ts < s.ts."""
    path = str(tmp_path_factory.mktemp("clause_model") / "t")
    SCH = "k int, v string, ts int, day string, src string"
    model: dict[int, tuple] = {}
    for op, rows in scenario:
        src_df = spark.createDataFrame(rows, SCH) if rows else spark.createDataFrame([], SCH)
        moved = any(
            k in model and (model[k][2], model[k][3]) != (day, s)
            for k, _, _, day, s in rows
        )
        kwargs = dict(keys=["k"], partition_cols=["day", "src"],
                      prune_with_source_partitions=not moved)
        if op == "upsert":
            merge_into(spark, path, src_df, **kwargs)
            for k, v, ts, day, s in rows:
                model[k] = (v, ts, day, s)
        elif op == "newer_wins":
            merge_into(spark, path, src_df, when_matched_condition="s.ts > t.ts", **kwargs)
            for k, v, ts, day, s in rows:
                if k not in model or ts > model[k][1]:
                    model[k] = (v, ts, day, s)
        elif op == "partial_v":
            merge_into(spark, path, src_df, when_not_matched=None,
                       update_cols=["v"], **kwargs)
            for k, v, ts, day, s in rows:
                if k in model:
                    old = model[k]
                    model[k] = (v, old[1], old[2], old[3])
        else:  # delete_if_old
            merge_into(spark, path, src_df, when_matched="delete",
                       when_not_matched=None,
                       when_matched_condition="t.ts < s.ts", **kwargs)
            for k, _, ts, _, _ in rows:
                if k in model and model[k][1] < ts:
                    del model[k]

        try:
            actual = {(r.k, r.v, r.ts, r.day, r.src)
                      for r in spark.read.parquet(path).collect()}
        except Exception:
            actual = set()
        expected = {(k, *t) for k, t in model.items()}
        assert actual == expected, f"after {op} {rows}"
    if os.path.isdir(path):
        assert M.mismatches(path) == []


def test_multi_col_update_only_into_absent_partitions_noops(spark, tmp_path):
    """Review regression pin: an update-only merge whose source
    partition tuples don't exist on disk must no-op (the empty touched
    set used to crash the multi-column partition filter)."""
    path = str(tmp_path / "t")
    _mtarget(spark, path)
    src = spark.createDataFrame([(9, "x", "d9", "tv")], MSCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_cols=["day", "src"],
                       when_matched="update", when_not_matched=None)
    assert stats.noop
    assert _mrows(spark, path) == {
        (1, "a", "d1", "web"), (2, "b", "d1", "app"),
        (3, "c", "d2", "web"), (4, "d", "d2", "app"),
    }

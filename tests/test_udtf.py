"""Python UDTF parity: the LATERAL passback_explode table function
must agree exactly with the production JVM route
(with_passback_parsed + explode) on every syntax class."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_passback_udtf_matches_split_union_route(spark):
    from grader_etl_spark.functions.passback import with_passback_parsed
    from grader_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    rows = [
        (1, '{"a": "1", "b": "2"}'),      # JSON
        (2, "{'a': 1, 'c': None}"),       # Python literal w/ None value
        (3, "not a dict at all"),         # garbage -> no rows
        (4, None),                        # null -> no rows
        (5, '{"x": 9,}'),                 # trailing comma: literal-only
    ]
    df = spark.createDataFrame(rows, "event_id long, props string")
    df.createOrReplaceTempView("udtf_events")

    got = {
        (r["event_id"], r["key"], r["value"])
        for r in spark.sql(
            "SELECT e.event_id, t.key, t.value "
            "FROM udtf_events e, LATERAL passback_explode(e.props) t"
        ).collect()
    }

    prod = with_passback_parsed(df, "props", "parsed").select(
        "event_id", F.explode("parsed").alias("key", "value")
    )
    want = {(r["event_id"], r["key"], r["value"]) for r in prod.collect()}
    assert got == want
    assert {e for e, *_ in got} == {1, 2, 5}  # 3 and 4 emit nothing

"""Pin the cross-engine text-normalization contract
(functions/textnorm.py): norm_lower must equal DuckDB's lower() on
the divergent-character classes, and the pinned whitespace/dotall
regex spellings must tokenize identically in Java regex and RE2."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from grader_etl_spark.functions.textnorm import WS_RE, norm_lower, norm_lower_py

CASES = [
    "ΒΟΛΟΣ ΤΈΛΟΣ μεΣΑίο Σ",  # final-sigma contexts (word-end, isolated)
    "İstanbul İİ keeps ascii i",  # dotted capital I
    "STRASSE straße ẞ",  # sharp s (must stay engine-identical)
    "MiXeD CaSe ASCII 123",
    "ς σ Σ",  # pre-existing final sigma passes through
]


def test_norm_lower_equals_duckdb_lower(spark):
    df = spark.createDataFrame([(t,) for t in CASES], "t string")
    got = [r["l"] for r in df.select(norm_lower("t").alias("l")).collect()]
    want = [duckdb.sql("select lower(?)", params=[t]).fetchone()[0] for t in CASES]
    assert got == want
    assert [norm_lower_py(t) for t in CASES] == want


def test_ws_class_tokenizes_identically(spark):
    # \x0B is the divergent char: Java's \s has it, RE2's does not.
    text = "a\tb\nc\r\nd \x0be  f"
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(F.split(F.trim("t"), WS_RE).alias("w")).collect()[0]["w"]
    want = duckdb.sql(
        "select string_split_regex(trim(?), '[ \\t\\n\\r\\f\\x0B]+')", params=[text]
    ).fetchone()[0]
    assert got == want == ["a", "b", "c", "d", "e", "f"]


def test_dotall_char_extract_identical(spark):
    # Java '.' excludes \n \r U+0085 U+2028 U+2029; RE2 only \n —
    # only the (?s) form counts every codepoint on both engines.
    text = "x\ny\rzw v u"
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(
        F.size(F.regexp_extract_all("t", F.lit("(?s)."), 0)).alias("n")
    ).collect()[0]["n"]
    want = duckdb.sql(
        "select len(regexp_extract_all(?, '(?s).'))", params=[text]
    ).fetchone()[0]
    assert got == want == len(text)

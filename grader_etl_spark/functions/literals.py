"""Fast constant-array literals.

Building an array literal element-by-element (``F.array(*[F.lit(x)
for x in xs])``) pays a py4j conversion per element — ~0.6 ms each, so
a 24×64 hyperplane matrix costs ~1 s of DRIVER time every time the
query function runs (bench bills that to the query). Shipping the
values as ONE JSON string and parsing with ``from_json`` moves the
whole transfer into a single literal; Catalyst's ConstantFolding then
evaluates the foldable JsonToStructs at plan time, so the optimized
plan contains the exact same array literal as the element-wise form —
same physical plan, same codegen, ~100× less construction time.

Exactness: ``json.dumps`` emits ``repr`` (shortest round-trip) for
floats and Spark's Jackson parser returns the nearest double — an
exact round-trip for every finite double, the same contract the DuckDB
oracles rely on when they embed ``{x!r}`` literals in SQL.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import Column


def lit_doubles(xs) -> Column:
    """array<double> literal from a Python float sequence."""
    return F.from_json(F.lit(json.dumps([float(x) for x in xs])), "array<double>")


def lit_strings(xs) -> Column:
    """array<string> literal from a Python string sequence."""
    return F.from_json(F.lit(json.dumps(list(xs))), "array<string>")


def lit_longs(xs) -> Column:
    """array<bigint> literal from a Python int sequence."""
    return F.from_json(F.lit(json.dumps([int(x) for x in xs])), "array<bigint>")

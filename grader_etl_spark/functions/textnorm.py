"""Cross-engine lowercase normalization for free-form document text.

``lower()`` is NOT engine-identical on unicode: a full codepoint scan
(Spark 4 UTF8String vs DuckDB utf8proc, all of U+0020..U+10FFFF)
found exactly two divergence classes that can occur in real corpora —

- U+0130 İ (LATIN CAPITAL LETTER I WITH DOT ABOVE): Java semantics
  lowercase it to ``i`` + U+0307 COMBINING DOT ABOVE (two codepoints,
  which then SPLITS an ``[a-z]+`` token in half), while utf8proc maps
  it to plain ``i``.
- U+03A3 Σ GREEK CAPITAL SIGMA: Java applies the contextual
  final-sigma rule (ς at word end, σ elsewhere), utf8proc maps it to
  σ unconditionally.

``norm_lower`` pins ONE deterministic contract — Σ → σ always, İ →
plain dotless ``i`` (the utf8proc behavior, which is also what every
tokenizer wants) — by pre-translating those two characters before
``lower()``. On DuckDB the pre-translate is a no-op composition with
``lower()``, so oracle SQL keeps its plain ``lower(text)`` spelling;
only the Spark side carries the translate. ``tests/test_fuzz_oracle``'s
``unicode`` corpus shape holds the contract (final sigma, İstanbul,
ZWJ emoji, NBSP, combining accents, CJK all cross-checked).

Known boundary, documented not handled: 70 further single-char diffs
exist ONLY because the container's DuckDB links a utf8proc older than
the codepoints (Vithkuqi U+10570.., Garay U+10D50.., late archaic
Latin/Glagolitic additions — Unicode 14+). No natural-language corpus
hits them; a DuckDB upgrade erases them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Σ → σ (kill the contextual final-sigma branch), İ → i (utf8proc's
# single-codepoint mapping; avoids the token-splitting U+0307).
_FROM = "Σİ"
_TO = "σi"

# Engine-pinned whitespace class for tokenization/normalization.
# Java's \s is [ \t\n\x0B\f\r] but RE2's (DuckDB) is [\t\n\f\r ] —
# they disagree on VERTICAL TAB, so `\s+` silently tokenizes
# differently across engines. The explicit class below spells Java's
# set in syntax both regex engines read identically; the oracle SQL
# twin is the same characters with doubled backslashes
# ('[ \\t\\n\\r\\f\\x0B]+' in python source). Swept over every
# split/replace that used \s+ — keep new sites on this constant.
WS_RE = "[ \\t\\n\\r\\f\\x0B]+"


def norm_lower(col: Column | str) -> Column:
    """Engine-stable lowercase of free-form text: identical output to
    DuckDB's ``lower()`` for every real-world codepoint (module doc).
    Use this — never bare ``F.lower`` — on document text that feeds a
    cross-engine comparison or a dedup/tokenize pipeline."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.translate(c, _FROM, _TO))


def norm_lower_py(s: str) -> str:
    """Pure-Python twin for tests."""
    return s.translate({0x03A3: "σ", 0x0130: "i"}).lower()

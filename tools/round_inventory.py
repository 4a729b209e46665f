"""Inventory of every ``F.round(`` site in the package, classified —
the enforcement tool behind the round-5 ROUND sweep.

Native ROUND(double, n>0) is not a cross-engine function (see
``functions/quantize.py`` for the 1.2M-sample measurement), so the
engine bans it for DISPLAY rounding: every user-visible quantized
float goes through ``floor_quantize`` + the matching oracle spelling.
The only F.round() left standing is INTEGER CONSTRUCTION — scale-0
rounds (no 10^n multiply on either engine, so BigDecimal-vs-std::round
agree bit-for-bit) immediately cast to an integer type or used as an
exact-cents/size extraction.

Run:  python tools/round_inventory.py        # table + counts
Exit 1 if any DISPLAY-class F.round survives (tests/test_plan_contract
runs the same scan as a pytest, so a regression fails the suite).
"""

from __future__ import annotations

import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = os.path.join(_REPO, "grader_etl_spark")

_INT_CASTS = re.compile(r'^\s*\.cast\(["\'](bigint|long|int|decimal[^"\']*)["\']\)')


def _call_end(text: str, start: int) -> int:
    """Index just past the matching ')' of the call opening at start."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(text)


def _scale_zero(call: str) -> bool:
    """True when the round call has no digits arg or digits == 0."""
    inner = call[len("F.round(") : -1]
    depth = 0
    last_comma = -1
    for i, ch in enumerate(inner):
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            last_comma = i
    if last_comma == -1:
        return True  # one-arg form: scale 0
    tail = inner[last_comma + 1 :].strip()
    return tail in ("0", "0)")


def sites() -> list[tuple[str, int, str, str]]:
    """(relpath, lineno, class, snippet) for every F.round call."""
    out = []
    for root, _dirs, files in os.walk(_PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            text = open(path).read()
            for m in re.finditer(r"F\.round\(", text):
                end = _call_end(text, m.end() - 1)
                call = text[m.start() : end]
                after = text[end : end + 40]
                lineno = text.count("\n", 0, m.start()) + 1
                if _scale_zero(call) or _INT_CASTS.match(after):
                    cls = "INT_CONSTRUCT"
                else:
                    cls = "DISPLAY"
                rel = os.path.relpath(path, _REPO)
                snippet = " ".join(call.split())[:90]
                out.append((rel, lineno, cls, snippet))
    return out


def main() -> int:
    rows = sites()
    display = [r for r in rows if r[2] == "DISPLAY"]
    for rel, ln, cls, snip in rows:
        print(f"{cls:13s} {rel}:{ln}  {snip}")
    print(
        f"\n{len(rows)} F.round sites: {len(rows) - len(display)} INT_CONSTRUCT "
        f"(scale-0 / integer-cast — cross-engine-safe), {len(display)} DISPLAY "
        f"(must be floor_quantize)"
    )
    return 1 if display else 0


if __name__ == "__main__":
    sys.exit(main())

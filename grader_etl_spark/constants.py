"""Deterministic parameters shared by queries and their oracles.

The reference keys its report on ``CURRENT_DATE``
(/root/reference/main.py:281,288); for oracle determinism we take the
report date as an explicit parameter pinned inside the fixture's
2024-01 event range (FIXTURES.md §2.1), exactly as SURVEY.md §7.4(3)
prescribes.
"""

# Pinned "today" for the daily-report family of queries.
REPORT_DATE = "2024-01-15"

# events.event_type stand-ins for the reference's domain values
# (FIXTURES.md §2.1): is_correct=TRUE → 'purchase'; 'run' → 'view';
# 'check' → 'click'.
SUCCESS_TYPE = "purchase"
RUN_TYPE = "view"
CHECK_TYPE = "click"

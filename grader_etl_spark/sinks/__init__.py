"""Driver-side mirror-sink adapters (the reference's Sheets + email
legs, main.py:230-268 and main.py:374-419).

The engine keeps sinks behind the tiny ``plans.pipeline.Sink``
protocol — these are the LIVE adapters that were previously absent:

* ``SheetsSink`` — Google Sheets v4 ``values.clear`` + ``values.update``
  over stdlib urllib (gspread is just a wrapper around this REST
  surface; no third-party package needed). Endpoint is injectable so
  tests run against a local ``http.server`` mock, exactly like the
  REST source's transport tests.
* ``SmtpNotifier`` — stdlib ``smtplib`` + ``EmailMessage``; tested
  against an in-process SMTP server.

Both follow the reference's degrade discipline: incomplete
configuration logs a warning and skips (main.py:379-382, 419) instead
of failing the pipeline — the report still computes, the mirror is
best-effort.
"""

from grader_etl_spark.sinks.sheets import SheetsSink
from grader_etl_spark.sinks.smtp import SmtpNotifier

__all__ = ["SheetsSink", "SmtpNotifier"]

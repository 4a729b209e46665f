"""REST JSON source (SURVEY.md §2.1 S1/S2) — the reference's
`fetch_data` (/root/reference/main.py:103-125): GET a JSON array with
client credentials and a UTC date-range predicate, 60 s timeout,
degrade to None on HTTP/JSON errors.

Spark-first split of responsibilities:

- the HTTP fetch is DRIVER-SIDE and tiny (the reference's payload is
  one day-window of attempt events) — `fetch_attempts` keeps its exact
  error contract but is transport-injected so tests (and air-gapped
  runs) never import requests;
- `attempts_to_df` pins the explicit source schema (no sampling
  inference — 100 TB discipline: schema drift must fail loudly, not
  silently re-infer);
- at scale the same payloads land as files and `landed_json_stream`
  (sources/files.py + streaming/jobs.py file_stream) replaces the
  driver fetch entirely — that is the production path; this module is
  the compatibility path.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

DAYS_BACK = 7  # main.py:25
TIMEOUT_S = 60  # main.py:114

# The REST payload schema (main.py:134-141's field reads). Everything
# arrives stringly except is_correct; passback_params stays a raw
# string for the dual-syntax parser (functions/passback.py).
ATTEMPT_SCHEMA = StructType(
    [
        StructField("lti_user_id", StringType()),
        StructField("passback_params", StringType()),
        StructField("is_correct", StringType()),  # "0"/"1"/null upstream
        StructField("attempt_type", StringType()),
        StructField("created_at", StringType()),
    ]
)

Fetcher = Callable[[str, dict], list[dict] | None]


def date_range_params(
    now: dt.datetime, client: str = "Skillfactory", client_key: str = ""
) -> dict:
    """The source-side predicate pushdown (main.py:104-111): the only
    filter the upstream API accepts — a [now-7d, now] window."""
    start = now - dt.timedelta(days=DAYS_BACK)
    return {
        "client": client,
        "client_key": client_key,
        "start": start.strftime("%Y-%m-%d %H:%M:%S.%f"),
        "end": now.strftime("%Y-%m-%d %H:%M:%S.%f"),
    }


def http_fetcher(url: str, params: dict) -> list[dict] | None:
    """Real transport (import-gated; requests may be absent). Error
    contract matches main.py:113-125: None on HTTP or JSON failure,
    never an exception."""
    try:
        import requests  # noqa: PLC0415
    except ImportError:
        return None
    try:
        resp = requests.get(url, params=params, timeout=TIMEOUT_S)
        resp.raise_for_status()
        data = resp.json()
        return data if isinstance(data, list) else None
    except Exception:
        return None


def fetch_attempts(
    url: str,
    now: dt.datetime,
    fetcher: Fetcher = http_fetcher,
    client: str = "Skillfactory",
    client_key: str = "",
) -> list[dict] | None:
    """fetch_data parity: windowed GET, list-of-dicts or None."""
    return fetcher(url, date_range_params(now, client, client_key))


def attempts_to_df(spark: SparkSession, records: list[dict] | None) -> DataFrame:
    """Driver-side records -> typed DataFrame (empty on None, matching
    the reference's degrade-and-continue behavior, main.py:428-431)."""
    rows = [
        tuple(str(r[f.name]) if r.get(f.name) is not None else None for f in ATTEMPT_SCHEMA)
        for r in (records or [])
    ]
    return spark.createDataFrame(rows, ATTEMPT_SCHEMA)

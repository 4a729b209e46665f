"""Google Sheets mirror adapter over the v4 REST surface.

The reference mirrors raw rows and the daily report into a spreadsheet
via gspread (main.py:230-268: open-or-create worksheet → ``clear()`` →
``update(values, "A1")``). gspread itself is a thin wrapper over the
Sheets v4 REST API, so the adapter speaks that API directly with
stdlib urllib — the same zero-dependency transport discipline as the
REST source (`sources/rest_datasource.py`).

Design notes:

* **Driver-side by contract.** A ``Sink`` receives already-collected,
  already-stringified rows (the engine caps what reaches a mirror);
  nothing here touches executors.
* **Full-overwrite semantics** like the reference: ``clear`` the
  worksheet range, then write header+rows from A1. Chunked ``update``
  calls keep each request under the API's payload limits at large row
  counts; chunk k starts at A{1 + k*chunk_rows} so the result is one
  contiguous table regardless of chunking.
* **Find-or-create worksheet** (main.py:246-253) via
  ``spreadsheets:batchUpdate addSheet``, treating "already exists" as
  success.
* **Retries**: 429/5xx → bounded exponential backoff (attempts
  clamped ≥1, the REST source's idiom); other HTTP errors raise
  immediately — a 401/404 won't improve.
* **Graceful skip**: no token → warn + no-op, the reference's
  missing-credentials degrade (main.py:419).
"""

from __future__ import annotations

import json
import logging
import os
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

log = logging.getLogger(__name__)

DEFAULT_ENDPOINT = "https://sheets.googleapis.com"
DRIVE_ENDPOINT = "https://www.googleapis.com"


def _quote_ws(title: str) -> str:
    """A1-notation worksheet quoting: wrap in single quotes, double
    embedded ones ('It''s')."""
    return "'" + title.replace("'", "''") + "'"


@dataclass
class SheetsSink:
    """``plans.pipeline.Sink`` adapter writing to one worksheet.

    ``token`` is an OAuth2 bearer token (service-account or user);
    acquiring one is deployment wiring, not engine logic — pass it in
    or set ``SPARK_GRAFT_SHEETS_TOKEN``. ``endpoint`` is injectable
    for tests / private proxies.
    """

    spreadsheet_id: str
    worksheet: str = "raw_data"
    token: str | None = None
    endpoint: str = DEFAULT_ENDPOINT
    timeout: float = 15.0
    retries: int = 4
    chunk_rows: int = 5000
    drive_endpoint: str | None = None  # share() base; default: the real Drive host
    # observability for callers/tests: HTTP calls actually made
    calls: list[str] = field(default_factory=list)

    @classmethod
    def from_env(cls) -> "SheetsSink | None":
        """Build from SPARK_GRAFT_SHEETS_{ID,WORKSHEET,TOKEN,ENDPOINT};
        returns None (caller skips the mirror) when id or token is
        absent — the reference's incomplete-.env degrade."""
        sid = os.environ.get("SPARK_GRAFT_SHEETS_ID", "")
        token = os.environ.get("SPARK_GRAFT_SHEETS_TOKEN", "")
        if not sid or not token:
            log.warning("Sheets mirror not configured (id/token missing); skipping")
            return None
        return cls(
            spreadsheet_id=sid,
            worksheet=os.environ.get("SPARK_GRAFT_SHEETS_WORKSHEET", "raw_data"),
            token=token,
            endpoint=os.environ.get("SPARK_GRAFT_SHEETS_ENDPOINT", DEFAULT_ENDPOINT),
        )

    # -- transport ---------------------------------------------------------

    def _request(self, method: str, path: str, body: dict | None,
                 params: dict | None = None, base_override: str | None = None) -> dict:
        qs = f"?{urllib.parse.urlencode(params)}" if params else ""
        url = f"{base_override or self.endpoint}{path}{qs}"
        data = json.dumps(body).encode("utf-8") if body is not None else None
        attempts = max(1, self.retries)
        for attempt in range(attempts):
            req = urllib.request.Request(
                url,
                data=data,
                method=method,
                headers={
                    "Authorization": f"Bearer {self.token}",
                    "Content-Type": "application/json",
                },
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    payload = resp.read().decode("utf-8")
                self.calls.append(f"{method} {path}")
                return json.loads(payload) if payload else {}
            except urllib.error.HTTPError as e:
                retryable = e.code == 429 or 500 <= e.code < 600
                if retryable and attempt < attempts - 1:
                    time.sleep(0.05 * (2**attempt))
                    continue
                raise
        raise RuntimeError(f"{method} {path} ended without a response or an error")

    # -- API legs ----------------------------------------------------------

    def _ensure_worksheet(self) -> None:
        """Find-or-create (main.py:246-253): addSheet, and treat the
        'already exists' 400 as found."""
        try:
            self._request(
                "POST",
                f"/v4/spreadsheets/{self.spreadsheet_id}:batchUpdate",
                {"requests": [{"addSheet": {"properties": {"title": self.worksheet}}}]},
            )
        except urllib.error.HTTPError as e:
            if e.code == 400 and b"already exists" in (e.read() or b""):
                return
            raise

    def _clear(self) -> None:
        rng = urllib.parse.quote(_quote_ws(self.worksheet), safe="")
        self._request(
            "POST",
            f"/v4/spreadsheets/{self.spreadsheet_id}/values/{rng}:clear",
            {},
        )

    def _update(self, start_row: int, values: list[list[str]]) -> None:
        a1 = f"{_quote_ws(self.worksheet)}!A{start_row}"
        rng = urllib.parse.quote(a1, safe="")
        self._request(
            "PUT",
            f"/v4/spreadsheets/{self.spreadsheet_id}/values/{rng}",
            {"range": a1, "majorDimension": "ROWS", "values": values},
            params={"valueInputOption": "RAW"},
        )

    def share(self, email: str, role: str = "writer") -> None:
        """Grant a user access (reference main.py:243 ``share(...,
        perm_type='user', role='writer')``). Permissions live on the
        DRIVE surface, not Sheets — same bearer token, the drive_
        endpoint defaults to the public Drive v3 API and is
        injectable for tests like ``endpoint``."""
        if not self.token:
            log.warning("SheetsSink has no token; skipping share")
            return
        # the permissions surface lives on www.googleapis.com, not the
        # Sheets host — always the real Drive base unless explicitly
        # overridden (a custom Sheets proxy says nothing about where
        # Drive is reachable, so no host guessing).
        base = self.drive_endpoint or DRIVE_ENDPOINT
        self._request(
            "POST",
            f"/drive/v3/files/{self.spreadsheet_id}/permissions",
            {"type": "user", "role": role, "emailAddress": email},
            base_override=base,
        )

    # -- Sink protocol -----------------------------------------------------

    def write_rows(self, header: list[str], rows: list[list[str]]) -> None:
        """Full-overwrite mirror: ensure worksheet, clear, write
        header+rows from A1 in contiguous chunks (main.py:262-266)."""
        if not self.token:
            log.warning("SheetsSink has no token; skipping mirror write")
            return
        self._ensure_worksheet()
        self._clear()
        values = [list(header)] + [list(r) for r in rows]
        step = max(1, self.chunk_rows)
        for off in range(0, len(values), step):
            self._update(1 + off, values[off : off + step])

"""Live-adapter tests for the Sheets + SMTP mirror sinks
(sinks/sheets.py, sinks/smtp.py) against LOCAL transports: a stdlib
``http.server`` speaking the Sheets v4 values surface (gspread's
wire protocol, reference main.py:230-268) and an in-process SMTP
server capturing the message (main.py:374-419). Same discipline as
the REST source's live-socket tests: the adapters exercise real
sockets, real retries, real wire shapes — only the remote endpoint is
swapped for a fixture.
"""

from __future__ import annotations

import json
import socketserver
import threading
import urllib.error
from email import policy
from email.parser import Parser
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import pytest

from grader_etl_spark.sinks import SheetsSink, SmtpNotifier

TOKEN = "test-token"


# ---------------------------------------------------------------------------
# Sheets v4 mock — an in-memory {worksheet: grid} store
# ---------------------------------------------------------------------------


class _SheetsHandler(BaseHTTPRequestHandler):
    grids: dict = {}
    worksheets: set = set()
    calls: list = []
    fail_puts = 0  # next N PUTs answer 429
    lock = threading.Lock()

    def log_message(self, *a):  # quiet
        pass

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n) or b"{}")

    def _reply(self, code: int, payload: dict | None = None):
        body = json.dumps(payload or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _authed(self) -> bool:
        return self.headers.get("Authorization") == f"Bearer {TOKEN}"

    @staticmethod
    def _ws_of(range_str: str) -> tuple[str, int]:
        """'raw_data'!A7 → (raw_data, 7); bare 'raw_data' → row 1."""
        ws, _, cell = range_str.partition("!")
        ws = ws.strip("'").replace("''", "'")
        row = int(cell[1:]) if cell.startswith("A") and cell[1:].isdigit() else 1
        return ws, row

    def do_POST(self):  # noqa: N802
        path = unquote(urlparse(self.path).path)
        with self.lock:
            self.calls.append(("POST", path))
        if not self._authed():
            return self._reply(401, {"error": "unauthenticated"})
        if path.endswith(":batchUpdate"):
            title = self._body()["requests"][0]["addSheet"]["properties"]["title"]
            with self.lock:
                if title in self.worksheets:
                    body = json.dumps({"error": f"A sheet with the name {title} already exists"}).encode()
                    self.send_response(400)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self.worksheets.add(title)
            return self._reply(200)
        if path.endswith(":clear"):
            rng = path.rsplit("/values/", 1)[1][: -len(":clear")]
            ws, _ = self._ws_of(rng)
            with self.lock:
                self.grids[ws] = []
            return self._reply(200)
        return self._reply(404)

    def do_PUT(self):  # noqa: N802
        parsed = urlparse(self.path)
        path = unquote(parsed.path)
        with self.lock:
            self.calls.append(("PUT", path))
            if _SheetsHandler.fail_puts > 0:
                _SheetsHandler.fail_puts -= 1
                return self._reply(429, {"error": "rate limit"})
        if not self._authed():
            return self._reply(401, {"error": "unauthenticated"})
        if parse_qs(parsed.query).get("valueInputOption") != ["RAW"]:
            return self._reply(400, {"error": "expected valueInputOption=RAW"})
        rng = path.rsplit("/values/", 1)[1]
        ws, start = self._ws_of(rng)
        values = self._body()["values"]
        with self.lock:
            grid = self.grids.setdefault(ws, [])
            while len(grid) < start - 1 + len(values):
                grid.append([])
            for i, row in enumerate(values):
                grid[start - 1 + i] = row
        return self._reply(200)


@pytest.fixture()
def sheets_server():
    _SheetsHandler.grids, _SheetsHandler.worksheets = {}, set()
    _SheetsHandler.calls, _SheetsHandler.fail_puts = [], 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SheetsHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def _sink(endpoint: str, **kw) -> SheetsSink:
    return SheetsSink(spreadsheet_id="sheet1", worksheet="raw_data",
                      token=TOKEN, endpoint=endpoint, **kw)


def test_sheets_full_overwrite(sheets_server):
    sink = _sink(sheets_server)
    sink.write_rows(["day", "user"], [["2024-01-01", "u1"], ["2024-01-02", "u2"]])
    assert _SheetsHandler.grids["raw_data"] == [
        ["day", "user"], ["2024-01-01", "u1"], ["2024-01-02", "u2"],
    ]
    # second write is a FULL overwrite — shorter data must not leave a tail
    sink.write_rows(["day"], [["2024-02-01"]])
    assert _SheetsHandler.grids["raw_data"] == [["day"], ["2024-02-01"]]
    # find-or-create: the second write hit the already-exists 400 and went on
    assert sum(1 for m, p in _SheetsHandler.calls if p.endswith(":batchUpdate")) == 2


def test_sheets_chunked_update_is_contiguous(sheets_server):
    sink = _sink(sheets_server, chunk_rows=2)
    rows = [[f"r{i}"] for i in range(5)]
    sink.write_rows(["h"], rows)
    assert _SheetsHandler.grids["raw_data"] == [["h"]] + rows
    puts = [p for m, p in _SheetsHandler.calls if m == "PUT"]
    assert len(puts) == 3  # ceil(6/2)
    assert [p.rsplit("!A", 1)[1] for p in puts] == ["1", "3", "5"]


def test_sheets_retries_429_then_succeeds(sheets_server):
    _SheetsHandler.fail_puts = 2
    sink = _sink(sheets_server)
    sink.write_rows(["h"], [["v"]])
    assert _SheetsHandler.grids["raw_data"] == [["h"], ["v"]]
    assert sum(1 for m, _ in _SheetsHandler.calls if m == "PUT") == 3


def test_sheets_bad_token_raises_immediately(sheets_server):
    sink = SheetsSink(spreadsheet_id="sheet1", worksheet="raw_data",
                      token="WRONG", endpoint=sheets_server)
    with pytest.raises(urllib.error.HTTPError) as ei:
        sink.write_rows(["h"], [["v"]])
    assert ei.value.code == 401
    # a 401 is not retryable: exactly one call reached the server
    assert len(_SheetsHandler.calls) == 1


def test_sheets_missing_config_skips(monkeypatch, caplog):
    monkeypatch.delenv("SPARK_GRAFT_SHEETS_ID", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_SHEETS_TOKEN", raising=False)
    assert SheetsSink.from_env() is None
    # tokenless sink degrades to a logged no-op (main.py:419 parity)
    s = SheetsSink(spreadsheet_id="x", token=None, endpoint="http://127.0.0.1:1")
    s.write_rows(["h"], [["v"]])  # must not raise / connect
    assert s.calls == []


# ---------------------------------------------------------------------------
# in-process SMTP server (what smtplib speaks, minus TLS)
# ---------------------------------------------------------------------------


class _SmtpHandler(socketserver.StreamRequestHandler):
    messages: list = []

    def _send(self, line: str):
        self.wfile.write((line + "\r\n").encode())

    def handle(self):
        self._send("220 localhost test SMTP")
        sender, rcpts, data = "", [], None
        while True:
            raw = self.rfile.readline()
            if not raw:
                return
            line = raw.decode().rstrip("\r\n")
            verb = line.split(" ", 1)[0].upper()
            if verb in ("EHLO", "HELO"):
                self._send("250 localhost")
            elif verb == "MAIL":
                sender = line.split(":", 1)[1].strip()
                self._send("250 OK")
            elif verb == "RCPT":
                rcpts.append(line.split(":", 1)[1].strip())
                self._send("250 OK")
            elif verb == "DATA":
                self._send("354 end with <CRLF>.<CRLF>")
                chunks = []
                while True:
                    dl = self.rfile.readline().decode()
                    if dl == ".\r\n":
                        break
                    chunks.append(dl[1:] if dl.startswith("..") else dl)
                data = "".join(chunks)
                type(self).messages.append((sender, list(rcpts), data))
                self._send("250 accepted")
            elif verb == "QUIT":
                self._send("221 bye")
                return
            else:
                self._send("250 OK")


@pytest.fixture()
def smtp_server():
    _SmtpHandler.messages = []
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _SmtpHandler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv.server_address[1]
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_smtp_send_and_parse(smtp_server):
    notify = SmtpNotifier(host="127.0.0.1", port=smtp_server,
                          sender="etl@example.com", receiver="ops@example.com")
    body = "Daily Report — 2024-01-15\nTotal Attempts: 3\n"
    notify(body)
    assert len(_SmtpHandler.messages) == 1
    sender, rcpts, raw = _SmtpHandler.messages[0]
    assert "etl@example.com" in sender and any("ops@example.com" in r for r in rcpts)
    msg = Parser(policy=policy.default).parsestr(raw)
    assert msg["Subject"] == "Daily Report — 2024-01-15"
    assert msg["From"] == "etl@example.com" and msg["To"] == "ops@example.com"
    assert "Total Attempts: 3" in msg.get_payload(decode=True).decode()


def test_smtp_missing_config_skips(monkeypatch):
    for k in ("SPARK_GRAFT_SMTP_HOST", "SPARK_GRAFT_SMTP_SENDER", "SPARK_GRAFT_SMTP_RECEIVER"):
        monkeypatch.delenv(k, raising=False)
    assert SmtpNotifier.from_env() is None


def test_smtp_from_env_roundtrip(monkeypatch, smtp_server):
    monkeypatch.setenv("SPARK_GRAFT_SMTP_HOST", "127.0.0.1")
    monkeypatch.setenv("SPARK_GRAFT_SMTP_PORT", str(smtp_server))
    monkeypatch.setenv("SPARK_GRAFT_SMTP_SENDER", "a@x")
    monkeypatch.setenv("SPARK_GRAFT_SMTP_RECEIVER", "b@x")
    monkeypatch.setenv("SPARK_GRAFT_SMTP_MODE", "plain")
    notify = SmtpNotifier.from_env()
    assert notify is not None and not notify.use_ssl and not notify.use_starttls
    notify("Subject line\nbody")
    assert len(_SmtpHandler.messages) == 1


# ---------------------------------------------------------------------------
# end-to-end: run_pipeline with BOTH live adapters on local transports
# ---------------------------------------------------------------------------


def test_pipeline_with_live_adapters(spark, tmp_path, sheets_server, smtp_server):
    from grader_etl_spark.plans.pipeline import ParquetStore, run_pipeline

    raw = spark.createDataFrame(
        [("u1", '{"oauth_consumer_key": "ok"}', True, "run", "2024-01-15T10:00:00"),
         ("u2", "{}", False, "check", "2024-01-15T11:00:00")],
        "lti_user_id string, passback_params string, is_correct boolean, "
        "attempt_type string, created_at string",
    )
    store = ParquetStore(spark, str(tmp_path / "stats"))
    report_sink = _sink(sheets_server)
    notify = SmtpNotifier(host="127.0.0.1", port=smtp_server,
                          sender="etl@example.com", receiver="ops@example.com")
    run_pipeline(raw, store, report_date="2024-01-15",
                 report_sink=report_sink, notify=notify)

    grid = _SheetsHandler.grids["raw_data"]
    assert grid[0] == ["report_date", "metric", "value"]
    metrics = {r[1]: r[2] for r in grid[1:]}
    assert metrics["Total Attempts"] == "2"
    assert metrics["Successful Attempts"] == "1"
    assert metrics["Unique Users"] == "2"

    _, _, raw_msg = _SmtpHandler.messages[0]
    msg = Parser(policy=policy.default).parsestr(raw_msg)
    assert msg["Subject"].startswith("Daily Report")
    body = msg.get_payload(decode=True).decode()
    assert "Total Attempts: 2" in body and "Success Percentage: 50.00%" in body


def test_sheets_worksheet_title_with_slash(sheets_server):
    """A '/' in the worksheet title must be percent-escaped in the URL
    path (safe='' quoting), not split the route."""
    sink = SheetsSink(spreadsheet_id="sheet1", worksheet="2024/Q1",
                      token=TOKEN, endpoint=sheets_server)
    sink.write_rows(["h"], [["v"]])
    assert _SheetsHandler.grids["2024/Q1"] == [["h"], ["v"]]


def test_sheets_share_posts_drive_permission(sheets_server):
    """share() mirrors the reference's every-run spreadsheet.share()
    (main.py:243) via the Drive permissions surface."""
    perms = []

    orig_post = _SheetsHandler.do_POST

    def do_POST(self):  # noqa: N802
        from urllib.parse import urlparse as _up
        path = unquote(_up(self.path).path)
        if "/drive/v3/files/" in path and path.endswith("/permissions"):
            perms.append((path, self._body()))
            return self._reply(200, {"id": "perm1"})
        return orig_post(self)

    _SheetsHandler.do_POST = do_POST
    try:
        # drive_endpoint is explicit config (no host guessing): the
        # test server stands in for the Drive host here
        sink = _sink(sheets_server, drive_endpoint=sheets_server)
        sink.share("ops@example.com")
        assert perms == [(
            "/drive/v3/files/sheet1/permissions",
            {"type": "user", "role": "writer", "emailAddress": "ops@example.com"},
        )]
    finally:
        _SheetsHandler.do_POST = orig_post


def test_smtp_dot_stuffing_roundtrip(smtp_server):
    """Body lines beginning with '.' must survive SMTP transparency
    (client stuffs, server unstuffs) byte-for-byte."""
    notify = SmtpNotifier(host="127.0.0.1", port=smtp_server,
                          sender="a@x.com", receiver="b@x.com")
    body = "Subject line\n.hidden dot line\n..double dot\n.\nplain\n"
    notify(body)
    _, _, raw = _SmtpHandler.messages[0]
    msg = Parser(policy=policy.default).parsestr(raw)
    # SMTP canonicalizes line endings to CRLF; the dot content is what
    # transparency must preserve
    got = msg.get_payload(decode=True).decode().replace("\r\n", "\n")
    assert got == body

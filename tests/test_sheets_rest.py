"""Live-sheet REST ingest (sources/sheets_rest.py) against a local
http.server speaking the public Sheets API v4 payload shape — URL
format, auth (API key param / Bearer header), retry-on-transient, and
ragged-row + drift normalization identical to the export reader."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from hi_csa_db_spark.sources.sheets_rest import (
    fetch_values,
    read_sheet_rest,
    values_to_dataframe,
)

PAYLOAD = {
    "range": "Sheet1!A1:D4",
    "majorDimension": "ROWS",
    "values": [
        ["Practice", "Mitigation", "Resources (Links)", "Score"],
        ["till", "cover crop", "https://x.org/1", "3"],
        ["drain", "buffer"],  # trailing cells omitted by the API
        ["", "bare", "", "7"],
    ],
}


class _Handler(BaseHTTPRequestHandler):
    calls: list[dict] = []
    fail_next: int = 0

    def do_GET(self):  # noqa: N802 (stdlib naming)
        type(self).calls.append(
            {"path": self.path, "auth": self.headers.get("Authorization")}
        )
        if type(self).fail_next > 0:
            type(self).fail_next -= 1
            self.send_response(503)
            self.end_headers()
            return
        body = json.dumps(PAYLOAD).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture()
def api_server():
    _Handler.calls = []
    _Handler.fail_next = 0
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _Handler
    srv.shutdown()


def test_url_shape_and_api_key(api_server):
    endpoint, handler = api_server
    payload = fetch_values("SHEET_ID", "Sheet1!A1:D4", api_key="k123", endpoint=endpoint)
    assert payload["values"][0][0] == "Practice"
    path = handler.calls[0]["path"]
    assert path.startswith("/v4/spreadsheets/SHEET_ID/values/Sheet1!A1:D4")
    assert "key=k123" in path


def test_bearer_token_header(api_server):
    endpoint, handler = api_server
    fetch_values("S", "A1:B2", token="tok", endpoint=endpoint)
    assert handler.calls[0]["auth"] == "Bearer tok"


def test_retry_on_transient_then_success(api_server):
    endpoint, handler = api_server
    handler.fail_next = 2
    payload = fetch_values("S", "A1:B2", endpoint=endpoint, backoff_s=0.01)
    assert payload["majorDimension"] == "ROWS"
    assert len(handler.calls) == 3


def test_retries_exhausted_raises(api_server):
    endpoint, handler = api_server
    handler.fail_next = 99
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        fetch_values("S", "A1:B2", endpoint=endpoint, max_retries=2, backoff_s=0.01)


def test_values_to_dataframe_ragged_and_nulls(spark):
    df = values_to_dataframe(spark, PAYLOAD)
    assert df.columns == ["practice", "mitigation", "resources_links", "score"]
    rows = {r.mitigation: r for r in df.collect()}
    # ragged row padded with NULLs
    assert rows["buffer"].resources_links is None
    assert rows["buffer"].score is None
    # empty strings -> NULL
    assert rows["bare"].practice is None


def test_end_to_end_with_drift_alignment(api_server, spark):
    endpoint, _ = api_server
    df = read_sheet_rest(
        spark,
        "SHEET_ID",
        "Sheet1!A1:D4",
        endpoint=endpoint,
        target_schema="practice string, score int, region string",
    )
    assert df.columns == ["practice", "score", "region"]
    got = sorted(
        [(r.practice, r.score, r.region) for r in df.collect()],
        key=lambda t: (t[0] or "",),
    )
    # extras dropped, score cast to int, missing region -> typed nulls
    assert got == [(None, 7, None), ("drain", None, None), ("till", 3, None)]


def test_empty_range_needs_schema(spark):
    with pytest.raises(ValueError, match="empty sheet range"):
        values_to_dataframe(spark, {"values": []})
    df = values_to_dataframe(spark, {"values": []}, target_schema="a string")
    assert df.count() == 0 and df.columns == ["a"]

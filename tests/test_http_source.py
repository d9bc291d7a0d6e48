"""S1 HTTP paged source, driven end-to-end against a local HTTP
server: success pages, retryable 500s (must succeed after backoff),
and permanent 404s (must land as failed rows, not abort the job).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F

from data_lake_demo_spark.model import RAW_RECORD
from data_lake_demo_spark.sources.http import http_fetch_stage, parse_fetched
from data_lake_demo_spark.sources.mock import plan_work


class _Handler(BaseHTTPRequestHandler):
    flaky_hits: dict[str, int] = {}

    def do_GET(self):  # noqa: N802
        u = urlparse(self.path)
        endpoint = u.path.strip("/")
        qs = parse_qs(u.query)
        date, page = qs["date"][0], int(qs["page"][0])
        if endpoint == "api-missing":
            self.send_error(404)
            return
        if endpoint == "api-flaky":
            # fail the first attempt per page with a retryable 500
            key = f"{date}-{page}"
            n = self.flaky_hits.get(key, 0)
            self.flaky_hits[key] = n + 1
            if n == 0:
                self.send_error(500)
                return
        body = json.dumps(
            {
                "endpoint": endpoint,
                "date": date,
                "page": page,
                "fetched_at": f"{date}T00:00:00Z",
                "items": [
                    {"id": f"{endpoint}-{date}-{page}-{i}", "value": i}
                    for i in range(5)
                ],
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_fetch_success_retry_and_quarantine(spark, server):
    work = plan_work(
        spark, "2024-08-01", ["api-ok", "api-flaky", "api-missing"], pages=3
    )
    fetched = http_fetch_stage(work, server, qps_sleep_ms=0).cache()

    ok = fetched.filter(F.col("status") == "ok")
    failed = fetched.filter(F.col("status") != "ok")
    assert ok.count() == 6          # api-ok ×3 + api-flaky ×3 (after retry)
    assert failed.count() == 3      # api-missing ×3, job did NOT abort
    assert failed.filter(~F.col("status").startswith("failed_http_404")).count() == 0

    parsed = parse_fetched(fetched, RAW_RECORD)
    rows = parsed.select("endpoint", "page", F.size("payload.items").alias("n")).collect()
    assert len(rows) == 6 and all(r.n == 5 for r in rows)
    # flaky endpoint really was retried (first attempt 500, second OK)
    assert parsed.filter(F.col("endpoint") == "api-flaky").count() == 3
    fetched.unpersist()

"""GCS input walking against a local mock of the GCS JSON API."""
import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest


class _MockGCS(BaseHTTPRequestHandler):
    objects = {}  # name -> bytes

    def log_message(self, *a):
        pass

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        parts = parsed.path.split("/")
        # /storage/v1/b/<bucket>/o  or  /storage/v1/b/<bucket>/o/<object>
        if len(parts) >= 6 and parts[5] == "o" and len(parts) == 6:
            prefix = urllib.parse.parse_qs(parsed.query).get("prefix", [""])[0]
            items = [{"name": n} for n in sorted(self.objects)
                     if n.startswith(prefix)]
            body = json.dumps({"items": items}).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)
        elif len(parts) >= 7 and parts[5] == "o":
            name = urllib.parse.unquote(parts[6])
            data = self.objects.get(name)
            if data is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.end_headers()
            self.wfile.write(data)
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture()
def mock_gcs(example_dir, monkeypatch, tmp_path):
    _MockGCS.objects = {
        f"afdb/{n}": open(example_dir / n, "rb").read()
        for n in ("d1asha_", "d1mbaa_")}
    srv = HTTPServer(("localhost", 0), _MockGCS)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    monkeypatch.setenv("FOLDSEEK_TPU_GCS_ENDPOINT",
                       f"http://localhost:{srv.server_port}")
    monkeypatch.setenv("FOLDSEEK_TPU_GCS_CACHE", str(tmp_path / "cache"))
    yield srv
    srv.shutdown()


def test_createdb_from_gcs(mock_gcs, tmp_path):
    from foldseek_tpu.ingest.createdb import create_db
    db = create_db(["gs://testbucket/afdb/"], str(tmp_path / "db"))
    assert db.size == 2
    assert sorted(db.names) == ["d1asha_", "d1mbaa_"]
    assert db.entry_len(0) > 100


def test_gcs_listing_prefix(mock_gcs):
    from foldseek_tpu.ingest.gcs import list_objects
    names = list_objects("b", "afdb/d1a")
    assert names == ["afdb/d1asha_"]

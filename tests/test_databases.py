"""`databases` download pipeline against a local mock server
(reference: data/structdatabases.sh — download, md5 check, unpack,
post-process; the 13-entry catalog itself lives in cli.DATABASES)."""
import hashlib
import http.server
import io
import os
import tarfile
import threading

import pytest

from foldseek_tpu.cli import main


class _Server:
    def __init__(self, files):
        handler_files = files

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                body = handler_files.get(self.path)
                if body is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass
        self.httpd = http.server.HTTPServer(("localhost", 0), H)
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()

    @property
    def url(self):
        return f"http://localhost:{self.httpd.server_port}"

    def stop(self):
        self.httpd.shutdown()


@pytest.fixture()
def structure_archive(example_dir):
    """tar.gz of two SCOP domains + its md5, as the server payloads."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        for name in ("d1asha_", "d1b0ba_"):
            tar.add(str(example_dir / name), arcname=name)
    blob = buf.getvalue()
    return blob, hashlib.md5(blob).hexdigest().encode()


def test_databases_full_pipeline(structure_archive, tmp_path, monkeypatch):
    blob, md5 = structure_archive
    srv = _Server({"/cath50": blob, "/cath50.md5": md5})
    try:
        monkeypatch.setenv("FOLDSEEK_TPU_DB_MIRROR", srv.url)
        out = str(tmp_path / "cathdb")
        rc = main(["databases", "CATH50", out, str(tmp_path / "tmp")])
        assert rc == 0
        from foldseek_tpu.db.storage import load_db
        db = load_db(out)
        assert db.size == 2
        assert sorted(db.names) == ["d1asha_", "d1b0ba_"]
    finally:
        srv.stop()


def test_databases_md5_mismatch_rejected(structure_archive, tmp_path,
                                         monkeypatch):
    blob, _ = structure_archive
    srv = _Server({"/cath50": blob, "/cath50.md5": b"deadbeef bad"})
    try:
        monkeypatch.setenv("FOLDSEEK_TPU_DB_MIRROR", srv.url)
        from foldseek_tpu.db.databases import download_database
        with pytest.raises(ValueError, match="md5 mismatch"):
            download_database("CATH50", "https://x.invalid/cath50",
                              str(tmp_path / "out"), str(tmp_path / "tmp"))
    finally:
        srv.stop()


def test_databases_gguf_payload(tmp_path, monkeypatch):
    """The ProstT5 entry delivers model weights, not a structure DB."""
    gguf = b"GGUF" + b"\x00" * 64
    srv = _Server({"/prostt5/model.gguf": gguf})
    try:
        monkeypatch.setenv("FOLDSEEK_TPU_DB_MIRROR", srv.url)
        from foldseek_tpu.db.databases import download_database
        out = str(tmp_path / "weights.gguf")
        download_database("ProstT5", "https://x.invalid/prostt5/model.gguf",
                          out, str(tmp_path / "tmp"))
        assert open(out, "rb").read(4) == b"GGUF"
    finally:
        srv.stop()

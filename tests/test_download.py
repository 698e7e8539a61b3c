"""auto_create / resumable download (sat/resources/download.py parity)
driven against a localhost Range-capable HTTP server — no egress."""

import io
import os
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from scail_tpu.utils.download import (MODEL_URLS, auto_create,
                                      download_with_progress_bar)


def _zip_bytes(name: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(f"{name}/weights.bin", os.urandom(50000))
        z.writestr(f"{name}/config.json", "{}")
    return buf.getvalue()


class _RangeHandler(BaseHTTPRequestHandler):
    """Serves self.server.payload with HTTP Range support (the behaviour
    download_with_progress_bar's resume path needs)."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        data = self.server.payload
        rng = self.headers.get("Range")
        self.server.saw_range = self.server.saw_range or bool(rng)
        if rng:
            start = int(rng.split("=")[1].rstrip("-"))
            if start >= len(data):
                self.send_response(416)
                self.end_headers()
                return
            body = data[start:]
            self.send_response(206)
            self.send_header(
                "Content-Range", f"bytes {start}-{len(data)-1}/{len(data)}")
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def http_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    srv.payload = b""
    srv.saw_range = False
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_auto_create_download_unzip_and_cache(tmp_path, http_server):
    payload = _zip_bytes("tiny-model")
    http_server.payload = payload
    url = f"http://127.0.0.1:{http_server.server_address[1]}/tiny-model.zip"

    p = auto_create("tiny-model", path=str(tmp_path), url=url,
                    show_progress=False)
    assert p == str(tmp_path / "tiny-model")
    assert (tmp_path / "tiny-model" / "weights.bin").stat().st_size == 50000
    assert (tmp_path / "tiny-model" / "config.json").read_text() == "{}"

    # second call: directory exists -> no re-download
    http_server.payload = b"garbage that would corrupt a refetch"
    assert auto_create("tiny-model", path=str(tmp_path), url=url,
                       show_progress=False) == p


def test_download_resumes_from_partial_file(tmp_path, http_server):
    data = os.urandom(70000)
    http_server.payload = data
    url = f"http://127.0.0.1:{http_server.server_address[1]}/blob.bin"
    dst = tmp_path / "blob.bin"
    dst.write_bytes(data[:30000])  # torn download

    download_with_progress_bar(str(dst), url, show_progress=False)
    assert http_server.saw_range, "resume must go through a Range request"
    assert dst.read_bytes() == data

    # complete file: 416 from the server -> no-op, content intact
    download_with_progress_bar(str(dst), url, show_progress=False)
    assert dst.read_bytes() == data


def test_download_restarts_when_server_ignores_range(tmp_path):
    """A 200-without-Range server restarts the file from zero instead of
    appending a duplicated tail."""

    class _NoRange(_RangeHandler):
        def do_GET(self):
            data = self.server.payload
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _NoRange)
    srv.payload = os.urandom(40000)
    srv.saw_range = False
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        dst = tmp_path / "x.bin"
        dst.write_bytes(srv.payload[:999])
        download_with_progress_bar(
            str(dst), f"http://127.0.0.1:{srv.server_address[1]}/x.bin",
            show_progress=False)
        assert dst.read_bytes() == srv.payload
    finally:
        srv.shutdown()


def test_auto_create_local_and_errors(tmp_path):
    assert auto_create("anything", path=str(tmp_path), url="local") == str(
        tmp_path / "anything")
    with pytest.raises(KeyError):
        auto_create("not-a-known-model", path=str(tmp_path))
    with pytest.raises(RuntimeError):
        auto_create("chatglm-6b", path=str(tmp_path), url="r2://chatglm-6b.zip")
    # url table sanity: entries the zoo implements resolve to http mirrors
    assert MODEL_URLS["roberta-base"].startswith("https://")

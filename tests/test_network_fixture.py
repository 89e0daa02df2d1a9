"""The fetch halves of the download (S6) and SPARQL (S9) sources,
exercised against a LOCALHOST fixture server — real executed code
paths with zero external network (driver rule: no external data)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs

import pytest

from kgray.sources.download import SNIPPET_BYTES, download, fetch
from kgray.sources.sparql import result_dict_to_tsv, run_query

_BODY_A = b"id\tname\nX:1\talpha\n"
_BODY_BIG = b"Z" * (SNIPPET_BYTES * 3)
_SPARQL_RESULT = {
    "head": {"vars": ["s", "o"]},
    "results": {"bindings": [
        {"s": {"value": "CHEBI:1"}, "o": {"value": "water"}},
        {"s": {"value": "CHEBI:2"}},
    ]},
}


class _Handler(BaseHTTPRequestHandler):
    seen = {}

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        body = {"/a.tsv": _BODY_A, "/big.bin": _BODY_BIG}.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if self.path != "/sparql":
            self.send_response(404)
            self.end_headers()
            return
        n = int(self.headers.get("Content-Length", "0"))
        form = parse_qs(self.rfile.read(n).decode("utf-8"))
        _Handler.seen["accept"] = self.headers.get("Accept")
        _Handler.seen["query"] = form.get("query", [""])[0]
        body = json.dumps(_SPARQL_RESULT).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "application/sparql-results+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def http_base():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_fetch_and_download_manifest(http_base, tmp_path):
    y = tmp_path / "download.yaml"
    y.write_text(
        f"- url: {http_base}/a.tsv\n  local_name: renamed.tsv\n"
        f"- url: {http_base}/big.bin\n"
    )
    paths = download(str(y), str(tmp_path / "raw"))
    assert [p.split("/")[-1] for p in paths] == ["renamed.tsv", "big.bin"]
    assert open(paths[0], "rb").read() == _BODY_A
    assert open(paths[1], "rb").read() == _BODY_BIG


def test_download_snippet_only_truncates_at_5kb(http_base, tmp_path):
    out = fetch(f"{http_base}/big.bin", str(tmp_path / "snip.bin"),
                snippet_only=True)
    got = open(out, "rb").read()
    assert got == _BODY_BIG[:SNIPPET_BYTES]


def test_fetch_rejects_non_http_schemes(tmp_path):
    with pytest.raises(ValueError):
        fetch("file:///etc/hostname", str(tmp_path / "x"))


def test_run_query_protocol_roundtrip(http_base, tmp_path):
    res = run_query("SELECT ?s ?o WHERE { ?s ?p ?o }", f"{http_base}/sparql")
    assert res == _SPARQL_RESULT
    assert _Handler.seen["accept"] == "application/sparql-results+json"
    assert _Handler.seen["query"].startswith("SELECT ?s ?o")
    out = result_dict_to_tsv(res, str(tmp_path / "q.tsv"))
    assert open(out).read() == "s\to\nCHEBI:1\twater\nCHEBI:2\t\n"

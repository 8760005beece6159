"""HTTP API — the reference's FastAPI surface
(/root/reference/codesearch/api/server.py:58-358) on the stdlib server
(FastAPI isn't in this environment; the route contract is what matters):

    GET  /health                -> {"status": "ok"}
    GET  /stats                 -> index stats (A4)
    GET  /search?q=...&limit=&language=&entity_type=&repo=&hybrid=&method=
    POST /search                -> same, JSON body {"query": ..., "limit": ...}

Responses are JSON.  One engine instance serves all requests (the
reference's lazy process-global engine, ST5); the underlying shard actors
are the scalable part — the HTTP layer is a thin driver.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

from .engine import CodeSearchEngine


def make_handler(engine: CodeSearchEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _search(self, params: dict) -> None:
            query = params.get("q") or params.get("query")
            if not query:
                self._send(400, {"error": "missing query (q)"})
                return
            try:
                hits = engine.search(
                    query,
                    limit=int(params.get("limit", 20)),
                    language=params.get("language"),
                    entity_type=params.get("entity_type"),
                    repo_filter=params.get("repo"),
                    use_hybrid=str(params.get("hybrid", "")).lower() in ("1", "true"),
                    method=params.get("method", "dense"),
                )
            except Exception as e:  # surface engine errors as 500 JSON
                self._send(500, {"error": str(e)})
                return
            self._send(
                200,
                {
                    "query": query,
                    "total": len(hits),
                    "results": [
                        {
                            k: h.get(k)
                            for k in (
                                "doc_id", "score", "semantic_score", "bm25_score",
                                "name", "path", "file_path", "signature",
                                "highlights", "lang", "entity_type",
                            )
                            if k in h
                        }
                        for h in hits
                    ],
                },
            )

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/health":
                self._send(200, {"status": "ok"})
            elif url.path == "/stats":
                self._send(200, engine.stats())
            elif url.path == "/search":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                self._search(q)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/search":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._send(400, {"error": "invalid JSON body"})
                return
            self._search(body)

    return Handler


class SearchServer:
    """Embeddable server: ``SearchServer(index_dir).start()`` -> port."""

    def __init__(self, index_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.engine = CodeSearchEngine(index_dir)
        self.httpd = ThreadingHTTPServer((host, port), make_handler(self.engine))
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> int:
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.engine.close()


def main() -> int:  # pragma: no cover - thin CLI wrapper
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args()
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    srv = SearchServer(args.index_dir, args.host, args.port)
    print(f"serving on {args.host}:{srv.start()}")
    try:
        srv._thread.join()
    except KeyboardInterrupt:
        srv.stop()
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main())

"""HTTP API — the reference's FastAPI surface
(/root/reference/codesearch/api/server.py:58-358) on the stdlib server
(FastAPI isn't in this environment; the route contract is what matters):

    GET  /health                -> {"status": "ok"}
    GET  /api                   -> API info (server.py:101-108)
    GET  /stats                 -> index stats (A4)
    GET  /search?q=...&limit=&language=&entity_type=&repo=&hybrid=&method=
    POST /search                -> same, JSON body {"query": ..., "limit": ...}
    POST /index/sync            -> blocking build, JSON body {"corpus": path,
                                   "mode"?, "embeddings"?, "docs_per_partition"?}
                                   (server.py:228-248 minus git clone: the
                                   corpus is a parquet path, not a repo URL)
    POST /index                 -> queue the same build -> {"job_id": ...}
                                   (the reference's RabbitMQ queue route,
                                   server.py:196-226, with Ray as the
                                   execution backend).  Body may carry
                                   "priority" 0-10 (clamped like
                                   queue/publisher.py:178); a single worker
                                   thread consumes jobs highest-priority
                                   first, FIFO within a priority level
                                   (the x-max-priority declaration at
                                   publisher.py:67-74)
    GET  /index/status[?job_id=]-> one job record / all job records
    GET  /index/failed          -> failed-job records (the DLQ analogue of
                                   the reference's <queue>_failed queue,
                                   publisher.py:77-91)
    POST /index/retry           -> {"job_id": ...}: requeue a FAILED job at
                                   its original priority (worker.py:155-158
                                   requeue-on-error, made explicit)
    POST /index/purge           -> drop QUEUED jobs (D4 queue-purge
                                   semantics; running/finished jobs stay)

Responses are JSON.  One engine instance serves all requests (the
reference's lazy process-global engine, ST5); the underlying shard actors
are the scalable part — the HTTP layer is a thin driver.  Builds are
serialized by a lock (concurrent builds into one index dir would race the
staging layout); searches stay concurrent.
"""

from __future__ import annotations

import heapq
import itertools
import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

from . import __version__
from .engine import CodeSearchEngine

API_INFO = {
    "name": "DistributedCodeSearchEngine Ray API",
    "version": __version__,
    "endpoints": [
        "/health", "/api", "/stats", "/search", "/search/batch", "/facets", "/similar",
        "/suggest", "/explain", "/analyze", "/index", "/index/sync", "/index/status",
        "/index/failed", "/index/retry", "/index/purge",
    ],
}

MAX_PRIORITY = 10  # reference x-max-priority (queue/publisher.py:72)

# the reference serves a static GUI from api/static (server.py:87-100,
# 354-356); same layout here, own implementation
STATIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")
_MEDIA_TYPES = {".html": "text/html", ".css": "text/css",
                ".js": "application/javascript", ".json": "application/json",
                ".svg": "image/svg+xml", ".png": "image/png"}


class JobQueue:
    """In-process priority job queue — the reference RabbitMQ queue's
    ordering contract (publisher.py:67-74) on a heap: jobs pop
    highest-priority first, FIFO within a priority level (monotonic
    sequence number as the tie-break).  One daemon worker consumes;
    failed jobs stay in ``jobs`` as the DLQ analogue until retried."""

    def __init__(self):
        self._heap: list = []
        self._cv = threading.Condition()
        self._seq = itertools.count()
        self._closed = False

    def push(self, priority: int, job_id: str) -> None:
        with self._cv:
            heapq.heappush(self._heap, (-priority, next(self._seq), job_id))
            self._cv.notify()

    def pop(self, timeout: Optional[float] = None) -> Optional[str]:
        with self._cv:
            while not self._heap and not self._closed:
                if not self._cv.wait(timeout=timeout):
                    return None
            if self._closed and not self._heap:
                return None
            return heapq.heappop(self._heap)[2]

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()


def _run_build_locked(engine: CodeSearchEngine, params: dict) -> dict:
    """Build body (caller holds the build lock) — returns the reference's
    IndexResult shape (repo_indexer.py result fields, minus git specifics)."""
    t0 = time.time()
    manifest = engine.index_corpus(
        params["corpus"],
        resume=bool(params.get("resume", True)),
        with_embeddings=bool(params.get("embeddings", False)),
        **(
            {"docs_per_partition": int(params["docs_per_partition"])}
            if "docs_per_partition" in params
            else {}
        ),
    )
    langs = engine.stats()["languages"]
    return {
        "success": True,
        "corpus": params["corpus"],
        "entities_indexed": manifest.n_docs,
        "num_partitions": manifest.num_partitions,
        "build_id": manifest.build_id,
        "duration_seconds": round(time.time() - t0, 3),
        "languages": langs,
        "error": None,
    }


def make_handler(
    engine: CodeSearchEngine,
    jobs: Dict[str, dict],
    build_lock: threading.Lock,
    jobq: Optional[JobQueue] = None,
):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _cors(self) -> None:
            # the reference's allow-all CORSMiddleware (api/server.py:69-76)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Methods", "*")
            self.send_header("Access-Control-Allow-Headers", "*")
            self.send_header("Access-Control-Allow-Credentials", "true")

        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self._cors()
            self.end_headers()
            self.wfile.write(body)

        def _send_file(self, path: str, media_type: str) -> None:
            try:
                with open(path, "rb") as f:
                    body = f.read()
            except OSError:
                self._send(404, {"error": "not found"})
                return
            self.send_response(200)
            self.send_header("Content-Type", media_type)
            self.send_header("Content-Length", str(len(body)))
            self._cors()
            self.end_headers()
            self.wfile.write(body)

        def do_OPTIONS(self):  # CORS preflight
            self.send_response(204)
            self._cors()
            self.end_headers()

        def _search(self, params: dict) -> None:
            query = params.get("q") or params.get("query")
            if not query:
                self._send(400, {"error": "missing query (q)"})
                return
            try:  # malformed client input is a 400, not a 500
                limit = int(params.get("limit", 20))
            except (TypeError, ValueError):
                self._send(400, {"error": f"invalid limit: {params.get('limit')!r}"})
                return
            try:
                if str(params.get("expand", "")).lower() in ("1", "true"):
                    # pseudo-relevance-feedback expansion (RM3)
                    hits = engine.search_expanded(
                        query,
                        limit=limit,
                        fb_k=int(params.get("fb_k", 10)),
                        n_exp=int(params.get("n_exp", 10)),
                        language=params.get("language"),
                        entity_type=params.get("entity_type"),
                        repo_filter=params.get("repo"),
                    )
                else:
                    hits = engine.search(
                        query,
                        limit=limit,
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

        def _explain(self, params: dict) -> None:
            q = params.get("q")
            if not q:
                self._send(400, {"error": "missing q"})
                return
            try:  # malformed client input is a 400, not a 500
                limit = int(params.get("limit", 3))
            except (TypeError, ValueError):
                self._send(400, {"error": f"invalid limit: {params!r}"})
                return
            try:
                rows = engine.explain(q, limit=limit)
            except Exception as e:
                self._send(500, {"error": str(e)})
                return
            self._send(200, {"query": q, "explanations": rows})

        def _suggest(self, params: dict) -> None:
            term = params.get("term")
            if not term:
                self._send(400, {"error": "missing term"})
                return
            try:  # malformed client input is a 400, not a 500
                max_dist = int(params.get("max_dist", 1))
                limit = int(params.get("limit", 10))
            except (TypeError, ValueError):
                self._send(400, {"error": f"invalid max_dist/limit: {params!r}"})
                return
            try:
                rows = engine.suggest(term, max_dist=max_dist, limit=limit)
            except Exception as e:
                self._send(500, {"error": str(e)})
                return
            self._send(200, {"term": term, "suggestions": rows})

        def _similar(self, params: dict) -> None:
            try:  # malformed client input is a 400, not a 500
                doc_id = int(params["doc_id"])
                limit = int(params.get("limit", 20))
            except KeyError:
                self._send(400, {"error": "missing doc_id"})
                return
            except (TypeError, ValueError):
                self._send(400, {"error": f"invalid doc_id/limit: {params!r}"})
                return
            try:
                hits = engine.find_similar(
                    doc_id,
                    limit=limit,
                    language=params.get("language"),
                    entity_type=params.get("entity_type"),
                    repo_filter=params.get("repo"),
                )
            except Exception as e:
                self._send(500, {"error": str(e)})
                return
            self._send(
                200,
                {
                    "doc_id": doc_id,
                    "total": len(hits),
                    "results": [
                        {
                            k: h.get(k)
                            for k in (
                                "doc_id", "score", "bm25_score",
                                "name", "path", "file_path", "signature",
                                "highlights", "lang", "entity_type",
                            )
                            if k in h
                        }
                        for h in hits
                    ],
                },
            )

        def _facets(self, params: dict) -> None:
            query = params.get("q") or params.get("query")
            if not query:
                self._send(400, {"error": "missing query (q)"})
                return
            try:
                counts = engine.facets(
                    query,
                    facet_col=params.get("by", "language"),
                    language=params.get("language"),
                    entity_type=params.get("entity_type"),
                    repo_filter=params.get("repo"),
                )
            except KeyError as e:  # unknown facet column is client error
                self._send(400, {"error": str(e)})
                return
            except Exception as e:
                self._send(500, {"error": str(e)})
                return
            self._send(
                200,
                {
                    "query": query,
                    "facet": params.get("by", "language"),
                    "total": sum(counts.values()),
                    "counts": counts,
                },
            )

        def _index_params(self, body: dict) -> Optional[dict]:
            if not body.get("corpus"):
                self._send(400, {"error": "missing corpus (parquet path)"})
                return None
            return body

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                # serve the GUI; JSON API info when the GUI is absent
                # (reference server.py:87-100)
                index = os.path.join(STATIC_DIR, "index.html")
                if os.path.isfile(index):
                    self._send_file(index, "text/html")
                else:
                    self._send(200, API_INFO)
            elif url.path.startswith("/static/"):
                rel = os.path.normpath(url.path[len("/static/"):])
                if rel.startswith(("..", "/")):  # traversal guard
                    self._send(404, {"error": "not found"})
                    return
                full = os.path.join(STATIC_DIR, rel)
                ext = os.path.splitext(full)[1].lower()
                self._send_file(full, _MEDIA_TYPES.get(ext, "application/octet-stream"))
            elif url.path == "/health":
                self._send(200, {"status": "ok"})
            elif url.path == "/api":
                self._send(200, API_INFO)
            elif url.path == "/stats":
                try:
                    stats = engine.stats()
                    # A5 queue-length parity: per-state counts of the job queue
                    counts: Dict[str, int] = {}
                    for rec in jobs.values():
                        counts[rec["status"]] = counts.get(rec["status"], 0) + 1
                    stats["jobs"] = counts
                    self._send(200, stats)
                except Exception as e:
                    self._send(500, {"error": str(e)})
            elif url.path == "/search":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                self._search(q)
            elif url.path == "/facets":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                self._facets(q)
            elif url.path == "/similar":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                self._similar(q)
            elif url.path == "/suggest":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                self._suggest(q)
            elif url.path == "/explain":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                self._explain(q)
            elif url.path == "/analyze":
                # ES _analyze parity: run the code-aware tokenizer on the
                # given text and return the token list
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                text = q.get("text")
                if text is None:
                    self._send(400, {"error": "missing text"})
                else:
                    from .functions.tokenizer import tokenize

                    self._send(200, {"tokens": tokenize(text)})
            elif url.path == "/index/status":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                jid = q.get("job_id")
                if jid is None:
                    self._send(200, {"jobs": list(jobs.values())})
                elif jid in jobs:
                    self._send(200, jobs[jid])
                else:
                    self._send(404, {"error": f"unknown job_id {jid}"})
            elif url.path == "/index/failed":
                # the DLQ view: every job that errored and was not retried
                self._send(
                    200,
                    {"jobs": [r for r in jobs.values() if r["status"] == "failed"]},
                )
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path == "/index/purge":
                queued = [j for j, rec in jobs.items() if rec["status"] == "queued"]
                for j in queued:
                    jobs[j]["status"] = "purged"
                self._send(200, {"success": True, "purged": len(queued)})
                return
            if url.path not in (
                "/search", "/search/batch", "/index", "/index/sync", "/index/retry"
            ):
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._send(400, {"error": "invalid JSON body"})
                return
            if url.path == "/index/retry":
                jid = body.get("job_id")
                rec = jobs.get(jid)
                if rec is None:
                    self._send(404, {"error": f"unknown job_id {jid}"})
                    return
                if rec["status"] != "failed":
                    self._send(
                        400,
                        {"error": f"job {jid} is {rec['status']!r}, not 'failed'"},
                    )
                    return
                rec["status"] = "queued"
                rec["error"] = None
                rec["finished_at"] = None
                rec["retries"] = rec.get("retries", 0) + 1
                if jobq is not None:
                    jobq.push(rec.get("priority", 0), jid)
                self._send(200, {"success": True, "job_id": jid,
                                 "retries": rec["retries"]})
                return
            if url.path == "/search":
                self._search(body)
                return
            if url.path == "/search/batch":
                qs = body.get("queries")
                if not isinstance(qs, list) or not qs or len(qs) > 256:
                    self._send(400, {"error": "queries must be a list of 1..256 strings"})
                    return
                try:
                    limit = int(body.get("limit", 20))
                except (TypeError, ValueError):
                    self._send(400, {"error": f"invalid limit: {body.get('limit')!r}"})
                    return
                try:
                    batches = engine.search_many(
                        [str(q) for q in qs],
                        limit=limit,
                        language=body.get("language"),
                        entity_type=body.get("entity_type"),
                        repo_filter=body.get("repo"),
                        method=body.get("method", "dense"),
                    )
                except Exception as e:
                    self._send(500, {"error": str(e)})
                    return
                self._send(
                    200,
                    {
                        "total": len(batches),
                        "results": [
                            {"query": q, "hits": hits} for q, hits in zip(qs, batches)
                        ],
                    },
                )
                return
            params = self._index_params(body)
            if params is None:
                return
            if url.path == "/index/sync":
                try:
                    with build_lock:
                        self._send(200, _run_build_locked(engine, params))
                except Exception as e:
                    self._send(500, {"success": False, "error": str(e)})
                return
            # POST /index: publish to the priority queue (the reference's
            # RabbitMQ publish, publisher.py:124-178, with Ray as the
            # worker); priority is clamped 0..10 like publisher.py:178
            try:
                priority = int(params.get("priority", 0))
            except (TypeError, ValueError):
                self._send(400, {"error": f"invalid priority: {params.get('priority')!r}"})
                return
            priority = min(max(priority, 0), MAX_PRIORITY)
            job_id = uuid.uuid4().hex[:12]
            jobs[job_id] = {
                "job_id": job_id, "status": "queued", "corpus": params["corpus"],
                "priority": priority, "retries": 0, "queued_at": time.time(),
                "finished_at": None, "params": params, "result": None,
                "error": None,
            }
            if jobq is not None:
                jobq.push(priority, job_id)
            self._send(
                200,
                {
                    "success": True,
                    "job_id": job_id,
                    "priority": priority,
                    "message": f"corpus queued for indexing: {params['corpus']}",
                },
            )

    return Handler


class SearchServer:
    """Embeddable server: ``SearchServer(index_dir).start()`` -> port."""

    def __init__(self, index_dir: str, host: str = "127.0.0.1", port: int = 0, mode: str = "entity"):
        self.engine = CodeSearchEngine(index_dir, mode=mode)
        self.jobs: Dict[str, dict] = {}
        self._build_lock = threading.Lock()
        self.jobq = JobQueue()
        self.httpd = ThreadingHTTPServer(
            (host, port),
            make_handler(self.engine, self.jobs, self._build_lock, self.jobq),
        )
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None
        self._worker_thread: Optional[threading.Thread] = None

    def _worker(self) -> None:
        """The queue consumer (reference worker.py consume loop): one job
        at a time, highest priority first; errors park the job in the
        failed/DLQ state until /index/retry republishes it."""
        while True:
            jid = self.jobq.pop()
            if jid is None:  # queue closed
                return
            rec = self.jobs.get(jid)
            # skip purged jobs and stale heap entries (D4: purge wins)
            if rec is None or rec["status"] != "queued":
                continue
            with self._build_lock:
                if rec["status"] != "queued":  # purge landed while waiting
                    continue
                rec["status"] = "running"
                try:
                    rec["result"] = _run_build_locked(self.engine, rec["params"])
                    rec["status"] = "done"
                except Exception as e:
                    rec["error"] = str(e)
                    rec["status"] = "failed"
                rec["finished_at"] = time.time()

    def start(self) -> int:
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        self._worker_thread = threading.Thread(target=self._worker, daemon=True)
        self._worker_thread.start()
        return self.port

    def stop(self) -> None:
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.jobq.close()
        if self._worker_thread:
            self._worker_thread.join(timeout=5)
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

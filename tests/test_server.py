"""HTTP API surface tests (reference api/server.py route contract)."""

import json
import urllib.error
import urllib.request

import pytest

from distributedcodesearchengine_ray.sources.corpus import write_corpus


@pytest.fixture(scope="module")
def server(ray_session, tmp_path_factory):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.server import SearchServer

    corpus = write_corpus(str(tmp_path_factory.mktemp("c")), n_files=120, seed=42, num_shards=2)
    idx = str(tmp_path_factory.mktemp("idx"))
    build_index(corpus, idx, mode="entity", docs_per_partition=100)
    srv = SearchServer(idx)
    port = srv.start()
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(url, payload, timeout=300):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_health(server):
    status, body = _get(f"{server}/health")
    assert status == 200 and body == {"status": "ok"}


def test_stats(server):
    status, body = _get(f"{server}/stats")
    assert status == 200 and body["n_docs"] > 0
    assert isinstance(body["jobs"], dict)  # A5 queue-length parity


def test_search_get(server):
    status, body = _get(f"{server}/search?q=parse+json&limit=5")
    assert status == 200
    assert 0 < body["total"] <= 5
    assert {"doc_id", "score", "name", "highlights"} <= set(body["results"][0])


def test_search_expand_rm3(server):
    """expand=1 runs the RM3 pseudo-relevance-feedback path."""
    status, body = _get(f"{server}/search?q=parse+json&limit=5&expand=1&fb_k=3&n_exp=4")
    assert status == 200
    assert 0 < body["total"] <= 5
    assert {"doc_id", "score", "highlights"} <= set(body["results"][0])


def test_suggest_route(server):
    status, body = _get(f"{server}/suggest?term=parse_jsonn&max_dist=2&limit=5")
    assert status == 200
    assert body["term"] == "parse_jsonn"
    assert len(body["suggestions"]) >= 1
    top = body["suggestions"][0]
    assert {"term", "df", "dist"} <= set(top)
    assert top["dist"] <= 2
    # ranked: distance ascending
    dists = [s["dist"] for s in body["suggestions"]]
    assert dists == sorted(dists)


def test_suggest_missing_term_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/suggest")
    assert e.value.code == 400


def test_explain_route(server):
    status, body = _get(f"{server}/explain?q=parse%20json%20data&limit=2")
    assert status == 200 and body["query"] == "parse json data"
    rows = body["explanations"]
    assert rows, "top hits should match at least one query term"
    by_doc = {}
    for r in rows:
        assert {"rank", "doc_id", "term", "tf", "df", "idf",
                "contribution", "score"} <= set(r)
        assert r["tf"] >= 1 and r["df"] >= 1
        by_doc.setdefault(r["doc_id"], []).append(r)
    # the per-term contributions decompose the doc's BM25 score exactly
    for rs in by_doc.values():
        total = sum(x["contribution"] for x in rs)
        assert abs(total - rs[0]["score"]) <= 1e-6 * max(1.0, abs(rs[0]["score"]))


def test_explain_missing_q_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/explain")
    assert e.value.code == 400


def test_search_post(server):
    req = urllib.request.Request(
        f"{server}/search",
        data=json.dumps({"query": "send http request", "limit": 3, "language": "go"}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        body = json.loads(r.read())
    assert all(h["lang"] == "go" for h in body["results"])


def test_search_missing_query_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/search")
    assert e.value.code == 400


def test_unknown_route_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/nope")
    assert e.value.code == 404


def test_bad_json_post_400(server):
    req = urllib.request.Request(
        f"{server}/search", data=b"{not json", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_bad_limit_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/search?q=parse+json&limit=banana")
    assert e.value.code == 400


def test_api_info(server):
    status, body = _get(f"{server}/api")
    assert status == 200
    assert body["name"] and body["version"]
    assert "/index/sync" in body["endpoints"]


def test_index_sync_and_queued(server, tmp_path_factory):
    """POST /index/sync builds a fresh corpus into the served index and the
    queued POST /index route reaches done via /index/status."""
    corpus = write_corpus(
        str(tmp_path_factory.mktemp("c2")), n_files=80, seed=3, num_shards=2
    )
    status, body = _post(f"{server}/index/sync", {"corpus": corpus, "docs_per_partition": 60})
    assert status == 200 and body["success"]
    assert body["entities_indexed"] > 0 and body["languages"]
    # the served engine now answers over the new index
    status, s = _get(f"{server}/stats")
    assert s["n_docs"] == body["entities_indexed"]
    status, res = _get(f"{server}/search?q=parse+json&limit=3")
    assert res["total"] > 0

    # queued variant
    status, q = _post(f"{server}/index", {"corpus": corpus})
    assert status == 200 and q["success"] and q["job_id"]
    import time

    deadline = time.time() + 300
    while time.time() < deadline:
        status, rec = _get(f"{server}/index/status?job_id={q['job_id']}")
        if rec["status"] in ("done", "failed"):
            break
        time.sleep(0.5)
    assert rec["status"] == "done", rec
    assert rec["result"]["entities_indexed"] == body["entities_indexed"]
    # status listing includes the job
    status, all_jobs = _get(f"{server}/index/status")
    assert any(j["job_id"] == q["job_id"] for j in all_jobs["jobs"])


def test_index_purge(server, tmp_path_factory):
    """D4: purge drops QUEUED jobs; a purged job never runs."""
    corpus = write_corpus(
        str(tmp_path_factory.mktemp("c3")), n_files=40, seed=4, num_shards=1
    )
    # queue two jobs back-to-back; the second waits on the build lock
    _, q1 = _post(f"{server}/index", {"corpus": corpus})
    _, q2 = _post(f"{server}/index", {"corpus": corpus})
    _, purged = _post(f"{server}/index/purge", {})
    assert purged["success"]
    import time

    deadline = time.time() + 300
    while time.time() < deadline:
        _, recs = _get(f"{server}/index/status")
        states = {j["job_id"]: j["status"] for j in recs["jobs"]}
        if all(states[j] in ("done", "failed", "purged") for j in (q1["job_id"], q2["job_id"])):
            break
        time.sleep(0.5)
    # at least one of the two was still queued at purge time -> purged and
    # never transitioned to running/done
    assert "purged" in (states[q1["job_id"]], states[q2["job_id"]]) or purged["purged"] == 0
    assert all(s != "queued" for s in states.values())


def test_index_sync_missing_corpus_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/index/sync", {})
    assert e.value.code == 400


def test_facets_get(server):
    status, body = _get(f"{server}/facets?q=parse+json&by=language")
    assert status == 200
    assert body["facet"] == "language"
    assert body["total"] == sum(body["counts"].values()) > 0
    # facet counts must agree with a filtered facet query summed back up
    lang = max(body["counts"], key=body["counts"].get)
    status2, narrowed = _get(f"{server}/facets?q=parse+json&by=language&language={lang}")
    assert status2 == 200
    assert narrowed["counts"] == {lang: body["counts"][lang]}


def test_facets_missing_query_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/facets?by=language")
    assert e.value.code == 400


def test_facets_unknown_column_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/facets?q=parse+json&by=nosuchcol")
    assert e.value.code == 400


def test_similar_route(server):
    status, body = _get(f"{server}/similar?doc_id=0&limit=5")
    assert status == 200
    assert 0 < body["total"] <= 5
    assert all(r["doc_id"] != 0 for r in body["results"])  # source excluded
    assert {"doc_id", "score", "highlights"} <= set(body["results"][0])


def test_similar_missing_doc_id_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/similar")
    assert e.value.code == 400


def test_similar_bad_doc_id_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/similar?doc_id=abc")
    assert e.value.code == 400


def test_search_batch(server):
    status, body = _post(
        f"{server}/search/batch",
        {"queries": ["parse json data", "send http request"], "limit": 5},
    )
    assert status == 200 and body["total"] == 2
    assert [r["query"] for r in body["results"]] == ["parse json data", "send http request"]
    for r in body["results"]:
        assert r["hits"] and all(
            set(h) == {"doc_id", "score"} for h in r["hits"]
        ) and len(r["hits"]) <= 5
    # single-query batch agrees with /search on ids
    s2, single = _get(f"{server}/search?q=parse+json+data&limit=5")
    assert s2 == 200
    assert [h["doc_id"] for h in body["results"][0]["hits"]] == [
        h["doc_id"] for h in single["results"]
    ]


def test_search_batch_validation(server):
    import urllib.error

    try:
        _post(f"{server}/search/batch", {"queries": []})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    try:
        _post(f"{server}/search/batch", {"queries": ["x"], "limit": "nope"})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_analyze_route(server):
    """ES _analyze parity: the code-aware tokenizer over HTTP."""
    from urllib.parse import quote

    status, body = _get(f"{server}/analyze?text={quote('parseJSONData(req, res)')}")
    assert status == 200
    from distributedcodesearchengine_ray.functions.tokenizer import tokenize

    assert body["tokens"] == tokenize("parseJSONData(req, res)")


def test_analyze_missing_text_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/analyze")
    assert e.value.code == 400


def test_search_method_regexp(server):
    """method=regexp treats q as a Lucene regexp over the vocabulary."""
    status, body = _get(f"{server}/search?q=pars.*&limit=5&method=regexp")
    assert status == 200 and body["total"] > 0


def test_search_method_common_terms(server):
    status, body = _get(f"{server}/search?q=parse+json+data&limit=5&method=common_terms")
    assert status == 200 and body["total"] > 0

def test_jobqueue_priority_order():
    """JobQueue pops highest priority first, FIFO within a level
    (reference publisher.py x-max-priority ordering)."""
    from distributedcodesearchengine_ray.server import JobQueue

    q = JobQueue()
    q.push(0, "a")
    q.push(5, "b")
    q.push(5, "c")
    q.push(9, "d")
    assert [q.pop(timeout=1) for _ in range(4)] == ["d", "b", "c", "a"]
    q.close()
    assert q.pop(timeout=1) is None


def test_index_priority_and_retry(server, tmp_path_factory):
    """Priority: while the worker is busy, a later high-priority job runs
    before an earlier low-priority one.  Failure: a bad corpus parks the
    job in the failed/DLQ state (visible via /index/failed), and
    /index/retry republishes it."""
    import time

    corpus = write_corpus(
        str(tmp_path_factory.mktemp("c4")), n_files=60, seed=5, num_shards=1
    )
    # occupy the worker with a real build, then enqueue low before high
    _, busy = _post(f"{server}/index", {"corpus": corpus})
    _, low = _post(f"{server}/index", {"corpus": "/nonexistent/low", "priority": 1})
    _, high = _post(f"{server}/index", {"corpus": "/nonexistent/high", "priority": 9})
    assert low["priority"] == 1 and high["priority"] == 9
    deadline = time.time() + 300
    while time.time() < deadline:
        _, recs = _get(f"{server}/index/status")
        states = {j["job_id"]: j for j in recs["jobs"]}
        if all(
            states[j["job_id"]]["status"] in ("done", "failed")
            for j in (busy, low, high)
        ):
            break
        time.sleep(0.2)
    lo, hi = states[low["job_id"]], states[high["job_id"]]
    assert lo["status"] == "failed" and hi["status"] == "failed"
    # the high-priority job (queued later) finished first — PROVIDED the
    # worker was still busy with the real build when both were enqueued
    # (on a fast box the 60-file build can finish between the POSTs; the
    # ordering property itself is covered deterministically by
    # test_jobqueue_priority_order)
    busy_rec = states[busy["job_id"]]
    if busy_rec.get("finished_at") and hi.get("queued_at") and \
            busy_rec["finished_at"] > hi["queued_at"]:
        assert hi["finished_at"] <= lo["finished_at"]

    # DLQ view lists both failures
    _, failed = _get(f"{server}/index/failed")
    failed_ids = {j["job_id"] for j in failed["jobs"]}
    assert {low["job_id"], high["job_id"]} <= failed_ids

    # retry republishes; the job fails again (corpus still bad) with
    # retries incremented
    _, r = _post(f"{server}/index/retry", {"job_id": low["job_id"]})
    assert r["success"] and r["retries"] == 1
    deadline = time.time() + 120
    while time.time() < deadline:
        _, rec = _get(f"{server}/index/status?job_id={low['job_id']}")
        if rec["status"] == "failed":
            break
        time.sleep(0.2)
    assert rec["status"] == "failed" and rec["retries"] == 1

    # retry of a non-failed job is a 400; unknown job is a 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/index/retry", {"job_id": busy["job_id"]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/index/retry", {"job_id": "nope"})
    assert e.value.code == 404


def test_gui_and_static_mount(server):
    """GET / serves the GUI; /static/<file> serves static assets; CORS
    headers ride every response (reference server.py:69-76,87-100)."""
    req = urllib.request.Request(f"{server}/")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "text/html"
        assert r.headers["Access-Control-Allow-Origin"] == "*"
        body = r.read().decode()
    assert "DistributedCodeSearchEngine" in body and "/search" in body

    with urllib.request.urlopen(f"{server}/static/index.html", timeout=30) as r:
        assert r.status == 200 and r.headers["Content-Type"] == "text/html"

    # traversal guarded
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{server}/static/../server.py", timeout=30)
    assert e.value.code == 404

    # JSON responses carry CORS too; OPTIONS preflight answers 204
    status, _ = _get(f"{server}/health")
    with urllib.request.urlopen(f"{server}/health", timeout=30) as r:
        assert r.headers["Access-Control-Allow-Origin"] == "*"
    req = urllib.request.Request(f"{server}/search", method="OPTIONS")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 204
        assert r.headers["Access-Control-Allow-Methods"] == "*"

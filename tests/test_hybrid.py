"""Mock embedder / vector top-k / RRF fusion / hybrid engine tests."""

import hashlib

import numpy as np
import pytest

from distributedcodesearchengine_ray.functions.embed import mock_embed_text, searchable_text
from distributedcodesearchengine_ray.pipelines.hybrid import enhance_query, http_boost, rrf_fuse


def test_mock_embedding_matches_reference_algorithm():
    # independent recomputation of the reference MockEmbedder recipe
    # (generator.py:216-239): sha256 -> BE 4-byte chunks -> [-1,1] -> pad -> L2
    text = "parse_json function def parse_json(data)"
    h = hashlib.sha256(text.encode()).digest()
    vals = [int.from_bytes(h[i : i + 4], "big") / 2**32 * 2 - 1 for i in range(0, 32, 4)]
    exp = np.zeros(768)
    exp[: len(vals)] = vals
    exp = exp / np.linalg.norm(exp)
    got = mock_embed_text(text)
    np.testing.assert_allclose(got, exp.astype(np.float32), rtol=1e-6)
    assert np.isclose(np.linalg.norm(got), 1.0, atol=1e-5)
    # deterministic
    np.testing.assert_array_equal(got, mock_embed_text(text))


def test_searchable_text_projection():
    # M9 (models.py:66-103)
    s = searchable_text(
        "add", "method", "def add(self, x, y)", ["self", "x", "y"],
        '"""Add two numbers."""', "int", "Calculator",
    )
    assert s == (
        "add function def add(self, x, y) parameters: self x y "
        "Add two numbers. returns int method of Calculator"
    )


def test_enhance_query_cases():
    assert enhance_query("handle http requests") == (
        "function that sends makes HTTP requests GET POST PUT DELETE PATCH"
    )
    assert enhance_query("send http request") == (
        "function that sends or makes HTTP requests: send http request"
    )
    assert enhance_query("parse json data") == "JSON parsing function: parse json data"
    assert enhance_query("user login token") == "authentication function: user login token"
    assert enhance_query("save file to disk") == "file handling function: save file to disk"
    assert enhance_query("sort a list") == "function or method that sort a list"


def test_http_boost_table():
    q = "make http request"
    assert http_boost(q, "request", "requests/api.py") == 1.5
    assert http_boost(q, "helper", "requests/api.py") == 1.0
    assert http_boost(q, "send", "requests/sessions.py") == 1.5
    assert http_boost(q, "send", "requests/adapters.py") == 1.3
    assert http_boost(q, "handle_request", "x.py") == 0.7
    assert http_boost("sort a list", "handle_request", "x.py") == 1.0


def test_rrf_fusion_math():
    sem = [(1, 0.95), (2, 0.80)]
    bm = [(2, 7.0), (3, 5.0)]
    out = rrf_fuse(sem, bm, semantic_weight=0.7)
    scores = {d: s for d, s, _, _ in out}
    # raw fused: d1 = 0.7/61; d2 = 0.7/62 + 0.3/61; d3 = 0.3/62
    raw = {1: 0.7 / 61, 2: 0.7 / 62 + 0.3 / 61, 3: 0.3 / 62}
    mx = max(raw.values())
    for d in (1, 2, 3):
        assert scores[d] == pytest.approx(raw[d] / mx, rel=1e-12)
    assert out[0][0] == 2  # highest fused first, normalized to 1.0
    assert out[0][1] == pytest.approx(1.0)


def test_rrf_low_diversity_fallback():
    # semantic range < 0.05 => weight drops to 0.3
    sem = [(1, 0.91), (2, 0.90)]
    bm = [(3, 9.0)]
    out = rrf_fuse(sem, bm, semantic_weight=0.7)
    raw = {1: 0.3 / 61, 2: 0.3 / 62, 3: 0.7 / 61}
    mx = max(raw.values())
    scores = {d: s for d, s, _, _ in out}
    for d in raw:
        assert scores[d] == pytest.approx(raw[d] / mx, rel=1e-12)


def test_vector_topk_exact(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.annsearch import vector_topk

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = ds.to_pandas()
    mat = np.stack(df["embedding"].to_numpy())
    qs = mat[:3]
    got = vector_topk(ds, qs, k=5, id_column="vec_id").to_pandas()
    # numpy oracle
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    sims = matn @ qn.T
    for qi in range(3):
        order = np.lexsort((df["vec_id"].to_numpy(), -sims[:, qi]))[:5]
        exp_ids = df["vec_id"].to_numpy()[order].tolist()
        sub = got[got.query_idx == qi].sort_values("rank")
        assert sub["vec_id"].tolist() == exp_ids
        np.testing.assert_allclose(sub["score"].to_numpy(), sims[:, qi][order], rtol=1e-5)


def test_vector_topk_lsh_recall(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.annsearch import vector_topk, vector_topk_lsh

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = ds.to_pandas()
    mat = np.stack(df["embedding"].to_numpy())
    qs = mat[:2]
    exact = vector_topk(ds, qs, k=10, id_column="vec_id").to_pandas()
    approx = vector_topk_lsh(ds, qs, k=10, id_column="vec_id", n_bits=4).to_pandas()
    # the query vector itself must be found (same bucket by construction)
    for qi in range(2):
        ids = approx[approx.query_idx == qi]["vec_id"].tolist()
        assert df["vec_id"][qi] in ids
        inter = len(set(ids) & set(exact[exact.query_idx == qi]["vec_id"].tolist()))
        assert inter >= 3  # decent recall on clustered synthetic data


def test_vector_topk_int8_equals_exact(ray_session):
    """int8 scalar quantization + exact rescore must reproduce the exact
    brute-force top-k — ids, ranks AND float64 scores — on this data
    (the equality precondition the knn_int8 driver oracle relies on).
    Also checks the quantizer's approximation is tight enough that the
    true top-10 sits comfortably inside the approx top-64 margin."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.annsearch import (
        vector_topk,
        vector_topk_int8,
    )

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = ds.to_pandas()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    qs = mat[:3]
    exact = vector_topk(ds, qs, k=10, id_column="vec_id", dtype=np.float64).to_pandas()
    sq = vector_topk_int8(ds, qs, k=10, candidates=64, id_column="vec_id").to_pandas()
    for qi in range(3):
        e = exact[exact.query_idx == qi].sort_values("rank")
        a = sq[sq.query_idx == qi].sort_values("rank")
        assert a["vec_id"].tolist() == e["vec_id"].tolist()
        np.testing.assert_allclose(
            a["score"].to_numpy(), e["score"].to_numpy(), rtol=1e-12
        )
    # quantization margin: int8 approx scores of the whole corpus rank the
    # true top-10 well inside the top-64 window
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scale = np.abs(matn).max(axis=1, keepdims=True) / 127.0
    d8 = np.rint(matn / scale)
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    qsc = np.abs(qn).max(axis=1, keepdims=True) / 127.0
    q8 = np.rint(qn / qsc)
    approx = (d8 @ q8.T) * scale * qsc.T
    true = matn @ qn.T
    for qi in range(3):
        top10 = np.argsort(-true[:, qi])[:10]
        approx_rank = np.argsort(-approx[:, qi])
        worst = max(np.flatnonzero(np.isin(approx_rank, top10))[-1], 0)
        assert worst < 48  # inside the 64 window with margin


def test_hybrid_end_to_end(ray_session, tmp_path):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.hybrid import HybridEngine
    from distributedcodesearchengine_ray.sources.corpus import write_corpus
    from distributedcodesearchengine_ray.stages.embed_stage import build_embeddings

    corpus = write_corpus(str(tmp_path / "c"), n_files=120, seed=42, num_shards=2)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, mode="entity", docs_per_partition=200)
    build_embeddings(idx, concurrency=2)

    eng = HybridEngine(idx, num_actors=2)
    try:
        hits = eng.search("parse json data", limit=10)
        assert 0 < len(hits) <= 10
        assert hits[0]["score"] == pytest.approx(1.0)  # normalized
        assert all(h["score"] <= 1.0 + 1e-12 for h in hits)
        assert {"doc_id", "semantic_score", "bm25_score", "name"} <= set(hits[0])
        # bm25-only path still works
        only_bm = eng.search("parse json data", limit=10, use_hybrid=False)
        assert len(only_bm) > 0
    finally:
        eng.close()


def test_hybrid_lsh_probe_sublinear(ray_session, tmp_path):
    """The ann_method='lsh' scale path must read only the query's Hamming
    ball of bucket partitions: the probed row fraction stays ~flat (around
    |ball|/2^bits) while the corpus grows 10x, i.e. per-query reads are
    sublinear in table size — the property that keeps hybrid p50 flat."""
    import os

    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.functions.embed import mock_embed_text
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.hybrid import HybridEngine, enhance_query
    from distributedcodesearchengine_ray.sources.corpus import write_corpus
    from distributedcodesearchengine_ray.stages.embed_stage import build_embeddings

    def rows_in(dirs):
        total = 0
        for d in dirs:
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        return total

    fracs = {}
    for label, n in (("small", 60), ("large", 600)):
        corpus = write_corpus(str(tmp_path / f"c{label}"), n_files=n, seed=1, num_shards=2)
        idx = str(tmp_path / f"idx{label}")
        build_index(corpus, idx, mode="entity", docs_per_partition=max(50, n // 4))
        build_embeddings(idx, concurrency=2)
        eng = HybridEngine(idx, num_actors=2, ann_method="lsh")
        try:
            assert eng.emb_bucketed
            hits = eng.search("parse json data", limit=5)
            assert len(hits) > 0
            qvec = mock_embed_text(enhance_query("parse json data"))
            probed = rows_in(eng._probe_dirs(qvec))
            total = rows_in(
                [os.path.join(eng.emb_dir, d) for d in os.listdir(eng.emb_dir) if d.startswith("bucket=")]
            )
            fracs[label] = probed / total
        finally:
            eng.close()
    # ball of radius 1 over 8 bits = 9/256 of buckets; allow hash variance
    assert fracs["large"] < 0.15
    # the fraction must not grow with corpus size (flat per-query reads)
    assert fracs["large"] <= fracs["small"] * 2 + 0.02


def test_hybrid_ivf_layout(ray_session, tmp_path):
    """partition_by='ivf': centroids persisted at build, queries probe only
    the n_probe nearest cell partitions, results non-empty."""
    import os

    from distributedcodesearchengine_ray.functions.embed import mock_embed_text
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.hybrid import HybridEngine, enhance_query
    from distributedcodesearchengine_ray.sources.corpus import write_corpus
    from distributedcodesearchengine_ray.stages.embed_stage import build_embeddings

    corpus = write_corpus(str(tmp_path / "c"), n_files=150, seed=9, num_shards=2)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, mode="entity", docs_per_partition=100)
    build_embeddings(idx, concurrency=2, partition_by="ivf", ivf_cells=8)
    assert os.path.exists(os.path.join(idx, "ivf_centroids.parquet"))
    cells = [d for d in os.listdir(os.path.join(idx, "embeddings")) if d.startswith("ivf_cell=")]
    assert len(cells) >= 2

    eng = HybridEngine(idx, num_actors=2, ann_method="ivf", ivf_n_probe=3)
    try:
        qvec = mock_embed_text(enhance_query("parse json data"))
        probed = eng._probe_dirs_ivf(qvec)
        assert 0 < len(probed) <= 3  # reads only the probe cells
        hits = eng.search("parse json data", limit=5)
        assert len(hits) > 0
    finally:
        eng.close()
    # mismatched layout is rejected up front (before any actors spawn)
    with pytest.raises(ValueError, match="bucket"):
        HybridEngine(idx, num_actors=1, ann_method="lsh")


def test_vector_topk_ivf_recall(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.annsearch import vector_topk, vector_topk_ivf

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = ds.to_pandas()
    mat = np.stack(df["embedding"].to_numpy())
    qs = mat[:3]
    exact = vector_topk(ds, qs, k=10, id_column="vec_id").to_pandas()
    approx = vector_topk_ivf(ds, qs, k=10, id_column="vec_id", n_centroids=8, n_probe=3).to_pandas()
    for qi in range(3):
        ids = approx[approx.query_idx == qi]["vec_id"].tolist()
        assert df["vec_id"][qi] in ids  # the query vector itself is found
        inter = len(set(ids) & set(exact[exact.query_idx == qi]["vec_id"].tolist()))
        assert inter >= 5  # clustered synthetic data => good recall


def test_sentence_transformer_stage_guard():
    """Without torch/sentence-transformers the real-embedder stage must fail
    fast with the reference's install-hint error (generator.py:126-130)."""
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers installed; guard path not reachable")
    except ImportError:
        pass
    from distributedcodesearchengine_ray.stages.embed_stage import SentenceTransformerEmbedStage

    with pytest.raises(RuntimeError, match="pip install sentence-transformers"):
        SentenceTransformerEmbedStage()


class _StubSTModel:
    """The two-method sentence-transformers surface, deterministic: row i
    of a batch embeds to [i+1, 0, ..., 0] scaled by (1 if normalized
    else 2), so batching order, dim, and the normalize flag are all
    observable.  ``fail=True`` raises inside encode to drive the
    zero-vector error path (generator.py:155-159)."""

    def __init__(self, dim=4, fail=False):
        self._dim = dim
        self.fail = fail
        self.seen_normalize = None

    def get_sentence_embedding_dimension(self):
        return self._dim

    def encode(self, texts, convert_to_numpy=True, normalize_embeddings=True,
               show_progress_bar=False):
        if self.fail:
            raise RuntimeError("model exploded")
        self.seen_normalize = normalize_embeddings
        import numpy as np

        out = np.zeros((len(texts), self._dim), dtype=np.float32)
        out[:, 0] = np.arange(1, len(texts) + 1) * (1.0 if normalize_embeddings else 2.0)
        return out


def test_sentence_transformer_stage_stub_contract():
    """Everything up to the torch forward pass, skipless: text projection,
    batch shaping, normalize pass-through, output schema + lang rename
    — via an injected stub model (the class's documented DI seam)."""
    import numpy as np
    import pyarrow as pa

    from distributedcodesearchengine_ray.stages.embed_stage import (
        MockEmbedStage,
        SentenceTransformerEmbedStage,
    )

    stub = _StubSTModel(dim=4)
    stage = SentenceTransformerEmbedStage(model=stub)
    tbl = pa.table(
        {"doc_id": [0, 1, 2], "name": ["parse_json", "send_request", "retry"],
         "entity_type": ["function"] * 3, "signature": ["a", "b", "c"],
         "parameters": [["x"], ["y"], []], "docstring": ["", "", ""],
         "return_type": ["", "", ""], "parent_class": ["", "", ""],
         "lang": ["python", "go", "rust"]}
    )
    out = stage(tbl)
    # schema identical to MockEmbedStage's
    mock_out = MockEmbedStage(dim=4)(tbl)
    assert out.column_names == mock_out.column_names
    assert out["language"].to_pylist() == ["python", "go", "rust"]
    emb = np.asarray(out["embedding"].to_pylist(), dtype=np.float32)
    assert emb.shape == (3, 4)
    # row order preserved through encode; normalize=True reached the model
    assert list(emb[:, 0]) == [1.0, 2.0, 3.0]
    assert stub.seen_normalize is True
    # normalize=False is passed through
    stage_raw = SentenceTransformerEmbedStage(model=_StubSTModel(dim=4), normalize=False)
    emb_raw = np.asarray(stage_raw(tbl)["embedding"].to_pylist(), dtype=np.float32)
    assert list(emb_raw[:, 0]) == [2.0, 4.0, 6.0]


def test_sentence_transformer_stage_stub_zero_vector_path():
    """An encode failure produces zero vectors of the model dim, not an
    exception (the reference's fallback, generator.py:155-159)."""
    import numpy as np
    import pyarrow as pa

    from distributedcodesearchengine_ray.stages.embed_stage import (
        SentenceTransformerEmbedStage,
    )

    stage = SentenceTransformerEmbedStage(model=_StubSTModel(dim=6, fail=True))
    tbl = pa.table({"doc_id": [0, 1], "__searchable__": ["alpha", "beta"]})
    out = stage(tbl)
    emb = np.asarray(out["embedding"].to_pylist(), dtype=np.float32)
    assert emb.shape == (2, 6) and not emb.any()


class _FakeHFTokenizer:
    """Minimal HF-tokenizer stand-in: whitespace split -> word-hash ids,
    right-padded, with the attention mask — enough to drive the
    transformers-fallback path for real without torch."""

    def __call__(self, texts, padding=True, truncation=True, max_length=512):
        import numpy as np

        toks = [t.split()[:max_length] for t in texts]
        T = max((len(t) for t in toks), default=1) or 1
        ids = np.zeros((len(texts), T), dtype=np.int64)
        mask = np.zeros((len(texts), T), dtype=np.int64)
        for i, words in enumerate(toks):
            for j, w in enumerate(words):
                ids[i, j] = 1 + (hash(w) % 97)
                mask[i, j] = 1
        return {"input_ids": ids, "attention_mask": mask}


class _FakeHFModel:
    """last_hidden_state[b, t, h] = input_ids[b, t] * (h + 1) — linear in
    the ids so the expected pooled vector is hand-computable."""

    def __init__(self, hidden: int = 5):
        self.hidden = hidden

    def __call__(self, input_ids=None, attention_mask=None):
        import types

        import numpy as np

        scale = np.arange(1, self.hidden + 1, dtype=np.float32)
        hs = input_ids[..., None].astype(np.float32) * scale
        return types.SimpleNamespace(last_hidden_state=hs)


def test_transformers_fallback_mean_pooling_executes():
    """The reference's raw-transformers fallback path (ref
    embeddings/generator.py:163-199) EXECUTED end to end with fake
    tokenizer/model objects: attention-mask mean pooling + L2 normalize
    verified against an independent hand computation on a ragged batch,
    and the stage produces the MockEmbedStage schema through the same
    DI seam."""
    import numpy as np
    import pyarrow as pa

    from distributedcodesearchengine_ray.stages.embed_stage import (
        MockEmbedStage,
        SentenceTransformerEmbedStage,
        TransformersFallbackModel,
        mean_pool,
    )

    # --- pooling math, independently recomputed on a ragged batch
    rng = np.random.default_rng(7)
    emb = rng.normal(size=(3, 4, 5)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0], [1, 0, 0, 0], [1, 1, 1, 1]], dtype=np.int64)
    got = mean_pool(emb, mask, normalize=False)
    for b in range(3):
        keep = emb[b][mask[b] == 1]
        np.testing.assert_allclose(got[b], keep.mean(axis=0), rtol=1e-6)
    got_n = mean_pool(emb, mask, normalize=True)
    np.testing.assert_allclose(np.linalg.norm(got_n, axis=1), 1.0, rtol=1e-6)

    # --- the wrapped fallback model drives the full encode path
    model = TransformersFallbackModel(_FakeHFTokenizer(), _FakeHFModel(5),
                                      hidden_size=5)
    assert model.get_sentence_embedding_dimension() == 5
    texts = ["alpha beta gamma", "alpha", "one two three four five"]
    out = model.encode(texts, normalize_embeddings=False)
    assert out.shape == (3, 5) and out.dtype == np.float32
    # expected: mean of ids over real tokens, scaled by (h+1) per dim
    tok = _FakeHFTokenizer()(texts)
    for b in range(3):
        ids = tok["input_ids"][b][tok["attention_mask"][b] == 1]
        exp = ids.mean() * np.arange(1, 6, dtype=np.float32)
        np.testing.assert_allclose(out[b], exp, rtol=1e-5)
    # normalized variant is the same direction, unit length
    out_n = model.encode(texts, normalize_embeddings=True)
    np.testing.assert_allclose(np.linalg.norm(out_n, axis=1), 1.0, rtol=1e-6)

    # --- stage end to end via the DI seam: schema parity with the mock
    stage = SentenceTransformerEmbedStage(model=model)
    tbl = pa.table(
        {"doc_id": [0, 1], "name": ["parse_json", "send_request"],
         "entity_type": ["function"] * 2, "signature": ["a", "b"],
         "parameters": [["x"], []], "docstring": ["", ""],
         "return_type": ["", ""], "parent_class": ["", ""],
         "lang": ["python", "go"]}
    )
    out_tbl = stage(tbl)
    assert out_tbl.column_names == MockEmbedStage(dim=5)(tbl).column_names
    embs = np.asarray(out_tbl["embedding"].to_pylist(), dtype=np.float32)
    assert embs.shape == (2, 5)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-6)


def test_sentence_transformer_stage_real(ray_session):
    """Exercised only where the ML stack exists (skipped in this container):
    the real stage must produce the same schema as MockEmbedStage."""
    st = pytest.importorskip("sentence_transformers")  # noqa: F841
    import pyarrow as pa
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.embed_stage import SentenceTransformerEmbedStage

    tbl = pa.table(
        {"doc_id": [0, 1], "name": ["parse_json", "send_request"],
         "entity_type": ["function", "function"], "signature": ["a", "b"],
         "parameters": [["x"], ["y"]], "docstring": ["", ""],
         "return_type": ["", ""], "parent_class": ["", ""], "lang": ["python", "python"]}
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            SentenceTransformerEmbedStage,
            fn_constructor_kwargs={"model_name": "sentence-transformers/all-MiniLM-L6-v2"},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert set(out.columns) >= {"doc_id", "language", "embedding"}
    assert len(out["embedding"][0]) > 0


def test_hybrid_golden_fusion(ray_session, tmp_path):
    """End-to-end hybrid result == independent recomputation of the full
    reference semantics: mock-embed(enhanced query) cosine ranking + BM25
    ranking + weighted RRF (k=60, w=0.7, low-diversity fallback, HTTP
    boost) + max normalization."""
    import pandas as pd

    from distributedcodesearchengine_ray.functions.embed import mock_embed_text, searchable_text
    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.hybrid import HybridEngine, enhance_query
    from distributedcodesearchengine_ray.pipelines.oracle import BM25Oracle, oracle_search
    from distributedcodesearchengine_ray.sources.corpus import gen_corpus_rows, write_corpus
    from distributedcodesearchengine_ray.stages.embed_stage import build_embeddings
    from distributedcodesearchengine_ray.stages.parse import entity_document, parse_content
    from tests.test_rank_identity import _keep

    n = 100
    corpus = write_corpus(str(tmp_path / "c"), n_files=n, seed=42, num_shards=2)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, mode="entity", docs_per_partition=40)
    build_embeddings(idx, concurrency=2)

    # oracle entities in docID order
    rows = [r for r in gen_corpus_rows(n, seed=42) if _keep(r["path"])]
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    ents = []
    for r in rows:
        ents.extend(parse_content(r["content"], r["path"], r["repo"], r["lang"]))

    query, limit = "parse json data", 8
    # semantic side: cosine of mock embeddings vs enhanced query, top 2*limit
    qv = mock_embed_text(enhance_query(query)).astype(np.float64)
    sims = []
    for i, e in enumerate(ents):
        ev = mock_embed_text(
            searchable_text(
                e["name"], e["entity_type"], e["signature"], e["parameters"],
                e["docstring"], e["return_type"], e["parent_class"],
            )
        ).astype(np.float64)
        sims.append((i, float(ev @ qv)))
    sims.sort(key=lambda x: (-x[1], x[0]))
    sem = sims[: 2 * limit]
    # bm25 side
    oracle = BM25Oracle([tokenize(entity_document(e)) for e in ents])
    bm = oracle_search(oracle, query, limit=2 * limit)
    # reference RRF (recomputed independently, not via rrf_fuse)
    svals = [s for _, s in sem]
    w = 0.3 if svals and (max(svals) - min(svals) < 0.05) else 0.7
    acc = {}
    for rank, (d, s) in enumerate(sem):
        acc[d] = [w / (60 + rank + 1), 0.0]
    for rank, (d, s) in enumerate(bm):
        acc.setdefault(d, [0.0, 0.0])[1] = (1 - w) / (60 + rank + 1)
    fused = sorted(((d, a + b) for d, (a, b) in acc.items()), key=lambda x: (-x[1], x[0]))
    mx = fused[0][1]
    expected = [(d, s / mx) for d, s in fused][:limit]

    eng = HybridEngine(idx, num_actors=2)
    try:
        got = eng.search(query, limit=limit)
    finally:
        eng.close()
    assert [h["doc_id"] for h in got] == [d for d, _ in expected]
    np.testing.assert_allclose(
        [h["score"] for h in got], [s for _, s in expected], rtol=1e-9
    )

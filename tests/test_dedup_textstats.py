"""Dedup + text-analysis + multimodal stage tests (documents/embeddings
testdata as inputs)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_exact_dedup(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.dedup import exact_dedup

    ds = rd.read_parquet(f"{SF}/documents.parquet")
    dup = ds.map_batches(  # duplicate every row with a shifted id
        lambda t: pa.concat_tables(
            [t, t.set_column(0, "doc_id", pa.compute.add(t["doc_id"], 100000))]
        ),
        batch_format="pyarrow",
    )
    out = exact_dedup(dup).to_pandas()
    orig = ds.to_pandas()
    assert len(out) == len(orig)
    # min-id winner => the original ids survive
    assert sorted(out["doc_id"].tolist()) == sorted(orig["doc_id"].tolist())


def test_minhash_jaccard_estimates(ray_session):
    from distributedcodesearchengine_ray.stages.dedup import jaccard, minhash_signature

    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    sa = minhash_signature(a, num_perm=256)
    sb = minhash_signature(b, num_perm=256)
    est = (sa == sb).mean()
    true = jaccard(a, b)
    assert abs(est - true) < 0.15
    assert (minhash_signature(a, num_perm=256) == sa).all()  # deterministic


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.dedup import minhash_lsh_candidates

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = []
    for i in range(20):
        rows.append({"doc_id": i, "text": f"unique document {i} " + " ".join(f"w{i}{j}" for j in range(30))})
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base + " tail"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = minhash_lsh_candidates(ds, num_perm=64, bands=16).to_pandas()
    pairs = pairs.drop_duplicates(["id_a", "id_b"])
    assert ((pairs.id_a == 100) & (pairs.id_b == 101)).any()


def test_minhash_driver_shortcut_equals_distributed(ray_session, monkeypatch):
    """The small-table driver shortcut and the distributed groupby path of
    _pairs_from_hot_buckets must return the same pair set."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [
        {"doc_id": i, "text": f"unique {i} " + " ".join(f"w{i}{j}" for j in range(30))}
        for i in range(40)
    ]
    rows += [{"doc_id": 100, "text": base}, {"doc_id": 101, "text": base + " tail"},
             {"doc_id": 102, "text": base + " other tail"}]
    df = pd.DataFrame(rows)

    got_small = (
        dedup.minhash_lsh_candidates(rd.from_pandas(df), num_perm=64, bands=16)
        .to_pandas().drop_duplicates(["id_a", "id_b"])
    )
    monkeypatch.setattr(dedup, "SMALL_BANDS_DRIVER_ROWS", 0)
    got_dist = (
        dedup.minhash_lsh_candidates(rd.from_pandas(df), num_perm=64, bands=16)
        .to_pandas().drop_duplicates(["id_a", "id_b"])
    )
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b"]].to_numpy()))
    assert key(got_small) == key(got_dist)
    assert (100, 101) in key(got_small)


def test_minhash_mega_bucket_capped(ray_session):
    """A 10k-near-identical-doc cluster (one LSH bucket per band) must not
    emit C(10k,2) pairs: buckets over max_bucket emit n-1 star pairs with
    the min id as hub, keeping the cluster connected for transitive dedup."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.dedup import minhash_lsh_candidates

    base = "identical cluster text with enough words to shingle " * 3
    rows = [{"doc_id": i, "text": base} for i in range(10_000)]
    rows += [
        {"doc_id": 20_000 + i, "text": f"distinct doc {i} " + " ".join(f"q{i}{j}" for j in range(25))}
        for i in range(5)
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = minhash_lsh_candidates(ds, num_perm=64, bands=16).to_pandas()
    pairs = pairs.drop_duplicates(["id_a", "id_b"])
    cluster = pairs[pairs.id_a < 20_000]
    # star shape: hub is the min id, one pair per other member — not C(n,2)
    assert (cluster["id_a"] == 0).all()
    assert len(cluster) == 9_999
    assert sorted(cluster["id_b"].tolist()) == list(range(1, 10_000))


def test_simhash_mega_bucket_capped(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.dedup import simhash_candidates

    base = "repeated simhash cluster words " * 4
    rows = [{"doc_id": i, "text": base} for i in range(300)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = simhash_candidates(ds, max_bucket=256).to_pandas().drop_duplicates(["id_a", "id_b"])
    assert (pairs["id_a"] == 0).all()
    assert len(pairs) == 299
    assert (pairs["hamming"] == 0).all()


def test_simhash_batch_matches_scalar_oracle():
    from distributedcodesearchengine_ray.stages.dedup import simhash_batch, simhash_scalar

    import random

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(80)]
    docs = [None, "", "   "] + [
        " ".join(rng.choices(vocab, k=rng.randrange(0, 60))) for _ in range(200)
    ]
    got = simhash_batch(docs)
    exp = np.array([simhash_scalar(t) for t in docs], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)


def test_simhash_candidates(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.dedup import simhash_candidates

    base = "one two three four five six seven eight nine ten " * 3
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base + "extra word tail"},
        {"doc_id": 2, "text": " ".join(f"z{i}" for i in range(50))},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = simhash_candidates(ds).to_pandas().drop_duplicates(["id_a", "id_b"])
    match = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert len(match) == 1
    assert match["hamming"].iloc[0] <= 16


def test_embedding_near_dups(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.dedup import embedding_near_dups

    rng = np.random.default_rng(0)
    base = rng.standard_normal(32).astype(np.float32)
    rows = []
    for i in range(10):
        v = rng.standard_normal(32).astype(np.float32)
        rows.append({"vec_id": i, "embedding": v})
    rows.append({"vec_id": 100, "embedding": base})
    rows.append({"vec_id": 101, "embedding": base + 0.001 * rng.standard_normal(32).astype(np.float32)})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = embedding_near_dups(ds, threshold=0.99).to_pandas()
    assert ((pairs.id_a == 100) & (pairs.id_b == 101)).any()


def test_asof_join_matches_scalar(ray_session):
    """asof_join vs a per-row scalar truth: equal timestamps match, left
    rows before any right row drop, users missing on either side drop."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.asof import asof_join

    left = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [10, 10, 10, 20, 20, 30],
            "ts": [100, 250, 300, 50, 400, 77],
        }
    )
    right = pd.DataFrame(
        {
            "pid": [901, 902, 903, 904],
            "user_id": [10, 10, 20, 40],
            "ts": [100, 260, 300, 10],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    got = (
        asof_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            by="user_id",
            on="ts",
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    # scalar truth
    want = []
    for _, l in left.iterrows():
        cands = right[(right.user_id == l.user_id) & (right.ts <= l.ts)]
        if len(cands):
            m = cands.sort_values(["ts", "pid"]).iloc[-1]
            want.append((l.event_id, m.pid, m.value))
    assert [
        (int(r.event_id), int(r.pid), float(r.value)) for r in got.itertuples()
    ] == want
    # specific semantics pinned: ts==100 matches pid 901 (equality);
    # event 2 (ts 250) matches 901 not 902 (260 is later); user 30 drops
    d = {int(r.event_id): int(r.pid) for r in got.itertuples()}
    assert d[1] == 901 and d[2] == 901 and d[3] == 902
    assert 6 not in d and 4 not in d


def test_range_join_matches_scalar(ray_session):
    """range_join vs a per-row scalar truth: inclusive bounds both ends,
    multi-match expansion, empty intervals drop."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.asof import range_join

    left = pd.DataFrame(
        {"event_id": [1, 2, 3], "user_id": [10, 10, 20], "ts": [100, 205, 300]}
    )
    right = pd.DataFrame(
        {
            "pid": [901, 902, 903, 904, 905],
            "user_id": [10, 10, 10, 20, 20],
            "ts": [90, 100, 200, 310, 250],
        }
    )
    got = (
        range_join(
            rd.from_pandas(left).repartition(2),
            rd.from_pandas(right).repartition(2),
            lower=-10, upper=0, by="user_id", on="ts",
        )
        .to_pandas()
        .sort_values(["event_id", "pid"], ignore_index=True)
    )
    want = []
    for _, l in left.iterrows():
        c = right[
            (right.user_id == l.user_id)
            & (right.ts >= l.ts - 10)
            & (right.ts <= l.ts)
        ].sort_values("pid")
        want += [(l.event_id, p) for p in c.pid]
    assert [(int(r.event_id), int(r.pid)) for r in got.itertuples()] == want
    # pinned: event 1 matches BOTH 901 (ts 90 = lower bound) and 902
    # (ts 100 = upper bound); event 3 (ts 300) matches nothing in [290,300]
    pairs = set(map(tuple, got[["event_id", "pid"]].to_numpy()))
    assert (1, 901) in pairs and (1, 902) in pairs
    assert not any(e == 3 for e, _ in pairs)


def test_asof_range_randomized_vs_bruteforce(ray_session):
    """Rank-merge (bucketed, no per-key loop) vs brute force on a random
    multi-user stream with duplicate timestamps on both sides."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.asof import asof_join, range_join

    rng = np.random.default_rng(31)
    nl, nr, users = 400, 300, 23
    left = pd.DataFrame(
        {
            "event_id": np.arange(nl),
            "user_id": rng.integers(0, users, nl),
            "ts": rng.integers(0, 200, nl),  # dup timestamps guaranteed
        }
    )
    right = pd.DataFrame(
        {
            "pid": np.arange(1000, 1000 + nr),
            "user_id": rng.integers(0, users, nr),
            "ts": rng.integers(0, 200, nr),
        }
    )
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(4)

    got = (
        asof_join(lds, rds, by="user_id", on="ts", right_tiebreak=["pid"])
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    want = []
    for _, l in left.iterrows():
        c = right[(right.user_id == l.user_id) & (right.ts <= l.ts)]
        if len(c):
            m = c.sort_values(["ts", "pid"]).iloc[-1]
            want.append((l.event_id, m.pid))
    assert [(int(r.event_id), int(r.pid)) for r in got.itertuples()] == sorted(want)

    got_r = (
        range_join(lds, rds, lower=-15, upper=5, by="user_id", on="ts")
        .to_pandas()
        .sort_values(["event_id", "pid"], ignore_index=True)
    )
    want_r = []
    for _, l in left.iterrows():
        c = right[
            (right.user_id == l.user_id)
            & (right.ts >= l.ts - 15)
            & (right.ts <= l.ts + 5)
        ]
        want_r += [(l.event_id, p) for p in sorted(c.pid)]
    assert [(int(r.event_id), int(r.pid)) for r in got_r.itertuples()] == sorted(want_r)


def test_kmeans_fit_matches_numpy(ray_session):
    """Distributed Lloyd's must equal a single-process numpy reference:
    same seeds, same assignments after each of 3 iterations, across a
    multi-block layout and gappy ids."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.kmeans import kmeans_fit

    rng = np.random.default_rng(13)
    n, dim, k = 240, 12, 5
    E = rng.standard_normal((n, dim))
    ids = np.arange(n) * 3 + 1  # gappy, non-zero-based
    rows = [{"vec_id": int(ids[i]), "embedding": E[i]} for i in range(n)]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(6)

    got, centroids = kmeans_fit(ds, k=k, n_iter=3)
    got = got.to_pandas()

    # numpy reference (seeds = k smallest ids; empty clusters would drop)
    order = np.argsort(ids)
    E2, ids2 = E[order], ids[order]
    C = E2[:k].copy()
    lab = ids2[:k].copy()
    for _ in range(2):
        d = ((E2[:, None, :] - C[None, :, :]) ** 2).sum(2)
        a = d.argmin(1)
        live = np.unique(a)
        C = np.stack([E2[a == c].mean(0) for c in live])
        lab = lab[live]
    d = ((E2[:, None, :] - C[None, :, :]) ** 2).sum(2)
    final = lab[d.argmin(1)]
    assert got["vec_id"].tolist() == ids2.tolist()
    assert got["cluster"].tolist() == final.tolist()
    assert np.allclose(centroids, C)


def test_exact_heavy_hitters(ray_session):
    """Two-pass sketch must equal the exact full count at any block split,
    including a term that is NEVER a local heavy hitter in most blocks
    but qualifies globally (completeness comes from the pigeonhole)."""
    import collections

    import ray.data as rd

    from distributedcodesearchengine_ray.stages.sketch import exact_heavy_hitters

    rng = np.random.default_rng(21)
    vocab = [f"tk{i:04d}" for i in range(4000)]  # background terms stay rare
    rows = []
    for i in range(300):
        toks = list(rng.choice(vocab, 40))
        if i % 3 == 0:
            toks += ["hotterm"] * 2  # ~0.16% of the stream, spread thin
        rows.append({"text": " ".join(toks)})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(7)

    got = exact_heavy_hitters(
        ds, denominator=800, text_col="text"
    ).to_pandas()

    # exact truth with the same tokenizer
    from distributedcodesearchengine_ray.functions.tokenizer import tokenize

    counter = collections.Counter()
    for r in rows:
        counter.update(tokenize(r["text"]))
    total = sum(counter.values())
    want = sorted(
        ((t, c) for t, c in counter.items() if c * 800 > total),
        key=lambda x: (-x[1], x[0]),
    )
    assert list(map(tuple, got[["term", "n_occurrences"]].to_numpy())) == want
    assert "hotterm" in set(got["term"])


def test_new_stages_degenerate_inputs(ray_session):
    """Null/empty/sub-minimum texts: ngram join and heavy hitters must
    return empty (typed) results, not crash — including the all-empty
    corpus where Ray's to_pandas drops the schema."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.simjoin import ngram_jaccard_join
    from distributedcodesearchengine_ray.stages.sketch import exact_heavy_hitters

    # nulls/empties everywhere; the len-1 tokens vanish entirely for the
    # CODE tokenizer (heavy hitters -> all-empty pass-1, the schema-drop
    # path) and leave no shareable grams for the whitespace 3-gram join
    dead = pd.DataFrame({"doc_id": [1, 2, 3], "text": [None, "", "a b c"]})
    ds = rd.from_pandas(dead).repartition(2)
    out = ngram_jaccard_join(ds, threshold=0.5)
    assert out.num_rows == 0 and out.schema.names == ["id_a", "id_b", "jaccard"]
    hh = exact_heavy_hitters(ds, denominator=4, text_col="text")
    assert hh.num_rows == 0 and hh.schema.names == ["term", "n_occurrences"]

    # mixed: nulls alongside real near-dups still pair correctly
    mixed = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [None, "", "alpha beta gamma delta alpha beta gamma delta",
                     "alpha beta gamma delta alpha beta gamma delta extra"],
        }
    )
    out = ngram_jaccard_join(rd.from_pandas(mixed).repartition(3), threshold=0.5).to_pandas()
    assert [(int(r.id_a), int(r.id_b)) for r in out.itertuples()] == [(3, 4)]


def test_connected_components_exact(ray_session, monkeypatch):
    """Union-find must equal a BFS ground truth on a random graph, and the
    distributed label-propagation path must equal the driver path."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages import components

    rng = np.random.default_rng(9)
    # 200 nodes (sparse ids), ~150 random edges + a long chain (deep
    # component exercises multi-round propagation)
    nodes = rng.choice(10_000, size=200, replace=False)
    ea = list(rng.choice(nodes, 150))
    eb = list(rng.choice(nodes, 150))
    chain = sorted(rng.choice(nodes, 12, replace=False))
    ea += chain[:-1]
    eb += chain[1:]
    edges = pd.DataFrame({"id_a": np.array(ea, np.int64), "id_b": np.array(eb, np.int64)})
    edges = edges[edges.id_a != edges.id_b].reset_index(drop=True)

    got = components.connected_components(
        pa.Table.from_pandas(edges, preserve_index=False)
    ).to_pandas()

    # BFS truth
    adj = {}
    for a, b in edges.itertuples(index=False):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    truth = {}
    for start in sorted(adj):
        if start in truth:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x] - seen:
                seen.add(y)
                stack.append(y)
        m = min(comp)
        for x in comp:
            truth[x] = m
    want = sorted(truth.items())
    assert list(map(tuple, got[["doc_id", "cluster_id"]].to_numpy())) == want

    monkeypatch.setattr(components, "SMALL_CC_DRIVER_EDGES", 0)
    got_dist = components.connected_components(
        rd.from_pandas(edges).repartition(4)
    ).to_pandas()
    assert got_dist.values.tolist() == got.values.tolist()


def test_ngram_jaccard_join_exact(ray_session, monkeypatch):
    """The prefix-filter join must equal the brute-force all-pairs truth
    (ids AND exact scores), and the driver shortcut must equal the
    distributed path bit-for-bit."""
    import itertools

    import ray.data as rd

    from distributedcodesearchengine_ray.stages import simjoin

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(40):
        rows.append({"doc_id": i * 7, "text": " ".join(rng.choice(vocab, 30))})
    # planted near-dups: same text +/- a small tail
    base = " ".join(rng.choice(vocab, 40))
    rows.append({"doc_id": 900, "text": base})
    rows.append({"doc_id": 901, "text": base + " zz yy xx"})
    rows.append({"doc_id": 902, "text": "tiny"})  # <3 tokens -> no grams
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(4)

    got = simjoin.ngram_jaccard_join(ds, threshold=0.5, n=3).to_pandas()

    # brute-force truth
    def gset(text):
        ts = text.lower().split()
        return set(zip(*(ts[k:] for k in range(3))))

    sets = {r["doc_id"]: gset(r["text"]) for r in rows}
    want = []
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa and not sb:
            continue
        u = len(sa | sb)
        j = len(sa & sb) / u if u else 1.0
        if j >= 0.5:
            want.append((a, b, j))
    assert [(int(r.id_a), int(r.id_b)) for r in got.itertuples()] == [
        (a, b) for a, b, _ in want
    ]
    assert np.allclose(got["jaccard"].to_numpy(), [j for _, _, j in want])
    assert (900, 901) in {(a, b) for a, b, _ in want}  # planted pair found

    monkeypatch.setattr(simjoin, "SMALL_JOIN_DRIVER_DOCS", 0)
    got_dist = simjoin.ngram_jaccard_join(ds, threshold=0.5, n=3).to_pandas()
    assert got_dist.values.tolist() == got.values.tolist()


def test_embedding_cosine_exact_pairs(ray_session):
    """embedding_cosine_dups_exact must equal the numpy all-pairs truth
    (ids AND rounded cosines), across multiple blocks."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.dedup import embedding_cosine_dups_exact

    rng = np.random.default_rng(3)
    n, dim = 120, 16
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    mat[40] = mat[7] + 0.05 * rng.standard_normal(dim).astype(np.float32)
    rows = [{"vec_id": i * 3, "embedding": mat[i]} for i in range(n)]  # gappy ids
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(5)

    th = 0.3
    got = (
        embedding_cosine_dups_exact(ds, threshold=th)
        .to_pandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )

    norm = mat.astype(np.float64)
    norm /= np.linalg.norm(norm, axis=1, keepdims=True)
    sims = norm @ norm.T
    ia, ib = np.triu_indices(n, k=1)
    keep = sims[ia, ib] >= th
    want = pd.DataFrame(
        {"id_a": ia[keep] * 3, "id_b": ib[keep] * 3, "cosine": sims[ia[keep], ib[keep]]}
    ).sort_values(["id_a", "id_b"], ignore_index=True)

    assert got[["id_a", "id_b"]].values.tolist() == want[["id_a", "id_b"]].values.tolist()
    assert np.allclose(got["cosine"].to_numpy(), want["cosine"].to_numpy(), atol=1e-9)
    assert ((got["id_a"] == 7 * 3) & (got["id_b"] == 40 * 3)).any()


def test_semantic_dedup_matches_bruteforce(ray_session, monkeypatch):
    """SemDeDup (kmeans + within-cluster keep-first cosine dedup) vs a
    brute-force oracle, with planted near-duplicates and a tiny matmul
    block size to exercise the blocked lower-triangular path."""
    import ray

    from distributedcodesearchengine_ray.stages import semdedup as sd
    from distributedcodesearchengine_ray.stages.kmeans import kmeans_fit

    monkeypatch.setattr(sd, "_BLOCK_ROWS", 3)
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16))
    vecs = [v for v in base]
    # plant near-dups: rows 40..49 are tiny perturbations of rows 0..9
    for i in range(10):
        vecs.append(base[i] + rng.normal(scale=1e-3, size=16))
    ids = list(range(len(vecs)))
    t = pa.table(
        {"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]}
    )
    ds = ray.data.from_arrow(t)
    got = (
        sd.semantic_dedup(ds, k=4, n_iter=2, threshold=0.95)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    # brute force: same kmeans assignment, then exists-smaller-id rule
    assign, _ = kmeans_fit(ds, k=4, n_iter=2)
    cl = assign.to_pandas().set_index("vec_id")["cluster"]
    M = np.stack([np.asarray(v) for v in vecs])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    for i in ids:
        exp_dup = any(
            cl[j] == cl[i] and float(M[i] @ M[j]) >= 0.95 for j in range(i)
        )
        row = got[got["vec_id"] == i].iloc[0]
        assert row["keep"] == (0 if exp_dup else 1), f"vec_id {i}"
        assert row["cluster"] == cl[i]
    # all 10 planted dups flagged, none of the 40 originals dropped
    assert got[got["vec_id"] >= 40]["keep"].sum() == 0
    assert got[got["vec_id"] < 40]["keep"].sum() == 40


def test_quality_stats_vectorized(ray_session):
    from distributedcodesearchengine_ray.stages.text_stats import quality_stats

    t = pa.table({"text": ["The quick brown fox!", "", "a b c 123 DEF."]})
    out = quality_stats(t).to_pandas()
    assert out["n_tokens"].tolist() == [4, 0, 5]
    assert out["n_chars"].tolist() == [20, 0, 14]
    assert out["stopword_ratio"][0] == pytest.approx(1 / 4)
    assert out["digit_ratio"][2] == pytest.approx(3 / 14)
    assert out["upper_ratio"][2] == pytest.approx(3 / 14)


def test_repetition_stats_vs_bruteforce(ray_session):
    """Gopher repetition signals vs a brute-force Python oracle, on
    multi-line docs with real duplicate lines/bigrams (the sf testdata is
    single-line, so the dup-line path needs its own fixture)."""
    import random
    from collections import Counter

    from distributedcodesearchengine_ray.stages.text_stats import repetition_stats

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "x"]
    docs = [
        "",  # empty
        "one line only",
        "dup\ndup\nunique\ndup",  # 3 copies of "dup"
        "a b a b a b",  # heavy bigram repetition
        "\n\n",  # empty lines only
        "tab\tsep  spaces\nand a newline",
    ]
    for _ in range(40):
        lines = [
            " ".join(rng.choices(words, k=rng.randint(0, 6)))
            for _ in range(rng.randint(1, 8))
        ]
        # force some duplicate lines
        if len(lines) > 2 and rng.random() < 0.7:
            lines[rng.randrange(len(lines))] = lines[0]
        docs.append("\n".join(lines))
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    out = repetition_stats(t).to_pandas().set_index("doc_id")

    for did, text in enumerate(docs):
        lines = text.split("\n")
        lc = Counter(lines)
        assert out.loc[did, "n_lines"] == len(lines)
        assert out.loc[did, "n_uniq_lines"] == len(lc)
        assert out.loc[did, "dup_line_chars"] == sum(
            (c - 1) * len(l) for l, c in lc.items()
        )
        assert out.loc[did, "line_chars"] == sum(len(l) for l in lines)
        toks = [w for w in __import__("re").split(r"\s+", text) if w]
        bgs = Counter(
            toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
        )
        assert out.loc[did, "n_bigrams"] == sum(bgs.values())
        assert out.loc[did, "n_uniq_bigrams"] == len(bgs)
        if bgs:
            top = max(bgs.values())
            assert out.loc[did, "top_bigram_n"] == top
            assert out.loc[did, "top_bigram_len"] == max(
                len(b) for b, c in bgs.items() if c == top
            )
        else:
            assert out.loc[did, "top_bigram_n"] == 0
            assert out.loc[did, "top_bigram_len"] == 0


def test_token_counts():
    from distributedcodesearchengine_ray.stages.text_stats import token_counts

    t = pa.table({"text": ["hello world", "it's a test-case 42", ""]})
    out = token_counts(t).to_pandas()
    assert out["ws_tokens"].tolist() == [2, 4, 0]
    assert out["bpe_tokens"][0] == 2
    assert out["bpe_tokens"][2] == 0


def test_lang_id_heuristic():
    from distributedcodesearchengine_ray.stages.text_stats import lang_id_batch

    assert lang_id_batch(["the cat is in the house and that is fine"]) == ["en"]
    assert lang_id_batch(["der hund ist nicht mit der katze"]) == ["de"]
    assert lang_id_batch(["le chat est dans la maison et les chiens"]) == ["fr"]
    assert lang_id_batch(["el perro es una mascota que vive por aqui"]) == ["es"]
    assert lang_id_batch(["这是一个中文句子"]) == ["zh"]
    assert lang_id_batch(["zzz qqq xxx"]) == ["unknown"]


def test_winnow_fingerprints_deterministic():
    from distributedcodesearchengine_ray.stages.text_stats import winnow_fingerprints

    a = winnow_fingerprints("some document text for fingerprinting purposes")
    b = winnow_fingerprints("some document text for fingerprinting purposes")
    np.testing.assert_array_equal(a, b)
    c = winnow_fingerprints("completely different content here")
    assert set(a.tolist()) != set(c.tolist())
    # shared long substring => shared fingerprints
    d = winnow_fingerprints("XX some document text for fingerprinting purposes YY")
    assert len(set(a.tolist()) & set(d.tolist())) > 0


def test_multimodal_pipeline(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.multimodal import (
        FrameSampleStage,
        MediaDecodeStage,
        MediaFeatureStage,
        gen_media_table,
    )

    tbl = gen_media_table(30)
    ds = rd.from_arrow(tbl)
    decoded = ds.map_batches(
        MediaDecodeStage, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert len(decoded) == 30
    assert (decoded["width"] >= 16).all()
    feats = ds.map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert len(feats) == 30
    assert len(feats["embedding"][0]) == 64
    frames = ds.map_batches(
        FrameSampleStage, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    assert (frames["media_id"].nunique()) == 10  # every 3rd row is video
    # real path refuses codec-requiring payloads with the install hint
    with pytest.raises(NotImplementedError, match="codec"):
        MediaDecodeStage(use_real=True)(tbl.slice(2, 1))  # opaque video bytes


def test_media_pipeline_fused_equals_composition(ray_session):
    """media_pipeline executes its dataset ONCE through the fused
    MediaSummaryStage; its summary must equal the same numbers derived
    by running the three component stages separately (the pre-fusion
    shape) — per-kind counts, decoded width sums, embedding dim, and
    total sampled frames."""
    import ray.data as rd

    from distributedcodesearchengine_ray.pipelines.queries import media_pipeline
    from distributedcodesearchengine_ray.stages.multimodal import (
        FrameSampleStage,
        MediaDecodeStage,
        MediaFeatureStage,
        gen_media_table,
    )

    got = media_pipeline("/root/testdata/sf0.001").to_pandas().set_index("kind")

    # rebuild the exact media table media_pipeline synthesizes
    base = gen_media_table(120, seed=42, real_formats=True)
    kinds = base["kind"].to_pylist()
    keep = pa.array([k in ("image", "audio") for k in kinds])
    base = base.filter(keep)
    imgs = [p for p, k in zip(base["payload"].to_pylist(),
                              base["kind"].to_pylist()) if k == "image"][:12]
    vids = [b"".join(imgs[i::4]) for i in range(4)]
    vid_tbl = pa.table({
        "media_id": pa.array([1_000_000 + i for i in range(len(vids))], pa.int64()),
        "kind": pa.array(["video"] * len(vids), pa.string()),
        "payload": pa.array(vids, pa.binary()),
    })
    media = pa.concat_tables([base.select(["media_id", "kind", "payload"]), vid_tbl])
    ds = rd.from_arrow(media)

    decoded = ds.map_batches(
        MediaDecodeStage, fn_constructor_kwargs={"use_real": True},
        batch_format="pyarrow", concurrency=(1, 2),
    ).to_pandas()
    feats = ds.map_batches(
        MediaFeatureStage, batch_format="pyarrow", concurrency=(1, 2)
    ).to_pandas()
    frames = ds.map_batches(
        FrameSampleStage, fn_constructor_kwargs={"every": 2, "use_real": True},
        batch_format="pyarrow", concurrency=(1, 2),
    ).to_pandas()

    assert sorted(got.index) == sorted(decoded["kind"].unique())
    for kind, grp in decoded.groupby("kind"):
        row = got.loc[kind]
        assert int(row["n"]) == len(grp)
        assert int(row["width_sum"]) == int(grp["width"].sum())
        assert int(row["emb_dim"]) == len(feats["embedding"].iloc[0])
        assert int(row["frames_sampled"]) == (len(frames) if kind == "video" else 0)


def test_multimodal_real_decode(ray_session):
    """The REAL decode path: P6 PPM and PCM WAV payloads parsed for true
    dimensions/sample counts (no codec libraries involved)."""
    import json

    import pyarrow.compute as pc
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.multimodal import MediaDecodeStage, gen_media_table

    tbl = gen_media_table(30, real_formats=True)
    decodable = tbl.filter(pc.not_equal(tbl["kind"], "video"))
    out = (
        rd.from_arrow(decodable)
        .map_batches(
            MediaDecodeStage,
            fn_constructor_kwargs={"use_real": True},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        )
        .to_pandas()
        .set_index("media_id")
    )
    metas = {m: json.loads(s) for m, s in zip(tbl["media_id"].to_pylist(), tbl["meta"].to_pylist())}
    for mid, row in out.iterrows():
        meta = metas[mid]
        if meta["codec"] == "ppm":
            assert (row["width"], row["height"], row["channels"]) == (meta["width"], meta["height"], 3)
        else:
            assert meta["codec"] == "wav"
            assert (row["width"], row["height"], row["channels"]) == (meta["frames"], meta["rate"], 1)
        assert row["std_byte"] > 0


def test_multimodal_real_resize(ray_session):
    """The REAL resize path: netpbm images nearest-neighbor thumbnailed
    by pure numpy, output payloads round-trip through decode_ppm with
    the target dimensions and preserved corner pixels."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.multimodal import (
        MediaResizeStage,
        _ppm_pixels,
        decode_ppm,
        gen_media_table,
        resize_ppm,
    )

    tbl = gen_media_table(30, real_formats=True)
    images = tbl.filter(pc.equal(tbl["kind"], "image"))
    out = (
        rd.from_arrow(images)
        .map_batches(
            MediaResizeStage,
            fn_constructor_kwargs={"width": 8, "height": 6, "use_real": True},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=(1, 2),
        )
        .to_pandas()
        .set_index("media_id")
    )
    payloads = dict(zip(tbl["media_id"].to_pylist(), tbl["payload"].to_pylist()))
    assert len(out) == len(images)
    for mid, row in out.iterrows():
        info = decode_ppm(row["thumb"])
        assert (info["width"], info["height"], info["channels"]) == (8, 6, 3)
        # nearest-neighbor identity: each thumb pixel equals a source pixel
        src, w, h = _ppm_pixels(payloads[mid])
        thumb, _, _ = _ppm_pixels(row["thumb"])
        ys = np.minimum(((np.arange(6) + 0.5) * h / 6).astype(np.int64), h - 1)
        xs = np.minimum(((np.arange(8) + 0.5) * w / 8).astype(np.int64), w - 1)
        assert (thumb == src[ys][:, xs]).all()
    # deterministic: same input -> same bytes
    some = next(iter(payloads.values()))
    assert resize_ppm(some, 8, 6) == resize_ppm(some, 8, 6)
    # fake path still emits schema-compatible decodable thumbs
    fake = MediaResizeStage(width=5, height=4)(tbl.slice(0, 3))
    for t in fake["thumb"].to_pylist():
        info = decode_ppm(t)
        assert (info["width"], info["height"]) == (5, 4)
    # real path refuses codec-requiring payloads with the install hint
    opaque = gen_media_table(3)  # fake payloads (no real formats)
    with pytest.raises(NotImplementedError, match="codec"):
        MediaResizeStage(use_real=True)(opaque.slice(0, 1))


def test_redact_pii_synthetic():
    """Typed placeholders + per-category counts on texts with real PII."""
    import pyarrow as pa

    from distributedcodesearchengine_ray.stages.text_stats import redact_pii

    t = pa.table(
        {
            "text": [
                "mail me at john.doe+x@example.co.uk or visit https://a.b/c?d=1",
                "server 10.0.255.7 port 8080, call 555-123-4567 now",
                "no pii here",
                None,
            ]
        }
    )
    out = redact_pii(t)
    red = out["redacted"].to_pylist()
    assert red[0] == "mail me at <EMAIL> or visit <URL>"
    # ip wins over bare numbers; remaining digit runs become <NUM>
    assert red[1] == "server <IP> port <NUM>, call <NUM>-<NUM>-<NUM> now"
    assert red[2] == "no pii here"
    assert red[3] == ""
    assert out["n_email"].to_pylist() == [1, 0, 0, 0]
    assert out["n_url"].to_pylist() == [1, 0, 0, 0]
    assert out["n_ip"].to_pylist() == [0, 1, 0, 0]
    assert out["n_number"].to_pylist() == [0, 4, 0, 0]


def test_gopher_gate_rules(ray_session):
    """Each gate rule fires on a purpose-built doc; integer-exact flags."""
    import pyarrow as pa

    from distributedcodesearchengine_ray.stages.text_stats import gopher_gate

    good = ("the quick brown research paper explains that many of these "
            "documents with useful sentences and clear structure is kept "
            "because that text looks natural and with enough words total")
    docs = {
        "good": good,
        "too_short": "the cat is in that house",  # < 20 words
        "long_words": "the and " + " ".join(["supercalifragilistic"] * 30),
        "no_stopwords": " ".join(f"tok{i}" for i in range(30)),
        "dup_lines": "the line is that one\n" * 10 + "with a tail of it",
        "rep_bigram": "the of " + "again again " * 30 + "is that",
    }
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(list(docs.values())),
        }
    )
    out = gopher_gate(t).to_pandas()
    out.index = list(docs)
    assert out.loc["good", "keep"] == 1, out.loc["good"]
    assert out.loc["too_short", "f_words"] == 0
    assert out.loc["long_words", "f_wordlen"] == 0
    assert out.loc["no_stopwords", "f_stop"] == 0
    assert out.loc["dup_lines", "f_dupline"] == 0
    assert out.loc["rep_bigram", "f_bigram"] == 0
    for name in docs:
        if name != "good":
            assert out.loc[name, "keep"] == 0, name


def test_dedup_keep_best_elects_longest(ray_session):
    """Keeper = max-token member (min id tie-break), never silently the
    min id; verified against a per-cluster pandas election."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from distributedcodesearchengine_ray.stages.components import connected_components

    pairs = pa.table(
        {
            "id_a": pa.array([1, 2, 10, 20], pa.int64()),
            "id_b": pa.array([2, 3, 11, 21], pa.int64()),
        }
    )
    cc = connected_components(pairs).to_pandas()
    nt = pd.DataFrame(
        {"doc_id": [1, 2, 3, 10, 11, 20, 21],
         "n_tokens": [5, 9, 9, 4, 7, 6, 6]}
    )
    m = cc.merge(nt, on="doc_id").sort_values(
        ["cluster_id", "n_tokens", "doc_id"], ascending=[True, False, True]
    )
    keeper = m.groupby("cluster_id", sort=False)["doc_id"].transform("first")
    got = dict(zip(m["doc_id"], keeper))
    # cluster {1,2,3}: 2 and 3 tie at 9 tokens -> min id 2; {10,11}: 11 longer;
    # {20,21}: tie -> 20
    assert got == {1: 2, 2: 2, 3: 2, 10: 11, 11: 11, 20: 20, 21: 20}


def test_multimodal_real_frame_sampling(ray_session):
    """REAL video frame-sampling: a concatenated-netpbm stream splits on
    actual frame headers (not byte offsets), every-Nth sampling keeps
    the right frames, each emitted frame round-trips through decode_ppm
    with its own dimensions and exact pixels, and opaque containers are
    refused on the real path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.multimodal import (
        FrameSampleStage,
        decode_ppm,
        frame_sample_ppm,
        split_ppm_stream,
    )

    rng = np.random.default_rng(7)
    frames = []
    dims = [(5, 4), (3, 7), (8, 2), (6, 6), (4, 4)]
    for w, h in dims:
        body = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        frames.append(b"P6" + f"\n{w} {h}\n255\n".encode() + body)
    stream = b"".join(frames)

    # container parse: exact frame extents, in order
    assert split_ppm_stream(stream) == frames
    assert frame_sample_ppm(stream, every=2) == frames[::2]
    # each sampled frame decodes independently with its own dims
    for fr, (w, h) in zip(frame_sample_ppm(stream, every=2), dims[::2]):
        info = decode_ppm(fr)
        assert (info["width"], info["height"]) == (w, h)

    # truncated stream is an error, not a silent short read
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated"):
        split_ppm_stream(stream[:-3])

    # the Ray stage: one video row -> sampled frame rows
    tbl = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "kind": pa.array(["video", "image"], pa.string()),
            "payload": pa.array([stream, frames[0]], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"every": 2, "use_real": True},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("frame_idx", ignore_index=True)
    )
    assert out["media_id"].tolist() == [1, 1, 1]  # image row skipped
    assert [bytes(b) for b in out["frame"]] == frames[::2]

    # opaque container refused on the real path
    stage = FrameSampleStage(every=2, use_real=True)
    with _pytest.raises(NotImplementedError, match="PyAV|ffmpeg"):
        stage._frames(b"\x00\x00\x01\xba fake mpeg")


def test_multimodal_audio_windowing(ray_session):
    """REAL PCM audio windowing: window boundaries, per-window RMS and
    zero-crossing counts must equal an independent numpy reference over
    the decoded samples; the Ray stage emits one row per window and
    skips non-audio rows."""
    import io
    import wave

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.multimodal import (
        AudioWindowStage,
        _make_wav,
        chunk_wav,
    )

    rng = np.random.default_rng(11)
    payload, n_frames, rate = _make_wav(rng)

    # independent reference
    with wave.open(io.BytesIO(payload), "rb") as w:
        data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    win = rate * 25 // 1000
    hop = rate * 12 // 1000
    got = chunk_wav(payload, 25, 12)
    exp = []
    for start in range(0, len(data), hop):
        seg = data[start : start + win].astype(np.int64)
        if len(seg) == 0:
            break
        rms = np.sqrt(np.mean(seg.astype(np.float64) ** 2))
        zc = int(np.count_nonzero(np.diff(np.signbit(seg))))
        exp.append((start * 1000 // rate, len(seg),
                    int(np.floor(rms / 32768.0 * 1000 + 0.5)), zc))
        if start + win >= len(data):
            break
    assert got == exp and len(got) >= 2

    tbl = pa.table(
        {
            "media_id": pa.array([7, 8], pa.int64()),
            "kind": pa.array(["audio", "image"], pa.string()),
            "payload": pa.array([payload, b"P6\n1 1\n255\nABC"], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            AudioWindowStage,
            fn_constructor_kwargs={"window_ms": 25, "hop_ms": 12},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("win_idx", ignore_index=True)
    )
    assert out["media_id"].unique().tolist() == [7]  # image skipped
    assert len(out) == len(exp)
    assert out["rms_milli"].tolist() == [e[2] for e in exp]
    assert out["zero_crossings"].tolist() == [e[3] for e in exp]

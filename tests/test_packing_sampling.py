"""Truth tests for the training-data layout stages: sequence packing
(distributed prefix sum), hash sampling/splitting, exact quantiles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_pack_sequences_matches_serial_prefix_sum(ray_session):
    """Bucketed two-phase prefix sum == a single-process cumsum, across
    an adversarial partitioning (ids scattered over blocks, tiny bucket
    width so many buckets exist and several are split across blocks)."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(7)
    n = 1000
    ids = rng.permutation(n * 3)[:n]  # sparse, shuffled, non-dense ids
    counts = rng.integers(1, 400, n)
    df = pd.DataFrame({"doc_id": ids, "n_tokens": counts})
    ds = rd.from_pandas(df).repartition(7)

    got = (
        pack_sequences(ds, budget=512, bucket_width=64)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    want = df.sort_values("doc_id", ignore_index=True)
    start = np.concatenate([[0], np.cumsum(want["n_tokens"].to_numpy())[:-1]])
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["start_tok"].tolist() == start.tolist()
    assert got["chunk_id"].tolist() == (start // 512).tolist()
    assert got["chunk_offset"].tolist() == (start % 512).tolist()


def test_stratified_sample_deterministic_and_rate(ray_session):
    """Same membership under different partitionings; empirical rate in
    a loose band around the target; unlisted strata fully dropped."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.sampling import (
        hash_u32,
        stratified_sample,
    )

    n = 6000
    df = pd.DataFrame(
        {"doc_id": np.arange(n), "lang": np.tile(["en", "de", "xx"], n // 3)}
    )
    rates = {"en": 0.5, "de": 0.1}

    picks = []
    for parts in (3, 11):
        ds = rd.from_pandas(df).repartition(parts)
        out = stratified_sample(ds, rates=rates).to_pandas()
        picks.append(sorted(out["doc_id"].tolist()))
    assert picks[0] == picks[1]

    out = pd.DataFrame({"doc_id": picks[0]}).merge(df, on="doc_id")
    by_lang = out["lang"].value_counts()
    assert "xx" not in by_lang
    assert abs(by_lang["en"] / (n / 3) - 0.5) < 0.05
    assert abs(by_lang["de"] / (n / 3) - 0.1) < 0.05

    # membership is exactly the integer-threshold rule
    h = hash_u32(out["doc_id"].to_numpy())
    thr = out["lang"].map({"en": 0.5, "de": 0.1}).to_numpy() * 2**32
    assert (h < np.floor(thr)).all()


def test_hash_split_fences_and_coverage(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.sampling import hash_split, hash_u32

    n = 5000
    df = pd.DataFrame({"doc_id": np.arange(n)})
    out = hash_split(rd.from_pandas(df).repartition(5)).to_pandas()
    assert len(out) == n
    pct = hash_u32(out["doc_id"].to_numpy()) % 100
    want = np.where(pct < 90, "train", np.where(pct < 95, "val", "test"))
    assert (out["split"].to_numpy() == want).all()
    share = (out["split"] == "train").mean()
    assert 0.85 < share < 0.95

    with pytest.raises(ValueError):
        hash_split(rd.from_pandas(df), fences=(("a", 50), ("b", 80)))


def test_exact_quantiles_match_numpy_rank(ray_session):
    """Histogram-CDF quantiles == sorting the column and indexing at
    rank ceil(q*N) (DuckDB quantile_disc semantics), duplicates heavy."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.sketch import exact_quantiles

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 40, 3000)  # heavy duplication
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(9)
    qs = (0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    got = exact_quantiles(ds, qs=qs, value_col="v").to_pandas()

    svals = np.sort(vals)
    for q, val in zip(qs, got["value"]):
        rank = max(1, int(np.ceil(q * len(svals))))
        assert val == svals[rank - 1], q


def test_clean_text_kernels(ray_session):
    """URL/e-mail strip, lowercase, whitespace collapse, null safety."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.text_stats import clean_text

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "Visit https://Example.COM/x?a=1 NOW",
                "mail Me at Bob@example.org  \t twice\n\nplease",
                None,
                "  just   spaces  ",
            ],
        }
    )
    out = (
        rd.from_pandas(df)
        .map_batches(clean_text, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["clean_text"].tolist() == [
        "visit now",
        "mail me at twice please",
        "",
        "just spaces",
    ]


def _winnow_py(text, k=5, window=4):
    """Independent scalar winnowing oracle (mirrors the one in
    test_driver_contract)."""
    data = (text or "").encode("utf-8", "replace")
    if len(data) < k:
        h = pd.util.hash_array(np.asarray([text or ""], dtype=object)).astype("uint64")
        return {int(h[0])}
    M = 1 << 64
    hs = []
    for i in range(len(data) - k + 1):
        h = 0
        for byte in data[i : i + k]:
            h = (h * 257 + byte) % M
        hs.append(h)
    if len(hs) <= window:
        return {min(hs)}
    return {min(hs[i : i + window]) for i in range(len(hs) - window + 1)}


def test_clone_pairs_match_bruteforce(ray_session):
    """Distributed fingerprint join == all-pairs set intersection over the
    independent scalar oracle, including the df noise filter and both
    thresholds.  Corpus: clone families (shuffled/edited copies), unrelated
    docs, and a boilerplate line shared by EVERYONE (df-filter fodder)."""
    import itertools

    import ray.data as rd

    from distributedcodesearchengine_ray.stages.clones import fingerprint_clone_pairs

    rng = np.random.default_rng(11)
    boiler = "copyright license header common to all files"
    docs = []
    for fam in range(6):  # clone families of 3: base, reordered, edited
        # per-family vocabulary of random letter strings: every char 5-gram
        # is family-specific, so family fingerprints have df ~3 (inside the
        # [2, max_fp_df] informative window), while the boilerplate prefix
        # (df = every doc) exercises the upper cut
        vocab = [
            "".join(chr(97 + c) for c in rng.integers(0, 26, 8))
            for _ in range(13)
        ]
        words = [vocab[int(w)] for w in rng.integers(0, 13, 40)]
        base = " ".join(words)
        reordered = " ".join(words[20:] + words[:20])
        edited = " ".join(words[:35] + ["extra", "tail", "tokens"])
        docs += [boiler + " " + d for d in (base, reordered, edited)]
    for i in range(12):  # unrelated
        docs.append(boiler + " " + " ".join(
            f"unique{i}x{j}" for j in range(30)))
    df = pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})

    got = (
        fingerprint_clone_pairs(
            rd.from_pandas(df).repartition(5),
            min_shared=3, min_containment=0.5, max_fp_df=10,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )

    # brute force with the same semantics
    sets = {i: _winnow_py(t) for i, t in zip(df["doc_id"], df["text"])}
    dfreq = {}
    for s in sets.values():
        for f in s:
            dfreq[f] = dfreq.get(f, 0) + 1
    informative = {f for f, c in dfreq.items() if 2 <= c <= 10}
    want = []
    for a, b in itertools.combinations(df["doc_id"], 2):
        shared = len((sets[a] & sets[b]) & informative)
        if shared >= 3 and shared / min(len(sets[a]), len(sets[b])) >= 0.5:
            want.append((a, b, shared))
    want.sort()
    assert [(r.id_a, r.id_b, r.shared) for r in got.itertuples()] == want
    assert len(want) >= 6  # every family's 3 pairs should largely survive


def test_chunk_sliding_windows_matches_serial(ray_session):
    """Vectorized sliding-window chunker == a per-doc Python loop, over
    empty / 1-token / exact-window / window+1 / long docs and an
    adversarial multi-block partitioning."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.packing import chunk_sliding_windows

    rng = np.random.default_rng(11)
    texts = ["", "a", " ".join(f"t{i}" for i in range(32)),
             " ".join(f"t{i}" for i in range(33)), "  \n\t  "]
    texts += [" ".join(f"w{rng.integers(0, 50)}" for _ in range(rng.integers(0, 90)))
              for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})

    got = (
        rd.from_pandas(df)
        .repartition(6)
        .map_batches(chunk_sliding_windows, batch_format="pyarrow",
                     fn_kwargs=dict(window=16, stride=12))
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    )

    want = []
    for d, t in zip(df["doc_id"], df["text"]):
        toks, s, i = t.split(), 0, 0
        while s < len(toks):
            w = toks[s:s + 16]
            want.append((d, i, s, len(w), " ".join(w)))
            s += 12
            i += 1
    assert list(got.itertuples(index=False, name=None)) == want
    assert got["n_tok"].max() <= 16 and len(want) > 60


def test_token_budget_select_matches_window(ray_session):
    """Histogram-threshold + cutoff-prefix selection == the SQL window
    SUM() OVER (ORDER BY score DESC, id ASC) <= budget, across heavy
    score ties, shuffled multi-block partitioning, and edge budgets."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.selection import token_budget_select

    rng = np.random.default_rng(3)
    n = 800
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(n * 2)[:n],
            "score": rng.integers(0, 12, n),  # heavy ties -> big cutoff group
            "n_tokens": rng.integers(1, 50, n),
        }
    )

    def serial(frac_num, frac_den):
        budget = int(df["n_tokens"].sum()) * frac_num // frac_den
        w = df.sort_values(["score", "doc_id"], ascending=[False, True])
        cum = w["n_tokens"].cumsum()
        return set(w.loc[cum <= budget, "doc_id"])

    for num, den in [(3, 10), (1, 100), (999, 1000), (1, 1)]:
        ds = rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(7)
        got = token_budget_select(ds, num, den).to_pandas()
        assert set(got["doc_id"]) == serial(num, den), (num, den)
        m = got.merge(df, on="doc_id", suffixes=("", "_w"))
        assert (m["n_tokens"] == m["n_tokens_w"]).all()


def test_temperature_sample_exact_and_edges(ray_session):
    """temperature_sample: exact integer targets and membership vs a
    brute-force pandas reference on a skewed two-stratum table —
    including the select-all stratum (target clamps at n) and the
    zero-budget path."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.sampling import (
        hash_u32,
        temperature_sample,
    )

    df = pd.DataFrame(
        {
            "doc_id": np.arange(104, dtype=np.int64),
            "lang": ["big"] * 100 + ["tiny"] * 4,
        }
    )
    ds = rd.from_pandas(df).repartition(6)

    out = temperature_sample(ds, 9, 10).to_pandas().set_index("lang")

    # brute-force reference with identical integer semantics
    n = df.groupby("lang")["doc_id"].size()
    w = {s: int(np.floor(np.sqrt(float(n[s])) * 1_000_000 + 0.5)) for s in n.index}
    T = int(n.sum()) * 9 // 10
    W = sum(w.values())
    for s in n.index:
        tgt = min(int(n[s]), T * w[s] // W)
        sub = df[df["lang"] == s].copy()
        sub["h"] = hash_u32(sub["doc_id"].to_numpy())
        sel = sub.sort_values(["h", "doc_id"]).head(tgt)
        assert int(out.loc[s, "target"]) == tgt
        assert int(out.loc[s, "n_selected"]) == tgt
        assert int(out.loc[s, "sel_id_sum"]) == int(sel["doc_id"].sum())
    # the sqrt weighting upsamples the tail: tiny keeps ALL its rows
    assert int(out.loc["tiny", "n_selected"]) == 4  # select-all clamp

    # zero budget: every stratum selects nothing
    zero = temperature_sample(ds, 0, 1).to_pandas()
    assert zero["target"].tolist() == [0, 0]
    assert zero["n_selected"].tolist() == [0, 0]
    assert zero["sel_id_sum"].tolist() == [0, 0]

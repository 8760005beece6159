"""BPE training + encoding vs a naive reference implementation."""

import re
from collections import Counter

import pyarrow as pa


def _naive_learn(texts, n_merges):
    """Recount-from-scratch reference trainer (no incremental index)."""
    wc = Counter(w for t in texts for w in re.split(r"\s+", t.lower()) if w)
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for w, syms in words.items():
            for p in zip(syms[:-1], syms[1:]):
                stats[p] += wc[w]
        if not stats:
            break
        best_n = max(stats.values())
        if best_n < 2:
            break
        best = min(p for p, c in stats.items() if c == best_n)
        merges.append(best)
        joined = best[0] + best[1]
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _naive_encode(word, merges):
    syms = list(word)
    for a, b in merges:  # apply merges in learned order
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "the quick brown fox the the",
    "ab ab ab abc abcd",
    "",
    "xyz",
    "aaaa aaaa aa",  # overlapping-pair edge
]


def test_learn_bpe_matches_naive(ray_session):
    import ray

    from distributedcodesearchengine_ray.stages.bpe import learn_bpe, word_counts

    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    )
    wc = word_counts(ds).sort_values("word", ignore_index=True)
    exp_wc = Counter(w for t in TEXTS for w in re.split(r"\s+", t.lower()) if w)
    assert dict(zip(wc["word"], wc["c"])) == dict(exp_wc)

    merges = learn_bpe(wc, 30)
    assert merges == _naive_learn(TEXTS, 30)
    assert len(merges) >= 5  # actually learned something


def test_bpe_encoder_counts_match_naive(ray_session):
    import ray

    from distributedcodesearchengine_ray.stages.bpe import train_and_count

    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    )
    merges, counted = train_and_count(ds, n_merges=30, concurrency=2)
    got = counted.to_pandas().sort_values("doc_id", ignore_index=True)
    for i, t in enumerate(TEXTS):
        words = [w for w in re.split(r"\s+", t.lower()) if w]
        exp_bpe = sum(len(_naive_encode(w, merges)) for w in words)
        assert got.loc[i, "ws_tokens"] == len(words)
        assert got.loc[i, "bpe_tokens"] == exp_bpe, f"doc {i}"


def test_encode_word_rank_order_equals_sequential_merges():
    """Greedy-by-rank encoding equals applying merges sequentially (they
    coincide for merge lists produced by training on the same corpus)."""
    from distributedcodesearchengine_ray.stages.bpe import encode_word

    merges = _naive_learn(TEXTS, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in {w for t in TEXTS for w in re.split(r"\s+", t.lower()) if w}:
        assert encode_word(w, ranks) == _naive_encode(w, merges), w

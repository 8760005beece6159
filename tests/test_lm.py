"""Bigram-LM training + perplexity scoring vs a brute-force Python oracle."""

import math
import re
from collections import Counter

import pyarrow as pa


def _brute(docs, model_bigrams=None, model_lefts=None, vocab=None):
    """Pure-Python reference: add-one bigram model trained on `docs`
    (or supplied counts), scored per doc in milli-nats."""
    pairs_per_doc = []
    for text in docs:
        toks = [w for w in re.split(r"\s+", text.lower()) if w]
        pairs_per_doc.append(list(zip(toks[:-1], toks[1:])))
    if model_bigrams is None:
        model_bigrams = Counter(p for ps in pairs_per_doc for p in ps)
        model_lefts = Counter(w1 for ps in pairs_per_doc for (w1, _) in ps)
        vocab = len({w for text in docs for w in re.split(r"\s+", text.lower()) if w})
    out = []
    for ps in pairs_per_doc:
        ll = 0
        for w1, w2 in ps:
            p = (model_bigrams.get((w1, w2), 0) + 1.0) / (model_lefts.get(w1, 0) + vocab)
            ll += math.floor(math.log(p) * 1000.0 + 0.5)
        out.append((len(ps), ll))
    return out


DOCS = [
    "the cat sat on the mat",
    "the cat sat on the cat",
    "",  # empty -> (0, 0)
    "single",  # one token, no pairs
    "a a a a a a a a",  # degenerate repetition
    "completely unseen words zzz qqq",
    "The CAT\tsat\n on the MAT",  # case + whitespace variants
]


def test_perplexity_profile_matches_bruteforce(ray_session):
    import ray

    from distributedcodesearchengine_ray.stages.lm import perplexity_profile

    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS})
    )
    got = perplexity_profile(ds, concurrency=2).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    exp = _brute(DOCS)
    assert got["n_pairs"].tolist() == [n for n, _ in exp]
    assert got["ll_milli"].tolist() == [ll for _, ll in exp]


def test_bigram_cap_logs_and_scores_as_unseen(ray_session, caplog):
    import logging

    import ray

    from distributedcodesearchengine_ray.stages.lm import (
        BigramScorer,
        train_bigram_lm,
    )

    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS})
    )
    with caplog.at_level(logging.WARNING):
        model = train_bigram_lm(ds, max_bigrams=3)
    assert len(model["bigrams"]) == 3
    assert any("capped" in r.message for r in caplog.records)
    # kept entries are the most frequent; ties broken (w1, w2) ascending
    full = train_bigram_lm(ds)
    top3 = full["bigrams"].sort_values(
        ["c2", "w1", "w2"], ascending=[False, True, True]
    ).head(3)
    assert sorted(map(tuple, model["bigrams"][["w1", "w2"]].to_numpy())) == sorted(
        map(tuple, top3[["w1", "w2"]].to_numpy())
    )
    # capped model scores every doc, with dropped bigrams as smoothed-unseen
    scorer = BigramScorer(model)
    out = scorer(pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS})).to_pandas()
    mb = Counter(
        {(r.w1, r.w2): int(r.c2) for r in model["bigrams"].itertuples()}
    )
    ml = Counter({r.w1: int(r.c1) for r in model["lefts"].itertuples()})
    exp = _brute(DOCS, model_bigrams=mb, model_lefts=ml, vocab=model["vocab_size"])
    assert out["ll_milli"].tolist() == [ll for _, ll in exp]

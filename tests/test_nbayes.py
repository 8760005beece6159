"""Naive Bayes training/scoring vs a from-scratch reference, incl. the
unseen-term fallback the SQL oracle can't exercise (self-scoring has no
unseen tokens)."""

import math
import re
from collections import Counter, defaultdict

import pyarrow as pa

DOCS = [
    ("spam", "buy cheap pills now buy now"),
    ("spam", "cheap pills cheap deals"),
    ("ham", "meeting notes for the project review"),
    ("ham", "project review notes and action items"),
    ("ham", "the quick brown fox"),
    ("spam", ""),  # empty doc -> prior-only score
]


def _toks(t):
    return [w for w in re.split(r"\s+", t.lower()) if w]


def _naive_model(docs):
    ct = defaultdict(Counter)
    dc = Counter()
    vocab = set()
    for c, t in docs:
        dc[c] += 1
        for w in _toks(t):
            ct[c][w] += 1
            vocab.add(w)
    v = len(vocab)
    n = sum(dc.values())
    classes = sorted(dc)
    prior = {c: math.floor(math.log(dc[c] * 1.0 / n) * 1000 + 0.5) for c in classes}
    tot = {c: sum(ct[c].values()) for c in classes}
    def ll(term, c):
        return math.floor(math.log((ct[c].get(term, 0) + 1.0) / (tot[c] + v)) * 1000 + 0.5)
    return classes, prior, ll


def _naive_score(text, classes, prior, ll):
    best, best_s = None, None
    for c in classes:  # ascending -> first max wins ties
        s = prior[c] + sum(ll(w, c) for w in _toks(text))
        if best_s is None or s > best_s:
            best, best_s = c, s
    return best, best_s


def test_nb_classify_matches_naive(ray_session):
    import ray

    from distributedcodesearchengine_ray.stages.nbayes import classify

    t = pa.table(
        {
            "doc_id": list(range(len(DOCS))),
            "source": [c for c, _ in DOCS],
            "text": [x for _, x in DOCS],
        }
    )
    got = (
        classify(ray.data.from_arrow(t), label_col="source", concurrency=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    classes, prior, ll = _naive_model(DOCS)
    for i, (_, text) in enumerate(DOCS):
        exp_pred, exp_score = _naive_score(text, classes, prior, ll)
        assert got.loc[i, "pred"] == exp_pred, f"doc {i}"
        assert got.loc[i, "score_milli"] == exp_score, f"doc {i}"


def test_nb_scorer_unseen_terms(ray_session):
    from distributedcodesearchengine_ray.stages.nbayes import NBScorer, train_nb
    import ray

    t = pa.table(
        {
            "doc_id": list(range(len(DOCS))),
            "source": [c for c, _ in DOCS],
            "text": [x for _, x in DOCS],
        }
    )
    model = train_nb(ray.data.from_arrow(t), label_col="source")
    scorer = NBScorer(model)
    out = scorer(
        pa.table({"doc_id": [0, 1], "text": ["zzz qqq unseen words", "cheap zzz pills"]})
    ).to_pandas()
    classes, prior, ll = _naive_model(DOCS)
    v = len(model["terms"])
    tot = {c: 0 for c in classes}
    for c, text in DOCS:
        tot[c] += len(_toks(text))
    def full_ll(w, c):
        known = w in model["terms"]
        num = ll(w, c) if known else math.floor(
            math.log(1.0 / (tot[c] + v)) * 1000 + 0.5
        )
        return num
    for row, text in zip(out.itertuples(), ["zzz qqq unseen words", "cheap zzz pills"]):
        best, best_s = None, None
        for c in classes:
            s = prior[c] + sum(full_ll(w, c) for w in _toks(text))
            if best_s is None or s > best_s:
                best, best_s = c, s
        assert row.pred == best and row.score_milli == best_s

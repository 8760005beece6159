"""DSIR importance weights vs a brute-force Python oracle, including
the unseen-token fallback path (scoring a corpus the model never saw)."""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = [
    (0, "en", "the quick brown fox jumps over the lazy dog"),
    (1, "en", "the data pipeline streams the batches"),
    (2, "de", "der schnelle braune fuchs springt"),
    (3, "zh", "shu ju liu shui xian"),
    (4, "en", ""),  # empty -> weight 0
    (5, "de", "der der der the the"),  # mixed-domain tokens
]


def _milli(x: float) -> int:
    return int(math.floor(math.log(x) * 1000.0 + 0.5))


def _oracle():
    from collections import Counter

    raw, tgt = Counter(), Counter()
    for _, lang, text in DOCS:
        toks = [w for w in text.lower().split() if w]
        raw.update(toks)
        if lang == "en":
            tgt.update(toks)
    v = len(raw)
    t_raw, t_tgt = sum(raw.values()), sum(tgt.values())

    def ratio(tok: str) -> int:
        return _milli((tgt.get(tok, 0) + 1.0) / (t_tgt + v)) - _milli(
            (raw.get(tok, 0) + 1.0) / (t_raw + v)
        )

    out = {}
    for did, _, text in DOCS:
        toks = [w for w in text.lower().split() if w]
        out[did] = (len(toks), sum(ratio(w) for w in toks))
    return out, ratio, v, t_raw, t_tgt


def _ds():
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _, _ in DOCS], pa.int64()),
                "lang": pa.array([l for _, l, _ in DOCS], pa.string()),
                "text": pa.array([t for _, _, t in DOCS], pa.string()),
            }
        )
    ).repartition(3)


def _make_is_target():
    # Returned as a closure so cloudpickle ships it by VALUE — a
    # module-level function here would pickle by reference to the
    # test module, which Ray workers cannot import.
    def is_target(t):
        import pyarrow.compute as pc

        return pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)

    return is_target


_is_target = _make_is_target()


def test_dsir_weights_match_bruteforce(ray_session):
    from distributedcodesearchengine_ray.stages.dsir import dsir_weights

    truth, _, _, _, _ = _oracle()
    out = (
        dsir_weights(_ds(), _is_target)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    for did, n, w in zip(out["doc_id"], out["n_tokens"], out["dsir_milli"]):
        assert (int(n), int(w)) == truth[did], did


def test_dsir_unseen_token_fallback(ray_session):
    """Score a corpus containing tokens the model never saw: each unseen
    token contributes the smoothed zero-count ratio."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.dsir import (
        DSIRScorer,
        train_ratio_model,
    )

    _, ratio_fn, v, t_raw, t_tgt = _oracle()
    model = train_ratio_model(_ds(), _is_target)
    unseen_expected = _milli(1.0 / (t_tgt + v)) - _milli(1.0 / (t_raw + v))
    assert model["unseen"] == unseen_expected

    new = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100], pa.int64()),
                "text": pa.array(["the zzz_never_seen dog"], pa.string()),
            }
        )
    )
    scored = new.map_batches(
        DSIRScorer,
        fn_constructor_kwargs={"model_ref": ray.put(model)},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    expected = ratio_fn("the") + unseen_expected + ratio_fn("dog")
    assert int(scored["dsir_milli"].iloc[0]) == expected
    assert int(scored["n_tokens"].iloc[0]) == 3


def test_dsir_target_docs_score_higher(ray_session):
    """Sanity: distinctly-target-language docs outscore non-target ones
    per token (the selection property the operator exists for)."""
    from distributedcodesearchengine_ray.stages.dsir import dsir_weights

    out = (
        dsir_weights(_ds(), _is_target)
        .to_pandas()
        .set_index("doc_id")
    )
    per_tok = out["dsir_milli"] / out["n_tokens"].clip(lower=1)
    assert per_tok.loc[1] > per_tok.loc[3]  # en doc >> zh doc

"""TF-IDF keywords, PMI co-occurrence, and Gumbel-top-k DSIR selection
vs brute-force Python oracles."""

import math
import os
import sys
from collections import Counter

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = [
    (0, "en", "data pipeline streams data batches over data"),
    (1, "en", "the quick brown fox jumps over the lazy dog"),
    (2, "en", "pipeline of streams and batches and streams"),
    (3, "de", "der schnelle braune fuchs springt"),
    (4, "en", ""),
    (5, "en", "data data data dog dog fox"),
    (6, "en", "streams pipeline data fox"),
]


def _milli(x: float) -> int:
    return int(math.floor(math.log(x) * 1000.0 + 0.5))


def _tok(text: str):
    return [w for w in text.lower().split() if w]


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


def _df_oracle():
    df = Counter()
    for _, _, text in DOCS:
        df.update(set(_tok(text)))
    return df


def test_tfidf_keywords_match_bruteforce(ray_session):
    from distributedcodesearchengine_ray.stages.tfidf import tfidf_keywords

    n = len(DOCS)
    df = _df_oracle()
    idf = {t: _milli((n + 1.0) / (c + 1.0)) for t, c in df.items()}
    expected = {}
    for did, _, text in DOCS:
        tf = Counter(_tok(text))
        scored = sorted(
            ((t, c, c * idf[t]) for t, c in tf.items()),
            key=lambda x: (-x[2], x[0]),
        )[:3]
        expected[did] = [(r + 1, t, c, s) for r, (t, c, s) in enumerate(scored)]

    out = (
        tfidf_keywords(_ds(), k=3)
        .to_pandas()
        .sort_values(["doc_id", "kw_rank"], ignore_index=True)
    )
    got = {}
    for row in out.itertuples(index=False):
        got.setdefault(int(row.doc_id), []).append(
            (int(row.kw_rank), row.term, int(row.tf), int(row.score_milli))
        )
    for did, _, text in DOCS:
        assert got.get(did, []) == expected[did], did


def test_term_cooccurrence_match_bruteforce(ray_session):
    from distributedcodesearchengine_ray.stages.tfidf import term_cooccurrence

    n = len(DOCS)
    df = _df_oracle()
    top = sorted(df.items(), key=lambda x: (-x[1], x[0]))[:5]
    vocab = {t for t, _ in top}
    vdf = dict(top)
    pair_ct = Counter()
    for _, _, text in DOCS:
        present = sorted(set(_tok(text)) & vocab)
        for i in range(len(present)):
            for j in range(i + 1, len(present)):
                pair_ct[(present[i], present[j])] += 1
    exp = []
    for (a, b), c in pair_ct.items():
        if c >= 2:
            exp.append((a, b, c, _milli(n * c / (vdf[a] * vdf[b]))))
    exp.sort(key=lambda x: (-x[3], x[0], x[1]))

    out = term_cooccurrence(_ds(), vocab_size=5, min_count=2, top_n=50).to_pandas()
    got = list(
        zip(out["term_a"], out["term_b"], map(int, out["n_ab"]), map(int, out["pmi_milli"]))
    )
    assert got == exp


def test_gumbel_topk_matches_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.selection import (
        gumbel_milli,
        gumbel_topk,
    )

    ids = np.arange(40, dtype=np.int64)
    w = (ids * 37 % 11).astype(np.int64) * 100
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "dsir_milli": pa.array(w)})
    ).repartition(4)

    g = gumbel_milli(ids, "s7")
    key = w + g
    order = np.lexsort((ids, -key))[:10]

    out = gumbel_topk(ds, 10, seed="s7").to_pandas()
    assert out["doc_id"].tolist() == ids[order].tolist()
    assert out["key_milli"].tolist() == key[order].tolist()
    assert out["rank"].tolist() == list(range(10))
    # deterministic: second run identical
    out2 = gumbel_topk(ds, 10, seed="s7").to_pandas()
    assert out.equals(out2)
    # a different seed reorders (not a constant permutation)
    out3 = gumbel_topk(ds, 10, seed="other").to_pandas()
    assert out3["doc_id"].tolist() != out["doc_id"].tolist()


def test_gumbel_sql_twin_bit_identical():
    """The SQL expression builds the SAME doubles from the same md5
    digits — bit-identical milli-nat Gumbel keys (no Ray needed)."""
    import duckdb

    from distributedcodesearchengine_ray.stages.selection import (
        gumbel_milli,
        gumbel_sql_expr,
    )

    ids = np.arange(0, 2000, dtype=np.int64)
    g = gumbel_milli(ids, "s0")
    e = (
        duckdb.connect()
        .execute(
            f"SELECT {gumbel_sql_expr('i', 's0')} AS g FROM range(0,2000) t(i) ORDER BY i"
        )
        .df()["g"]
        .to_numpy()
    )
    assert (g == e).all()


def test_dsir_select_end_to_end(ray_session):
    """dsir_select = dsir_weights + gumbel_topk, composed."""
    from distributedcodesearchengine_ray.stages.dsir import dsir_weights
    from distributedcodesearchengine_ray.stages.selection import (
        dsir_select,
        gumbel_milli,
    )

    def make():
        def is_target(t):
            import pyarrow.compute as pc

            return pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)

        return is_target

    is_target = make()
    w = (
        dsir_weights(_ds(), is_target)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    key = w["dsir_milli"].to_numpy(np.int64) + gumbel_milli(
        w["doc_id"].to_numpy(np.int64), "s1"
    )
    order = np.lexsort((w["doc_id"].to_numpy(), -key))[:4]

    out = dsir_select(_ds(), is_target, 4, seed="s1").to_pandas()
    assert out["doc_id"].tolist() == w["doc_id"].to_numpy()[order].tolist()
    assert out["key_milli"].tolist() == key[order].tolist()

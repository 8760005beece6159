"""Duplicate-span detection (stages/spans.py) — exact-substring dedup
shape of Lee et al. 2022 over fixed-width token windows.

Truth model: brute-force span extraction with EXACT STRING grouping (the
engine groups by a 64-bit rolling hash; equality here also proves the
hash introduces no collisions on these fixtures).
"""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from distributedcodesearchengine_ray.stages.spans import dup_span_stats, span_hash_rows


def _brute(texts, ids, width):
    occurrences = Counter()
    per_doc_spans = Counter()
    locs = []
    for d, s in zip(ids, texts):
        toks = [w for w in (s or "").split() if w]
        for i in range(max(0, len(toks) - width + 1)):
            span = " ".join(toks[i : i + width])
            occurrences[span] += 1
            per_doc_spans[d] += 1
            locs.append((d, span))
    per_doc_dups = Counter()
    for d, span in locs:
        if occurrences[span] >= 2:
            per_doc_dups[d] += 1
    return per_doc_spans, per_doc_dups


CORPUS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "prefix the quick brown fox jumps over the lazy dog suffix",  # shares 8-grams with 0
    "completely unrelated text with eight tokens here",  # exactly 8 tokens, unique
    "short doc",  # < width -> 0 spans
    "",  # empty
    "rep rep rep rep rep rep rep rep rep rep",  # self-repetition duplicates
    "the quick brown fox jumps over the lazy dog again and again",  # exact dup of 0
]


@pytest.mark.parametrize("width", [4, 8])
def test_dup_span_stats_matches_bruteforce(ray_session, width):
    import ray

    ids = list(range(len(CORPUS)))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(CORPUS)})
    ).repartition(3)
    out = dup_span_stats(ds, width=width).to_pandas().sort_values("doc_id")
    spans_t, dups_t = _brute(CORPUS, ids, width)
    got_spans = dict(zip(out["doc_id"], out["n_spans"]))
    got_dups = dict(zip(out["doc_id"], out["n_dup_spans"]))
    for d in ids:
        assert got_spans.get(d, 0) == spans_t.get(d, 0), (d, "n_spans")
        assert got_dups.get(d, 0) == dups_t.get(d, 0), (d, "n_dup_spans")
    # sanity: the planted structures actually exercised the operator
    assert got_dups[0] > 0 and got_dups[1] > 0 and got_dups[5] > 0
    assert got_dups[2] == 0 and got_spans[3] == 0


def test_span_hash_rows_partitioning_invariance(ray_session):
    """Same totals whether spans come from one batch or many."""
    ids = list(range(len(CORPUS)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(CORPUS)})
    whole = span_hash_rows(t, 8).to_pandas()
    parts = pd.concat(
        [span_hash_rows(t.slice(i, 2), 8).to_pandas() for i in range(0, len(CORPUS), 2)]
    )
    w = whole.groupby("h")["cnt"].sum().sort_index()
    p = parts.groupby("h")["cnt"].sum().sort_index()
    assert w.equals(p)


def test_dup_span_stats_vs_sql_oracle(ray_session, tmp_path):
    """End-to-end equality with the DuckDB oracle over a synthetic table
    shaped like the driver's documents table."""
    import duckdb
    import ray

    from distributedcodesearchengine_ray.pipelines.queries import (
        DUP_SPAN_WIDTH,
        build_oracle_sql,
        dup_spans,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40))) for _ in range(120)]
    # plant near-dups: shared long runs
    texts[5] = texts[3] + " tail"
    texts[9] = "lead " + texts[3]
    doc_ids = np.arange(len(texts), dtype=np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = dup_spans(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(build_oracle_sql()["dup_spans"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"),
        want.reset_index(drop=True).astype("int64"),
    )
    assert DUP_SPAN_WIDTH >= 2
    assert (got["n_dup_spans"] > 0).any()

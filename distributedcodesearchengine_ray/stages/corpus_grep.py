"""grep over the code corpus: trigram index + line-level verification.

Applies the trigram machinery (``stages/trigram.py``, Cox's Google Code
Search construction) to the engine's corpus parquet — the reference
engine (/root/reference/codesearch) answers only tokenized BM25 queries;
this adds exact grep/regex over raw file CONTENT as a CLI surface
(``cli.py grep``).

Doc identity: the corpus is a directory of parquet shards with no id
column, so doc_id = fragment row offset (prefix sum of per-fragment
``num_rows`` read from parquet METADATA — no data scan) + the row's
ordinal inside its fragment.  Fragment order is the sorted file list,
deterministic across runs.  Candidate doc ids map back to (fragment,
local row) by the same offsets, so verification reads only the
fragments that contain candidates and only their (repo, path, content)
columns.

Scale: extraction is one streaming pass (fragment specs -> load ->
``build_trigram_index``'s bucketed posting exchange); verification is
one task per candidate-bearing fragment.  A pattern with no usable
trigram (no >=3-byte required literal) degrades to a distributed
full scan over all fragments — the same cost grep itself pays.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .trigram import (
    _case_variant_groups,
    _explode_lines,
    build_trigram_index,
    candidate_ids,
    candidate_ids_groups,
    required_literals,
    string_trigrams,
)

FRAG_MANIFEST = "frag_manifest.json"


def corpus_fragments(corpus_dir: str) -> List[Dict]:
    """[{path, offset, num_rows}] in deterministic (sorted-path) order;
    row counts come from parquet footers only."""
    paths = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )
    frags, off = [], 0
    for p in paths:
        n = pq.ParquetFile(p).metadata.num_rows
        frags.append({"path": p, "offset": off, "num_rows": n})
        off += n
    return frags


def _corpus_signature(frags: List[Dict]) -> Dict:
    return {
        "n_fragments": len(frags),
        "total_rows": sum(f["num_rows"] for f in frags),
        "bytes": sum(os.path.getsize(f["path"]) for f in frags),
    }


def build_corpus_trigram_index(
    corpus_dir: str,
    index_dir: str,
    *,
    n_buckets: int = 16,
    text_col: str = "content",
) -> Dict:
    """Build (or refresh) the corpus trigram index under ``index_dir``.

    Skipped when the stored corpus signature (fragment count / rows /
    bytes) already matches — `cli grep` calls this unconditionally.
    """
    import ray.data as rd

    frags = corpus_fragments(corpus_dir)
    sig = _corpus_signature(frags)
    man_path = os.path.join(index_dir, FRAG_MANIFEST)
    if os.path.exists(man_path) and os.path.exists(
        os.path.join(index_dir, "tri_manifest.json")
    ):
        with open(man_path) as f:
            if json.load(f).get("signature") == sig:
                return sig
    os.makedirs(index_dir, exist_ok=True)

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for path, offset in zip(
            batch["path"].to_pylist(), batch["offset"].to_pylist()
        ):
            t = pq.read_table(path, columns=[text_col])
            n = t.num_rows
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(
                            np.arange(offset, offset + n, dtype=np.int64)
                        ),
                        "text": t[text_col],
                    }
                )
            )
        return pa.concat_tables(out)

    ds = rd.from_items(
        [{"path": f["path"], "offset": f["offset"]} for f in frags]
    ).map_batches(load, batch_size=1, batch_format="pyarrow")
    build_trigram_index(ds, index_dir, n_buckets=n_buckets)
    with open(man_path, "w") as f:
        json.dump({"signature": sig, "fragments": frags}, f)
    return sig


def _load_fragments(index_dir: str) -> List[Dict]:
    with open(os.path.join(index_dir, FRAG_MANIFEST)) as f:
        return json.load(f)["fragments"]


def _plan_candidates(
    index_dir: str, needle: str, *, regex: bool, ignore_case: bool
) -> Optional[np.ndarray]:
    """Candidate doc ids, or None when the index cannot prune."""
    if regex:
        pattern = f"(?i){needle}" if ignore_case else needle
        codes: List[int] = []
        for lit in required_literals(pattern):
            codes.extend(string_trigrams(lit))
        return candidate_ids(index_dir, codes) if codes else None
    if ignore_case:
        groups = _case_variant_groups(needle)
        return candidate_ids_groups(index_dir, groups) if groups else None
    codes = string_trigrams(needle)
    return candidate_ids(index_dir, codes) if codes else None


def corpus_grep(
    index_dir: str,
    corpus_dir: str,
    needle: str,
    *,
    regex: bool = False,
    ignore_case: bool = False,
    text_col: str = "content",
    meta_cols: Tuple[str, ...] = ("repo", "path"),
) -> pa.Table:
    """Line-level grep: (repo, path, line_no, line) for every corpus line
    matching the needle/pattern (grep semantics: the match must sit
    inside one line)."""
    import ray.data as rd

    cand = _plan_candidates(index_dir, needle, regex=regex, ignore_case=ignore_case)
    frags = _load_fragments(index_dir)

    if regex:
        pattern = f"(?i){needle}" if ignore_case else needle
        matcher = lambda col: pc.match_substring_regex(col, pattern)  # noqa: E731
    else:
        matcher = lambda col: pc.match_substring(  # noqa: E731
            col, needle, ignore_case=ignore_case
        )

    empty = pa.table(
        {
            **{c: pa.array([], pa.string()) for c in meta_cols},
            "line_no": pa.array([], pa.int64()),
            "line": pa.array([], pa.string()),
        }
    )

    # fragment work list: every fragment (full scan) or only those
    # holding candidates, each with its candidate LOCAL row ordinals
    specs = []
    if cand is None:
        specs = [
            {"path": f["path"], "local_rows": None} for f in frags
        ]
    else:
        if cand.size == 0:
            return empty
        offsets = np.array([f["offset"] for f in frags], np.int64)
        ends = offsets + np.array([f["num_rows"] for f in frags], np.int64)
        fi = np.searchsorted(ends, cand, side="right")
        for i in np.unique(fi):
            local = (cand[fi == i] - offsets[i]).tolist()
            specs.append({"path": frags[i]["path"], "local_rows": local})

    def scan(batch: pa.Table) -> pa.Table:
        out = []
        for path, local in zip(
            batch["path"].to_pylist(), batch["local_rows"].to_pylist()
        ):
            t = pq.read_table(path, columns=[*meta_cols, text_col])
            if local is not None:
                t = t.take(pa.array(local, pa.int64()))
            ex = _explode_lines(
                t.append_column(
                    "_rid", pa.array(np.arange(t.num_rows, dtype=np.int64))
                ),
                id_col="_rid",
                text_col=text_col,
            )
            hit = ex.filter(matcher(ex["line"]))
            if hit.num_rows == 0:
                continue
            meta = t.select(list(meta_cols)).take(hit["_rid"])
            out.append(
                pa.table(
                    {
                        **{c: meta[c] for c in meta_cols},
                        "line_no": hit["line_no"],
                        "line": hit["line"],
                    }
                )
            )
        return pa.concat_tables(out) if out else empty

    import ray

    parts = [
        ray.get(r)
        for r in rd.from_items(specs)
        .map_batches(scan, batch_size=1, batch_format="pyarrow")
        .to_arrow_refs()
    ]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    out = pa.concat_tables(parts)
    return out.sort_by(
        [(c, "ascending") for c in meta_cols] + [("line_no", "ascending")]
    )

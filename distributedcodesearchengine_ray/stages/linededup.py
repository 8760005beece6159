"""Corpus-wide line deduplication (the CCNet paragraph-dedup shape,
Wenzek et al. 2020): every distinct line survives exactly once across
the WHOLE corpus — in the document where it first appears (smallest
(doc_id, line_idx)) — and is removed from every other document.  The
standard web-corpus cleanup for boilerplate (headers, nav bars, license
blocks) that per-document quality filters cannot see.

Distributed shape:

- explode: one vectorized ``map_batches`` pass — Arrow ``split_pattern``
  on newline, offsets -> per-doc line indices, no Python row loop;
- combiner: per-batch local winner per distinct line BEFORE the
  exchange (a batch with k copies of a boilerplate line ships one row);
- the ONE exchange: ``groupby(line).min(packed)`` where
  ``packed = doc_id * 2^20 + line_idx`` — a single int64 carries the
  lexicographic (doc_id, line_idx) order so the global winner is a
  plain Min aggregate, no per-group map_groups over millions of tiny
  groups.  The exchange is keyed on line CONTENT; at 100 TB swap the
  key for a 128-bit content hash to cut exchange bytes (collision-free
  in practice; documented trade — the string key here keeps the SQL
  oracle total);
- reassemble: winners keyed back by doc_id (second exchange, doc-sized)
  and joined with newline in line_idx order.

Documents whose every line is owned elsewhere vanish from the output
(matches the SQL oracle's GROUP BY over winners).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# packed = doc_id * LINE_CAP + line_idx must fit int64: doc_id < 2^43,
# line_idx < 2^20 (a million-line document). Asserted per batch.
LINE_CAP = 1 << 20
DOC_CAP = 1 << 43


def explode_lines(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(doc_id, line_idx, line, packed) rows, local-winner combined."""
    if len(t) == 0:
        return pa.table(
            {
                "line": pa.array([], pa.string()),
                "packed": pa.array([], pa.int64()),
            }
        )
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    lines = pc.split_pattern(pc.cast(t[text_col], pa.string()), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    offsets = lines.offsets.to_numpy(zero_copy_only=False)
    n_per_doc = np.diff(offsets)
    doc_of = np.repeat(np.arange(len(ids)), n_per_doc)
    line_idx = np.arange(len(doc_of), dtype=np.int64) - np.repeat(
        offsets[:-1].astype(np.int64), n_per_doc
    )
    assert ids.max(initial=0) < DOC_CAP and (
        n_per_doc.max(initial=0) <= LINE_CAP
    ), "packed-key caps exceeded; raise LINE_CAP/DOC_CAP"
    packed = ids[doc_of] * LINE_CAP + line_idx
    df = pd.DataFrame(
        {
            "line": np.asarray(lines.values.to_numpy(zero_copy_only=False), dtype=object),
            "packed": packed,
        }
    )
    # combiner: one row per distinct line per batch (its local winner)
    df = df.groupby("line", as_index=False, sort=False)["packed"].min()
    return pa.table(
        {
            "line": pa.array(df["line"], pa.string()),
            "packed": pa.array(df["packed"], pa.int64()),
        }
    )


def dedup_lines(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Returns a Dataset of (id_col, text_col): the corpus with every
    line kept only at its first (doc_id, line_idx) occurrence; documents
    left with zero lines are dropped."""
    from ray.data.aggregate import Min

    winners = (
        ds.map_batches(
            lambda t: explode_lines(t, id_col, text_col), batch_format="pyarrow"
        )
        .groupby("line")
        .aggregate(Min("packed", alias_name="packed"))
    )

    def unpack(t: pa.Table) -> pa.Table:
        packed = t["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(packed // LINE_CAP),
                "line_idx": pa.array(packed % LINE_CAP),
                "line": t["line"],
            }
        )

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("line_idx", ignore_index=True)
        return pd.DataFrame(
            {
                id_col: [df[id_col].iloc[0]],
                text_col: ["\n".join(df["line"].tolist())],
            }
        )

    return (
        winners.map_batches(unpack, batch_format="pyarrow")
        .groupby(id_col)
        .map_groups(reassemble, batch_format="pandas")
    )

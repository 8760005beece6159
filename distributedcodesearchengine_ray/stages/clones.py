"""Code-clone detection: a distributed winnowing-fingerprint join.

The MOSS construction (Schleimer/Wilkerson/Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD'03) over the engine's
existing winnow fingerprints (``text_stats.winnow_fingerprints``): two
documents are clone candidates when they SHARE enough fingerprints —
robust to reordering and insertions where exact/shingle dedup is not.

Execution shape (all exchanges bucketed, nothing quadratic in the
corpus):

1. map side: explode each doc into its DISTINCT fingerprints —
   ``(fp, doc_id, n_fps)`` rows (n_fps carried inline so no later join
   is needed for containment);
2. ONE exchange on ``fp % 256``: inside a bucket, fingerprints with
   document frequency outside ``[2, max_fp_df]`` are dropped — df=1
   carries no pair, df > max_fp_df is boilerplate (license headers,
   common idioms) that MOSS likewise excludes as noise; the cap is a
   documented parameter of the ALGORITHM, not a silent coverage cut,
   and it bounds per-fingerprint pair fan-out at C(max_fp_df, 2);
3. pair emission per fingerprint (vectorized self-merge), partial
   per-bucket ``(id_a, id_b)`` counts;
4. ONE small exchange on the pair key sums the partials; pairs pass
   with ``shared >= min_shared`` and containment
   ``shared / min(n_a, n_b) >= min_containment``.

No SQL oracle exists (the rolling hash is not expressible in DuckDB);
the exactness gate is a brute-force all-pairs comparison against an
independent pure-Python winnowing oracle in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_FP_BUCKETS = 256


def fingerprint_clone_pairs(
    ds,
    *,
    k: int = 5,
    window: int = 4,
    min_shared: int = 3,
    min_containment: float = 0.5,
    max_fp_df: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Returns a Dataset of (id_a, id_b, shared, containment_micro),
    id_a < id_b, for every document pair sharing >= ``min_shared``
    informative fingerprints with containment >= ``min_containment``."""
    from ray.data.aggregate import Max, Sum

    from .text_stats import winnow_fingerprints

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # DISTINCT fingerprints per doc: winnowing emits one row per window
        # position, so repeated code repeats fingerprints — set semantics
        # (like the MOSS oracle) need the unique set, and n_fps must be the
        # set size for containment to be well-defined.
        fps = [
            np.unique(winnow_fingerprints(x, k, window))
            for x in t[text_col].to_pylist()
        ]
        lens = np.array([len(f) for f in fps], np.int64)
        flat = (
            np.concatenate(fps).view(np.int64) if fps else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "fp": pa.array(flat),
                "__fb": pa.array((flat % N_FP_BUCKETS + N_FP_BUCKETS) % N_FP_BUCKETS),
                id_col: pa.array(np.repeat(ids, lens)),
                "n_fps": pa.array(np.repeat(lens, lens)),
            }
        )

    pairs_schema = pa.schema(
        [
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("shared", pa.int64()),
            ("na", pa.int64()),
            ("nb", pa.int64()),
        ]
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        # works in pandas internally, but returns Arrow with an EXPLICIT
        # schema: a bucket where every fingerprint fails the df filter
        # yields zero rows, and a schemaless empty block would poison the
        # downstream pair groupby
        df = t.select(["fp", id_col, "n_fps"]).to_pandas()
        # df filter: informative fingerprints only (see module docstring)
        counts = df.groupby("fp")["fp"].transform("size")
        df = df[(counts >= 2) & (counts <= max_fp_df)]
        if df.empty:
            return pairs_schema.empty_table()
        m = df.merge(df, on="fp", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = (
            m.groupby([f"{id_col}_a", f"{id_col}_b"])
            .agg(shared=("fp", "size"), na=("n_fps_a", "first"), nb=("n_fps_b", "first"))
            .reset_index()
            .rename(columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"})
        )
        return pa.Table.from_pandas(out, schema=pairs_schema, preserve_index=False)

    partials = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("__fb")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    totals = partials.groupby(["id_a", "id_b"]).aggregate(
        Sum("shared", alias_name="shared"),
        Max("na", alias_name="na"),
        Max("nb", alias_name="nb"),
    )

    def finish(t: pa.Table) -> pa.Table:
        shared = t["shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        denom = np.minimum(na, nb)
        cont = shared / np.maximum(denom, 1)
        keep = (shared >= min_shared) & (cont >= min_containment)
        return pa.table(
            {
                "id_a": pa.array(t["id_a"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)),
                "id_b": pa.array(t["id_b"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)),
                "shared": pa.array(shared[keep]),
                "containment_micro": pa.array(
                    np.floor(cont[keep] * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow")

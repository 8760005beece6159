"""Deterministic global shuffle: assign every row a stable position in
a seeded pseudo-random permutation.

Training pipelines need a REPRODUCIBLE corpus-wide shuffle (epoch
ordering must not depend on partition layout, executor scheduling, or
retries).  ``ds.random_shuffle()`` gives none of that: it is seeded per
execution and returns no addressable position.  This operator defines
the permutation as a pure function of the row id — sort order of
``md5(seed || ':' || id)`` — so any run, any partitioning, any engine
(including the paired SQL oracle's ``row_number() OVER (ORDER BY
md5(...))``) produces the identical permutation.

Distributed shape: a full sort is avoided with the same two-phase
id-range trick the index build and sequence packing use, except the
range is over the HASH, which is uniform by construction — so buckets
are balanced with no boundary sampling:

- bucket = first byte of the hex digest (256 equal-probability buckets;
  hex is lexicographically ordered, so bucket order == global order);
- phase 1: ``groupby(bucket).count`` -> 256 rows to the driver ->
  exclusive cumsum = each bucket's global starting position (tiny,
  shipped back inside the stage closure);
- phase 2: the single full-data exchange — ``groupby(bucket)``,
  sort WITHIN the bucket by digest, position = bucket offset + local
  rank.

At 100 TB the per-bucket groups are corpus/256; raise ``prefix_len`` to
2 bytes (65,536 buckets) to keep groups block-sized — same code path.

Beyond-reference operator (the reference engine has no shuffle step).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _digests(ids: np.ndarray, seed: str) -> np.ndarray:
    """Hex md5 of ``f"{seed}:{id}"`` per id.  md5 has no vectorized
    kernel; the per-row loop is the cost of an oracle-reproducible
    permutation (~1M digests/s/core — never the bottleneck next to the
    exchange it feeds)."""
    pre = f"{seed}:".encode()
    return np.array(
        [hashlib.md5(pre + str(i).encode()).hexdigest() for i in ids],
        dtype=object,
    )


def shuffle_positions(
    ds,
    id_col: str = "doc_id",
    seed: str = "s0",
    prefix_len: int = 1,
):
    """Returns a Dataset of (id_col, pos): ``pos`` = the row's rank in
    the seeded permutation, dense 0..N-1.  Consumers sort or
    range-partition by ``pos`` to materialize the shuffled order."""
    from ray.data.aggregate import Count

    hex_chars = 2 * prefix_len

    def keyed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        digs = _digests(ids, seed)
        bkt = np.array([int(d[:hex_chars], 16) for d in digs], dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "__dig": pa.array(digs, pa.string()),
                "__bkt": pa.array(bkt),
            }
        )

    with_key = ds.map_batches(keyed, batch_format="pyarrow")

    # phase 1: 256 (or 64k) count rows -> exclusive cumsum on the driver
    counts = (
        with_key.groupby("__bkt")
        .aggregate(Count(alias_name="__n"))
        .to_pandas()
        .sort_values("__bkt", ignore_index=True)
    )
    offsets = dict(
        zip(
            counts["__bkt"].to_numpy(),
            np.concatenate(([0], np.cumsum(counts["__n"].to_numpy())[:-1])),
        )
    )

    # phase 2: the one full exchange — rank within each hash bucket
    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("__dig", ignore_index=True)
        base = offsets[int(df["__bkt"].iloc[0])]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "pos": base + np.arange(len(df), dtype=np.int64),
            }
        )

    return with_key.groupby("__bkt").map_groups(rank_bucket, batch_format="pandas")

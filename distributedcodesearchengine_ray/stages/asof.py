"""Distributed as-of join (most recent right row at or before each left row).

The classic stream/event alignment operator ("for each click, the latest
prior purchase by the same user") that Ray Data has no native join type
for.  Implemented as the documented composition: tag + union the two
sides, hash-exchange ONCE on the equality key (``groupby(by)``), then a
vectorized per-group merge — sort both sides by the ordering column and
``np.searchsorted`` the left timestamps into the right side.  Per-group
work is O((l+r) log(l+r)) with no per-row Python loop; the only shuffle
is the single groupby, and its partitioning key is the join key, so the
operator composes with upstream stages already partitioned by it.

Semantics (mirrors DuckDB's ``ASOF JOIN ... ON l.by = r.by AND l.on >=
r.on``): inner — left rows with no prior right row are dropped; equal
timestamps DO match; if several right rows share the same (by, on) the
last one in ``(on, tiebreak)`` sort order wins (deterministic — callers
with duplicate timestamps should pass an explicit ``right_tiebreak``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(
    left_ds,
    right_ds,
    by: str = "user_id",
    on: str = "ts",
    right_suffix: str = "_r",
    right_tiebreak: Optional[List[str]] = None,
):
    """Returns a Dataset of matched rows: all left columns plus the right
    side's non-key columns (suffixed where names collide)."""
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right_schema.names, right_schema.types))
    left_cols = list(left_schema.names)
    right_payload = [c for c in right_schema.names if c not in (by,)]
    out_right_names = {
        c: (c + right_suffix if c in left_cols else c) for c in right_payload
    }

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = {"__side": pa.array(np.full(len(t), side, np.int8))}
            for c in left_cols:
                cols[c] = t[c] if side == 0 else pa.nulls(len(t), left_types[c])
            for c in right_payload:
                name = out_right_names[c]
                cols[name] = t[c] if side == 1 else pa.nulls(len(t), right_types[c])
            # the join key must be populated on BOTH sides (overrides the
            # null fill above for the right side)
            cols[by] = t[by]
            return pa.table(cols)

        return fn

    unioned = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    r_on = out_right_names[on]
    tb = [out_right_names[c] for c in (right_tiebreak or []) if c in out_right_names]

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        lt = df[df["__side"] == 0]
        rt = df[df["__side"] == 1]
        if len(lt) == 0 or len(rt) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=df[c].dtype) for c in df.columns}
            ).drop(columns="__side")
        rt = rt.sort_values([r_on] + tb, kind="stable")
        lt = lt.sort_values(on, kind="stable")
        idx = np.searchsorted(rt[r_on].to_numpy(), lt[on].to_numpy(), side="right") - 1
        keep = idx >= 0
        lt = lt[keep]
        matched = rt.iloc[idx[keep]]
        out = lt.drop(columns=["__side"] + list(out_right_names.values())).reset_index(
            drop=True
        )
        for c in right_payload:
            name = out_right_names[c]
            out[name] = matched[name].to_numpy()
        return out

    return unioned.groupby(by).map_groups(merge_group, batch_format="pandas")

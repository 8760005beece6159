"""Distributed as-of and range joins over an ordering column.

Event-stream alignment operators Ray Data has no native join type for:

- ``asof_join``: for each left row, the most recent right row at or
  before it per key ("for each click, the latest prior purchase by the
  same user");
- ``range_join``: ALL (left, right) pairs whose ordering values are
  within a bounded interval per key ("every purchase in the 24 h before
  each click").

Both use the same composition: tag + union the two sides, hash-exchange
ONCE on the equality key (``groupby(by)``), then a vectorized per-group
merge — sort the right side by the ordering column and ``searchsorted``
the left values (one probe for as-of, an interval pair for range; range
pair expansion is the grouped-arange trick, no per-row Python loop).
Groups are processed as Arrow tables end-to-end: the union's null-filled
columns would coerce int64 ids through float64 in pandas (silently lossy
above 2^53 — real event ids get there), while Arrow keeps every column's
type exact.  Per-group work is O((l+r) log(l+r)) + output size; the only
shuffle is the single groupby, and its partitioning key is the join key,
so the operators compose with upstream stages already partitioned by it.

As-of semantics (mirrors DuckDB ``ASOF JOIN ... ON l.by = r.by AND l.on
>= r.on``): inner — left rows with no prior right row are dropped; equal
values DO match; if several right rows share the same (by, on) the last
one in ``(on, tiebreak)`` sort order wins (deterministic — callers with
duplicate timestamps should pass an explicit ``right_tiebreak``).
Range semantics: right rows with ``on_l + lower <= on_r <= on_l +
upper`` (both bounds inclusive), inner.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _tagged_union(left_ds, right_ds, by: str, right_suffix: str):
    """Union the two sides under a harmonized schema with a __side tag;
    returns (unioned_ds, right_payload, out_right_names)."""
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
    return unioned, right_payload, out_right_names


def _split_sides(t: pa.Table):
    side = t["__side"]
    lt = t.filter(pc.equal(side, 0))
    rt = t.filter(pc.equal(side, 1))
    return lt, rt


def _emit(lt: pa.Table, matched: pa.Table, right_payload, out_right_names) -> pa.Table:
    out = lt.drop_columns(["__side"] + list(out_right_names.values()))
    for c in right_payload:
        name = out_right_names[c]
        out = out.append_column(name, matched[name])
    return out


def _empty_out(t: pa.Table, right_payload, out_right_names) -> pa.Table:
    return _emit(
        t.slice(0, 0), t.slice(0, 0), right_payload, out_right_names
    )


def _on_values(tbl: pa.Table, col: str) -> np.ndarray:
    arr = tbl[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False)


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
    unioned, right_payload, out_right_names = _tagged_union(
        left_ds, right_ds, by, right_suffix
    )
    r_on = out_right_names[on]
    tb = [out_right_names[c] for c in (right_tiebreak or []) if c in out_right_names]

    def merge_group(t: pa.Table) -> pa.Table:
        lt, rt = _split_sides(t)
        if len(lt) == 0 or len(rt) == 0:
            return _empty_out(t, right_payload, out_right_names)
        rt = rt.take(
            pc.sort_indices(rt, sort_keys=[(k, "ascending") for k in [r_on] + tb])
        )
        lt = lt.take(pc.sort_indices(lt, sort_keys=[(on, "ascending")]))
        idx = np.searchsorted(_on_values(rt, r_on), _on_values(lt, on), side="right") - 1
        keep = idx >= 0
        lt = lt.filter(pa.array(keep))
        matched = rt.take(pa.array(idx[keep], pa.int64()))
        return _emit(lt, matched, right_payload, out_right_names)

    return unioned.groupby(by).map_groups(merge_group, batch_format="pyarrow")


def range_join(
    left_ds,
    right_ds,
    lower,
    upper,
    by: str = "user_id",
    on: str = "ts",
    right_suffix: str = "_r",
):
    """All (left, right) pairs with ``on_l + lower <= on_r <= on_l +
    upper`` per key (inclusive bounds; ``lower``/``upper`` must be
    addable to the ordering column's numpy values — e.g. np.timedelta64
    for timestamps).  Returns all left columns plus suffixed right
    payload."""
    unioned, right_payload, out_right_names = _tagged_union(
        left_ds, right_ds, by, right_suffix
    )
    r_on = out_right_names[on]

    def merge_group(t: pa.Table) -> pa.Table:
        lt, rt = _split_sides(t)
        if len(lt) == 0 or len(rt) == 0:
            return _empty_out(t, right_payload, out_right_names)
        rt = rt.take(pc.sort_indices(rt, sort_keys=[(r_on, "ascending")]))
        lt = lt.take(pc.sort_indices(lt, sort_keys=[(on, "ascending")]))
        r_vals = _on_values(rt, r_on)
        l_vals = _on_values(lt, on)
        lo = np.searchsorted(r_vals, l_vals + lower, side="left")
        hi = np.searchsorted(r_vals, l_vals + upper, side="right")
        counts = (hi - lo).clip(min=0)
        total = int(counts.sum())
        if total == 0:
            return _empty_out(t, right_payload, out_right_names)
        l_idx = np.repeat(np.arange(len(lt)), counts)
        # grouped arange: for each left row i, the run lo[i]..hi[i]-1
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        r_idx = np.arange(total) - np.repeat(starts, counts) + np.repeat(lo, counts)
        return _emit(
            lt.take(pa.array(l_idx, pa.int64())),
            rt.take(pa.array(r_idx, pa.int64())),
            right_payload,
            out_right_names,
        )

    return unioned.groupby(by).map_groups(merge_group, batch_format="pyarrow")

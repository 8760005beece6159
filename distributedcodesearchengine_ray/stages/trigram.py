"""Trigram substring / regex index (Google Code Search construction).

Russ Cox's "Regular Expression Matching with a Trigram Index" design
(the engine behind Google Code Search / Zoekt / Hound), rebuilt on Ray
Data.  The reference engine answers only tokenized BM25 queries
(`/root/reference/codesearch/bm25/index.py`); grep-style substring and
regex search over the raw file bytes is the canonical *fulltext-index*
capability it lacks, so this module adds it as a first-class index:

Build (``build_trigram_index``):
  corpus Dataset (doc_id, text)
    -> map_batches: vectorized distinct byte-trigram extraction
       (one numpy pass over the Arrow string buffer per batch; a trigram
       is 3 consecutive UTF-8 bytes packed into a uint32 code)
    -> hive-partitioned write_parquet(partition_cols=["bucket"]) where
       bucket = knuth_hash(code) % n_buckets  (the all-to-all exchange)
    -> one compaction task per bucket: sort (code, doc_id), write a
       single postings file with small row groups (parquet predicate
       pushdown resolves a code without scanning the bucket) plus a tiny
       per-bucket df summary (code -> n_docs).

Query:
  * ``substring_search(needle)``: needle trigrams -> df lookup -> read
    ONLY the K rarest codes' posting lists (bucket hash + pushdown)
    -> sorted-array intersection -> exact verification of the candidate
    docs (``pc.match_substring`` over a doc_id-pushdown read).  Using a
    subset of trigrams never loses matches (intersection of fewer lists
    is a superset) and verification removes all false positives, so the
    result is exact.
  * ``regex_search(pattern)``: a conservative regex -> required-literal
    planner (``required_literals``) walks Python's regex parse tree and
    extracts literal substrings every match must contain; their trigrams
    prune exactly like the substring case and ``pc.match_substring_regex``
    (RE2, same engine as the DuckDB oracle's ``regexp_matches``)
    verifies.  When no literal >= 3 bytes can be proven (or the pattern
    is case-insensitive) the query falls back to a distributed full scan.

Scale notes (100 TB): the posting exchange is the same shape as the BM25
build's lexicon pass — `n_buckets` scales with corpus size (the code
space is only 2^24, so buckets stay balanced); compaction is one task
per bucket touching only that bucket's fragments; queries read O(K rare
posting lists + candidate docs), never the corpus.  Candidate
verification switches from a driver-side pushdown read to a distributed
``map_batches`` scan above ``DRIVER_VERIFY_ROWS`` candidates.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

try:  # Python 3.11+: sre_parse lives at re._parser (same public shape)
    import re._parser as sre_parse  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older interpreters
    import sre_parse  # type: ignore[no-redef]

DEFAULT_BUCKETS = 16
# intersect at most this many (rarest) trigram posting lists; exactness is
# preserved by the verification pass regardless of K
MAX_PROBE_CODES = 8
# candidate sets up to this size are verified with a driver-side parquet
# pushdown read; larger sets use a distributed Ray Data scan
DRIVER_VERIFY_ROWS = 100_000
_KNUTH = np.uint64(2654435761)


# ---------------------------------------------------------------------------
# trigram extraction (vectorized over the Arrow string buffer)
# ---------------------------------------------------------------------------

def _utf8_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte_buffer, per-row byte lengths) views of a StringArray."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[offsets[0] : offsets[-1]], np.diff(offsets)


def distinct_trigrams(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Per-row distinct byte-trigram codes.

    Returns (row_idx, code): for every row, one entry per DISTINCT
    3-byte window in its UTF-8 encoding, code = b0<<16 | b1<<8 | b2.
    Single numpy pass; no per-row Python loop.
    """
    buf, lens = _utf8_view(texts)
    n = len(lens)
    if buf.size < 3:
        return np.empty(0, np.int64), np.empty(0, np.uint32)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    codes = (
        (buf[:-2].astype(np.uint32) << 16)
        | (buf[1:-1].astype(np.uint32) << 8)
        | buf[2:].astype(np.uint32)
    )
    # a window starting at p belongs to a row only if p+2 is in the same row
    valid = row_of[:-2] == row_of[2:]
    codes = codes[valid]
    rows = row_of[:-2][valid]
    if codes.size == 0:
        return rows, codes
    order = np.lexsort((codes, rows))
    rows, codes = rows[order], codes[order]
    keep = np.empty(rows.size, bool)
    keep[0] = True
    keep[1:] = (rows[1:] != rows[:-1]) | (codes[1:] != codes[:-1])
    return rows[keep], codes[keep]


def _bucket_of(codes: np.ndarray, n_buckets: int) -> np.ndarray:
    return ((codes.astype(np.uint64) * _KNUTH) % np.uint64(2**32)).astype(
        np.int64
    ) % n_buckets


def string_trigrams(s: str) -> List[int]:
    """Distinct trigram codes of a Python string (query side)."""
    b = s.encode("utf-8")
    return sorted(
        {(b[i] << 16) | (b[i + 1] << 8) | b[i + 2] for i in range(len(b) - 2)}
    )


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------

def build_trigram_index(
    ds,
    index_dir: str,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dict[str, int]:
    """Build the trigram index over a (doc_id, text) Dataset.

    Extraction streams through ``map_batches``; the posting exchange is
    a hive-partitioned parquet write keyed by code-hash bucket; one
    compaction task per bucket produces the final sorted postings + df
    files.  Returns {"n_postings": ..., "n_codes": ...}.
    """
    import ray

    def extract(t: pa.Table) -> pa.Table:
        rows, codes = distinct_trigrams(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "code": pa.array(codes, pa.uint32()),
                "doc_id": pa.array(ids[rows], pa.int64()),
                "bucket": pa.array(_bucket_of(codes, n_buckets), pa.int64()),
            }
        )

    tmp = os.path.join(index_dir, "tri_tmp")
    post_dir = os.path.join(index_dir, "tri_postings")
    df_dir = os.path.join(index_dir, "tri_df")
    for d in (tmp, post_dir, df_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    ds.map_batches(extract, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket"], row_group_size=1_000_000
    )

    @ray.remote(num_cpus=1)
    def compact(bucket: int) -> tuple[int, int]:
        frag_dir = os.path.join(tmp, f"bucket={bucket}")
        if not os.path.isdir(frag_dir):
            return 0, 0
        t = pads.dataset(frag_dir, format="parquet").to_table(
            columns=["code", "doc_id"]
        )
        codes = t["code"].to_numpy()
        docs = t["doc_id"].to_numpy()
        order = np.lexsort((docs, codes))
        codes, docs = codes[order], docs[order]
        out = pa.table(
            {
                "code": pa.array(codes, pa.uint32()),
                "doc_id": pa.array(docs, pa.int64()),
            }
        )
        # small row groups => a single code resolves via pushdown without
        # decoding the whole bucket
        pq.write_table(
            out,
            os.path.join(post_dir, f"bucket-{bucket:04d}.parquet"),
            row_group_size=65_536,
        )
        uniq, counts = np.unique(codes, return_counts=True)
        pq.write_table(
            pa.table(
                {
                    "code": pa.array(uniq, pa.uint32()),
                    "df": pa.array(counts, pa.int64()),
                }
            ),
            os.path.join(df_dir, f"bucket-{bucket:04d}.parquet"),
            row_group_size=65_536,
        )
        return len(codes), len(uniq)

    totals = ray.get([compact.remote(b) for b in range(n_buckets)])
    shutil.rmtree(tmp, ignore_errors=True)
    stats = {
        "n_postings": int(sum(t[0] for t in totals)),
        "n_codes": int(sum(t[1] for t in totals)),
        "n_buckets": n_buckets,
    }
    with open(os.path.join(index_dir, "tri_manifest.json"), "w") as f:
        json.dump(stats, f)
    return stats


# ---------------------------------------------------------------------------
# query
# ---------------------------------------------------------------------------

def _load_manifest(index_dir: str) -> Dict[str, int]:
    with open(os.path.join(index_dir, "tri_manifest.json")) as f:
        return json.load(f)


def _codes_by_bucket(codes: Sequence[int], n_buckets: int) -> Dict[int, np.ndarray]:
    arr = np.asarray(codes, np.uint32)
    buckets = _bucket_of(arr, n_buckets)
    return {int(b): arr[buckets == b] for b in np.unique(buckets)}


def lookup_df(index_dir: str, codes: Sequence[int]) -> Dict[int, int]:
    """code -> document frequency (0 when the code never occurs)."""
    n_buckets = _load_manifest(index_dir)["n_buckets"]
    out = {int(c): 0 for c in codes}
    for b, cs in _codes_by_bucket(codes, n_buckets).items():
        path = os.path.join(index_dir, "tri_df", f"bucket-{b:04d}.parquet")
        if not os.path.exists(path):
            continue
        t = pads.dataset(path, format="parquet").to_table(
            filter=pads.field("code").isin(pa.array(cs, pa.uint32()))
        )
        for c, d in zip(t["code"].to_pylist(), t["df"].to_pylist()):
            out[int(c)] = int(d)
    return out


def candidate_ids(
    index_dir: str, codes: Sequence[int], *, max_probe: int = MAX_PROBE_CODES
) -> Optional[np.ndarray]:
    """Doc ids containing ALL given trigram codes (None = cannot prune,
    caller must full-scan; empty array = provably no matches)."""
    codes = list(dict.fromkeys(int(c) for c in codes))
    if not codes:
        return None
    dfs = lookup_df(index_dir, codes)
    if any(d == 0 for d in dfs.values()):
        return np.empty(0, np.int64)  # some required trigram never occurs
    probe = sorted(codes, key=lambda c: dfs[c])[:max_probe]
    n_buckets = _load_manifest(index_dir)["n_buckets"]
    lists: Dict[int, np.ndarray] = {}
    for b, cs in _codes_by_bucket(probe, n_buckets).items():
        path = os.path.join(index_dir, "tri_postings", f"bucket-{b:04d}.parquet")
        t = pads.dataset(path, format="parquet").to_table(
            filter=pads.field("code").isin(pa.array(cs, pa.uint32()))
        )
        tc = t["code"].to_numpy()
        td = t["doc_id"].to_numpy()
        for c in cs:
            lists[int(c)] = td[tc == c]  # already doc-sorted within code
    cand = lists[probe[0]]
    for c in probe[1:]:
        if cand.size == 0:
            break
        cand = np.intersect1d(cand, lists[c], assume_unique=True)
    return cand


def _verify(
    docs_path: str,
    cand: Optional[np.ndarray],
    matcher,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> np.ndarray:
    """Exact-match verification: returns sorted matching doc ids.

    cand=None -> distributed full scan; small candidate sets use a
    driver-side pushdown read (documented threshold), large ones a
    distributed filtered read.
    """
    if cand is not None and cand.size == 0:
        return np.empty(0, np.int64)
    if cand is not None and cand.size <= DRIVER_VERIFY_ROWS:
        t = pads.dataset(docs_path, format="parquet").to_table(
            columns=[id_col, text_col],
            filter=pads.field(id_col).isin(pa.array(cand, pa.int64())),
        )
        mask = matcher(t[text_col])
        return np.sort(
            t[id_col].filter(mask).to_numpy(zero_copy_only=False).astype(np.int64)
        )
    import ray
    import ray.data as rd

    ds = rd.read_parquet(docs_path, columns=[id_col, text_col])
    cand_ref = ray.put(pa.array(cand, pa.int64())) if cand is not None else None

    def check(t: pa.Table) -> pa.Table:
        if cand_ref is not None:
            t = t.filter(pc.is_in(t[id_col], value_set=ray.get(cand_ref)))
        return t.select([id_col]).filter(matcher(t[text_col]))

    parts = [
        ray.get(r)[id_col].to_numpy(zero_copy_only=False)
        for r in ds.map_batches(check, batch_format="pyarrow").to_arrow_refs()
    ]
    if not parts:
        return np.empty(0, np.int64)
    return np.sort(np.concatenate(parts).astype(np.int64))


def substring_search(index_dir: str, docs_path: str, needle: str) -> np.ndarray:
    """Exact substring search (case-sensitive, = SQL ``contains``)."""
    codes = string_trigrams(needle)
    cand = candidate_ids(index_dir, codes) if codes else None
    return _verify(
        docs_path, cand, lambda col: pc.match_substring(col, needle)
    )


def _explode_lines(t: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    """(doc_id, text) -> (doc_id, line_no, line), fully vectorized.

    line_no is 1-based; splitting on "\\n" matches SQL
    ``str_split(text, chr(10))`` (no trailing-empty-line trimming).
    """
    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lines = pc.split_pattern(pc.fill_null(texts, ""), pattern="\n")
    offsets = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    total = int(counts.sum())
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    line_no = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offsets[:-1] - offsets[0], counts)
        + 1
    )
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, counts), pa.int64()),
            "line_no": pa.array(line_no, pa.int64()),
            "line": lines.flatten(),
        }
    )


def grep_lines(
    index_dir: str, docs_path: str, needle: str, *, id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """grep: exact line-level substring matches (doc_id, line_no, line).

    Trigram-pruned to candidate docs, then a vectorized split+match over
    only those docs; distributed scan above DRIVER_VERIFY_ROWS
    candidates.  Equivalent SQL: unnest(str_split(text, chr(10))) WITH
    aligned generate_subscripts, filtered by contains(line, needle).
    """
    codes = string_trigrams(needle)
    cand = candidate_ids(index_dir, codes) if codes else None

    def lines_of(t: pa.Table) -> pa.Table:
        ex = _explode_lines(t, id_col=id_col, text_col=text_col)
        return ex.filter(pc.match_substring(ex["line"], needle))

    empty = pa.table(
        {id_col: pa.array([], pa.int64()), "line_no": pa.array([], pa.int64()),
         "line": pa.array([], pa.string())}
    )
    if cand is not None and cand.size == 0:
        return empty
    if cand is not None and cand.size <= DRIVER_VERIFY_ROWS:
        t = pads.dataset(docs_path, format="parquet").to_table(
            columns=[id_col, text_col],
            filter=pads.field(id_col).isin(pa.array(cand, pa.int64())),
        )
        out = lines_of(t)
    else:
        import ray
        import ray.data as rd

        ds = rd.read_parquet(docs_path, columns=[id_col, text_col])
        cand_ref = ray.put(pa.array(cand, pa.int64())) if cand is not None else None

        def check(t: pa.Table) -> pa.Table:
            if cand_ref is not None:
                t = t.filter(pc.is_in(t[id_col], value_set=ray.get(cand_ref)))
            return lines_of(t)

        parts = [
            ray.get(r) for r in
            ds.map_batches(check, batch_format="pyarrow").to_arrow_refs()
        ]
        parts = [p for p in parts if p.num_rows]
        out = pa.concat_tables(parts) if parts else empty
    return out.sort_by([(id_col, "ascending"), ("line_no", "ascending")])


def regex_search(index_dir: str, docs_path: str, pattern: str) -> np.ndarray:
    """Exact regex search (RE2 semantics, = DuckDB ``regexp_matches``)."""
    lits = required_literals(pattern)
    codes: List[int] = []
    for lit in lits:
        codes.extend(string_trigrams(lit))
    cand = candidate_ids(index_dir, codes) if codes else None
    return _verify(
        docs_path, cand, lambda col: pc.match_substring_regex(col, pattern)
    )


def _case_variant_groups(needle: str) -> Optional[List[np.ndarray]]:
    """Per-trigram-position code groups for case-insensitive search.

    Position i of the needle must match SOME case variant of its 3 bytes,
    so candidates = intersection over positions of the union of each
    position's variant posting lists (Cox's RegexpQuery OR-of-trigrams).
    ASCII only — non-ASCII case folding can change byte length (e.g.
    U+0130), so those needles return None (caller full-scans).
    """
    b = needle.encode("utf-8")
    if len(b) < 3 or any(c >= 0x80 for c in b):
        return None
    per_byte = [
        sorted({c, ord(chr(c).lower()), ord(chr(c).upper())}) if chr(c).isalpha()
        else [c]
        for c in b
    ]
    groups = []
    for i in range(len(b) - 2):
        codes = {
            (x << 16) | (y << 8) | z
            for x in per_byte[i]
            for y in per_byte[i + 1]
            for z in per_byte[i + 2]
        }
        groups.append(np.array(sorted(codes), np.uint32))
    return groups


def candidate_ids_groups(
    index_dir: str,
    groups: Sequence[np.ndarray],
    *,
    max_probe: int = MAX_PROBE_CODES,
) -> np.ndarray:
    """Docs containing, for EVERY group, at least one of its codes.

    Union of posting lists within a group, intersection across groups;
    groups probed rarest-first (by summed df).  Exactness comes from the
    verification pass, as with ``candidate_ids``.
    """
    all_codes = sorted({int(c) for g in groups for c in g})
    dfs = lookup_df(index_dir, all_codes)
    group_df = [int(sum(dfs[int(c)] for c in g)) for g in groups]
    if any(d == 0 for d in group_df):
        return np.empty(0, np.int64)
    order = np.argsort(group_df, kind="stable")[:max_probe]
    probe_groups = [groups[i] for i in order]
    probe_codes = sorted({int(c) for g in probe_groups for c in g})
    n_buckets = _load_manifest(index_dir)["n_buckets"]
    lists: Dict[int, np.ndarray] = {}
    for b, cs in _codes_by_bucket(probe_codes, n_buckets).items():
        path = os.path.join(index_dir, "tri_postings", f"bucket-{b:04d}.parquet")
        t = pads.dataset(path, format="parquet").to_table(
            filter=pads.field("code").isin(pa.array(cs, pa.uint32()))
        )
        tc = t["code"].to_numpy()
        td = t["doc_id"].to_numpy()
        for c in cs:
            lists[int(c)] = td[tc == c]
    cand: Optional[np.ndarray] = None
    for g in probe_groups:
        members = [lists[int(c)] for c in g if lists.get(int(c)) is not None]
        union = (
            np.unique(np.concatenate(members)) if members else np.empty(0, np.int64)
        )
        cand = union if cand is None else np.intersect1d(
            cand, union, assume_unique=True
        )
        if cand.size == 0:
            break
    return cand if cand is not None else np.empty(0, np.int64)


def substring_search_nocase(
    index_dir: str, docs_path: str, needle: str
) -> np.ndarray:
    """Case-insensitive exact substring search (RE2 ``(?i)`` semantics,
    = DuckDB ``regexp_matches(text, pattern, 'i')``)."""
    groups = _case_variant_groups(needle)
    cand = candidate_ids_groups(index_dir, groups) if groups else None
    return _verify(
        docs_path,
        cand,
        lambda col: pc.match_substring(col, needle, ignore_case=True),
    )


# ---------------------------------------------------------------------------
# regex -> required literals (conservative Cox-style planner)
# ---------------------------------------------------------------------------

def required_literals(pattern: str) -> List[str]:
    """Literal substrings every match of ``pattern`` must contain.

    Conservative subset of Cox's RegexpQuery analysis: walks the parse
    tree accumulating mandatory literal runs.  Branches contribute the
    intersection of their branches' requirement sets; optional /
    zero-min repeats contribute nothing; a case-insensitive pattern
    returns [] (full scan).  Only literals >= 3 bytes are returned
    (shorter ones carry no trigram).  Soundness (never losing a match)
    is what matters — the verification pass restores exactness anyway.
    """
    try:
        parsed = sre_parse.parse(pattern)
    except re.error:
        return []
    if parsed.state.flags & re.IGNORECASE:
        return []
    req, run = _walk_seq(parsed)
    if run:
        req.add(run)
    return sorted(r for r in req if len(r.encode("utf-8")) >= 3)


def _walk_seq(seq) -> tuple[set, str]:
    """Returns (required_literal_set, trailing_open_run)."""
    req: set = set()
    run = ""

    def flush():
        nonlocal run
        if run:
            req.add(run)
            run = ""

    for op, av in seq:
        name = str(op)
        if name == "LITERAL":
            run += chr(av)
        elif name == "SUBPATTERN":
            # av = (group, add_flags, del_flags, subpattern); inline flags
            # like (?i:...) make the group's literals unreliable
            if av[1]:
                flush()
                continue
            sub_req, sub_run = _walk_seq(av[3])
            if not sub_req and sub_run:
                # a pure-literal group continues the current run
                run += sub_run
            else:
                flush()
                req.update(sub_req)
                if sub_run:
                    req.add(sub_run)
        elif name in ("MAX_REPEAT", "MIN_REPEAT"):
            lo, hi = av[0], av[1]
            sub_req, sub_run = _walk_seq(av[2])
            if not sub_req and sub_run:
                if lo == hi:
                    run += sub_run * lo  # fixed repeat: run stays open
                    continue
                if lo >= 1:
                    # first copy is adjacent to the preceding run; text
                    # after the repeat is not
                    run += sub_run
                flush()
            else:
                flush()
                if lo >= 1:
                    req.update(sub_req)
                    if sub_run:
                        req.add(sub_run)
        elif name == "BRANCH":
            flush()
            branch_sets = []
            for alt in av[1]:
                sub_req, sub_run = _walk_seq(alt)
                if sub_run:
                    sub_req = sub_req | {sub_run}
                branch_sets.append(sub_req)
            if branch_sets:
                req.update(set.intersection(*branch_sets))
        elif name == "AT":
            # anchors are zero-width: literal adjacency is preserved
            pass
        else:
            # ANY, IN, NOT_LITERAL, ASSERT, GROUPREF, ... : unknown bytes
            flush()
    if run and not req:
        return req, run
    flush()
    return req, ""

"""Distributed inverted-index build — the reference's §3.1 pipeline rebuilt
as a streaming Ray Data job.

Replaces the reference's single-process accumulate-and-refit indexer
(``/root/reference/codesearch/indexer/repo_indexer.py:94-270`` +
``storage/bm25_index.py:86-115``: every insert refits BM25Okapi over the
whole in-memory corpus) with:

1. **extract** — ``map_batches`` over zero-copy Arrow batches: F1/F2 path
   predicates, per-row ``sha256(content)`` (the per-row invariant), and
   either the raw-file doc projection (file mode) or per-language entity
   extraction + the entity->document projection (entity mode).
2. **partitioning** — deterministic doc-range partitioning: a hash-sampled
   key set gives quantile boundaries over the canonical sort key
   ``(repo, path, commit[, ent_ord])``; dense docIDs are assigned as
   ``offset[part] + rank_within_part`` (SURVEY.md §7.4 — docID = global
   lexicographic rank, the reference's insertion order, which drives
   tie-breaks).  Partition counts come from a cheap column-pruned
   ``groupby(part_id).count()`` pass; no global data sort.
3. **partition build** — ``groupby(part_id).map_groups``: each doc-range
   partition tokenizes its docs (vectorized Arrow tokenizer), builds its
   local inverted index (term -> delta+varint-compressed posting lists +
   block-max metadata), and writes ``postings``/``docmeta`` parquet
   atomically plus a lineage record.  Because postings stay local to a doc
   range, the Zipf-skewed hot terms ("import", "return", ...) never
   concentrate on one reducer — the only term-keyed shuffle (next step)
   sees at most one row per term per partition, which IS the salted-key /
   skew story (SURVEY.md §4.3).
4. **lexicon** — ``groupby(term).aggregate(Sum(df))`` over the per-partition
   partial dfs merges shards into the global lexicon; idf with the
   BM25Okapi epsilon floor is computed distributed and written sorted by
   term (small row groups => query-time predicate-pushdown lookup).
5. **manifest** — global scalars (N, avgdl, average_idf) + partition
   lineage, enabling checkpoint-resume (a rerun skips partitions whose
   lineage matches the build_id).
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.codec import delta_varint_encode, varint_encode
from ..functions.tokenizer import tokenize_array
from ..sources.corpus import SKIP_DIRS, SUPPORTED_EXTENSIONS, read_corpus
from ..state.manifest import (
    IndexManifest,
    PartitionRecord,
    compute_build_id,
    read_lineage,
    write_lineage,
)
from ..stages.parse import parse_batch

BLOCK = 128  # postings per block-max block
LEX_BUCKETS = 16  # hash buckets of the global lexicon (term -> bucket file)
# below this many corpus rows the boundary sample runs single-process on the
# driver (three pruned key columns, ~24 B/row): the distributed pipeline's
# ~1 s fixed executor overhead dwarfs the actual work there.  The driver
# path costs ~3 s/M rows (skey build + siphash are the bulk), so past a few
# hundred thousand rows it becomes a SERIAL floor while the cluster idles —
# measured at 2M files: 6.1 s driver-side (fixed at every CPU count) vs
# 1.5 s @16 / 4.0 s @4 distributed, identical sample set either way
# (hash-mod filter is order-independent).  The crossover sits near 300k.
SMALL_SAMPLE_DRIVER_ROWS = 300_000

DOCMETA_EXTRA_ENTITY = [
    "name", "entity_type", "file_path", "repo_name", "start_line", "end_line",
    "signature", "docstring", "parameters", "return_type", "decorators",
    "parent_class", "complexity", "loc", "source_code",
]


def _sha256_column(contents: List[Optional[str]]) -> List[str]:
    # deliberate per-row loop: Arrow has no sha256 kernel and hashlib is
    # C-speed per call; this is <2% of extract time and the digest must be
    # bit-exact per file (the row invariant checked by tests)
    return [hashlib.sha256((c or "").encode()).hexdigest() for c in contents]


def _path_keep_mask(paths, extra_extensions: Optional[Dict[str, str]] = None) -> pa.Array:
    """F1 (skip-dir) + F2 (supported extension) predicates, vectorized.

    Mirrors /root/reference/codesearch/indexer/repo_indexer.py:331-342 and
    parser/factory.py:56-64: drop any path with a skip-dir segment, keep
    only extensions with a registered parser.
    """
    if isinstance(paths, pa.ChunkedArray):
        paths = paths.combine_chunks()
    bad = None
    for d in SKIP_DIRS:
        hit = pc.or_(
            pc.starts_with(paths, f"{d}/"), pc.match_substring(paths, f"/{d}/")
        )
        bad = hit if bad is None else pc.or_(bad, hit)
    lower = pc.utf8_lower(paths)
    exts = (
        list(SUPPORTED_EXTENSIONS)
        + list(extra_extensions or ())
    )
    ext_ok = None
    for ext in exts:
        hit = pc.ends_with(lower, ext)
        ext_ok = hit if ext_ok is None else pc.or_(ext_ok, hit)
    return pc.and_(pc.invert(bad), ext_ok)


def filter_corpus_batch(
    batch: pa.Table, extra_extensions: Optional[Dict[str, str]] = None
) -> pa.Table:
    return batch.filter(_path_keep_mask(batch["path"], extra_extensions))


def _skey(repo, path, commit, ent_ord=None):
    if ent_ord is None:
        return pc.binary_join_element_wise(repo, path, commit, "\x00")
    ordpad = pc.utf8_lpad(pc.cast(ent_ord, pa.string()), 8, "0")
    return pc.binary_join_element_wise(repo, path, commit, ordpad, "\x00")


def _extract_file_docs(
    batch: pa.Table,
    apply_filters: bool = True,
    extra_extensions: Optional[Dict[str, str]] = None,
) -> pa.Table:
    if apply_filters:
        batch = filter_corpus_batch(batch, extra_extensions)
    return pa.table(
        {
            "skey": _skey(batch["repo"], batch["path"], batch["commit"]),
            "repo": batch["repo"],
            "path": batch["path"],
            "commit": batch["commit"],
            "lang": batch["lang"],
            "doc_text": batch["content"],
            "sha256": pa.array(_sha256_column(batch["content"].to_pylist()), pa.string()),
        }
    )


def _extract_entity_docs(
    batch: pa.Table,
    apply_filters: bool = True,
    extra_parsers=None,
    extra_extensions: Optional[Dict[str, str]] = None,
) -> pa.Table:
    if apply_filters:
        batch = filter_corpus_batch(batch, extra_extensions)
    sha = pa.array(_sha256_column(batch["content"].to_pylist()), pa.string())
    batch = batch.append_column("sha_file", sha)
    ents = parse_batch(batch, extra_parsers, extra_extensions)
    # parse_batch drops sha; rejoin per (repo,path,commit) within the batch
    sha_map = {
        (r, p, c): s
        for r, p, c, s in zip(
            batch["repo"].to_pylist(),
            batch["path"].to_pylist(),
            batch["commit"].to_pylist(),
            sha.to_pylist(),
        )
    }
    shas = [
        sha_map[(r, p, c)]
        for r, p, c in zip(
            ents["repo"].to_pylist(), ents["path"].to_pylist(), ents["commit"].to_pylist()
        )
    ]
    ents = ents.append_column("sha256", pa.array(shas, pa.string()))
    ents = ents.append_column(
        "skey", _skey(ents["repo"], ents["path"], ents["commit"], ents["ent_ord"])
    )
    # doc_text is fully derivable from the entity columns — drop it from
    # staging (the partition builder recomputes it vectorized) to cut the
    # bytes moving through the coalesce + hive write
    ents = ents.drop_columns(["doc_text"])
    if extra_parsers is None:
        # file_path / repo_name are byte-identical to path / repo for the
        # built-in parsers — don't stage them twice; the builder re-adds
        # the aliases.  (source_code stays VERBATIM per entity: the
        # measured column breakdown — BASELINE.md round 5 — shows
        # overlapping entity slices dedupe inside the parquet compression
        # window, so verbatim is the smallest of the three candidate
        # text stagings: 25.3 MB vs 47.2 content-once vs 34.4
        # raw-byte-adaptive at 200k files.)
        ents = ents.drop_columns(["file_path", "repo_name"])
    # language column of the entity (parser-assigned), keep corpus lang name
    ents = ents.rename_columns(
        [c if c != "language" else "lang" for c in ents.column_names]
    )
    return ents


def _entity_doc_text(t: pa.Table) -> pa.Array:
    """Vectorized entity -> BM25 doc projection.  Token-sequence identical
    to ``stages.parse.entity_document`` (empty fields contribute only extra
    whitespace, which the whitespace-splitting tokenizer ignores)."""
    params = pc.fill_null(pc.binary_join(t["parameters"], " "), "")
    cols = (
        [pc.fill_null(t[c], "") for c in ("name", "signature", "docstring")]
        + [params]
        + [pc.fill_null(t[c], "") for c in ("parent_class", "return_type")]
    )
    cols = [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols]
    return pc.binary_join_element_wise(*cols, " ")


def _deterministic_sample(skeys: np.ndarray, modulus: int) -> np.ndarray:
    """Block-layout-independent sample: keep keys whose stable hash % modulus
    == 0 (pandas siphash with fixed key — identical at every parallelism
    level, unlike seeded ``random_sample`` whose output depends on block
    boundaries).

    The \\x00-joined sort keys MUST be sanitized first:
    ``pd.util.hash_array`` mis-hashes object strings with embedded NULs
    (truncation at the first NUL plus array-size-dependent collapse), which
    silently degraded the sample to repo-prefix granularity — on corpora
    whose repo prefixes all missed ``hash % modulus == 0`` the sample came
    back EMPTY, every build collapsed to one giant partition, and
    partition_build went superlinear (measured 10x).  \\x1f preserves
    per-key distinctness and never appears in repo/path/commit values."""
    if modulus <= 1:
        return skeys
    clean = (
        pd.Series(skeys, dtype=object)
        .str.replace("\x00", "\x1f", regex=False)
        .to_numpy()
    )
    h = pd.util.hash_array(clean)
    return skeys[h % modulus == 0]


def encode_postings_arrays(
    term_codes: np.ndarray,
    dictionary: pa.Array,
    global_d: np.ndarray,
    tf_arr: np.ndarray,
    dl_of_pair: np.ndarray,
) -> pa.Table:
    """Encode (term, doc) postings arrays — sorted by (term_code, doc id)
    — into the on-disk postings table: per-term varint delta doc ids
    (absolute at each term's first entry), varint tfs, and block-max WAND
    metadata for terms longer than ``BLOCK``.  Shared by the partition
    builder and by segment compaction (which decodes member partitions
    back to these arrays and re-encodes the merge)."""
    if len(term_codes):
        change = np.flatnonzero(term_codes[1:] != term_codes[:-1]) + 1
        starts = np.concatenate(([0], change, [len(term_codes)]))
    else:
        starts = np.array([0], dtype=np.int64)
    n_terms = len(starts) - 1
    g_lo, g_hi = starts[:-1], starts[1:]
    term_col = (
        pc.take(dictionary, pa.array(term_codes[g_lo], pa.int64()))
        if n_terms
        else pa.array([], pa.string())
    )
    dfs = (g_hi - g_lo).astype(np.int64)

    # one vectorized varint pass over ALL postings; per-term buffers are
    # pure byte-range slices (no per-term encode calls — this is the hot
    # loop at realistic vocabulary sizes)
    global_d = global_d.astype(np.uint64)
    deltas = global_d.copy()
    if len(deltas) > 1:
        deltas[1:] = global_d[1:] - global_d[:-1]
    deltas[g_lo] = global_d[g_lo]  # absolute value at each group start
    from ..functions.codec import varint_lengths

    dbuf = varint_encode(deltas)
    dpos = np.concatenate(([0], np.cumsum(varint_lengths(deltas))))
    tf_u = tf_arr.astype(np.uint64)
    tbuf = varint_encode(tf_u)
    tpos = np.concatenate(([0], np.cumsum(varint_lengths(tf_u))))
    doc_bufs = [dbuf[dpos[lo] : dpos[hi]] for lo, hi in zip(g_lo, g_hi)]
    tf_bufs = [tbuf[tpos[lo] : tpos[hi]] for lo, hi in zip(g_lo, g_hi)]

    blk_last: List[bytes] = [b""] * n_terms
    blk_maxtf: List[bytes] = [b""] * n_terms
    blk_mindl: List[bytes] = [b""] * n_terms
    for k in np.flatnonzero(dfs > BLOCK):  # rare: only long postings
        lo, hi = g_lo[k], g_hi[k]
        ids = global_d[lo:hi].astype(np.int64)
        tfs = tf_arr[lo:hi]
        nb = -(-(hi - lo) // BLOCK)
        lasts = ids[np.minimum(np.arange(1, nb + 1) * BLOCK - 1, hi - lo - 1)]
        mx = np.array(
            [tfs[j * BLOCK : (j + 1) * BLOCK].max() for j in range(nb)], dtype=np.uint64
        )
        dl_local = dl_of_pair[lo:hi]
        mn = np.array(
            [dl_local[j * BLOCK : (j + 1) * BLOCK].min() for j in range(nb)],
            dtype=np.uint64,
        )
        blk_last[k] = delta_varint_encode(lasts)
        blk_maxtf[k] = varint_encode(mx)
        blk_mindl[k] = varint_encode(mn)

    return pa.table(
        {
            "term": term_col.cast(pa.string()),
            "df": pa.array(dfs, pa.int64()),
            "doc_ids": pa.array(doc_bufs, pa.binary()),
            "tfs": pa.array(tf_bufs, pa.binary()),
            "block_last": pa.array(blk_last, pa.binary()),
            "block_max_tf": pa.array(blk_maxtf, pa.binary()),
            "block_min_dl": pa.array(blk_mindl, pa.binary()),
        }
    )


def _postings_payload_bytes(postings: pa.Table) -> int:
    """Posting-payload size (doc-id + tf buffers) of an encoded table."""
    return int(
        pc.sum(pc.binary_length(postings["doc_ids"])).as_py() or 0
    ) + int(pc.sum(pc.binary_length(postings["tfs"])).as_py() or 0)


class _PartitionBuilder:
    """Builds one doc-range partition of the inverted index (called inside
    ``groupby(part_id).map_groups``).  Sorts the group by the canonical key,
    assigns dense docIDs from the precomputed offsets, tokenizes with the
    vectorized Arrow tokenizer, and writes compressed postings + docmeta
    atomically; returns one summary row.  Resume: if a lineage record with
    the current ``build_id`` exists, the partition is skipped."""

    def __init__(
        self,
        index_dir: str,
        offsets: Dict[int, int],
        build_id: str,
        mode: str,
        resume: bool,
        with_positions: bool = False,
    ):
        self.index_dir = index_dir
        self.offsets = offsets
        self.build_id = build_id
        self.mode = mode
        self.resume = resume
        self.with_positions = with_positions

    def __call__(self, tbl: pa.Table, pid: int) -> dict:
        """Arrow-native end to end: no pandas / per-row Python objects (they
        were the memory-allocator contention point under 32 concurrent
        tasks)."""
        # one Ray task = one CPU: stop Arrow's internal pool from spawning a
        # machine-wide thread set per concurrent task (oversubscription made
        # each task ~6x slower at 32-way concurrency)
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
        t0 = time.time()
        base = self.offsets[pid]
        n = len(tbl)
        post_path = os.path.join(self.index_dir, "postings", f"part-{pid:05d}.parquet")
        meta_path = os.path.join(self.index_dir, "docmeta", f"part-{pid:05d}.parquet")
        if self.resume:
            rec = read_lineage(self.index_dir, pid)
            # lineage is written only after the data files are renamed into
            # place, so a crash can't leave a record without files — but a
            # manually-deleted partition file must trigger a rebuild
            if (
                rec is not None
                and rec.build_id == self.build_id
                and rec.n_docs == n
                and os.path.exists(post_path)
                and os.path.exists(meta_path)
            ):
                return rec.to_dict()

        if "skey" not in tbl.column_names:  # staging omits derivable columns
            tbl = tbl.append_column(
                "skey",
                _skey(
                    tbl["repo"], tbl["path"], tbl["commit"],
                    tbl["ent_ord"] if "ent_ord" in tbl.column_names else None,
                ),
            )
        tbl = tbl.take(pc.sort_indices(tbl["skey"]))
        if "file_path" not in tbl.column_names and "path" in tbl.column_names:
            # staging drops the alias columns (byte-identical twins)
            tbl = tbl.append_column("file_path", tbl["path"])
            tbl = tbl.append_column("repo_name", tbl["repo"])
        if "doc_text" not in tbl.column_names:  # entity mode: recompute
            tbl = tbl.append_column("doc_text", _entity_doc_text(tbl))
        doc_ids = base + np.arange(n, dtype=np.int64)
        tokens = tokenize_array(tbl["doc_text"])
        doc_len = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)

        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        # (term, doc) -> tf fully vectorized: dictionary-encode terms (Arrow,
        # C++), sort (code, doc) pairs, run-length the sorted pairs.  Term
        # order on disk is dictionary order (irrelevant: query-time lookup is
        # by hash); doc order within a term is ascending (delta encoding).
        dict_arr = pc.dictionary_encode(flat)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = np.asarray(dict_arr.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        dictionary = dict_arr.dictionary
        # single combined-key introsort (code*n+doc fits int64: both factors
        # are partition-local counts).  Non-stable is fine — equal
        # (term, doc) occurrences are interchangeable for tf counting — and
        # ~4x faster than the two-key lexsort on this box.  The positional
        # build needs the STABLE kind: within a (term, doc) run the original
        # occurrence order IS ascending token position.
        key = codes * np.int64(max(n, 1)) + parents
        order = np.argsort(key, kind="stable" if self.with_positions else None)
        key_s = key[order]
        c_s, d_s = codes[order], parents[order].astype(np.int64)
        if len(c_s):
            pair_bound = np.flatnonzero(key_s[1:] != key_s[:-1]) + 1
            pair_starts = np.concatenate(([0], pair_bound))
            tf_arr = np.diff(np.concatenate((pair_starts, [len(c_s)]))).astype(np.int64)
            term_codes = c_s[pair_starts]
            d_arr = d_s[pair_starts]
        else:
            tf_arr = np.empty(0, dtype=np.int64)
            term_codes = np.empty(0, dtype=np.int64)
            d_arr = np.empty(0, dtype=np.int64)
        global_d = (doc_ids[d_arr] if len(d_arr) else d_arr).astype(np.uint64)
        dl_of_pair = doc_len[d_arr] if len(d_arr) else np.empty(0, np.int64)
        postings = encode_postings_arrays(
            term_codes, dictionary, global_d, tf_arr, dl_of_pair
        )
        n_terms = len(postings)

        positions_tbl = None
        if self.with_positions:
            # token position within doc per occurrence; the stable sort
            # above keeps each (term, doc) run in ascending position order
            from ..functions.codec import varint_lengths

            if len(c_s):
                row_starts = np.concatenate(([0], np.cumsum(doc_len)))
                pos_all = np.arange(len(parents), dtype=np.int64) - row_starts[parents]
                pos_s = pos_all[order].astype(np.uint64)
                deltas = pos_s.copy()
                if len(deltas) > 1:
                    deltas[1:] = pos_s[1:] - pos_s[:-1]  # wraps at pair
                deltas[pair_starts] = pos_s[pair_starts]  # ...starts: absolute
                pbuf = varint_encode(deltas)
                ppos = np.concatenate(([0], np.cumsum(varint_lengths(deltas))))
                # per-TERM occurrence byte ranges (postings rows align 1:1)
                t_change = np.flatnonzero(term_codes[1:] != term_codes[:-1]) + 1
                t_starts = np.concatenate(([0], t_change, [len(term_codes)]))
                occ_bounds = np.concatenate((pair_starts, [len(c_s)]))
                occ_lo = occ_bounds[t_starts[:-1]]
                occ_hi = occ_bounds[t_starts[1:]]
                pos_bufs = [pbuf[ppos[lo]:ppos[hi]] for lo, hi in zip(occ_lo, occ_hi)]
            else:
                pos_bufs = []
            positions_tbl = pa.table(
                {"term": postings["term"], "positions": pa.array(pos_bufs, pa.binary())}
            )

        meta_cols: Dict[str, pa.Array] = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "repo": tbl["repo"],
            "path": tbl["path"],
            "commit": tbl["commit"],
            "lang": tbl["lang"],
            "sha256": tbl["sha256"],
            "doc_len": pa.array(doc_len, pa.int64()),
        }
        if self.mode == "entity":
            for col in DOCMETA_EXTRA_ENTITY:
                if col in tbl.column_names:
                    meta_cols[col] = tbl[col]
        docmeta = pa.table(meta_cols)

        writes = [(postings, post_path), (docmeta, meta_path)]
        subs = ["postings", "docmeta"]
        if positions_tbl is not None:
            subs.append("positions")
            writes.append(
                (
                    positions_tbl,
                    os.path.join(self.index_dir, "positions", f"part-{pid:05d}.parquet"),
                )
            )
        for sub in subs:
            os.makedirs(os.path.join(self.index_dir, sub), exist_ok=True)
        for out_tbl, path in writes:
            tmp = f"{path}.tmp-{os.getpid()}"
            pq.write_table(out_tbl, tmp)
            os.replace(tmp, path)

        rec = PartitionRecord(
            part_id=pid,
            doc_lo=int(base),
            doc_hi=int(base + n),
            n_docs=n,
            total_tokens=int(doc_len.sum()),
            n_terms=int(n_terms),
            postings_bytes=_postings_payload_bytes(postings),
            build_sec=round(time.time() - t0, 3),
            build_id=self.build_id,
        )
        write_lineage(self.index_dir, rec)
        return rec.to_dict()


def build_index(
    corpus,
    index_dir: str,
    *,
    mode: str = "file",
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
    docs_per_partition: int = 10_000,
    partition_bytes: int = 256 << 20,
    coalesce_block_bytes: int = 256 << 20,
    max_partitions: int = 4096,
    resume: bool = True,
    apply_path_filters: bool = True,
    extra_parsers=None,
    extra_extensions: Optional[Dict[str, str]] = None,
    with_positions: bool = False,
) -> IndexManifest:
    """Build a sharded BM25 index from a corpus parquet path / Dataset.

    ``with_positions=True`` additionally writes per-term token-position
    postings (``positions/part-NNNNN.parquet``, delta-varint per doc) for
    positional phrase search (Lucene-PhraseQuery token-adjacency
    semantics) — opt-in because it roughly doubles posting bytes.

    ``mode="file"`` indexes each file's raw content as one document;
    ``mode="entity"`` extracts code entities first and indexes the
    entity->document projection (the reference's BM25 corpus,
    ``bm25_index.py:74-84``).  Partition sizing is BYTE-aware: the number of
    doc-range partitions is the max of a rows-based target
    (``docs_per_partition`` corpus FILES per partition) and a bytes-based
    target (``partition_bytes`` uncompressed source bytes per partition,
    estimated from parquet row-group metadata — no data scan), so a corpus
    of few huge files still fans out and a corpus of many tiny files does
    not explode into thousands of partitions.  Partition size costs are
    SUPERLINEAR (the (term, doc) sort + codec over a 4M-pair partition
    measured ~6x slower per doc than a 400k-pair one on this box), so the
    defaults target small-ish partitions; at 100-TB scale raise
    ``max_partitions`` rather than the per-partition size.  The staging coalesce before
    the hive-partitioned write is likewise input-proportional
    (``coalesce_block_bytes`` per block) instead of a fixed block count, so
    no staged block exceeds ~2x the target at any corpus size.
    ``extra_parsers`` / ``extra_extensions`` extend the language registry
    for this build — they are shipped inside the pipeline closures
    (driver-side registry mutation does not reach Ray workers).
    """
    from ..state.manifest import normalize_dir

    index_dir = normalize_dir(index_dir)
    files_per_partition = docs_per_partition
    os.makedirs(index_dir, exist_ok=True)
    corpus_path = normalize_dir(corpus) if isinstance(corpus, str) else None
    phase_sec: Dict[str, float] = {}
    _t = time.time()

    def _mark(name: str) -> None:
        nonlocal _t
        phase_sec[name] = round(time.time() - _t, 3)
        _t = time.time()

    import functools
    import json as _json
    import shutil

    import ray

    # --- pass A: partition boundaries from the corpus FILE keys — three
    # pruned columns, no parse.  File-key boundaries induce contiguous
    # entity doc ranges because the canonical entity key is its file key
    # plus an ordinal suffix (lexicographic extension), so one cheap key
    # pass serves both modes.
    if corpus_path is not None:
        keys_src = read_corpus(corpus_path, columns=["repo", "path", "commit"])
        # row count + uncompressed byte estimate from parquet METADATA (no
        # scan); filters only shave a few percent and partition sizing is
        # approximate by design
        n_files = 0
        est_bytes = 0
        files = (
            [corpus_path]
            if os.path.isfile(corpus_path)
            else [
                os.path.join(corpus_path, f)
                for f in os.listdir(corpus_path)
                if f.endswith(".parquet")
            ]
        )
        # footer reads are independent I/O — thread them (the serial loop
        # was ~1.3 s of driver floor at 64 shards)
        from concurrent.futures import ThreadPoolExecutor

        def _shard_md(f):
            md = pq.ParquetFile(f).metadata
            return md.num_rows, sum(
                md.row_group(rg).total_byte_size
                for rg in range(md.num_row_groups)
            )

        with ThreadPoolExecutor(max_workers=min(16, max(1, len(files)))) as ex:
            for nr, nb in ex.map(_shard_md, files):
                n_files += nr
                est_bytes += nb
    else:
        keys_src = corpus
        n_files = corpus.count()
        est_bytes = int(corpus.size_bytes() or 0)
    _mark("count")

    def key_batch(t: pa.Table) -> pa.Table:
        if apply_path_filters:
            t = filter_corpus_batch(t, extra_extensions)
        return pa.table({"skey": _skey(t["repo"], t["path"], t["commit"])})

    keys = keys_src.map_batches(key_batch, batch_format="pyarrow")
    if n_files == 0:
        raise ValueError("corpus has zero rows")
    # rows-based OR bytes-based, whichever fans out more: few huge files
    # still split by bytes; billions of tiny files don't explode (clamped)
    parts_by_rows = -(-n_files // files_per_partition)
    parts_by_bytes = -(-est_bytes // partition_bytes) if est_bytes else 0
    num_partitions = max(1, min(max_partitions, max(parts_by_rows, parts_by_bytes)))
    target_sample = min(100_000, max(1_000, 200 * num_partitions))
    modulus = max(1, n_files // target_sample)

    if corpus_path is not None and n_files <= SMALL_SAMPLE_DRIVER_ROWS:
        # driver shortcut (same pattern as dedup's SMALL_BANDS_DRIVER_ROWS):
        # small corpora sample faster single-process than paying the
        # distributed executor's fixed overhead; large corpora sample
        # distributed (the driver path is a serial floor — see the
        # constant's note).  The sampled SET is identical either way
        # (hash-mod filter, order-independent), so this changes
        # wall-clock only.
        import pyarrow.dataset as pads

        key_tbl = pads.dataset(files, format="parquet").to_table(
            columns=["repo", "path", "commit"]
        )
        key_tbl = key_batch(key_tbl)
        sample_keys = sorted(
            _deterministic_sample(
                key_tbl["skey"].to_numpy(zero_copy_only=False), modulus
            ).tolist()
        )
    else:
        sampled = keys.map_batches(
            lambda t: pa.table(
                {"skey": _deterministic_sample(t["skey"].to_numpy(zero_copy_only=False), modulus)}
            ),
            batch_format="pyarrow",
        ).take_all()
        sample_keys = sorted(r["skey"] for r in sampled)
    _mark("sample")
    boundaries: List[str] = []
    if num_partitions > 1 and sample_keys:
        idx = (np.arange(1, num_partitions) * len(sample_keys)) // num_partitions
        boundaries = sorted(set(sample_keys[i] for i in idx))
    params = {
        "mode": mode, "k1": k1, "b": b, "epsilon": epsilon,
        "apply_path_filters": apply_path_filters,
        "extra_langs": sorted((extra_parsers or {}).keys())
        + sorted((extra_extensions or {}).keys()),
    }
    build_id = compute_build_id(n_files, boundaries, params)
    bnd_arr = np.array(boundaries, dtype=object)
    P = len(boundaries) + 1

    def add_part_id(t: pa.Table) -> pa.Table:
        sk = t["skey"].to_numpy(zero_copy_only=False)
        if len(bnd_arr):
            pid = np.searchsorted(bnd_arr, sk, side="right")
        else:
            pid = np.zeros(len(sk), dtype=np.int64)
        # skey is derivable (repo/path/commit[/ent_ord]) — don't stage it;
        # the partition builder recomputes it for the within-partition sort
        return t.drop_columns(["skey"]).append_column("part_id", pa.array(pid, pa.int64()))

    # --- pass B: extract + doc-range partitioning in ONE streaming pass.
    # A hive-partitioned write (each task appends its rows to part_id=K
    # subdirs) replaces a groupby(part_id) sort shuffle — the all-to-all
    # goes through the filesystem with no ordering barrier (measured: the
    # sort-based groupby cost 5-10x the partition builds themselves).
    # Block sizing happens at the READ (override_num_blocks = the
    # input-proportional coalesce target, floored at one block per CPU so
    # parse stays fully parallel): extract output then lands in write-sized
    # blocks with NO repartition exchange at all (measured 2x faster than
    # extract + repartition).  Only a caller-provided Dataset (unknown
    # block layout) still coalesces explicitly.
    staged_parts = os.path.join(index_dir, "staged_parts")
    marker2 = os.path.join(index_dir, "_PARTED.json")
    parted_valid = False
    if resume and os.path.exists(marker2):
        try:
            parted_valid = _json.load(open(marker2)).get("build_id") == build_id
        except (ValueError, OSError):
            parted_valid = False
    if not parted_valid:
        shutil.rmtree(staged_parts, ignore_errors=True)
        # the build changed (input/params/boundaries): every derived artifact
        # is stale.  Clearing here is what prevents an old, larger build's
        # partition files from leaking into the new lexicon (stale df >
        # n_docs => log of a negative => NaN idf) or docmeta joins.
        for derived in (
            "postings", "docmeta", "lineage", "embeddings", "positions",
            "tombstones", "lex_ddf",  # deletes apply to the OLD partitions
        ):
            shutil.rmtree(os.path.join(index_dir, derived), ignore_errors=True)
        # extraction expands bytes (~2x in entity mode: source_code + entity
        # metadata travel per row) — size blocks on the expanded estimate
        staged_bytes = est_bytes * (2 if mode == "entity" else 1)
        n_coalesce = int(max(16, -(-staged_bytes // coalesce_block_bytes))) if est_bytes else 16
        # keep the fragment-file product (blocks x partitions) bounded: each
        # staged block writes at most one file per partition it overlaps
        n_coalesce = min(n_coalesce, 8 * num_partitions)
        # at least one read block per CPU keeps the parse stage fully
        # parallel; sizing the READ blocks (instead of a repartition after
        # extract) removes the all-to-all exchange entirely — measured 2x
        # faster for the whole pass
        n_read_blocks = max(n_coalesce, int(ray.cluster_resources().get("CPU", 32)))
        if corpus_path is not None:
            src = read_corpus(corpus_path, override_num_blocks=n_read_blocks)
            need_repartition = False
        else:
            src = corpus  # caller-provided Dataset: block layout unknown
            need_repartition = True
        if mode == "entity":
            extract = functools.partial(
                _extract_entity_docs,
                apply_filters=apply_path_filters,
                extra_parsers=extra_parsers,
                extra_extensions=extra_extensions,
            )
        else:
            extract = functools.partial(
                _extract_file_docs,
                apply_filters=apply_path_filters,
                extra_extensions=extra_extensions,
            )
        # batch_size=None = one batch per block: the hive sink writes a row
        # group per arriving batch, and fragmented row groups come back as
        # hundreds of chunks per column in the partition builders (measured
        # 2x slower partition_build at 1M files with the default batch size)
        staged = src.map_batches(
            extract, batch_format="pyarrow", batch_size=None
        ).map_batches(add_part_id, batch_format="pyarrow", batch_size=None)
        if need_repartition:
            staged = staged.repartition(n_coalesce)
        # one row group per fragment: the sink otherwise emits a row group
        # per arriving sub-batch (~300 rows), and many-row-group fragments
        # read back as heavily chunked columns in the partition builders
        staged.write_parquet(
            staged_parts, partition_cols=["part_id"], row_group_size=1_000_000
        )
        with open(marker2, "w") as f:
            _json.dump({"build_id": build_id}, f)
    _mark("extract_partition_write")

    # per-partition doc counts: parquet METADATA only (no data read);
    # footer reads threaded — the serial loop grows with partitions x
    # fragments and was part of the fixed driver floor
    from concurrent.futures import ThreadPoolExecutor

    frag_jobs = []
    for p in range(P):
        sub = os.path.join(staged_parts, f"part_id={p}")
        if os.path.isdir(sub):
            frag_jobs.extend(
                (p, os.path.join(sub, f))
                for f in os.listdir(sub)
                if f.endswith(".parquet")
            )
    counts_vec = np.zeros(P, dtype=np.int64)
    if frag_jobs:
        with ThreadPoolExecutor(max_workers=min(16, len(frag_jobs))) as ex:
            for p, nr in ex.map(
                lambda job: (job[0], pq.ParquetFile(job[1]).metadata.num_rows),
                frag_jobs,
            ):
                counts_vec[p] += nr
    n_docs = int(counts_vec.sum())
    if n_docs == 0:
        raise ValueError("corpus produced zero documents after extraction")
    offsets: Dict[int, int] = {}
    acc = 0
    for p in range(P):
        offsets[p] = acc
        acc += int(counts_vec[p])
    # a full (re)build owns partitions 0..P-1 exactly: drop any higher-pid
    # partition files left by earlier append_index runs — they would
    # otherwise leak stale dfs into the lexicon pass below, which globs
    # every postings file on disk (a differently-sized OLD BUILD can't
    # leak: its build_id differs, which wipes the derived dirs above)
    for sub in ("postings", "docmeta"):
        d = os.path.join(index_dir, sub)
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.startswith("part-") and f.endswith(".parquet"):
                    if int(f[5:10]) >= P:
                        os.remove(os.path.join(d, f))
    lin_dir = os.path.join(index_dir, "lineage")
    if os.path.isdir(lin_dir):
        for f in os.listdir(lin_dir):
            if f.startswith("part-") and int(f.split(".")[0][5:]) >= P:
                os.remove(os.path.join(lin_dir, f))
    _mark("part_counts")

    # --- pass C: independent per-partition index builds (pure Ray tasks)
    builder = _PartitionBuilder(
        index_dir, offsets, build_id, mode, resume, with_positions=with_positions
    )

    # 2 CPUs per builder caps concurrency at ~cluster/2: partition builds
    # are memory-bandwidth-bound (sort + varint over all token pairs) and
    # this box saturates at ~16 concurrent memory-heavy workers — 32-way
    # oversubscription measured SLOWER than 16-way
    @ray.remote(num_cpus=2)
    def build_one(pid: int) -> dict:
        rec = read_lineage(index_dir, pid) if resume else None
        if (
            rec is not None
            and rec.build_id == build_id
            and os.path.exists(os.path.join(index_dir, "postings", f"part-{pid:05d}.parquet"))
            and os.path.exists(os.path.join(index_dir, "docmeta", f"part-{pid:05d}.parquet"))
        ):
            return rec.to_dict()
        sub = os.path.join(staged_parts, f"part_id={pid}")
        # fragments are written with one row group each, so columns arrive
        # with ~one chunk per fragment — no combine_chunks copy needed
        return builder(pq.read_table(sub), pid)

    live_parts = [p for p in range(P) if counts_vec[p] > 0]
    summaries = pd.DataFrame(ray.get([build_one.remote(p) for p in live_parts]))
    _mark("partition_build")
    total_tokens = int(summaries["total_tokens"].sum())

    # a resumed build over an index that has since been TOMBSTONE-deleted
    # (same build_id: partitions + tombstones + lex_ddf all survive the
    # resume check) must carry the delete corrections — recomputing the
    # scalars from the full partition files while lex_ddf still subtracts
    # df would mix alive df with pre-delete N/avgdl
    tomb_extra: Dict = {}
    old_mpath = os.path.join(index_dir, "manifest.json")
    if resume and os.path.exists(old_mpath):
        try:
            old_m = IndexManifest.load(index_dir)
        except (ValueError, KeyError, OSError, TypeError):
            old_m = None
        if (
            old_m is not None
            and old_m.build_id == build_id
            and old_m.extra.get("deletes")
            and os.path.isdir(os.path.join(index_dir, "tombstones"))
        ):
            n_docs -= int(old_m.extra.get("tombstoned_docs", 0))
            total_tokens -= int(old_m.extra.get("dead_tokens", 0))
            tomb_extra = {
                k: old_m.extra[k]
                for k in ("deletes", "tombstoned_docs", "dead_tokens")
                if k in old_m.extra
            }
    avgdl = total_tokens / n_docs

    # --- pass D: global lexicon (shared with append_index)
    average_idf, vocab_size = _lexicon_pass(index_dir, n_docs, epsilon)
    _mark("lexicon")
    partitions = [
        PartitionRecord.from_dict(r)
        for r in summaries.sort_values("part_id").to_dict("records")
    ]
    manifest = IndexManifest(
        mode=mode,
        n_docs=n_docs,
        total_tokens=total_tokens,
        avgdl=avgdl,
        vocab_size=vocab_size,
        average_idf=average_idf,
        k1=k1,
        b=b,
        epsilon=epsilon,
        num_partitions=len(boundaries) + 1,
        build_id=build_id,
        boundaries=boundaries,
        partitions=partitions,
        extra={
            "phase_sec": phase_sec,
            "lex_buckets": LEX_BUCKETS,
            # deployment contract: every node must see index_dir at this
            # path (shared POSIX fs / FUSE mount) — see manifest.normalize_dir
            "filesystem": "shared-posix",
            "positions": bool(with_positions),
            # file-mode phrase verification reads raw content back from the
            # corpus (docmeta stores no text); recorded when given as a path
            "corpus_dir": corpus_path,
            **tomb_extra,
        },
    )
    manifest.save(index_dir)
    return manifest


def _lexicon_pass(index_dir: str, n_docs: int, epsilon: float):
    """Global lexicon rebuild over EVERY postings partition currently on
    disk — the groupby(term)-aggregate merge of the per-partition partial
    dfs, implemented as an explicit hash-partitioned exchange: LEX_BUCKETS
    parallel tasks each aggregate the terms whose stable hash lands in
    their bucket (reading only the tiny term/df columns of every
    partition's postings), then a second tiny round applies the epsilon
    floor once the driver has combined the per-bucket (sum_idf, vocab)
    partials.  Buckets are written sorted-by-term with small row groups,
    so a query term resolves via bucket hash + parquet predicate pushdown
    — the vocabulary is never loaded whole anywhere.

    Cost scales with VOCABULARY, not corpus size, which is what makes
    ``append_index`` incremental: appending partitions re-runs only this
    pass (plus the new partitions' builds), never the old partitions.

    Returns (average_idf, vocab_size)."""
    import shutil

    import ray

    post_files = sorted(
        os.path.join(index_dir, "postings", f)
        for f in os.listdir(os.path.join(index_dir, "postings"))
        if f.endswith(".parquet")
    )
    lex_dir = os.path.join(index_dir, "lexicon")
    os.makedirs(lex_dir, exist_ok=True)
    for f in os.listdir(lex_dir):
        os.remove(os.path.join(lex_dir, f))

    # phase 0 (map side of the term exchange): each postings file is read
    # ONCE; its term/df rows are split by term-hash into per-bucket fragment
    # files.  No task ever materializes more than one file's terms.
    lex_tmp = os.path.join(index_dir, "lex_tmp")
    shutil.rmtree(lex_tmp, ignore_errors=True)
    # NB: loop var must not shadow the BM25 `b` parameter (it reaches the
    # manifest below)
    for bk in range(LEX_BUCKETS):
        os.makedirs(os.path.join(lex_tmp, f"bucket={bk}"), exist_ok=True)

    @ray.remote(num_cpus=1)
    def lex_split(file_idx: int) -> None:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        tbl = pq.read_table(post_files[file_idx], columns=["term", "df"])
        terms = tbl["term"].combine_chunks()
        # object-dtype view without an intermediate Python list; hash values
        # are identical (same str objects) so query-side bucket lookup
        # (pd.util.hash_array on the query term) still agrees
        h = pd.util.hash_array(terms.to_numpy(zero_copy_only=False))
        buckets = (h % LEX_BUCKETS).astype(np.int64)
        for b in np.unique(buckets):
            sub = tbl.filter(pa.array(buckets == b))
            pq.write_table(
                sub, os.path.join(lex_tmp, f"bucket={b}", f"frag-{file_idx:05d}.parquet")
            )

    ray.get([lex_split.remote(i) for i in range(len(post_files))])

    # tombstone corrections: lex_ddf/bucket={b}/part-*.parquet holds the
    # per-term df contributed by TOMBSTONED docs (written by
    # tombstone_delete, removed when a partition is physically rebuilt).
    # Subtracting here keeps every lexicon refresh (build/append/delete)
    # consistent without touching partition files.
    ddf_root = os.path.join(index_dir, "lex_ddf")

    @ray.remote(num_cpus=1)
    def lex_bucket(b: int) -> tuple:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        frag_dir = os.path.join(lex_tmp, f"bucket={b}")
        frags = sorted(os.listdir(frag_dir))
        if not frags:
            return 0.0, 0
        sub = pa.concat_tables(
            pq.read_table(os.path.join(frag_dir, f)) for f in frags
        )
        ddf_dir = os.path.join(ddf_root, f"bucket={b}")
        if os.path.isdir(ddf_dir):
            dead = [
                pq.read_table(os.path.join(ddf_dir, f))
                for f in sorted(os.listdir(ddf_dir))
                if f.endswith(".parquet")
            ]
            if dead:
                neg = pa.concat_tables(dead)
                sub = pa.concat_tables(
                    [
                        sub,
                        pa.table(
                            {
                                "term": neg["term"],
                                "df": pc.negate(pc.cast(neg["ddf"], pa.int64())),
                            }
                        ),
                    ]
                )
        dict_arr = pc.dictionary_encode(sub["term"].combine_chunks())
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dfs_local = sub["df"].to_numpy(zero_copy_only=False)
        agg = np.bincount(codes, weights=dfs_local).astype(np.int64)
        terms_arr = dict_arr.dictionary
        if (agg <= 0).any():  # fully-deleted terms leave the lexicon
            alive = agg > 0
            terms_arr = terms_arr.filter(pa.array(alive))
            agg = agg[alive]
        # Sort by term BEFORE the idf_raw partial sum: the per-bucket fold
        # order is then a pure function of the bucket's (term -> df) map,
        # so FederatedEngine._union_average_idf can reproduce the union
        # build's epsilon floor bit-identically (same sorted arrays, same
        # numpy pairwise summation), not just to ulp tolerance.
        order = pc.sort_indices(terms_arr)
        terms_arr = terms_arr.take(order)
        agg = agg[order.to_numpy(zero_copy_only=False)]
        idf_raw = np.log(n_docs - agg.astype(np.float64) + 0.5) - np.log(
            agg.astype(np.float64) + 0.5
        )
        out = pa.table(
            {
                "term": terms_arr,
                "df": pa.array(agg, pa.int64()),
                "idf_raw": pa.array(idf_raw, pa.float64()),
            }
        )
        pq.write_table(out, os.path.join(lex_dir, f"bucket-{b:04d}.tmp"))
        return float(idf_raw.sum()), int(len(agg))

    partials = ray.get([lex_bucket.remote(b) for b in range(LEX_BUCKETS)])
    vocab_size = int(sum(c for _, c in partials))
    average_idf = float(sum(s for s, _ in partials)) / vocab_size if vocab_size else 0.0
    eps_floor = epsilon * average_idf

    @ray.remote(num_cpus=1)
    def lex_floor(b: int) -> None:
        tmp = os.path.join(lex_dir, f"bucket-{b:04d}.tmp")
        if not os.path.exists(tmp):  # empty bucket
            return
        t = pq.read_table(tmp)
        raw = t["idf_raw"].to_numpy(zero_copy_only=False)
        idf = np.where(raw < 0, eps_floor, raw)
        out = pa.table(
            {"term": t["term"], "df": t["df"], "idf": pa.array(idf, pa.float64())}
        )
        pq.write_table(
            out, os.path.join(lex_dir, f"bucket-{b:04d}.parquet"), row_group_size=8192
        )
        os.remove(tmp)

    ray.get([lex_floor.remote(b) for b in range(LEX_BUCKETS)])
    shutil.rmtree(lex_tmp, ignore_errors=True)
    return average_idf, vocab_size


# docmeta sha sets up to this size broadcast to the dedup filter as one
# object-store array; above it the dedup is a distributed left-anti join
# (same result set — equivalence-tested with a forced threshold)
APPEND_BROADCAST_SHAS = 2_000_000


def append_index(
    index_dir: str,
    corpus,
    *,
    dedup_on_insert: bool = False,
    docs_per_partition: int = 10_000,
    partition_bytes: int = 256 << 20,
    max_partitions: int = 4096,
    apply_path_filters: bool = True,
    extra_parsers=None,
    extra_extensions: Optional[Dict[str, str]] = None,
    resume: bool = True,
) -> IndexManifest:
    """Incrementally add a corpus to an existing index — the reference's
    insert path (``api/server.py`` POST /index + ``bm25_index.py``
    add_documents: new docs get the NEXT docIDs, exact duplicates are
    dropped when dedup is on) re-expressed as an append-only build:

    - existing partitions are NEVER touched (their postings, docmeta and
      docIDs are byte-identical before and after);
    - the appended files become NEW partitions (ids ``P_old..``) with
      docIDs starting at the old ``n_docs``, ordered lexicographically
      within the append batch — insertion-order semantics;
    - only the lexicon (cost ∝ vocabulary) and the manifest scalars
      (N, avgdl, average_idf — exactly the full-rebuild values, since
      they are order-independent sums) are recomputed;
    - ``dedup_on_insert=True`` drops appended FILES whose content sha256
      already exists in the index (J2), plus exact duplicates within the
      batch (first by key wins) — broadcast-set filter for small
      indexes, distributed left-anti join above APPEND_BROADCAST_SHAS.

    Appends are idempotent: each is identified by a deterministic
    ``append_id`` (old manifest build_id + the new corpus fingerprint)
    recorded in ``manifest.extra["appends"]``; re-running a completed
    append is a no-op, and a crashed one resumes partition-by-partition
    through the same lineage records the full build uses.
    """
    import functools
    import json as _json

    import ray

    from ..state.manifest import normalize_dir

    index_dir = normalize_dir(index_dir)
    manifest = IndexManifest.load(index_dir)
    mode = manifest.mode
    corpus_path = normalize_dir(corpus) if isinstance(corpus, str) else None

    # --- fingerprint the append batch (cheap: parquet metadata + keys)
    if corpus_path is not None:
        files = (
            [corpus_path]
            if os.path.isfile(corpus_path)
            else sorted(
                os.path.join(corpus_path, f)
                for f in os.listdir(corpus_path)
                if f.endswith(".parquet")
            )
        )
        n_files = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        est_bytes = sum(
            pq.ParquetFile(f).metadata.row_group(rg).total_byte_size
            for f in files
            for rg in range(pq.ParquetFile(f).metadata.num_row_groups)
        )
        src = read_corpus(corpus_path)
    else:
        files = []
        src = corpus
        n_files = corpus.count()
        est_bytes = int(corpus.size_bytes() or 0)
    if n_files == 0:
        return manifest

    params = {
        "op": "append",
        "base_build": manifest.build_id,
        "dedup": bool(dedup_on_insert),
        "mode": mode,
        "apply_path_filters": apply_path_filters,
        "extra_langs": sorted((extra_parsers or {}).keys())
        + sorted((extra_extensions or {}).keys()),
        "src": corpus_path or "<dataset>",
    }
    append_id = compute_build_id(n_files, [], params)
    for a in manifest.extra.get("appends", []):
        if a["append_id"] == append_id:
            return manifest  # this exact append already applied

    # --- boundaries over the APPEND batch's file keys
    def key_batch(t: pa.Table) -> pa.Table:
        if apply_path_filters:
            t = filter_corpus_batch(t, extra_extensions)
        return pa.table({"skey": _skey(t["repo"], t["path"], t["commit"])})

    parts_by_rows = -(-n_files // docs_per_partition)
    parts_by_bytes = -(-est_bytes // partition_bytes) if est_bytes else 0
    p_new = max(1, min(max_partitions, max(parts_by_rows, parts_by_bytes)))
    target_sample = min(100_000, max(1_000, 200 * p_new))
    modulus = max(1, n_files // target_sample)
    if corpus_path is not None and n_files <= SMALL_SAMPLE_DRIVER_ROWS:
        import pyarrow.dataset as pads

        key_tbl = key_batch(
            pads.dataset(files, format="parquet").to_table(
                columns=["repo", "path", "commit"]
            )
        )
        sample_keys = sorted(
            _deterministic_sample(
                key_tbl["skey"].to_numpy(zero_copy_only=False), modulus
            ).tolist()
        )
    else:
        sampled = (
            src.map_batches(key_batch, batch_format="pyarrow")
            .map_batches(
                lambda t: pa.table(
                    {
                        "skey": _deterministic_sample(
                            t["skey"].to_numpy(zero_copy_only=False), modulus
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .take_all()
        )
        sample_keys = sorted(r["skey"] for r in sampled)
    boundaries: List[str] = []
    if p_new > 1 and sample_keys:
        idx = (np.arange(1, p_new) * len(sample_keys)) // p_new
        boundaries = sorted(set(sample_keys[i] for i in idx))
    bnd_arr = np.array(boundaries, dtype=object)
    p_old = manifest.num_partitions
    n_old = manifest.n_docs
    # id watermark: ids continue past the highest EXISTING id, which is
    # NOT n_docs once tombstone deletes leave gaps (n_docs counts alive
    # docs; reusing a dead doc's id would collide at the next delete or
    # resurrect it through the tombstone mask)
    id_watermark = max((p.doc_hi for p in manifest.partitions), default=n_old)
    P = len(boundaries) + 1

    # --- optional J2 dedup-on-insert at FILE granularity, BEFORE extract
    if dedup_on_insert:
        def add_file_sha(t: pa.Table) -> pa.Table:
            return t.append_column(
                "sha256", pa.array(_sha256_column(t["content"].to_pylist()))
            ).append_column("__skey", _skey(t["repo"], t["path"], t["commit"]))

        src = src.map_batches(add_file_sha, batch_format="pyarrow")
        meta_dir = os.path.join(index_dir, "docmeta")
        meta_files = [
            os.path.join(meta_dir, f)
            for f in sorted(os.listdir(meta_dir))
            if f.endswith(".parquet")
        ]
        if n_old <= APPEND_BROADCAST_SHAS:
            old = pa.concat_tables(
                pq.read_table(f, columns=["sha256"]) for f in meta_files
            )
            sha_ref = ray.put(pc.unique(old["sha256"]))

            def drop_existing(t: pa.Table) -> pa.Table:
                known = ray.get(sha_ref)
                return t.filter(
                    pc.invert(pc.is_in(t["sha256"], value_set=known))
                )

            src = src.map_batches(drop_existing, batch_format="pyarrow")
        else:
            import ray.data as rd

            old_ds = rd.read_parquet(meta_files, columns=["sha256"])
            src = src.join(
                old_ds,
                "left_anti",
                num_partitions=max(16, p_new),
                on=("sha256",),
            )

        # within-batch exact dedup: first file (min key) per content hash —
        # the bucketed exchange pattern from stages/dedup.py
        def first_per_sha(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["sha256", "__skey"], kind="mergesort", ignore_index=True)
            keep = df["sha256"].ne(df["sha256"].shift())
            return df[keep].drop(columns=["__b"]).reset_index(drop=True)

        def add_sha_bucket(t: pa.Table) -> pa.Table:
            h = pd.util.hash_array(
                t["sha256"].to_numpy(zero_copy_only=False)
            )
            return t.append_column("__b", pa.array((h % 256).astype(np.int64)))

        src = (
            src.map_batches(add_sha_bucket, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(first_per_sha, batch_format="pandas")
            .drop_columns(["__skey"])
        )

    # --- extract + partition + stage (mirrors build pass B, own dir)
    staged = os.path.join(index_dir, "staged_append", append_id)
    marker = os.path.join(staged, "_PARTED.json")
    parted_valid = False
    if resume and os.path.exists(marker):
        try:
            parted_valid = _json.load(open(marker)).get("append_id") == append_id
        except (ValueError, OSError):
            parted_valid = False
    if not parted_valid:
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        if mode == "entity":
            extract = functools.partial(
                _extract_entity_docs,
                apply_filters=apply_path_filters,
                extra_parsers=extra_parsers,
                extra_extensions=extra_extensions,
            )
        else:
            extract = functools.partial(
                _extract_file_docs,
                apply_filters=apply_path_filters,
                extra_extensions=extra_extensions,
            )

        def add_part_id(t: pa.Table) -> pa.Table:
            sk = t["skey"].to_numpy(zero_copy_only=False)
            pid = (
                np.searchsorted(bnd_arr, sk, side="right")
                if len(bnd_arr)
                else np.zeros(len(sk), dtype=np.int64)
            )
            return t.drop_columns(["skey"]).append_column(
                "part_id", pa.array(pid, pa.int64())
            )

        (
            src.map_batches(extract, batch_format="pyarrow", batch_size=None)
            .map_batches(add_part_id, batch_format="pyarrow", batch_size=None)
            .write_parquet(staged, partition_cols=["part_id"], row_group_size=1_000_000)
        )
        with open(marker, "w") as f:
            _json.dump({"append_id": append_id}, f)

    counts_vec = np.zeros(P, dtype=np.int64)
    for p in range(P):
        sub = os.path.join(staged, f"part_id={p}")
        if os.path.isdir(sub):
            for f in os.listdir(sub):
                if f.endswith(".parquet"):
                    counts_vec[p] += pq.ParquetFile(os.path.join(sub, f)).metadata.num_rows
    n_new = int(counts_vec.sum())
    if n_new == 0:  # everything filtered / deduped away: record + done
        manifest.extra.setdefault("appends", []).append(
            {"append_id": append_id, "n_docs": 0, "partitions": 0}
        )
        manifest.save(index_dir)
        return manifest

    # global pids/offsets continue where the index left off
    offsets = {}
    acc = id_watermark
    for p in range(P):
        offsets[p_old + p] = acc
        acc += int(counts_vec[p])

    builder = _PartitionBuilder(
        index_dir, offsets, append_id, mode, resume,
        with_positions=bool(manifest.extra.get("positions")),
    )

    @ray.remote(num_cpus=2)
    def build_one(local_p: int) -> dict:
        pid = p_old + local_p
        rec = read_lineage(index_dir, pid) if resume else None
        if (
            rec is not None
            and rec.build_id == append_id
            and os.path.exists(os.path.join(index_dir, "postings", f"part-{pid:05d}.parquet"))
            and os.path.exists(os.path.join(index_dir, "docmeta", f"part-{pid:05d}.parquet"))
        ):
            return rec.to_dict()
        sub = os.path.join(staged, f"part_id={local_p}")
        return builder(pq.read_table(sub), pid)

    live = [p for p in range(P) if counts_vec[p] > 0]
    summaries = pd.DataFrame(ray.get([build_one.remote(p) for p in live]))

    n_docs = n_old + n_new
    total_tokens = manifest.total_tokens + int(summaries["total_tokens"].sum())
    average_idf, vocab_size = _lexicon_pass(index_dir, n_docs, manifest.epsilon)

    manifest.n_docs = n_docs
    manifest.total_tokens = total_tokens
    manifest.avgdl = total_tokens / n_docs
    manifest.vocab_size = vocab_size
    manifest.average_idf = average_idf
    manifest.num_partitions = p_old + P
    manifest.partitions = manifest.partitions + [
        PartitionRecord.from_dict(r)
        for r in summaries.sort_values("part_id").to_dict("records")
    ]
    manifest.extra.setdefault("appends", []).append(
        {"append_id": append_id, "n_docs": n_new, "partitions": len(live)}
    )
    manifest.save(index_dir)
    return manifest


def compact_index(
    index_dir: str,
    *,
    max_docs_per_partition: int = 200_000,
    max_bytes_per_partition: int = 256 << 20,
) -> IndexManifest:
    """Merge runs of adjacent small partitions into full-sized ones —
    segment compaction for the append path (every ``append_index`` adds
    new partitions; many small appends leave many tiny segments, which
    costs per-partition file/actor overhead at query time).

    Semantics: search results are IDENTICAL before and after — docIDs,
    global stats, and the lexicon are untouched (merging doc-contiguous
    partitions changes no df/idf/avgdl).  Only the partition table and
    the postings/docmeta files change:

    - partitions are grouped greedily in doc order while staying under
      ``max_docs_per_partition`` and ``max_bytes_per_partition``
      (posting-payload bytes from the lineage records — no data scan);
    - each >=2-member group is merged by ONE Ray task: decode member
      postings (vectorized segmented-cumsum over one flat varint pass),
      re-encode through the same ``encode_postings_arrays`` the builder
      uses (block-max WAND metadata recomputed for now-long postings),
      concat docmeta (already doc-ascending);
    - merged partitions get FRESH ids above the ``num_partitions``
      watermark; the atomic ``manifest.save`` is the commit point — a
      crash before it leaves the old manifest pointing at the old files
      (new files are unreferenced orphans), never a mixed view;
    - replaced member files + lineage are deleted best-effort AFTER the
      manifest commit.

    At 100 TB this is an O(changed-bytes) maintenance job: each merge
    task touches only its group's files; nothing global moves.

    Positional indexes (``with_positions=True``) are not compactable yet:
    the merge path re-encodes postings but not position postings, which
    would silently break positional phrase search on merged partitions —
    guarded with an explicit error instead.
    """
    import ray

    from ..state.manifest import normalize_dir

    index_dir = normalize_dir(index_dir)
    if IndexManifest.load(index_dir).extra.get("positions"):
        raise NotImplementedError(
            "compact_index does not merge position postings yet; "
            "rebuild with with_positions=True instead of compacting"
        )
    manifest = IndexManifest.load(index_dir)
    parts = sorted(manifest.partitions, key=lambda p: p.doc_lo)

    groups: List[List[PartitionRecord]] = []
    cur: List[PartitionRecord] = []
    docs = nbytes = 0
    for p in parts:
        if cur and (
            docs + p.n_docs > max_docs_per_partition
            or nbytes + p.postings_bytes > max_bytes_per_partition
        ):
            groups.append(cur)
            cur, docs, nbytes = [], 0, 0
        cur.append(p)
        docs += p.n_docs
        nbytes += p.postings_bytes
    if cur:
        groups.append(cur)
    merge_groups = [g for g in groups if len(g) >= 2]
    if not merge_groups:
        return manifest

    build_tag = f"{manifest.build_id}+compact"

    @ray.remote
    def merge_one(pids: List[int], new_pid: int) -> dict:
        from ..functions.codec import varint_decode

        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
        t0 = time.time()
        metas = [
            pq.read_table(os.path.join(index_dir, "docmeta", f"part-{p:05d}.parquet"))
            for p in pids
        ]
        docmeta = pa.concat_tables(metas, promote_options="default")
        doc_id_arr = docmeta["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_lo = int(doc_id_arr[0])
        doc_len = docmeta["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64)

        posts = [
            pq.read_table(
                os.path.join(index_dir, "postings", f"part-{p:05d}.parquet"),
                columns=["term", "df", "doc_ids", "tfs"],
            )
            for p in pids
        ]

        def col(t, name):
            c = t[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        term_rows = pa.concat_arrays([col(t, "term") for t in posts])
        dfs = np.concatenate(
            [col(t, "df").to_numpy(zero_copy_only=False) for t in posts]
        ).astype(np.int64)
        all_dbuf = b"".join(
            b"".join(col(t, "doc_ids").to_pylist()) for t in posts
        )
        all_tbuf = b"".join(b"".join(col(t, "tfs").to_pylist()) for t in posts)
        vals = varint_decode(all_dbuf).astype(np.int64)
        tf_arr = varint_decode(all_tbuf).astype(np.int64)
        # segmented cumsum: each term-run starts with an absolute id, the
        # rest are deltas, so within-run cumsum recovers absolutes
        pair_lo = np.concatenate(([0], np.cumsum(dfs)))[:-1]
        c = np.cumsum(vals)
        seg_base = np.where(pair_lo > 0, c[pair_lo - 1], 0)
        global_d = c - np.repeat(seg_base, dfs)

        enc = pc.dictionary_encode(term_rows)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        row_codes = np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64
        )
        dictionary = enc.dictionary
        pair_codes = np.repeat(row_codes, dfs)
        order = np.lexsort((global_d, pair_codes))
        dl_of_pair = doc_len[global_d - doc_lo]
        postings = encode_postings_arrays(
            pair_codes[order],
            dictionary,
            global_d[order].astype(np.uint64),
            tf_arr[order],
            dl_of_pair[order],
        )

        for sub in ("postings", "docmeta"):
            os.makedirs(os.path.join(index_dir, sub), exist_ok=True)
        for out_tbl, path in (
            (postings, os.path.join(index_dir, "postings", f"part-{new_pid:05d}.parquet")),
            (docmeta, os.path.join(index_dir, "docmeta", f"part-{new_pid:05d}.parquet")),
        ):
            tmp = f"{path}.tmp-{os.getpid()}"
            pq.write_table(out_tbl, tmp)
            os.replace(tmp, path)

        rec = PartitionRecord(
            part_id=new_pid,
            doc_lo=doc_lo,
            doc_hi=int(doc_id_arr[-1]) + 1,
            n_docs=len(docmeta),
            total_tokens=int(doc_len.sum()),
            n_terms=len(postings),
            postings_bytes=_postings_payload_bytes(postings),
            build_sec=round(time.time() - t0, 3),
            build_id=build_tag,
        )
        write_lineage(index_dir, rec)
        return rec.to_dict()

    watermark = manifest.num_partitions
    new_recs = ray.get(
        [
            merge_one.remote([p.part_id for p in g], watermark + i)
            for i, g in enumerate(merge_groups)
        ]
    )

    removed = {p.part_id for g in merge_groups for p in g}
    kept = [p for p in parts if p.part_id not in removed]
    manifest.partitions = sorted(
        kept + [PartitionRecord.from_dict(r) for r in new_recs],
        key=lambda p: p.doc_lo,
    )
    manifest.num_partitions = watermark + len(merge_groups)
    manifest.extra.setdefault("compactions", []).append(
        {
            "merged_groups": len(merge_groups),
            "removed_partitions": len(removed),
            "live_partitions": len(manifest.partitions),
        }
    )
    manifest.save(index_dir)  # <- atomic commit point

    for pid in removed:  # best-effort cleanup after the commit
        for sub, ext in (("postings", "parquet"), ("docmeta", "parquet"), ("lineage", "json")):
            try:
                os.unlink(os.path.join(index_dir, sub, f"part-{pid:05d}.{ext}"))
            except OSError:
                pass
    return manifest


def tombstone_delete(
    index_dir: str,
    column: str,
    value: str,
) -> IndexManifest:
    """Logical delete WITHOUT rewriting the index: mark every doc whose
    docmeta ``column`` equals ``value`` dead, and make search results +
    BM25 scores EXACTLY equal to a full rebuild over the filtered corpus
    (modulo docID values — surviving docs keep their original ids, which
    preserves the insertion-order tie-break because survivors keep their
    relative order).

    The reference's delete path refits the whole in-memory index
    (/root/reference/codesearch/storage/bm25_index.py:172-202); at 100 TB
    that is a full rewrite, so this path exists alongside
    ``CodeSearchEngine.remove_by_repo``'s rebuild.  Cost:

    - partitions WITHOUT matching docs: one docmeta column scan each
      (parquet, pruned to [doc_id, doc_len, column]);
    - partitions WITH matching docs: one postings decode to count each
      term's dead document frequency (the price of exact df/idf);
    - one lexicon refresh (cost ∝ vocabulary — the append_index pass);
    - partition postings/docmeta files are NEVER rewritten.

    Artifacts (both consumed automatically everywhere):

    - ``tombstones/del-NNN-part-NNNNN.parquet`` — global doc_ids of the
      newly-dead docs (IndexShard builds its alive mask from doc RANGES,
      so compaction's partition renumbering cannot orphan them);
    - ``lex_ddf/bucket=B/del-NNN-part-NNNNN.parquet`` — per-term dead df,
      subtracted by every future ``_lexicon_pass`` (append/delete); terms
      whose df reaches 0 leave the lexicon, exactly as in a rebuild.

    Idempotent: already-dead docs are excluded from the scan, so
    re-deleting the same value is a no-op.  Returns the updated manifest.
    """
    import ray

    from ..state.manifest import normalize_dir

    index_dir = normalize_dir(index_dir)
    manifest = IndexManifest.load(index_dir)
    tomb_dir = os.path.join(index_dir, "tombstones")
    ddf_root = os.path.join(index_dir, "lex_ddf")
    os.makedirs(tomb_dir, exist_ok=True)
    opid = len(manifest.extra.get("deletes", []))

    prev_files = sorted(
        os.path.join(tomb_dir, f)
        for f in os.listdir(tomb_dir)
        if f.endswith(".parquet")
    )

    @ray.remote(num_cpus=1)
    def delete_part(pid: int, doc_lo: int, doc_hi: int) -> dict:
        from ..functions.codec import delta_varint_decode

        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        meta_path = os.path.join(index_dir, "docmeta", f"part-{pid:05d}.parquet")
        meta = pq.read_table(meta_path, columns=["doc_id", "doc_len", column])
        ids = meta["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = pc.equal(meta[column], pa.scalar(value)).to_numpy(zero_copy_only=False)
        if not hit.any():
            return {"n_dead": 0, "dead_tokens": 0}
        prev_dead = np.zeros(0, dtype=np.int64)
        if prev_files:
            prev = [
                pq.read_table(
                    f, columns=["doc_id"],
                    filters=[("doc_id", ">=", doc_lo), ("doc_id", "<", doc_hi)],
                )["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                for f in prev_files
            ]
            prev_dead = np.concatenate(prev) if prev else prev_dead
        new_dead = ids[hit]
        if len(prev_dead):
            new_dead = new_dead[~np.isin(new_dead, prev_dead)]
        if not len(new_dead):
            return {"n_dead": 0, "dead_tokens": 0}
        new_dead = np.sort(new_dead)
        dead_tokens = int(
            meta["doc_len"].to_numpy(zero_copy_only=False)[
                np.isin(ids, new_dead)
            ].sum()
        )
        pq.write_table(
            pa.table({"doc_id": pa.array(new_dead, pa.int64())}),
            os.path.join(tomb_dir, f"del-{opid:03d}-part-{pid:05d}.parquet"),
        )
        # per-term dead df: one postings decode for this partition
        post = pq.read_table(
            os.path.join(index_dir, "postings", f"part-{pid:05d}.parquet"),
            columns=["term", "doc_ids"],
        )
        terms = post["term"].to_pylist()
        encs = post["doc_ids"].to_pylist()
        out_terms, out_ddf = [], []
        for t, enc in zip(terms, encs):
            pids_arr = delta_varint_decode(enc)
            lo = np.searchsorted(pids_arr, new_dead[0])
            hi = np.searchsorted(pids_arr, new_dead[-1], side="right")
            if lo >= hi:
                continue
            n = int(np.isin(pids_arr[lo:hi], new_dead).sum())
            if n:
                out_terms.append(t)
                out_ddf.append(n)
        if out_terms:
            h = pd.util.hash_array(np.asarray(out_terms, dtype=object))
            buckets = (h % LEX_BUCKETS).astype(np.int64)
            ddf_arr = np.asarray(out_ddf, dtype=np.int64)
            terms_arr = np.asarray(out_terms, dtype=object)
            for b in np.unique(buckets):
                bdir = os.path.join(ddf_root, f"bucket={b}")
                os.makedirs(bdir, exist_ok=True)
                sel = buckets == b
                pq.write_table(
                    pa.table(
                        {
                            "term": pa.array(terms_arr[sel], pa.string()),
                            "ddf": pa.array(ddf_arr[sel], pa.int64()),
                        }
                    ),
                    os.path.join(bdir, f"del-{opid:03d}-part-{pid:05d}.parquet"),
                )
        return {"n_dead": int(len(new_dead)), "dead_tokens": dead_tokens}

    results = ray.get(
        [
            delete_part.remote(p.part_id, p.doc_lo, p.doc_hi)
            for p in manifest.partitions
        ]
    )
    n_dead = sum(r["n_dead"] for r in results)
    dead_tokens = sum(r["dead_tokens"] for r in results)
    if n_dead == 0:
        return manifest

    n_docs = manifest.n_docs - n_dead
    total_tokens = manifest.total_tokens - dead_tokens
    if n_docs <= 0:
        raise ValueError(
            "tombstone_delete would delete every document; rebuild instead"
        )
    average_idf, vocab_size = _lexicon_pass(index_dir, n_docs, manifest.epsilon)
    manifest.n_docs = n_docs
    manifest.total_tokens = total_tokens
    manifest.avgdl = total_tokens / n_docs
    manifest.average_idf = average_idf
    manifest.vocab_size = vocab_size
    manifest.extra.setdefault("deletes", []).append(
        {"column": column, "value": value, "n_dead": n_dead}
    )
    manifest.extra["tombstoned_docs"] = (
        manifest.extra.get("tombstoned_docs", 0) + n_dead
    )
    # cumulative, so a resumed build_index can re-derive alive stats
    manifest.extra["dead_tokens"] = (
        manifest.extra.get("dead_tokens", 0) + dead_tokens
    )
    manifest.save(index_dir)
    return manifest


def _shift_first_varint(buf: bytes, off: int) -> bytes:
    """Shift a delta+varint posting buffer's ABSOLUTE first value by
    ``off`` without touching the delta tail: decode the first varint,
    re-encode ``first+off``, splice.  O(1) per posting list — this is
    what makes a segment merge postings-rewrite nearly free."""
    if not buf:
        return buf
    i = 0
    v = 0
    shift = 0
    while True:
        byte = buf[i]
        v |= (byte & 0x7F) << shift
        i += 1
        if not (byte & 0x80):
            break
        shift += 7
    from ..functions.codec import varint_encode as _venc

    return bytes(_venc(np.array([v + off], dtype=np.uint64))) + buf[i:]


def merge_indexes(a_dir: str, b_dir: str, out_dir: str) -> IndexManifest:
    """Lucene-style segment merge: combine two independently built indexes
    into one WITHOUT reprocessing any text.  Semantics are identical to
    ``append_index(A, corpus_of_B)`` — B's documents take the next docIDs
    (A's insertion order, then B's), so tie-breaks, filters and scores on
    the merged index equal the append/rebuild result (score identity
    holds because N/avgdl/df and the epsilon floor are recomputed exactly
    as a rebuild would; see reference ``bm25_index.py:102-115`` full
    refit semantics).

    Costs, by construction:
      - A's partition files are COPIED verbatim (postings, docmeta,
        positions) — no decode;
      - B's postings shift only each posting list's absolute first
        doc-id varint (the delta tail is byte-identical) and docmeta's
        doc_id column; positions are doc-relative, copied verbatim;
      - only the lexicon (cost ∝ vocabulary) and manifest scalars are
        recomputed, via the same ``_lexicon_pass`` build/append use.

    Inputs must be tombstone-free (run a rebuild or fold deletes first)
    and agree on mode/k1/b/epsilon and positional indexing.  Embeddings
    side-tables are not merged (rebuild them over the merged corpus)."""
    import shutil

    import ray

    from ..state.manifest import normalize_dir

    a_dir, b_dir, out_dir = normalize_dir(a_dir), normalize_dir(b_dir), normalize_dir(out_dir)
    ma, mb = IndexManifest.load(a_dir), IndexManifest.load(b_dir)
    if ma.mode != mb.mode:
        raise ValueError(f"mode mismatch: {ma.mode} vs {mb.mode}")
    if (ma.k1, ma.b, ma.epsilon) != (mb.k1, mb.b, mb.epsilon):
        raise ValueError("BM25 parameter mismatch between inputs")
    for name, d in (("a", a_dir), ("b", b_dir)):
        tomb = os.path.join(d, "tombstones")
        if os.path.isdir(tomb) and any(f.endswith(".parquet") for f in os.listdir(tomb)):
            raise NotImplementedError(
                f"merge_indexes requires tombstone-free inputs ({name} has "
                "tombstones); fold deletes with a rebuild first"
            )
    pos_a = bool(ma.extra.get("positions"))
    if pos_a != bool(mb.extra.get("positions")):
        raise ValueError("positional indexing must match between inputs")
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"out_dir not empty: {out_dir}")

    subs = ["postings", "docmeta"] + (["positions"] if pos_a else [])
    for s in subs + ["lineage"]:
        os.makedirs(os.path.join(out_dir, s), exist_ok=True)

    off = ma.n_docs
    p_a = ma.num_partitions
    merge_id = compute_build_id(
        ma.n_docs + mb.n_docs, [], {"op": "merge", "a": ma.build_id, "b": mb.build_id}
    )

    @ray.remote(num_cpus=1)
    def copy_a_part(pid: int) -> None:
        for s in subs:
            src = os.path.join(a_dir, s, f"part-{pid:05d}.parquet")
            if os.path.exists(src):
                shutil.copyfile(src, os.path.join(out_dir, s, f"part-{pid:05d}.parquet"))

    @ray.remote(num_cpus=1)
    def shift_b_part(pid: int) -> None:
        new_pid = p_a + pid
        post = pq.read_table(os.path.join(b_dir, "postings", f"part-{pid:05d}.parquet"))
        doc_bufs = [_shift_first_varint(buf, off) for buf in post["doc_ids"].to_pylist()]
        blk_bufs = [_shift_first_varint(buf, off) for buf in post["block_last"].to_pylist()]
        out = pa.table(
            {
                "term": post["term"],
                "df": post["df"],
                "doc_ids": pa.array(doc_bufs, pa.binary()),
                "tfs": post["tfs"],
                "block_last": pa.array(blk_bufs, pa.binary()),
                "block_max_tf": post["block_max_tf"],
                "block_min_dl": post["block_min_dl"],
            }
        )
        pq.write_table(out, os.path.join(out_dir, "postings", f"part-{new_pid:05d}.parquet"))

        meta = pq.read_table(os.path.join(b_dir, "docmeta", f"part-{pid:05d}.parquet"))
        ids = pc.add(meta["doc_id"], pa.scalar(off, pa.int64()))
        meta = meta.set_column(meta.schema.get_field_index("doc_id"), "doc_id", ids)
        pq.write_table(meta, os.path.join(out_dir, "docmeta", f"part-{new_pid:05d}.parquet"))

        if pos_a:  # positions are doc-relative: byte-identical copy
            src = os.path.join(b_dir, "positions", f"part-{pid:05d}.parquet")
            if os.path.exists(src):
                shutil.copyfile(
                    src, os.path.join(out_dir, "positions", f"part-{new_pid:05d}.parquet")
                )

    ray.get(
        [copy_a_part.remote(p.part_id) for p in ma.partitions]
        + [shift_b_part.remote(p.part_id) for p in mb.partitions]
    )

    partitions = [
        PartitionRecord(
            part_id=p.part_id, doc_lo=p.doc_lo, doc_hi=p.doc_hi, n_docs=p.n_docs,
            total_tokens=p.total_tokens, n_terms=p.n_terms,
            postings_bytes=p.postings_bytes, build_sec=0.0, build_id=merge_id,
        )
        for p in ma.partitions
    ] + [
        PartitionRecord(
            part_id=p_a + p.part_id, doc_lo=p.doc_lo + off, doc_hi=p.doc_hi + off,
            n_docs=p.n_docs, total_tokens=p.total_tokens, n_terms=p.n_terms,
            postings_bytes=p.postings_bytes, build_sec=0.0, build_id=merge_id,
        )
        for p in mb.partitions
    ]
    for rec in partitions:
        write_lineage(out_dir, rec)

    n_docs = ma.n_docs + mb.n_docs
    total_tokens = ma.total_tokens + mb.total_tokens
    average_idf, vocab_size = _lexicon_pass(out_dir, n_docs, ma.epsilon)
    manifest = IndexManifest(
        mode=ma.mode,
        n_docs=n_docs,
        total_tokens=total_tokens,
        avgdl=total_tokens / n_docs,
        vocab_size=vocab_size,
        average_idf=average_idf,
        k1=ma.k1,
        b=ma.b,
        epsilon=ma.epsilon,
        num_partitions=p_a + mb.num_partitions,
        build_id=merge_id,
        boundaries=[],
        partitions=partitions,
        extra={
            "lex_buckets": LEX_BUCKETS,
            "filesystem": "shared-posix",
            "positions": pos_a,
            "merged_from": [ma.build_id, mb.build_id],
            "corpus_dir": None,
        },
    )
    manifest.save(out_dir)
    return manifest

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

DOCMETA_EXTRA_ENTITY = [
    "name", "entity_type", "file_path", "repo_name", "start_line", "end_line",
    "signature", "docstring", "return_type", "parent_class", "loc",
]


def _sha256_column(contents: List[Optional[str]]) -> List[str]:
    return [hashlib.sha256((c or "").encode()).hexdigest() for c in contents]


def _path_keep_mask(paths) -> pa.Array:
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
    ext_ok = None
    for ext in SUPPORTED_EXTENSIONS:
        hit = pc.ends_with(lower, ext)
        ext_ok = hit if ext_ok is None else pc.or_(ext_ok, hit)
    return pc.and_(pc.invert(bad), ext_ok)


def filter_corpus_batch(batch: pa.Table) -> pa.Table:
    return batch.filter(_path_keep_mask(batch["path"]))


def _skey(repo, path, commit, ent_ord=None):
    if ent_ord is None:
        return pc.binary_join_element_wise(repo, path, commit, "\x00")
    ordpad = pc.utf8_lpad(pc.cast(ent_ord, pa.string()), 8, "0")
    return pc.binary_join_element_wise(repo, path, commit, ordpad, "\x00")


def _extract_file_docs(batch: pa.Table, apply_filters: bool = True) -> pa.Table:
    if apply_filters:
        batch = filter_corpus_batch(batch)
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


def _extract_entity_docs(batch: pa.Table, apply_filters: bool = True) -> pa.Table:
    if apply_filters:
        batch = filter_corpus_batch(batch)
    sha = pa.array(_sha256_column(batch["content"].to_pylist()), pa.string())
    batch = batch.append_column("sha_file", sha)
    ents = parse_batch(batch)
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
    # language column of the entity (parser-assigned), keep corpus lang name
    ents = ents.rename_columns(
        [c if c != "language" else "lang" for c in ents.column_names]
    )
    return ents


def _deterministic_sample(skeys: np.ndarray, modulus: int) -> np.ndarray:
    """Block-layout-independent sample: keep keys whose stable hash % modulus
    == 0 (pandas siphash with fixed key — identical at every parallelism
    level, unlike seeded ``random_sample`` whose output depends on block
    boundaries)."""
    if modulus <= 1:
        return skeys
    h = pd.util.hash_array(skeys.astype(object))
    return skeys[h % modulus == 0]


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
    ):
        self.index_dir = index_dir
        self.offsets = offsets
        self.build_id = build_id
        self.mode = mode
        self.resume = resume

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        pid = int(df["part_id"].iloc[0])
        base = self.offsets[pid]
        n = len(df)
        if self.resume:
            rec = read_lineage(self.index_dir, pid)
            if rec is not None and rec.build_id == self.build_id and rec.n_docs == n:
                return pd.DataFrame([rec.to_dict()])

        df = df.sort_values("skey", kind="mergesort", ignore_index=True)
        doc_ids = base + np.arange(n, dtype=np.int64)
        texts = pa.array(df["doc_text"].tolist(), type=pa.string())
        tokens = tokenize_array(texts)
        doc_len = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)

        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        # (term, doc) -> tf fully vectorized: dictionary-encode terms, sort
        # (code, doc) pairs, run-length the sorted pairs.  Term order on disk
        # is first-occurrence order (irrelevant: query-time lookup is by
        # dict); doc order within a term is ascending (delta encoding).
        codes, uniques = pd.factorize(flat.to_pandas(), sort=False)
        codes = codes.astype(np.int64)
        order = np.lexsort((parents, codes))
        c_s, d_s = codes[order], parents[order].astype(np.int64)
        if len(c_s):
            pair_bound = np.flatnonzero((c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])) + 1
            pair_starts = np.concatenate(([0], pair_bound))
            tf_arr = np.diff(np.concatenate((pair_starts, [len(c_s)]))).astype(np.int64)
            term_codes = c_s[pair_starts]
            d_arr = d_s[pair_starts]
        else:
            tf_arr = np.empty(0, dtype=np.int64)
            term_codes = np.empty(0, dtype=np.int64)
            d_arr = np.empty(0, dtype=np.int64)
        uniq_arr = np.asarray(uniques, dtype=object)
        terms_arr = uniq_arr[term_codes] if len(term_codes) else np.empty(0, dtype=object)

        # term group boundaries over the (term, doc)-sorted postings
        if len(terms_arr):
            change = np.flatnonzero(term_codes[1:] != term_codes[:-1]) + 1
            starts = np.concatenate(([0], change, [len(terms_arr)]))
        else:
            starts = np.array([0], dtype=np.int64)
        n_terms = len(starts) - 1
        g_lo, g_hi = starts[:-1], starts[1:]
        term_names = terms_arr[g_lo].tolist() if n_terms else []
        dfs = (g_hi - g_lo).astype(np.int64)

        # one vectorized varint pass over ALL postings; per-term buffers are
        # pure byte-range slices (no per-term encode calls — this is the hot
        # loop at realistic vocabulary sizes)
        global_d = (doc_ids[d_arr] if len(d_arr) else d_arr).astype(np.uint64)
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
            dl_local = doc_len[d_arr[lo:hi]]
            mn = np.array(
                [dl_local[j * BLOCK : (j + 1) * BLOCK].min() for j in range(nb)],
                dtype=np.uint64,
            )
            blk_last[k] = delta_varint_encode(lasts)
            blk_maxtf[k] = varint_encode(mx)
            blk_mindl[k] = varint_encode(mn)

        postings = pa.table(
            {
                "term": pa.array(term_names, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "doc_ids": pa.array(doc_bufs, pa.binary()),
                "tfs": pa.array(tf_bufs, pa.binary()),
                "block_last": pa.array(blk_last, pa.binary()),
                "block_max_tf": pa.array(blk_maxtf, pa.binary()),
                "block_min_dl": pa.array(blk_mindl, pa.binary()),
            }
        )

        meta_cols: Dict[str, pa.Array] = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "repo": pa.array(df["repo"].tolist(), pa.string()),
            "path": pa.array(df["path"].tolist(), pa.string()),
            "commit": pa.array(df["commit"].tolist(), pa.string()),
            "lang": pa.array(df["lang"].tolist(), pa.string()),
            "sha256": pa.array(df["sha256"].tolist(), pa.string()),
            "doc_len": pa.array(doc_len, pa.int64()),
        }
        if self.mode == "entity":
            for col in DOCMETA_EXTRA_ENTITY:
                meta_cols[col] = pa.array(df[col].tolist())
        docmeta = pa.table(meta_cols)

        for sub in ("postings", "docmeta"):
            os.makedirs(os.path.join(self.index_dir, sub), exist_ok=True)
        post_path = os.path.join(self.index_dir, "postings", f"part-{pid:05d}.parquet")
        meta_path = os.path.join(self.index_dir, "docmeta", f"part-{pid:05d}.parquet")
        for tbl, path in ((postings, post_path), (docmeta, meta_path)):
            tmp = f"{path}.tmp-{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, path)

        rec = PartitionRecord(
            part_id=pid,
            doc_lo=int(base),
            doc_hi=int(base + n),
            n_docs=n,
            total_tokens=int(doc_len.sum()),
            n_terms=int(n_terms),
            postings_bytes=int(sum(len(b) for b in doc_bufs) + sum(len(b) for b in tf_bufs)),
            build_sec=round(time.time() - t0, 3),
            build_id=self.build_id,
        )
        write_lineage(self.index_dir, rec)
        return pd.DataFrame([rec.to_dict()])


def build_index(
    corpus,
    index_dir: str,
    *,
    mode: str = "file",
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
    docs_per_partition: int = 50_000,
    max_partitions: int = 512,
    resume: bool = True,
    apply_path_filters: bool = True,
) -> IndexManifest:
    """Build a sharded BM25 index from a corpus parquet path / Dataset.

    ``mode="file"`` indexes each file's raw content as one document;
    ``mode="entity"`` extracts code entities first and indexes the
    entity->document projection (the reference's BM25 corpus,
    ``bm25_index.py:74-84``).  ``docs_per_partition`` bounds per-worker
    memory (at production scale size this by bytes, not rows).
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    os.makedirs(index_dir, exist_ok=True)
    corpus_path = corpus if isinstance(corpus, str) else None
    phase_sec: Dict[str, float] = {}
    _t = time.time()

    def _mark(name: str) -> None:
        nonlocal _t
        phase_sec[name] = round(time.time() - _t, 3)
        _t = time.time()

    import functools
    import json as _json

    # Entity mode: the parse stage dominates, so extract ONCE into a staged
    # parquet (much smaller than the corpus: doc_text projections, no file
    # bodies) and run the key/count/build passes over the staging with column
    # pruning, instead of re-parsing the corpus three times.
    staged_path: Optional[str] = None
    if mode == "entity":
        staged_path = os.path.join(index_dir, "staged")
        marker = os.path.join(index_dir, "_STAGED.json")
        stamp = {
            "mode": mode,
            "corpus": corpus_path,
            "apply_path_filters": apply_path_filters,
        }
        valid = False
        if resume and corpus_path is not None and os.path.exists(marker):
            try:
                valid = _json.load(open(marker)) == stamp
            except (ValueError, OSError):
                valid = False
        if not valid:
            import shutil

            shutil.rmtree(staged_path, ignore_errors=True)
            src = read_corpus(corpus_path) if corpus_path is not None else corpus
            src.map_batches(
                functools.partial(_extract_entity_docs, apply_filters=apply_path_filters),
                batch_format="pyarrow",
            ).write_parquet(staged_path)
            with open(marker, "w") as f:
                _json.dump(stamp, f)
        _mark("stage_extract")

    def docs_ds(columns: Optional[List[str]] = None):
        """Fresh Dataset of extracted docs; column-pruned at the read when
        only key columns are needed (passes A/B never read content in file
        mode, and read only ``skey`` from the staging in entity mode)."""
        import ray.data as rd

        key_only = columns is not None and set(columns) <= {"skey", "repo", "path", "commit"}
        if staged_path is not None:
            return rd.read_parquet(
                staged_path, columns=["skey"] if key_only else None
            )
        if corpus_path is not None:
            read_cols = ["repo", "path", "commit"] if key_only else None
            ds = read_corpus(corpus_path, columns=read_cols)
        else:
            ds = corpus
        if key_only:
            def key_batch(t: pa.Table) -> pa.Table:
                if apply_path_filters:
                    t = filter_corpus_batch(t)
                return pa.table({"skey": _skey(t["repo"], t["path"], t["commit"])})
            return ds.map_batches(key_batch, batch_format="pyarrow")
        return ds.map_batches(
            functools.partial(_extract_file_docs, apply_filters=apply_path_filters),
            batch_format="pyarrow",
        )

    # --- pass A: count + deterministic key sample -> boundaries
    keys = docs_ds(columns=["skey"])
    n_docs = keys.count()
    _mark("count")
    if n_docs == 0:
        raise ValueError("corpus produced zero documents after filtering")
    num_partitions = max(1, min(max_partitions, -(-n_docs // docs_per_partition)))
    target_sample = min(100_000, max(1_000, 200 * num_partitions))
    modulus = max(1, n_docs // target_sample)

    sampled = (
        keys.map_batches(
            lambda t: pa.table(
                {"skey": _deterministic_sample(t["skey"].to_numpy(zero_copy_only=False), modulus)}
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    _mark("sample")
    sample_keys = sorted(r["skey"] for r in sampled)
    boundaries: List[str] = []
    if num_partitions > 1 and sample_keys:
        idx = (np.arange(1, num_partitions) * len(sample_keys)) // num_partitions
        boundaries = sorted(set(sample_keys[i] for i in idx))
    params = {"mode": mode, "k1": k1, "b": b, "epsilon": epsilon}
    build_id = compute_build_id(n_docs, boundaries, params)
    bnd_arr = np.array(boundaries, dtype=object)

    def add_part_id(t: pa.Table) -> pa.Table:
        sk = t["skey"].to_numpy(zero_copy_only=False)
        if len(bnd_arr):
            pid = np.searchsorted(bnd_arr, sk, side="right")
        else:
            pid = np.zeros(len(sk), dtype=np.int64)
        return t.append_column("part_id", pa.array(pid, pa.int64()))

    # --- pass B: per-partition counts -> docID offsets (prefix sums)
    counts_df = (
        docs_ds(columns=["skey"])
        .map_batches(add_part_id, batch_format="pyarrow")
        .groupby("part_id")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    _mark("part_counts")
    counts = {int(r.part_id): int(r.n) for r in counts_df.itertuples()}
    offsets: Dict[int, int] = {}
    acc = 0
    for p in range(len(boundaries) + 1):
        offsets[p] = acc
        acc += counts.get(p, 0)

    # --- pass C: build partitions (map_groups over doc ranges)
    builder = _PartitionBuilder(index_dir, offsets, build_id, mode, resume)

    def build_partition(df: pd.DataFrame) -> pd.DataFrame:
        return builder(df)

    summaries = (
        docs_ds()
        .map_batches(add_part_id, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(build_partition, batch_format="pandas")
        .to_pandas()
    )

    _mark("partition_build")
    total_tokens = int(summaries["total_tokens"].sum())
    avgdl = total_tokens / n_docs

    # --- pass D: global lexicon via groupby(term) partial-df merge
    from ray.data.aggregate import Sum

    post_files = sorted(
        os.path.join(index_dir, "postings", f)
        for f in os.listdir(os.path.join(index_dir, "postings"))
        if f.endswith(".parquet")
    )
    lex = (
        rd.read_parquet(post_files, columns=["term", "df"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )

    def add_idf(t: pa.Table) -> pa.Table:
        df_ = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf_raw = np.log(n_docs - df_ + 0.5) - np.log(df_ + 0.5)
        return t.append_column("idf_raw", pa.array(idf_raw, pa.float64()))

    lex = lex.map_batches(add_idf, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Mean

    agg = lex.aggregate(Mean("idf_raw", alias_name="avg"), Count(alias_name="vocab"))
    average_idf = float(agg["avg"]) if agg["vocab"] else 0.0
    vocab_size = int(agg["vocab"])
    eps_floor = epsilon * average_idf

    def floor_idf(t: pa.Table) -> pa.Table:
        raw = t["idf_raw"].to_numpy(zero_copy_only=False)
        idf = np.where(raw < 0, eps_floor, raw)
        return pa.table(
            {"term": t["term"], "df": t["df"], "idf": pa.array(idf, pa.float64())}
        )

    lex_dir = os.path.join(index_dir, "lexicon")
    os.makedirs(lex_dir, exist_ok=True)
    for f in os.listdir(lex_dir):
        os.remove(os.path.join(lex_dir, f))
    # sorted by term + small row groups => query terms resolve via parquet
    # predicate pushdown instead of loading the vocabulary anywhere.
    lex.map_batches(floor_idf, batch_format="pyarrow").sort("term").write_parquet(
        lex_dir, row_group_size=8192
    )

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
        extra={"phase_sec": phase_sec},
    )
    manifest.save(index_dir)
    return manifest

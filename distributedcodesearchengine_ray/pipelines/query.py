"""Query engine: BM25 top-k over the sharded index via an actor pool.

Replaces the reference's dense single-process scorer
(``/root/reference/codesearch/storage/bm25_index.py:117-170``: BM25Okapi
``get_scores`` over every doc, threshold, post-score filters, stable sort)
with index-shard actors — each actor owns a set of doc-range partitions
(postings + docmeta loaded once in ``__init__``) and scores its local docs
exactly; the driver fans the query's ``{term: idf}`` out and heap-merges
per-shard top-k by ``(-score, doc_id)``, reproducing the reference's
insertion-order tie-break (SURVEY.md §2.6 K1).

Exactness contract (vs the vendored oracle, bit-for-bit modulo the
average_idf reduction order):

* per-query-token accumulation in query order with duplicates kept;
* contribution ``idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` evaluated in
  float64 with the same expression shapes as ``rank_bm25``;
* threshold ``score >= 0.01 * max(all scores)`` where the max is over the
  UNFILTERED corpus — each shard reports its local unfiltered max, the
  driver takes the global max, then prunes the merged candidates;
* metadata filters (language / entity_type / repo_name) applied after
  scoring, never touching idf/avgdl (F3 semantics, ``bm25_index.py:157-164``);
* the rare ``max <= 0`` branch (all-negative idf) falls back to a dense
  ranking over every doc, as the reference does.

The global lexicon is consulted per query through parquet predicate
pushdown on the sorted ``term`` column (no vocabulary is ever loaded
whole), with a small driver-side cache for repeated terms.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.codec import delta_varint_decode, varint_decode
from ..functions.tokenizer import tokenize
from ..state.manifest import IndexManifest

_HEAVY_META = {"source_code", "doc_text"}

# quoted phrase segments in a query: scored as tokens AND required verbatim
import re as _re_mod

_PHRASE_RE = _re_mod.compile(r'"([^"]+)"')


class IndexShard:
    """One scorer actor: holds N doc-range partitions' postings + docmeta.

    State loaded once per actor (the actor-pool replacement for the
    reference's in-memory ``BM25Index`` singleton, SURVEY.md §2.3 ST4):
    per-partition ``{term -> postings row}`` lazily-decoded compressed
    postings, plus docmeta arrays (doc_len and the filterable columns).
    """

    def __init__(
        self,
        index_dir: str,
        part_ids: Sequence[int],
        avgdl_override: Optional[float] = None,
    ):
        manifest = IndexManifest.load(index_dir)
        self.k1 = manifest.k1
        self.b = manifest.b
        # federated search recombines global stats across sub-indexes:
        # the caller may inject the UNION corpus's avgdl so this shard's
        # length norm matches a single index built over the union
        self.avgdl = manifest.avgdl if avgdl_override is None else avgdl_override
        self._decoded: Dict[Tuple[int, int], tuple] = {}
        self.parts: List[dict] = []
        n_local = 0
        for pid in part_ids:
            post_path = os.path.join(index_dir, "postings", f"part-{pid:05d}.parquet")
            meta_path = os.path.join(index_dir, "docmeta", f"part-{pid:05d}.parquet")
            if not os.path.exists(post_path):
                continue
            post = pq.read_table(post_path)
            terms = post["term"].to_pylist()
            term_row = {t: i for i, t in enumerate(terms)}
            meta_tbl = pq.read_table(meta_path)
            meta_cols = [c for c in meta_tbl.column_names if c not in _HEAVY_META]
            meta = meta_tbl.select(meta_cols)
            doc_len = meta["doc_len"].to_numpy(zero_copy_only=False).astype(np.float64)
            doc_lo = int(meta["doc_id"][0].as_py()) if len(meta) else 0
            part = {
                "pid": pid,
                "doc_lo": doc_lo,
                "n": len(meta),
                "local_base": n_local,
                "term_row": term_row,
                "doc_ids_enc": post["doc_ids"].to_pylist(),
                "tfs_enc": post["tfs"].to_pylist(),
                # block-max metadata: per-128-posting (max_tf, min_dl) — the
                # WAND upper bounds come from these without full decode
                "blk_maxtf_enc": post["block_max_tf"].to_pylist(),
                "blk_mindl_enc": post["block_min_dl"].to_pylist(),
                "meta": meta,
                # query-independent norm, same expression as rank_bm25
                "normf": self.k1 * (1 - self.b + self.b * doc_len / self.avgdl),
            }
            n_local += part["n"]
            self.parts.append(part)
        self.n_local = n_local
        # concatenated filter columns / doc ids across this shard's partitions
        self._doc_ids = np.concatenate(
            [p["meta"]["doc_id"].to_numpy(zero_copy_only=False) for p in self.parts]
        ) if self.parts else np.empty(0, dtype=np.int64)
        # raw token-count doc lengths (query-likelihood scoring needs dl
        # itself, not just the BM25 norm baked into "normf")
        self._doc_len = np.concatenate(
            [
                p["meta"]["doc_len"].to_numpy(zero_copy_only=False).astype(np.float64)
                for p in self.parts
            ]
        ) if self.parts else np.empty(0, dtype=np.float64)
        self._filter_cols: Dict[str, np.ndarray] = {}
        for col, meta_name in (
            ("language", "lang"),
            ("entity_type", "entity_type"),
            ("repo_name", "repo_name"),
            ("repo", "repo"),
        ):
            arrays = []
            ok = True
            for p in self.parts:
                if meta_name in p["meta"].column_names:
                    arrays.append(np.asarray(p["meta"][meta_name].to_pylist(), dtype=object))
                else:
                    ok = False
                    break
            if ok and arrays:
                self._filter_cols[col] = np.concatenate(arrays)

        # tombstones (logical deletes): alive mask over local positions.
        # Files carry GLOBAL doc_ids, selected here by this shard's doc
        # ranges — partition renumbering (compaction) cannot orphan them.
        # None when the index has no tombstones: the common path pays
        # nothing.
        self.alive: Optional[np.ndarray] = None
        tomb_dir = os.path.join(index_dir, "tombstones")
        if os.path.isdir(tomb_dir) and self.parts:
            dead_files = [
                os.path.join(tomb_dir, f)
                for f in sorted(os.listdir(tomb_dir))
                if f.endswith(".parquet")
            ]
            if dead_files:
                dead = np.concatenate(
                    [
                        pq.read_table(f, columns=["doc_id"])["doc_id"]
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                        for f in dead_files
                    ]
                )
                alive = np.ones(self.n_local, dtype=bool)
                any_dead = False
                for p in self.parts:
                    sel = dead[(dead >= p["doc_lo"]) & (dead < p["doc_lo"] + p["n"])]
                    if len(sel):
                        alive[sel - p["doc_lo"] + p["local_base"]] = False
                        any_dead = True
                if any_dead:
                    self.alive = alive

        # positional postings (opt-in at build): rows align 1:1 with each
        # partition's postings rows, so term_row indexes both tables
        self.has_positions = False
        pos_dir = os.path.join(index_dir, "positions")
        if os.path.isdir(pos_dir) and self.parts:
            ok = True
            for p in self.parts:
                fp = os.path.join(pos_dir, f"part-{p['pid']:05d}.parquet")
                if not os.path.exists(fp):
                    ok = False
                    break
                p["pos_enc"] = pq.read_table(fp, columns=["positions"])[
                    "positions"
                ].to_pylist()
            self.has_positions = ok
        self._pos_decoded: Dict[Tuple[int, int], tuple] = {}

    def ping(self) -> int:
        return self.n_local

    def prewarm(self, terms: List[str]) -> int:
        """Decode the given (typically highest-df) terms' postings into the
        cache — moves the cold-decode cost of Zipf-hot terms out of the
        first queries' latency."""
        n = 0
        for t in terms:
            for pi in range(len(self.parts)):
                row = self.parts[pi]["term_row"].get(t)
                if row is not None:
                    self._postings(pi, row)
                    n += 1
        return n

    _CACHE_CAP = 4096

    def _postings(self, part_idx: int, row: int):
        """Decoded posting list for (partition, term row): (local_idx,
        query-independent per-doc weight wtf).  LRU-ish cached — decode
        cost for Zipf-hot terms is paid once per actor, not per query."""
        key = (part_idx, row)
        hit = self._decoded.get(key)
        if hit is not None:
            return hit
        p = self.parts[part_idx]
        ids = delta_varint_decode(p["doc_ids_enc"][row])
        tfs = varint_decode(p["tfs_enc"][row]).astype(np.float64)
        rel = ids - p["doc_lo"]
        local = rel + p["local_base"]
        normf = p["normf"][rel]
        wtf = tfs * (self.k1 + 1) / (tfs + normf)
        if len(self._decoded) >= self._CACHE_CAP:
            self._decoded.pop(next(iter(self._decoded)))
        self._decoded[key] = (local, wtf)
        return local, wtf

    def _postings_raw(self, part_idx: int, row: int):
        """Decoded posting list with RAW term frequencies: (local_idx, tf).
        Sibling of ``_postings`` (which bakes the BM25 norm into a
        query-independent weight) for scorers that need tf itself —
        query-likelihood, collection-frequency sums.  Shares the cache
        budget via its own keyspace."""
        key = (-1 - part_idx, row)
        hit = self._decoded.get(key)
        if hit is not None:
            return hit
        p = self.parts[part_idx]
        ids = delta_varint_decode(p["doc_ids_enc"][row])
        tfs = varint_decode(p["tfs_enc"][row]).astype(np.float64)
        local = ids - p["doc_lo"] + p["local_base"]
        if len(self._decoded) >= self._CACHE_CAP:
            self._decoded.pop(next(iter(self._decoded)))
        self._decoded[key] = (local, tfs)
        return local, tfs

    def term_cfs(self, terms: List[str]) -> Dict[str, int]:
        """Collection-frequency partials: per term, the sum of tf over
        this shard's LIVE docs.  Merged by the driver into the corpus-wide
        cf that feeds Dirichlet smoothing — one tiny dict crosses the
        wire, never postings."""
        out: Dict[str, int] = {}
        for t in set(terms):
            tot = 0
            for pi in range(len(self.parts)):
                row = self.parts[pi]["term_row"].get(t)
                if row is None:
                    continue
                local, tfs = self._postings_raw(pi, row)
                if self.alive is not None:
                    tot += int(tfs[self.alive[local]].sum())
                else:
                    tot += int(tfs.sum())
            out[t] = tot
        return out

    def live_token_count(self) -> int:
        """Total token count over this shard's live docs (= sum of dl) —
        the |C| denominator of the Dirichlet background model, computed
        tombstone-aware instead of trusting the manifest scalar."""
        if self.n_local == 0:
            return 0
        dl = self._doc_len if self.alive is None else self._doc_len[self.alive]
        return int(dl.sum())

    def qld_topk(
        self,
        query_tokens: List[str],
        cfs: Dict[str, int],
        total_tokens: int,
        mu: float,
        limit: int,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Query-likelihood Dirichlet top-k (Zhai & Lafferty 2001), the
        classic LM alternative to BM25 over the SAME postings:

            score(q, d) = sum_t qtf_t * ( ln(tf_td + mu * cf_t / |C|)
                                          - ln(dl_d + mu) )

        Candidates are docs containing >=1 query term (background-only
        docs are not ranked); terms with corpus cf=0 are dropped (their
        smoothed probability is undefined).  Dense per-term vector
        accumulation in sorted-term order; ties break (score desc,
        doc_id asc) like every other ranker here."""
        if self.n_local == 0:
            return []
        has = np.zeros(self.n_local, dtype=bool)
        scores = np.zeros(self.n_local, dtype=np.float64)
        C = float(total_tokens)
        dl_term = np.log(self._doc_len + mu)
        mult: Dict[str, int] = {}
        for t in query_tokens:
            mult[t] = mult.get(t, 0) + 1
        for t, m in sorted(mult.items()):
            cf = cfs.get(t, 0)
            if cf <= 0:
                continue
            pc = mu * cf / C
            tf = np.zeros(self.n_local, dtype=np.float64)
            for pi in range(len(self.parts)):
                row = self.parts[pi]["term_row"].get(t)
                if row is None:
                    continue
                local, tfs = self._postings_raw(pi, row)
                tf[local] = tfs
                has[local] = True
            scores += m * (np.log(tf + pc) - dl_term)
        cand = np.flatnonzero(has)
        if self.alive is not None:
            cand = cand[self.alive[cand]]
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i])}
            for i in cand
        ]

    def _dense_scores(self, query_tokens: List[str], idfs: Dict[str, float]) -> np.ndarray:
        scores = np.zeros(self.n_local, dtype=np.float64)
        for q in query_tokens:  # duplicates kept, query order preserved
            idf = idfs.get(q) or 0
            if not idf:
                continue
            for pi in range(len(self.parts)):
                row = self.parts[pi]["term_row"].get(q)
                if row is None:
                    continue
                local, wtf = self._postings(pi, row)
                scores[local] += idf * wtf
        return scores

    def _term_ub(self, part_idx: int, row: int) -> float:
        """Upper bound on a term's per-doc wtf from the stored block-max
        metadata (max_tf, min_dl per 128-posting block) — no posting decode
        needed; short lists (single block, empty metadata) fall back to the
        decoded exact max."""
        p = self.parts[part_idx]
        enc_mt = p["blk_maxtf_enc"][row]
        if enc_mt:
            mt = varint_decode(enc_mt).astype(np.float64)
            md = varint_decode(p["blk_mindl_enc"][row]).astype(np.float64)
            normf = self.k1 * (1 - self.b + self.b * md / self.avgdl)
            return float((mt * (self.k1 + 1) / (mt + normf)).max())
        _, wtf = self._postings(part_idx, row)
        return float(wtf.max()) if len(wtf) else 0.0

    def _term_lists(self, query_tokens: List[str], idfs: Dict[str, float]):
        """Per distinct term, in FIRST-OCCURRENCE query order: dict with
        single-occurrence weight ``w``, multiplicity ``m``, ascending local
        idx + wtf arrays (merged across partitions), and a pruning upper
        bound ``ub`` (0 for non-positive weights: a doc lacking the term
        contributes 0 > any negative contribution, so 0 is the valid
        per-term bound)."""
        mult: Dict[str, int] = {}
        order: List[str] = []
        for q in query_tokens:
            if q not in mult:
                order.append(q)
            mult[q] = mult.get(q, 0) + 1
        lists = []
        for term in order:
            m = mult[term]
            idf = idfs.get(term) or 0
            if not idf:
                continue
            locs, wtfs, ubs = [], [], []
            for pi in range(len(self.parts)):
                row = self.parts[pi]["term_row"].get(term)
                if row is not None:
                    l, w = self._postings(pi, row)
                    locs.append(l)
                    wtfs.append(w)
                    ubs.append(self._term_ub(pi, row))
            if not locs:
                continue
            # partitions are ordered by local_base => concatenation ascends
            ub = max(0.0, idf * m * max(ubs)) if idf > 0 else 0.0
            lists.append(
                {
                    "term": term,
                    "w": idf,
                    "m": m,
                    "local": np.concatenate(locs),
                    "wtf": np.concatenate(wtfs),
                    "ub": ub,
                }
            )
        return lists

    def _wand_topk(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        filters: Optional[Dict[str, str]],
    ) -> Tuple[float, List[Tuple[int, float]]]:
        """Score-exact block-max-WAND-style top-k: document-at-a-time with
        per-term upper-bound pruning.  Bit-exactness contract vs the dense
        scorer: pruning uses non-negative per-term bounds and is strict
        (``acc >= theta``), and full scoring adds contributions in query
        token order with duplicate occurrences added separately — the same
        float64 operation sequence per doc as the dense path.  Wins over
        the dense path when postings are long and k is small; the dense
        path stays the default on in-memory shards.

        Returns (unfiltered local max score, [(local_idx, score)] top-k).
        """
        import heapq

        lists = self._term_lists(query_tokens, idfs)
        if not lists:
            return 0.0, []
        fmask = None
        if filters:
            fmask = self._filter_mask(filters, np.arange(self.n_local))
        n_lists = len(lists)
        # per-occurrence scoring order: dense accumulates once per token
        # occurrence in query order (interleaved duplicates included) — we
        # replay exactly that float64 addition sequence at each pivot
        term_to_list = {}
        for i, e in enumerate(lists):
            term_to_list[e["term"]] = i
        occurrence_seq = [term_to_list[q] for q in query_tokens if q in term_to_list]
        ptrs = [0] * n_lists
        sizes = [len(e["local"]) for e in lists]
        heap: List[Tuple[float, int]] = []  # (score, -local): weakest first
        unfiltered_max = 0.0
        while True:
            # sort live lists by current doc
            live = [i for i in range(n_lists) if ptrs[i] < sizes[i]]
            if not live:
                break
            live.sort(key=lambda i: lists[i]["local"][ptrs[i]])
            # pivot: smallest doc d such that the sum of (non-negative) ubs
            # of lists whose current doc <= d reaches the threshold
            theta = heap[0][0] if len(heap) >= limit else float("-inf")
            acc = 0.0
            pivot_idx = None
            for i in live:
                acc += lists[i]["ub"]
                # >= so score==theta ties are still evaluated (they can win
                # the docID tie-break) — keeps WAND rank-identical to dense
                if acc >= theta:
                    pivot_idx = i
                    break
            if pivot_idx is None:
                break  # no doc can beat theta
            pivot_doc = int(lists[pivot_idx]["local"][ptrs[pivot_idx]])
            first_doc = int(lists[live[0]]["local"][ptrs[live[0]]])
            if first_doc == pivot_doc:
                # fully score pivot_doc — replay the dense path's
                # per-occurrence addition sequence exactly
                contribs: Dict[int, float] = {}
                for i in range(n_lists):
                    e = lists[i]
                    pi = ptrs[i]
                    if pi < sizes[i] and int(e["local"][pi]) == pivot_doc:
                        contribs[i] = e["w"] * e["wtf"][pi]
                        ptrs[i] += 1
                score = 0.0
                for li in occurrence_seq:
                    if li in contribs:
                        score += contribs[li]
                if self.alive is not None and not self.alive[pivot_doc]:
                    continue  # tombstoned: not part of the corpus at all
                if score > unfiltered_max:
                    unfiltered_max = score
                if fmask is None or fmask[pivot_doc]:
                    item = (score, -pivot_doc)
                    if len(heap) < limit:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
            else:
                # advance lists before the pivot up to pivot_doc
                for i in live:
                    e = lists[i]
                    if int(e["local"][ptrs[i]]) >= pivot_doc:
                        break
                    ptrs[i] = int(np.searchsorted(e["local"], pivot_doc, side="left"))
        out = sorted(((s, -nl) for s, nl in heap), key=lambda x: (-x[0], x[1]))
        return unfiltered_max, [(doc, s) for s, doc in out]

    def _positions(self, part_idx: int, row: int):
        """Decoded positional postings for (partition, term row):
        ``(local_idx, starts, pos)`` — entry j's token positions are
        ``pos[starts[j]:starts[j+1]]``, ascending.  Cached like
        ``_postings``."""
        key = (part_idx, row)
        hit = self._pos_decoded.get(key)
        if hit is not None:
            return hit
        p = self.parts[part_idx]
        ids = delta_varint_decode(p["doc_ids_enc"][row])
        tfs = varint_decode(p["tfs_enc"][row]).astype(np.int64)
        deltas = varint_decode(p["pos_enc"][row]).astype(np.int64)
        gs = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        cs = np.cumsum(deltas)
        base = cs[gs] - deltas[gs]
        pos = cs - np.repeat(base, tfs)
        local = (ids - p["doc_lo"]) + p["local_base"]
        starts = np.concatenate((gs, [len(deltas)]))
        out = (local, starts, pos)
        if len(self._pos_decoded) >= self._CACHE_CAP:
            self._pos_decoded.pop(next(iter(self._pos_decoded)))
        self._pos_decoded[key] = out
        return out

    def phrase_adjacency_local(
        self,
        phrase_tokens: List[str],
        slop: int = 0,
        last_alternatives: Optional[List[str]] = None,
    ) -> np.ndarray:
        """Ascending local indices of ALIVE docs containing the token
        sequence in order with inter-token gaps <= ``slop + 1``
        (``slop=0`` = exact Lucene-PhraseQuery adjacency; ``slop>0`` =
        ordered proximity).  Candidate docs are pre-filtered by
        intersecting doc sets RAREST token first, so per-doc positional
        work is bounded by the rarest token's df, not a hot token's.

        ``last_alternatives`` appends one EXTRA final slot matched by
        ANY of the given terms (Lucene MultiPhraseQuery's single
        multi-term position — the match_phrase_prefix expansion slot):
        its per-doc positions are the sorted union over the
        alternatives' postings."""
        if not self.has_positions:
            raise RuntimeError("index was built without with_positions=True")
        empty = np.empty(0, dtype=np.int64)
        slots: List[List[str]] = [[t] for t in phrase_tokens]
        if last_alternatives is not None:
            slots.append(list(last_alternatives))
        if not slots:
            return empty
        tok_lists = []  # per slot: [(local, starts, pos), ...]
        for alts in slots:
            per = []
            for pi in range(len(self.parts)):
                for tok in alts:
                    row = self.parts[pi]["term_row"].get(tok)
                    if row is not None:
                        per.append(self._positions(pi, row))
            if not per:
                return empty
            tok_lists.append(per)

        doc_sets = [
            np.unique(np.concatenate([e[0] for e in per])) for per in tok_lists
        ]  # unique: a multi-term slot can repeat a doc across alternatives
        cand = None
        for i in np.argsort([len(d) for d in doc_sets]):  # rarest first
            cand = (
                doc_sets[i]
                if cand is None
                else np.intersect1d(cand, doc_sets[i], assume_unique=True)
            )
            if not len(cand):
                return empty
        cand_set = set(cand.tolist())
        pos_maps: List[Dict[int, np.ndarray]] = []
        for per in tok_lists:
            m: Dict[int, np.ndarray] = {}
            for local, starts, pos in per:
                for j in range(len(local)):
                    d = int(local[j])
                    if d in cand_set:
                        seg = pos[starts[j] : starts[j + 1]]
                        prev_seg = m.get(d)
                        m[d] = (
                            seg
                            if prev_seg is None
                            else np.sort(np.concatenate([prev_seg, seg]))
                        )
            pos_maps.append(m)

        win = slop + 1
        out = []
        for d in cand.tolist():
            prev = pos_maps[0][d]
            for m in pos_maps[1:]:
                q = m[d]
                # exists p in prev with 1 <= q - p <= win  <=>  some
                # prev value lies in [q - win, q - 1]
                idx = np.searchsorted(prev, q - win, side="left")
                keep = (idx < len(prev)) & (
                    prev[np.minimum(idx, len(prev) - 1)] <= q - 1
                )
                prev = q[keep]
                if not len(prev):
                    break
            else:
                out.append(d)
        arr = np.array(out, dtype=np.int64)
        if self.alive is not None and len(arr):
            arr = arr[self.alive[arr]]
        return arr

    def span_first_local(self, term: str, n: int) -> np.ndarray:
        """Ascending local indices of ALIVE docs whose FIRST occurrence
        of ``term`` lies within the first ``n`` token positions (Lucene
        SpanFirstQuery).  Positions are 0-based doc offsets, so the
        predicate is ``first_pos <= n - 1``; one positional-postings
        decode per partition containing the term, no text reads."""
        if not self.has_positions:
            raise RuntimeError("index was built without with_positions=True")
        hits = []
        for pi in range(len(self.parts)):
            row = self.parts[pi]["term_row"].get(term)
            if row is None:
                continue
            local, starts, pos = self._positions(pi, row)
            first = pos[starts[:-1]]
            hits.append(local[first <= n - 1])
        if not hits:
            return np.empty(0, dtype=np.int64)
        arr = np.sort(np.concatenate(hits))
        if self.alive is not None and len(arr):
            arr = arr[self.alive[arr]]
        return arr

    def span_near_local(self, term_a: str, term_b: str, window: int) -> np.ndarray:
        """Ascending local indices of ALIVE docs where some occurrence of
        ``term_a`` lies within ``window`` token positions of some
        occurrence of ``term_b`` (Lucene SpanNearQuery, in_order=false).
        Same vectorized ragged-neighbor merge as ``span_not_local`` —
        one searchsorted on (doc-rank << 32 | position) keys per
        partition — with the predicate inverted: docs survive when a
        nearest-neighbor distance is <= window."""
        if not self.has_positions:
            raise RuntimeError("index was built without with_positions=True")
        BASE = np.int64(1) << np.int64(32)
        hits = []
        for pi in range(len(self.parts)):
            row_a = self.parts[pi]["term_row"].get(term_a)
            row_b = self.parts[pi]["term_row"].get(term_b)
            if row_a is None or row_b is None:
                continue
            la, sa, posa = self._positions(pi, row_a)
            lb, sb, posb = self._positions(pi, row_b)
            common, ia, ib = np.intersect1d(la, lb, return_indices=True)
            if len(common) == 0:
                continue
            pos_ac, len_a = _ragged_gather(posa, sa, ia)
            pos_bc, len_b = _ragged_gather(posb, sb, ib)
            rank_a = np.repeat(np.arange(len(common), dtype=np.int64), len_a)
            rank_b = np.repeat(np.arange(len(common), dtype=np.int64), len_b)
            key_a = rank_a * BASE + pos_ac
            key_b = rank_b * BASE + pos_bc
            j = np.searchsorted(key_b, key_a)
            jr = np.minimum(j, len(key_b) - 1)
            right_near = (
                (j < len(key_b))
                & (rank_b[jr] == rank_a)
                & (pos_bc[jr] - pos_ac <= window)
            )
            jl = np.maximum(j - 1, 0)
            left_near = (
                (j > 0) & (rank_b[jl] == rank_a) & (pos_ac - pos_bc[jl] <= window)
            )
            near = right_near | left_near
            surv = np.bincount(rank_a[near], minlength=len(common)) > 0
            if surv.any():
                hits.append(common[surv])
        if not hits:
            return np.empty(0, dtype=np.int64)
        arr = np.sort(np.concatenate(hits))
        if self.alive is not None and len(arr):
            arr = arr[self.alive[arr]]
        return arr

    def search_span_near(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        term_a: str,
        term_b: str,
        window: int,
        filters: Optional[Dict[str, str]] = None,
    ) -> Tuple[float, List[dict]]:
        """span_near search: BM25 over ``query_tokens`` restricted to the
        ``span_near_local`` doc set.  Same return contract as ``search``."""
        if self.n_local == 0:
            return 0.0, []
        scores = self._dense_scores(query_tokens, idfs)
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
        else:
            live = scores[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
        cand = self.span_near_local(term_a, term_b, window)
        if len(cand) == 0:
            return local_max, []
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i]),
             "_local": int(i)}
            for i in cand
        ]

    def span_containing_local(
        self, term_a: str, term_b: str, term_c: str, width: int,
        term_d: Optional[str] = None,
    ) -> np.ndarray:
        """Ascending local indices of ALIVE docs where some ordered span
        ``[pa, pb]`` (``pa`` an occurrence of ``term_a``, ``pb`` of
        ``term_b``, ``pa <= pb``, ``pb - pa <= width``) CONTAINS the
        little span — an occurrence of ``term_c`` (``pa <= pc <= pb``),
        or, with ``term_d`` set, the ADJACENT PHRASE ``term_c term_d``
        (``pa <= pc`` and ``pc+1 <= pb``).  The single-term form is
        Lucene SpanContainingQuery; the phrase form is the doc-level
        SpanWithinQuery(big=a..b, little=c d) — the same match set seen
        from the little side.

        For each little occurrence it suffices to test the TIGHTEST
        candidate span: the nearest a-position at-or-left of its start
        and the nearest b-position at-or-right of its end.  All
        neighbors come from one searchsorted each on (doc-rank << 32 |
        position) keys — the span_near ragged-merge pattern."""
        if not self.has_positions:
            raise RuntimeError("index was built without with_positions=True")
        BASE = np.int64(1) << np.int64(32)
        terms = (term_a, term_b, term_c) + ((term_d,) if term_d else ())
        hits = []
        for pi in range(len(self.parts)):
            rows = [self.parts[pi]["term_row"].get(t) for t in terms]
            if any(r is None for r in rows):
                continue
            la, sa, posa = self._positions(pi, rows[0])
            lb, sb, posb = self._positions(pi, rows[1])
            lc, sc, posc = self._positions(pi, rows[2])
            common = np.intersect1d(np.intersect1d(la, lb), lc)
            if term_d:
                ld, sd, posd = self._positions(pi, rows[3])
                common = np.intersect1d(common, ld)
            if len(common) == 0:
                continue
            ia = np.searchsorted(la, common)
            ib = np.searchsorted(lb, common)
            ic = np.searchsorted(lc, common)
            pos_ac, len_a = _ragged_gather(posa, sa, ia)
            pos_bc, len_b = _ragged_gather(posb, sb, ib)
            pos_cc, len_c = _ragged_gather(posc, sc, ic)
            rank_a = np.repeat(np.arange(len(common), dtype=np.int64), len_a)
            rank_b = np.repeat(np.arange(len(common), dtype=np.int64), len_b)
            rank_c = np.repeat(np.arange(len(common), dtype=np.int64), len_c)
            key_a = rank_a * BASE + pos_ac
            key_b = rank_b * BASE + pos_bc
            key_c = rank_c * BASE + pos_cc
            end_c = key_c  # little-span end key (== start for one term)
            d_ok = np.ones(len(key_c), dtype=bool)
            if term_d:
                id_ = np.searchsorted(ld, common)
                pos_dc, len_d = _ragged_gather(posd, sd, id_)
                rank_d = np.repeat(np.arange(len(common), dtype=np.int64), len_d)
                key_d = rank_d * BASE + pos_dc
                end_c = key_c + 1
                # the little span exists only where term_d sits at pc+1
                jd = np.searchsorted(key_d, end_c, side="left")
                jdr = np.minimum(jd, max(len(key_d) - 1, 0))
                d_ok = (jd < len(key_d)) & (key_d[jdr] == end_c)
            # nearest a at-or-left of each little start (right - 1)
            ja = np.searchsorted(key_a, key_c, side="right") - 1
            jal = np.maximum(ja, 0)
            left_ok = (ja >= 0) & (rank_a[jal] == rank_c)
            pa_star = pos_ac[jal]
            # nearest b at-or-right of each little end
            jb = np.searchsorted(key_b, end_c, side="left")
            jbr = np.minimum(jb, len(key_b) - 1)
            right_ok = (jb < len(key_b)) & (rank_b[jbr] == rank_c)
            pb_star = pos_bc[jbr]
            match = d_ok & left_ok & right_ok & (pb_star - pa_star <= width)
            surv = np.bincount(rank_c[match], minlength=len(common)) > 0
            if surv.any():
                hits.append(common[surv])
        if not hits:
            return np.empty(0, dtype=np.int64)
        arr = np.sort(np.concatenate(hits))
        if self.alive is not None and len(arr):
            arr = arr[self.alive[arr]]
        return arr

    def search_span_containing(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        term_a: str,
        term_b: str,
        term_c: str,
        width: int,
        filters: Optional[Dict[str, str]] = None,
        term_d: Optional[str] = None,
    ) -> Tuple[float, List[dict]]:
        """span_containing / span_within search: BM25 over
        ``query_tokens`` restricted to the ``span_containing_local``
        doc set (little span = ``term_c`` alone, or the adjacent phrase
        ``term_c term_d``)."""
        if self.n_local == 0:
            return 0.0, []
        scores = self._dense_scores(query_tokens, idfs)
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
        else:
            live = scores[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
        cand = self.span_containing_local(term_a, term_b, term_c, width, term_d)
        if len(cand) == 0:
            return local_max, []
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i]),
             "_local": int(i)}
            for i in cand
        ]

    def span_not_local(self, include: str, exclude: str, dist: int) -> np.ndarray:
        """Ascending local indices of ALIVE docs with at least one
        occurrence of ``include`` that is NOT within ``dist`` token
        positions of any occurrence of ``exclude`` (Lucene SpanNotQuery
        with pre=post=dist).  Pure positional-postings work, vectorized:
        per partition, the ragged per-doc position lists of both terms
        merge through ONE searchsorted on (doc-rank << 32 | position)
        keys — nearest-exclude-neighbor distance per include position,
        no per-doc Python loop, no text reads."""
        if not self.has_positions:
            raise RuntimeError("index was built without with_positions=True")
        BASE = np.int64(1) << np.int64(32)
        hits = []
        for pi in range(len(self.parts)):
            row_i = self.parts[pi]["term_row"].get(include)
            if row_i is None:
                continue
            li, si, posi = self._positions(pi, row_i)
            row_e = self.parts[pi]["term_row"].get(exclude)
            if row_e is None:
                hits.append(li)
                continue
            le, se, pose = self._positions(pi, row_e)
            common, ia, ie = np.intersect1d(li, le, return_indices=True)
            only = np.setdiff1d(li, common, assume_unique=True)
            if len(only):
                hits.append(only)
            if len(common) == 0:
                continue
            pos_ic, len_i = _ragged_gather(posi, si, ia)
            pos_ec, len_e = _ragged_gather(pose, se, ie)
            rank_i = np.repeat(np.arange(len(common), dtype=np.int64), len_i)
            rank_e = np.repeat(np.arange(len(common), dtype=np.int64), len_e)
            key_i = rank_i * BASE + pos_ic
            key_e = rank_e * BASE + pos_ec
            j = np.searchsorted(key_e, key_i)
            jr = np.minimum(j, len(key_e) - 1)
            right_ok = (
                (j >= len(key_e))
                | (rank_e[jr] != rank_i)
                | (pos_ec[jr] - pos_ic > dist)
            )
            jl = np.maximum(j - 1, 0)
            left_ok = (
                (j == 0) | (rank_e[jl] != rank_i) | (pos_ic - pos_ec[jl] > dist)
            )
            ok = right_ok & left_ok
            surv = np.bincount(rank_i[ok], minlength=len(common)) > 0
            if surv.any():
                hits.append(common[surv])
        if not hits:
            return np.empty(0, dtype=np.int64)
        arr = np.sort(np.concatenate(hits))
        if self.alive is not None and len(arr):
            arr = arr[self.alive[arr]]
        return arr

    def search_span_not(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        include: str,
        exclude: str,
        dist: int,
        filters: Optional[Dict[str, str]] = None,
    ) -> Tuple[float, List[dict]]:
        """span_not search: BM25 over ``query_tokens`` restricted to the
        ``span_not_local`` doc set.  Same return contract as ``search``
        (unfiltered local max + top rows) so the driver threshold/merge
        applies unchanged."""
        if self.n_local == 0:
            return 0.0, []
        scores = self._dense_scores(query_tokens, idfs)
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
        else:
            live = scores[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
        cand = self.span_not_local(include, exclude, dist)
        if len(cand) == 0:
            return local_max, []
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i]),
             "_local": int(i)}
            for i in cand
        ]

    def search_span_first(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        span_term: str,
        n: int,
        filters: Optional[Dict[str, str]] = None,
    ) -> Tuple[float, List[dict]]:
        """span_first search: BM25 over ``query_tokens`` restricted to
        docs where ``span_term`` first occurs within the first ``n``
        positions.  Same return contract as ``search`` (unfiltered local
        max + top rows) so the driver threshold/merge applies unchanged."""
        if self.n_local == 0:
            return 0.0, []
        scores = self._dense_scores(query_tokens, idfs)
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
        else:
            live = scores[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
        cand = self.span_first_local(span_term, n)
        if len(cand) == 0:
            return local_max, []
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i]),
             "_local": int(i)}
            for i in cand
        ]

    def search_function_score(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        filters: Optional[Dict[str, str]] = None,
    ) -> Tuple[float, List[dict]]:
        """ES function_score with ``field_value_factor(field=dl,
        modifier=sqrt)``: every doc's BM25 score multiplies by the IEEE-
        exact sqrt of its token length BEFORE the threshold, so longer
        docs rank up and the max*0.01 cut applies to the boosted score.
        Same return contract as ``search`` (unfiltered local max + top
        rows); zero-score docs stay zero (sqrt multiplies)."""
        if self.n_local == 0:
            return 0.0, []
        scores = self._dense_scores(query_tokens, idfs) * np.sqrt(
            self._doc_len.astype(np.float64)
        )
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
            cand = np.arange(self.n_local)
        else:
            live = scores[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
            cand = np.flatnonzero(self.alive)
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i]),
             "_local": int(i)}
            for i in cand
        ]

    def search_decay(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        origin: int,
        denom: float,
        filters: Optional[Dict[str, str]] = None,
    ) -> Tuple[float, List[dict]]:
        """ES function_score gauss decay on doc length: every doc's BM25
        multiplies by ``exp(-(dl - origin)^2 / denom)`` (the caller
        precomputes ``denom = 2*scale^2`` as one double literal shared
        with the SQL oracle) BEFORE the threshold — docs near the origin
        length rank up.  Same return contract as ``search``."""
        if self.n_local == 0:
            return 0.0, []
        d = self._doc_len.astype(np.float64) - float(origin)
        scores = self._dense_scores(query_tokens, idfs) * np.exp(
            -(d * d) / float(denom)
        )
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
            cand = np.arange(self.n_local)
        else:
            live = scores[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
            cand = np.flatnonzero(self.alive)
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i]),
             "_local": int(i)}
            for i in cand
        ]

    def search_rank_feature(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        weight: float,
        pivot: int,
        filters: Optional[Dict[str, str]] = None,
        mode: str = "saturation",
        age_mix: int = 0,
        age_mod: int = 1,
    ) -> Tuple[float, List[dict]]:
        """ES rank_feature as a bool-should clause: every doc's score is
        BM25 + ``weight`` * feature — the additive feature applies to
        ALL docs (any doc matches the feature clause), exactly like the
        SQL twin's scores_all, and the max*0.01 threshold applies to the
        combined score.  Pure IEEE ops in the same tree order on both
        sides.  ``mode="saturation"``: feature = dl/(dl+pivot) (the
        length saturation).  ``mode="distance"``: ES distance_feature
        on recency — feature = pivot/(pivot + age_days) with age_days
        the deterministic hash mix ``(doc_id * age_mix) % age_mod``
        (the geo family's derived-attribute pattern)."""
        if self.n_local == 0:
            return 0.0, []
        if mode == "distance":
            age = (self._doc_ids.astype(np.int64) * age_mix) % age_mod
            feat = weight * (float(pivot) / (pivot + age))
        else:
            dl = self._doc_len
            feat = weight * (dl.astype(np.float64) / (dl + pivot))
        scores = self._dense_scores(query_tokens, idfs) + feat
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
            cand = np.arange(self.n_local)
        else:
            live = scores[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
            cand = np.flatnonzero(self.alive)
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i]),
             "_local": int(i)}
            for i in cand
        ]

    def search_terms_set(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        dl_threshold: int,
        low_req: int = 2,
        high_req: int = 3,
        filters: Optional[Dict[str, str]] = None,
        dense_all: bool = False,
    ) -> Tuple[float, List[dict]]:
        """ES ``terms_set`` query (minimum_should_match_field semantics):
        rank with full BM25 but keep only docs containing at least a
        PER-DOC required number of distinct query terms — ``low_req``
        when the doc's token length < ``dl_threshold``, ``high_req``
        otherwise (short docs need fewer matches).  Membership masks come
        from the same decoded postings the scorer uses; the F4 threshold
        max stays unmasked (filters-after-scoring, like min_match)."""
        if self.n_local == 0:
            return 0.0, []
        scores = self._dense_scores(query_tokens, idfs)
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
        else:
            live = scores[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
        if dense_all:
            cand = (
                np.arange(self.n_local)
                if self.alive is None
                else np.flatnonzero(self.alive)
            )
        else:
            cand = np.flatnonzero(scores > 0)
            neg = np.flatnonzero(scores < 0)
            if len(neg):
                cand = np.concatenate([cand, neg])
            if self.alive is not None:
                cand = cand[self.alive[cand]]
        if len(cand) == 0:
            return local_max, []
        mask = self._filter_mask(filters, cand)
        cnt = np.zeros(len(cand), dtype=np.int64)
        for t in sorted(set(query_tokens)):
            cnt += self._contains_mask(t)[cand]
        req = np.where(self._doc_len[cand] >= dl_threshold, high_req, low_req)
        mask &= cnt >= req
        cand = cand[mask]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i]),
             "_local": int(i)}
            for i in cand
        ]

    def search_positional(
        self,
        phrase_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        filters: Optional[Dict[str, str]] = None,
        slop: int = 0,
        last_alternatives: Optional[List[str]] = None,
    ) -> Tuple[float, List[dict]]:
        """Positional phrase search: BM25 over the phrase's tokens,
        restricted to docs where they appear adjacently in order.  Same
        return contract as ``search`` (unfiltered local max + top rows) so
        the driver's threshold/merge applies unchanged.
        ``last_alternatives`` adds a trailing multi-term slot to the
        adjacency requirement only (match_phrase_prefix: the prefix
        expansion is a FILTER, scoring stays over the fixed tokens)."""
        if self.n_local == 0:
            return 0.0, []
        scores = self._dense_scores(phrase_tokens, idfs)
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
        else:
            live = scores[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
        cand = self.phrase_adjacency_local(
            phrase_tokens, slop=slop, last_alternatives=last_alternatives
        )
        if len(cand) == 0:
            return local_max, []
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(scores[i]), "_local": int(i)}
            for i in cand
        ]

    def _contains_mask(self, term: str) -> np.ndarray:
        """Boolean membership vector over this shard's local docs: True
        where the doc contains ``term`` (tf > 0).  Built from the same
        decoded postings the scorer uses — cost is one posting decode
        (cached), never a text scan."""
        mask = np.zeros(self.n_local, dtype=bool)
        for pi in range(len(self.parts)):
            row = self.parts[pi]["term_row"].get(term)
            if row is not None:
                local, _ = self._postings(pi, row)
                mask[local] = True
        return mask

    def _boolean_mask(
        self,
        required: Optional[List[str]],
        excluded: Optional[List[str]],
        idx: np.ndarray,
    ) -> np.ndarray:
        """Mask over candidate rows ``idx`` enforcing +term/-term query
        operators: every ``required`` term present, no ``excluded`` term
        present.  Applied AFTER scoring like the metadata filters (F3
        semantics) — never touches idf/avgdl or the threshold max."""
        mask = np.ones(len(idx), dtype=bool)
        for t in required or ():
            mask &= self._contains_mask(t)[idx]
        for t in excluded or ():
            mask &= ~self._contains_mask(t)[idx]
        return mask

    def _filter_mask(self, filters: Optional[Dict[str, str]], idx: np.ndarray) -> np.ndarray:
        mask = np.ones(len(idx), dtype=bool)
        if not filters:
            return mask
        for key, val in filters.items():
            col = key
            if key == "repo_name" and "repo_name" not in self._filter_cols:
                col = "repo"  # file mode: repo column plays the role
            arr = self._filter_cols.get(col)
            if arr is None:
                # surface the mode mismatch instead of silently returning
                # zero results (e.g. an entity_type filter on a file-mode
                # index has no such docmeta column)
                raise KeyError(
                    f"filter column {col!r} does not exist in this index's "
                    f"docmeta (available: {sorted(self._filter_cols)}); "
                    "index mode mismatch?"
                )
            mask &= arr[idx] == val
        return mask

    def search(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        limit: int,
        filters: Optional[Dict[str, str]] = None,
        dense_all: bool = False,
        method: str = "dense",
        required: Optional[List[str]] = None,
        excluded: Optional[List[str]] = None,
        after: Optional[Tuple[float, int]] = None,
        min_match: Optional[int] = None,
        demote: Optional[Tuple[List[str], float]] = None,
    ) -> Tuple[float, List[dict]]:
        """Return (local unfiltered max score, top-``limit`` candidate rows).

        ``dense_all=True`` ranks every local doc (zero scores included) —
        the reference's ``max <= 0`` fallback branch.  ``method="wand"``
        uses the upper-bound-pruned document-at-a-time scorer (identical
        results; wins when postings are long/disk-resident).
        ``required``/``excluded`` are +term/-term boolean operators —
        post-scoring membership masks (the WAND path falls back to dense
        when they are present: pruning bounds don't compose with
        candidate-set subtraction).
        ``after=(score, doc_id)`` is the search-after pagination cursor:
        only rows strictly after that position in the global
        (score desc, doc_id asc) order are returned.  Applied per shard
        BEFORE the local top-``limit`` cut (scores are corpus-global, so
        the predicate is exact shard-locally); the unfiltered local max
        — which feeds the F4 threshold — is unaffected by the cursor.
        """
        if self.n_local == 0:
            return 0.0, []
        if (
            method == "wand" and not dense_all and not required
            and not excluded and after is None and min_match is None
            and demote is None
        ):
            local_max, top = self._wand_topk(query_tokens, idfs, limit, filters)
            if filters and top is not None:
                _, top1 = self._wand_topk(query_tokens, idfs, 1, None)
                local_max = top1[0][1] if top1 else 0.0
            rows = [
                {"doc_id": int(self._doc_ids[l]), "score": float(s), "_local": int(l)}
                for l, s in top
            ]
            return local_max, rows
        scores = self._dense_scores(query_tokens, idfs)
        if demote is not None:
            # boosting query (ES `boosting`): docs matching ANY negative
            # term keep ranking but at score * negative_boost — applied
            # BEFORE the threshold max, so demotion is a pure score
            # transform of the standard pipeline (the oracle multiplies
            # inside scores_all identically; 0.5 is float-exact)
            neg_terms, factor = demote
            dm = np.zeros(self.n_local, dtype=bool)
            for t in sorted(set(neg_terms)):
                dm |= self._contains_mask(t)
            scores = scores.copy()
            scores[dm] *= factor
        if self.alive is None:
            local_max = float(scores.max()) if len(scores) else 0.0
        else:
            live_scores = scores[self.alive]
            local_max = float(live_scores.max()) if len(live_scores) else 0.0
        if dense_all:
            cand = (
                np.arange(self.n_local)
                if self.alive is None
                else np.flatnonzero(self.alive)
            )
        else:
            cand = np.flatnonzero(scores > 0)
            neg = np.flatnonzero(scores < 0)
            if len(neg):
                cand = np.concatenate([cand, neg])
            if self.alive is not None:
                cand = cand[self.alive[cand]]
        if len(cand) == 0:
            return local_max, []
        mask = self._filter_mask(filters, cand)
        if required or excluded:
            mask &= self._boolean_mask(required, excluded, cand)
        if min_match is not None:
            # minimum_should_match: keep docs containing >= k DISTINCT
            # query terms — same F3 placement as the boolean operators
            # (mask after scoring; the threshold max stays unmasked)
            cnt = np.zeros(len(cand), dtype=np.int64)
            for t in sorted(set(query_tokens)):
                cnt += self._contains_mask(t)[cand]
            mask &= cnt >= min_match
        if after is not None:
            s_a, d_a = after
            cs = scores[cand]
            mask &= (cs < s_a) | ((cs == s_a) & (self._doc_ids[cand] > d_a))
        cand = cand[mask]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))[:limit]
        cand = cand[order]
        rows = []
        for i in cand:
            rows.append(
                {
                    "doc_id": int(self._doc_ids[i]),
                    "score": float(scores[i]),
                    "_local": int(i),
                }
            )
        return local_max, rows

    def scores_for(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        doc_ids: List[int],
    ) -> Tuple[List[int], List[float]]:
        """Exact dense BM25 scores for a specific doc_id set — the rescore
        window primitive (ES ``rescore``): the caller already knows WHICH
        docs it wants re-scored, so no top-k / threshold logic applies.
        Returns (ids, scores) for the requested ids this shard owns; ids
        absent locally are another shard's (or nobody's) to answer.  Wire
        cost is O(|window|), never per-corpus rows."""
        if self.n_local == 0 or not len(doc_ids):
            return [], []
        want = np.asarray(doc_ids, dtype=np.int64)
        order = np.argsort(self._doc_ids, kind="stable")
        sorted_ids = self._doc_ids[order]
        pos = np.searchsorted(sorted_ids, want)
        pos = np.minimum(pos, len(sorted_ids) - 1)
        ok = sorted_ids[pos] == want
        if not ok.any():
            return [], []
        local = order[pos[ok]]
        scores = self._dense_scores(query_tokens, idfs)
        return (
            [int(d) for d in want[ok]],
            [float(s) for s in scores[local]],
        )

    def search_dismax(
        self,
        clause_token_lists: List[List[str]],
        idfs: Dict[str, float],
        limit: int,
        filters: Optional[Dict[str, str]] = None,
        dense_all: bool = False,
        tie: float = 0.3,
    ) -> Tuple[float, List[dict]]:
        """Disjunction-max scoring (ES dis_max): per doc, the best
        clause's BM25 score plus ``tie`` times the rest —
        ``max + tie * (sum - max)`` over the per-clause dense scores.
        Same return contract as ``search`` (unfiltered local max + local
        top rows) so the driver's F4 threshold/merge applies unchanged."""
        if self.n_local == 0:
            return 0.0, []
        per = [self._dense_scores(toks, idfs) for toks in clause_token_lists]
        stack = np.stack(per)
        mx = stack.max(axis=0)
        combined = mx + tie * (stack.sum(axis=0) - mx)
        if self.alive is None:
            local_max = float(combined.max()) if len(combined) else 0.0
        else:
            live = combined[self.alive]
            local_max = float(live.max()) if len(live) else 0.0
        if dense_all:
            cand = (
                np.arange(self.n_local)
                if self.alive is None
                else np.flatnonzero(self.alive)
            )
        else:
            cand = np.flatnonzero(combined > 0)
            neg = np.flatnonzero(combined < 0)
            if len(neg):
                cand = np.concatenate([cand, neg])
            if self.alive is not None:
                cand = cand[self.alive[cand]]
        if len(cand) == 0:
            return local_max, []
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return local_max, []
        order = np.lexsort((self._doc_ids[cand], -combined[cand]))[:limit]
        cand = cand[order]
        return local_max, [
            {"doc_id": int(self._doc_ids[i]), "score": float(combined[i]), "_local": int(i)}
            for i in cand
        ]

    def facet_counts(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        facet_col: str,
        min_score: Optional[float],
        filters: Optional[Dict[str, str]] = None,
    ) -> Dict[str, int]:
        """Partial facet aggregation over this shard's RESULT SET: counts
        of local docs with score >= min_score per facet value.  Only the
        (facet_value -> count) partials cross the wire — never per-doc
        rows — so facet queries cost O(distinct values), not O(matches).
        ``min_score=None`` = the reference's ``max <= 0`` keep-all branch.
        """
        col = self._filter_cols.get(facet_col)
        if col is None:
            raise KeyError(
                f"facet column {facet_col!r} not in this index's docmeta "
                f"(available: {sorted(self._filter_cols)})"
            )
        if self.n_local == 0:
            return {}
        scores = self._dense_scores(query_tokens, idfs)
        if min_score is None:
            cand = (
                np.arange(self.n_local)
                if self.alive is None
                else np.flatnonzero(self.alive)
            )
        else:
            cand = np.flatnonzero(scores >= min_score)
            if self.alive is not None:
                cand = cand[self.alive[cand]]
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return {}
        vals, counts = np.unique(col[cand], return_counts=True)
        return {str(v): int(c) for v, c in zip(vals, counts)}

    def match_count(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        min_score: Optional[float],
        filters: Optional[Dict[str, str]] = None,
    ) -> int:
        """Thresholded match COUNT for this shard — the ``_count`` API's
        partial.  Same candidate semantics as :meth:`facet_counts`
        (``min_score=None`` = the keep-all branch) but touches no facet
        column, so the count is independent of facet-value nullability
        and only one integer crosses the wire."""
        if self.n_local == 0:
            return 0
        if min_score is None:
            cand = (
                np.arange(self.n_local)
                if self.alive is None
                else np.flatnonzero(self.alive)
            )
        else:
            scores = self._dense_scores(query_tokens, idfs)
            cand = np.flatnonzero(scores >= min_score)
            if self.alive is not None:
                cand = cand[self.alive[cand]]
        cand = cand[self._filter_mask(filters, cand)]
        return int(len(cand))

    def group_top_hits(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        group_col: str,
        k: int,
        min_score: Optional[float],
        filters: Optional[Dict[str, str]] = None,
    ) -> Dict[str, List[Tuple[float, int]]]:
        """top_hits partial (ES ``top_hits`` inside a terms agg): per
        distinct ``group_col`` value, this shard's best ``k`` hits
        (score desc, doc_id asc) from the thresholded set.  At most
        groups x k pairs cross the wire — the collapse_best shape
        generalized from 1 to k."""
        col = self._filter_cols.get(group_col)
        if col is None:
            raise KeyError(
                f"group column {group_col!r} not in this index's docmeta "
                f"(available: {sorted(self._filter_cols)})"
            )
        if self.n_local == 0:
            return {}
        scores = self._dense_scores(query_tokens, idfs)
        if min_score is None:
            cand = (
                np.arange(self.n_local)
                if self.alive is None
                else np.flatnonzero(self.alive)
            )
        else:
            cand = np.flatnonzero(scores >= min_score)
            if self.alive is not None:
                cand = cand[self.alive[cand]]
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return {}
        import pandas as pd

        df = pd.DataFrame(
            {"g": col[cand], "score": scores[cand], "doc_id": self._doc_ids[cand]}
        )
        df = df.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).groupby("g", sort=False).head(k)
        out: Dict[str, List[Tuple[float, int]]] = {}
        for g, s, d in zip(df["g"], df["score"], df["doc_id"]):
            out.setdefault(str(g), []).append((float(s), int(d)))
        return out

    def collapse_best(
        self,
        query_tokens: List[str],
        idfs: Dict[str, float],
        collapse_col: str,
        min_score: Optional[float],
        filters: Optional[Dict[str, str]] = None,
    ) -> Dict[str, Tuple[float, int]]:
        """Field-collapsing partial (Elasticsearch ``collapse``): for each
        distinct value of ``collapse_col`` among this shard's thresholded
        result set, the best (score desc, doc_id asc) local hit.  Only
        one (value -> (score, doc_id)) pair per group crosses the wire —
        the driver merges per-shard bests, so collapse costs O(distinct
        groups), never O(matches).  ``min_score=None`` = the reference's
        ``max <= 0`` keep-all branch, like ``facet_counts``."""
        col = self._filter_cols.get(collapse_col)
        if col is None:
            raise KeyError(
                f"collapse column {collapse_col!r} not in this index's "
                f"docmeta (available: {sorted(self._filter_cols)})"
            )
        if self.n_local == 0:
            return {}
        scores = self._dense_scores(query_tokens, idfs)
        if min_score is None:
            cand = (
                np.arange(self.n_local)
                if self.alive is None
                else np.flatnonzero(self.alive)
            )
        else:
            cand = np.flatnonzero(scores >= min_score)
            if self.alive is not None:
                cand = cand[self.alive[cand]]
        cand = cand[self._filter_mask(filters, cand)]
        if len(cand) == 0:
            return {}
        # order by (score desc, doc_id asc); the FIRST occurrence of each
        # group value in that order is its best hit (np.unique returns
        # first-occurrence indexes)
        order = np.lexsort((self._doc_ids[cand], -scores[cand]))
        c = cand[order]
        vals, first = np.unique(col[c], return_index=True)
        return {
            str(v): (float(scores[c[i]]), int(self._doc_ids[c[i]]))
            for v, i in zip(vals, first)
        }


class LexiconReader:
    """Per-query term -> idf lookup: bucket hash selects the lexicon shard
    file, parquet predicate pushdown (sorted term + small row groups)
    selects the row — the vocabulary is never loaded whole."""

    def __init__(self, index_dir: str, lex_buckets: Optional[int] = None):
        self.path = os.path.join(index_dir, "lexicon")
        if lex_buckets is None:
            try:
                lex_buckets = IndexManifest.load(index_dir).extra.get("lex_buckets")
            except (OSError, ValueError):
                lex_buckets = None
        self.buckets = lex_buckets
        self._cache: Dict[str, float] = {}

    def _bucket_of(self, terms: List[str]) -> Dict[int, List[str]]:
        h = pd.util.hash_array(np.asarray(terms, dtype=object))
        out: Dict[int, List[str]] = {}
        for t, b in zip(terms, (h % self.buckets).astype(int)):
            out.setdefault(b, []).append(t)
        return out

    def idfs(self, terms: List[str]) -> Dict[str, float]:
        missing = sorted({t for t in terms if t not in self._cache})
        if missing:
            found: Dict[str, float] = {}
            if self.buckets:
                for b, ts in self._bucket_of(missing).items():
                    f = os.path.join(self.path, f"bucket-{b:04d}.parquet")
                    if not os.path.exists(f):
                        continue
                    tbl = pads.dataset(f, format="parquet").to_table(
                        columns=["term", "idf"], filter=pads.field("term").isin(ts)
                    )
                    found.update(zip(tbl["term"].to_pylist(), tbl["idf"].to_pylist()))
            else:  # legacy layout: one sorted dataset
                tbl = pads.dataset(self.path, format="parquet").to_table(
                    columns=["term", "idf"], filter=pads.field("term").isin(missing)
                )
                found = dict(zip(tbl["term"].to_pylist(), tbl["idf"].to_pylist()))
            for t in missing:
                self._cache[t] = found.get(t, 0.0)
        return {t: self._cache[t] for t in set(terms)}

    def stats(self, terms: List[str]) -> Dict[str, Tuple[int, float]]:
        """(df, idf) per term — the introspection read behind _explain
        and _termvectors: same bucket-hash + predicate-pushdown path as
        ``idfs`` but returning document frequency too."""
        out: Dict[str, Tuple[int, float]] = {}
        missing = sorted(set(terms))
        if self.buckets:
            for b, ts in self._bucket_of(missing).items():
                f = os.path.join(self.path, f"bucket-{b:04d}.parquet")
                if not os.path.exists(f):
                    continue
                tbl = pads.dataset(f, format="parquet").to_table(
                    columns=["term", "df", "idf"],
                    filter=pads.field("term").isin(ts),
                )
                for t, d, i in zip(
                    tbl["term"].to_pylist(), tbl["df"].to_pylist(),
                    tbl["idf"].to_pylist(),
                ):
                    out[t] = (int(d), float(i))
        else:
            tbl = pads.dataset(self.path, format="parquet").to_table(
                columns=["term", "df", "idf"],
                filter=pads.field("term").isin(missing),
            )
            for t, d, i in zip(
                tbl["term"].to_pylist(), tbl["df"].to_pylist(),
                tbl["idf"].to_pylist(),
            ):
                out[t] = (int(d), float(i))
        return out

    def expand(self, pattern: str, max_expand: int = 64) -> List[Tuple[str, int]]:
        """Wildcard term expansion: ``*`` = any run, ``?`` = one char.

        Returns matching (term, df) ordered by (df desc, term asc),
        capped at ``max_expand``.  The literal prefix before the first
        wildcard becomes a parquet RANGE predicate — lexicon shards are
        term-sorted, so prefix queries touch only the covering row
        groups; the residual pattern is matched with one vectorized RE2
        kernel per shard.  Cost scales with vocabulary, never corpus.
        """
        import re as _re

        import pyarrow.compute as pc

        rx = (
            "^"
            + "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                for c in pattern
            )
            + "$"
        )
        first_wild = min(
            [i for i in (pattern.find("*"), pattern.find("?")) if i >= 0],
            default=len(pattern),
        )
        return self._scan_matching(rx, pattern[:first_wild], max_expand)

    def expand_range(
        self, lo: str, hi: str, max_expand: int = 64
    ) -> List[Tuple[str, int]]:
        """Lucene ``TermRangeQuery`` expansion: vocabulary terms in the
        lexicographic interval ``[lo, hi)``.  The bounds become ONE
        parquet RANGE predicate on the term-sorted lexicon shards (only
        the covering row groups are read — same pushdown as prefix
        expansion), and matches return (term, df) ordered (df desc,
        term asc) capped at ``max_expand``, Lucene's scoring-rewrite
        cap.  Cost scales with vocabulary, never corpus."""
        if not os.path.isdir(self.path):
            return []
        filt = (pads.field("term") >= lo) & (pads.field("term") < hi)
        rows: List[Tuple[str, int]] = []
        for f in sorted(os.listdir(self.path)):
            if not f.endswith(".parquet"):
                continue
            t = pads.dataset(
                os.path.join(self.path, f), format="parquet"
            ).to_table(columns=["term", "df"], filter=filt)
            rows.extend(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:max_expand]

    def expand_regex(
        self, pattern: str, max_expand: int = 64
    ) -> List[Tuple[str, int]]:
        """Lucene ``regexp`` query expansion: the pattern is anchored and
        FULL-matched against every vocabulary term (Lucene RegexpQuery
        semantics — ``s[aeiou].*`` matches the whole term, never a
        substring).  The leading literal run of the pattern (chars before
        the first regex metacharacter) becomes the same parquet RANGE
        predicate ``expand`` uses, so anchored-literal-prefix regexes
        touch only the covering row groups.  Matches return (term, df)
        ordered (df desc, term asc), capped at ``max_expand`` — and then
        score as ordinary OR'd BM25 terms, like wildcard expansion.
        Both this scan and the DuckDB oracle (`regexp_full_match`) run
        RE2, so the match set is engine-identical by construction."""
        meta = set(".?*+()[]{}|\\^$")
        prefix = ""
        for c in pattern:
            if c in meta:
                break
            prefix += c
        return self._scan_matching(f"^(?:{pattern})$", prefix, max_expand)

    def _scan_matching(
        self, rx: str, prefix: str, max_expand: int
    ) -> List[Tuple[str, int]]:
        """Shared lexicon scan: prefix range pushdown + one vectorized
        RE2 kernel per term-sorted shard, (df desc, term asc) cap."""
        import pyarrow.compute as pc

        filt = None
        if prefix:
            filt = (pads.field("term") >= prefix) & (
                pads.field("term") <= prefix + "￿"
            )
        if not os.path.isdir(self.path):
            return []
        rows: List[Tuple[str, int]] = []
        for f in sorted(os.listdir(self.path)):
            if not f.endswith(".parquet"):
                continue
            t = pads.dataset(
                os.path.join(self.path, f), format="parquet"
            ).to_table(columns=["term", "df"], filter=filt)
            t = t.filter(pc.match_substring_regex(t["term"], rx))
            rows.extend(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:max_expand]

    def suggest(
        self, term: str, max_dist: int = 1, limit: int = 10
    ) -> List[Tuple[str, int, int]]:
        """Spelling suggestions ("did you mean"): vocabulary terms within
        ``max_dist`` Levenshtein edits of ``term``, ranked (distance asc,
        df desc, term asc) and capped at ``limit``.

        Scans the lexicon shards with a vectorized length-band prefilter
        (``|len(t) - len(q)| <= max_dist`` eliminates almost the whole
        vocabulary); the exact banded DP runs only on survivors.  Cost
        scales with vocabulary, never corpus; shard scans are independent
        (one task per shard on a cluster)."""
        import pyarrow.compute as pc

        q = term.lower()
        L = len(q)
        rows: List[Tuple[str, int, int]] = []
        for f in sorted(os.listdir(self.path)):
            if not f.endswith(".parquet"):
                continue
            t = pads.dataset(
                os.path.join(self.path, f), format="parquet"
            ).to_table(columns=["term", "df"])
            lens = pc.utf8_length(t["term"])
            band = pc.and_(
                pc.greater_equal(lens, pa.scalar(L - max_dist)),
                pc.less_equal(lens, pa.scalar(L + max_dist)),
            )
            t = t.filter(band)
            for cand, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
                d = _levenshtein_capped(q, cand, max_dist)
                if d <= max_dist:
                    rows.append((cand, int(df), d))
        rows.sort(key=lambda r: (r[2], -r[1], r[0]))
        return rows[:limit]


def _ragged_gather(values: np.ndarray, starts: np.ndarray, idx: np.ndarray):
    """Concatenate ``values[starts[i]:starts[i+1]]`` for every i in
    ``idx`` without a Python loop; returns (flat values, per-i lengths).
    Shared by the positional span operators' ragged-list merges."""
    lens = (starts[idx + 1] - starts[idx]).astype(np.int64)
    total = int(lens.sum())
    flat = np.arange(total, dtype=np.int64)
    offs = np.repeat(np.cumsum(lens) - lens, lens)
    out = values[np.repeat(starts[idx], lens) + (flat - offs)]
    return out.astype(np.int64), lens


def _levenshtein_capped(a: str, b: str, cap: int) -> int:
    """Classic DP with a row-minimum early exit; returns cap+1 when the
    true distance exceeds ``cap`` (callers only need <= cap)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if ca == b[j - 1] else 1),
            )
        if min(cur) > cap:
            return cap + 1
        prev = cur
    return prev[lb]


_POOLED_ACTORS: Dict[tuple, list] = {}
_POOL_MAX_ACTORS = 4  # only small engines pool (a 16-actor bench pool would
#                       hold half the cluster hostage between queries)


def _manifest_fingerprint(index_dir: str) -> str:
    """Cheap identity of the on-disk index state: pooled actors may only
    be reused while the manifest file is byte-identical (any rebuild,
    append, tombstone or compaction rewrites it)."""
    p = os.path.join(index_dir, "manifest.json")
    try:
        st = os.stat(p)
        return f"{st.st_mtime_ns}-{st.st_size}"
    except OSError:
        return "missing"


class QueryEngine:
    """Driver-side fan-out/merge over the shard-actor pool.

    Consecutive engines over the SAME unchanged index reuse the previous
    engine's warm shard actors (postings already loaded, decoded-postings
    caches intact) instead of paying actor startup + parquet loads per
    engine — the dominant cost when a driver runs hundreds of one-shot
    queries against one index.  ``close()`` parks small pools
    (<= ``_POOL_MAX_ACTORS``) for reuse; a changed manifest fingerprint
    evicts and kills stale pools for that index dir."""

    def __init__(
        self,
        index_dir: str,
        num_actors: Optional[int] = None,
        prewarm_terms: int = 0,
        avgdl_override: Optional[float] = None,
        pool: bool = False,
    ):
        import ray

        from ..state.manifest import normalize_dir

        index_dir = normalize_dir(index_dir)
        self.index_dir = index_dir
        self.manifest = IndexManifest.load(index_dir)
        self.lexicon = LexiconReader(index_dir)
        part_ids = [p.part_id for p in self.manifest.partitions if p.n_docs > 0]
        if num_actors is None:
            # leave headroom: a query-actor pool that reserves every CPU
            # starves any concurrently-running Dataset pipeline (deadlock in
            # the worst case) — size to half the cluster by default
            total = int(ray.cluster_resources().get("CPU", 4))
            num_actors = max(1, min(len(part_ids), total // 2))
        num_actors = max(1, min(num_actors, len(part_ids) or 1))
        # kept for heal(): a dead actor rebuilds over its own stride
        self._part_ids = part_ids
        self._num_actors = num_actors
        self._avgdl_override = avgdl_override
        # pool=False (default) keeps strict close()=kill semantics: parked
        # actors hold their 0.5-CPU reservations, which can starve
        # concurrent multi-CPU Dataset tasks on small clusters — only the
        # run-many-one-shot-queries driver path opts in.
        self._pool = bool(pool)
        self._pool_key = (
            index_dir, num_actors, avgdl_override,
            _manifest_fingerprint(index_dir),
        )
        pooled = _POOLED_ACTORS.pop(self._pool_key, None) if pool else None
        if pooled is not None:
            try:  # cheap liveness probe: a dead cluster/actor falls through
                ray.get([a.ping.remote() for a in pooled], timeout=30)
                self.actors = pooled
                return
            except Exception:
                # A failed probe must not abandon the popped actors: any
                # still-alive ones would keep their 0.5-CPU reservations
                # forever (exactly the starvation the pooling notes warn
                # about).  Best-effort kill before creating fresh actors.
                for a in pooled:
                    try:
                        ray.kill(a)
                    except Exception:
                        pass
        # a changed fingerprint makes older pools for this dir stale: kill
        for k in [k for k in _POOLED_ACTORS if k[0] == index_dir]:
            for a in _POOLED_ACTORS.pop(k):
                ray.kill(a)
        Actor = ray.remote(IndexShard)
        # fractional num_cpus: scoring bursts are short; 0.5 lets builds and
        # other stages interleave with a resident query pool
        self.actors = [
            Actor.options(num_cpus=0.5).remote(
                index_dir, part_ids[i::num_actors], avgdl_override
            )
            for i in range(num_actors)
        ]
        ray.get([a.ping.remote() for a in self.actors])  # surface init errors
        if prewarm_terms:
            hot = self._hot_terms(prewarm_terms)
            ray.get([a.prewarm.remote(hot) for a in self.actors])

    def heal(self) -> int:
        """Replace DEAD shard actors in place (each rebuilt over its own
        partition stride from shared storage) and return how many were
        revived.  The multi-node failure mode this serves: a lost node
        kills its resident shard actors mid-serve; the next search's
        fan-out raises ``RayActorError``, retries through this path, and
        the reloaded shards answer — no index rebuild, no engine
        restart.  Alive actors (and their warm caches) are untouched."""
        import ray

        revived = 0
        for i, a in enumerate(self.actors):
            try:
                ray.get(a.ping.remote(), timeout=30)
            except Exception:
                try:
                    ray.kill(a)
                except Exception:
                    pass
                Actor = ray.remote(IndexShard)
                na = Actor.options(num_cpus=0.5).remote(
                    self.index_dir,
                    self._part_ids[i :: self._num_actors],
                    self._avgdl_override,
                )
                # bounded: after a node loss the cluster may lack the
                # CPU to place the replacement — surface that instead
                # of hanging the retried query forever
                ray.get(na.ping.remote(), timeout=300)
                self.actors[i] = na
                revived += 1
        return revived

    def _tombstoned_ids(self) -> frozenset:
        """Global doc_ids logically deleted via tombstone files (cached;
        empty frozenset on the common tombstone-free path).  Mirrors the
        shard-side alive-mask source (IndexShard reads the same files)."""
        cached = getattr(self, "_dead_ids_cache", None)
        if cached is not None:
            return cached
        dead: frozenset = frozenset()
        tomb_dir = os.path.join(self.index_dir, "tombstones")
        if os.path.isdir(tomb_dir):
            files = [
                os.path.join(tomb_dir, f)
                for f in sorted(os.listdir(tomb_dir))
                if f.endswith(".parquet")
            ]
            if files:
                dead = frozenset(
                    int(x)
                    for f in files
                    for x in pq.read_table(f, columns=["doc_id"])["doc_id"]
                    .to_numpy(zero_copy_only=False)
                )
        self._dead_ids_cache = dead
        return dead

    def _hot_terms(self, n: int) -> List[str]:
        """Top-n terms by global df from the lexicon (df column only)."""
        import heapq

        lex_dir = os.path.join(self.index_dir, "lexicon")
        if not os.path.isdir(lex_dir):
            return []
        best: List[Tuple[int, str]] = []
        for f in sorted(os.listdir(lex_dir)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(lex_dir, f), columns=["term", "df"])
            dfs = t["df"].to_numpy(zero_copy_only=False)
            if len(dfs) == 0:
                continue
            k = min(n, len(dfs))
            top = np.argpartition(-dfs, k - 1)[:k]
            for i in top:
                item = (int(dfs[i]), t["term"][int(i)].as_py())
                if len(best) < n:
                    heapq.heappush(best, item)
                elif item > best[0]:
                    heapq.heapreplace(best, item)
        return [term for _, term in sorted(best, reverse=True)]

    def facets(
        self,
        query: str,
        facet_col: str = "language",
        filters: Optional[Dict[str, str]] = None,
        range_syntax: bool = False,
    ) -> Dict[str, int]:
        """Faceted search: facet-value counts over the FULL result set of
        ``query`` (every doc passing the reference's max*0.01 threshold,
        not just top-k).  Two cheap rounds: (1) limit-1 fan-out for the
        global unfiltered max, (2) per-shard facet partials merged on the
        driver — per-doc rows never leave the shards."""
        import ray

        toks = (
            self._wildcard_tokens(query, ranges=range_syntax)
            if ("*" in query or "?" in query or (range_syntax and ".." in query))
            else tokenize(query)
        )
        if not toks:
            return {}
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [a.search.remote(toks, q_idfs, 1, None, False, "dense") for a in self.actors]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        min_score = global_max * 0.01 if global_max > 0 else None
        partials = ray.get(
            [
                a.facet_counts.remote(toks, q_idfs, facet_col, min_score, filters)
                for a in self.actors
            ]
        )
        out: Dict[str, int] = {}
        for p in partials:
            for v, c in p.items():
                out[v] = out.get(v, 0) + c
        return dict(sorted(out.items()))

    def count(
        self,
        query: str,
        filters: Optional[Dict[str, str]] = None,
        range_syntax: bool = False,
    ) -> int:
        """ES ``_count`` API: how many docs the query matches under the
        reference threshold semantics (max*0.01; max<=0 keeps all
        scored docs), WITHOUT fetching any hits — one limit-1 fan-out
        for the global max, then a count-only round where each shard
        returns a single integer (no facet column involved, so NULL
        facet values can never leak out of the count)."""
        import ray

        toks = (
            self._wildcard_tokens(query, ranges=range_syntax)
            if ("*" in query or "?" in query or (range_syntax and ".." in query))
            else tokenize(query)
        )
        if not toks:
            return 0
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [a.search.remote(toks, q_idfs, 1, None, False, "dense") for a in self.actors]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        min_score = global_max * 0.01 if global_max > 0 else None
        return sum(
            ray.get(
                [
                    a.match_count.remote(toks, q_idfs, min_score, filters)
                    for a in self.actors
                ]
            )
        )

    def collapse(
        self,
        query: str,
        collapse_col: str = "language",
        limit: int = 10,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Field collapsing (Elasticsearch ``collapse``): the top
        ``limit`` GROUPS by their best hit — at most one result per
        distinct ``collapse_col`` value.  Same two cheap rounds as
        ``facets`` (global unfiltered max, then per-shard per-group
        bests); per-doc rows never leave the shards.  Returns
        [{group, doc_id, score}] ordered (score desc, doc_id asc)."""
        import ray

        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [a.search.remote(toks, q_idfs, 1, None, False, "dense") for a in self.actors]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        min_score = global_max * 0.01 if global_max > 0 else None
        partials = ray.get(
            [
                a.collapse_best.remote(toks, q_idfs, collapse_col, min_score, filters)
                for a in self.actors
            ]
        )
        best: Dict[str, Tuple[float, int]] = {}
        for p in partials:
            for g, (s, d) in p.items():
                cur = best.get(g)
                if cur is None or s > cur[0] or (s == cur[0] and d < cur[1]):
                    best[g] = (s, d)
        rows = sorted(
            ((s, d, g) for g, (s, d) in best.items()), key=lambda x: (-x[0], x[1])
        )[:limit]
        return [{"group": g, "doc_id": d, "score": s} for s, d, g in rows]

    def top_hits(
        self,
        query: str,
        group_col: str = "language",
        k: int = 2,
        limit_groups: int = 10,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """ES ``top_hits`` inside a terms aggregation: the top ``k`` hits
        per ``group_col`` bucket, buckets ranked by their best hit
        (score desc, doc_id asc) and capped at ``limit_groups``.  Same
        two cheap rounds as ``collapse``; only groups x k pairs per
        shard cross the wire.  Returns [{grp_rank, group, hit_rank,
        doc_id, score}]."""
        import ray

        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [a.search.remote(toks, q_idfs, 1, None, False, "dense")
             for a in self.actors]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        min_score = global_max * 0.01 if global_max > 0 else None
        partials = ray.get(
            [
                a.group_top_hits.remote(toks, q_idfs, group_col, k, min_score,
                                        filters)
                for a in self.actors
            ]
        )
        groups: Dict[str, List[Tuple[float, int]]] = {}
        for p in partials:
            for g, pairs in p.items():
                groups.setdefault(g, []).extend(pairs)
        merged = {
            g: sorted(pairs, key=lambda x: (-x[0], x[1]))[:k]
            for g, pairs in groups.items()
        }
        ranked = sorted(
            merged.items(), key=lambda kv: (-kv[1][0][0], kv[1][0][1])
        )[:limit_groups]
        out: List[dict] = []
        for gi, (g, pairs) in enumerate(ranked):
            for hi, (s, d) in enumerate(pairs):
                out.append(
                    {"grp_rank": gi, "group": g, "hit_rank": hi,
                     "doc_id": d, "score": s}
                )
        return out

    def search_function_score(
        self,
        query: str,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """ES function_score / field_value_factor(sqrt) search: BM25
        boosted by sqrt(doc token length) per doc, threshold max*0.01 on
        the BOOSTED score, standard (score desc, doc_id asc) merge."""
        import ray

        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [
                a.search_function_score.remote(toks, q_idfs, max(limit, 1), filters)
                for a in self.actors
            ]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        rows = [r for _, rs in parts for r in rs]
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for r in rows if r["score"] >= min_score]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_decay_gauss(
        self,
        query: str,
        origin: int = 30,
        scale: int = 20,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """ES function_score gauss decay on doc token length: BM25 times
        ``exp(-(dl-origin)^2 / (2*scale^2))`` per doc, threshold max*0.01
        on the decayed score, standard (score desc, doc_id asc) merge."""
        import ray

        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        denom = float(2 * scale * scale)
        parts = ray.get(
            [
                a.search_decay.remote(
                    toks, q_idfs, max(limit, 1), origin, denom, filters
                )
                for a in self.actors
            ]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        rows = [r for _, rs in parts for r in rs]
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for r in rows if r["score"] >= min_score]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_rank_feature(
        self,
        query: str,
        weight: float = 2.5,
        pivot: int = 30,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
        mode: str = "saturation",
        age_mix: int = 0,
        age_mod: int = 1,
    ) -> List[dict]:
        """ES rank_feature (saturation) / distance_feature (recency) as
        a bool-should clause: BM25 plus an additive per-doc feature —
        ``mode="saturation"``: weight * dl/(dl+pivot); ``mode=
        "distance"``: weight * pivot/(pivot + hash-derived age_days).
        The feature applies to every doc, the max*0.01 threshold to the
        combined score, standard (score desc, doc_id asc) merge."""
        import ray

        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [
                a.search_rank_feature.remote(
                    toks, q_idfs, max(limit, 1), weight, pivot, filters,
                    mode, age_mix, age_mod,
                )
                for a in self.actors
            ]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        rows = [r for _, rs in parts for r in rs]
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for r in rows if r["score"] >= min_score]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_qld(
        self,
        query: str,
        limit: int = 20,
        mu: float = 500.0,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Query-likelihood Dirichlet ranking (Zhai & Lafferty 2001) over
        the same index: one tiny cf/|C| round (per-term collection
        frequencies + live token totals, dict-sized), then per-shard
        dense scoring with driver top-k merge.  Docs must contain >=1
        query term; plain term queries only."""
        import ray

        toks = tokenize(query)
        if not toks:
            return []
        uniq = sorted(set(toks))
        cf_refs = [a.term_cfs.remote(uniq) for a in self.actors]
        tot_refs = [a.live_token_count.remote() for a in self.actors]
        cfs: Dict[str, int] = {}
        for part in ray.get(cf_refs):
            for t, c in part.items():
                cfs[t] = cfs.get(t, 0) + c
        total_tokens = sum(ray.get(tot_refs))
        if total_tokens <= 0:
            return []
        rows = [
            r
            for rs in ray.get(
                [
                    a.qld_topk.remote(toks, cfs, total_tokens, mu, limit, filters)
                    for a in self.actors
                ]
            )
            for r in rs
        ]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return rows[:limit]

    def _search_phrase(
        self,
        toks: List[str],
        q_idfs: Dict[str, float],
        limit: int,
        filters: Optional[Dict[str, str]],
        method: str,
        phrases: List[str],
        required: Optional[List[str]] = None,
        excluded: Optional[List[str]] = None,
    ) -> List[dict]:
        """Phrase query: BM25 rank, then drop docs missing any quoted
        phrase.  The per-shard top-k escalates (x4) until the filtered
        result fills ``limit`` or every shard is exhausted — a selective
        phrase can reject arbitrarily many of the top-scored docs."""
        import ray

        k = max(4 * limit, 64)
        while True:
            refs = [
                a.search.remote(toks, q_idfs, k, filters, False, method,
                                required, excluded)
                for a in self.actors
            ]
            parts = ray.get(refs)
            global_max = max((m for m, _ in parts), default=0.0)
            if global_max > 0:
                min_score = global_max * 0.01
                rows = [r for _, rs in parts for r in rs if r["score"] >= min_score]
            else:
                refs2 = [
                    a.search.remote(toks, q_idfs, k, filters, True, "dense",
                                    required, excluded)
                    for a in self.actors
                ]
                parts = ray.get(refs2)
                rows = [r for _, rs in parts for r in rs]
            exhausted = all(len(rs) < k for _, rs in parts)
            rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
            out = self._phrase_filter(rows, phrases, limit)
            if len(out) >= limit or exhausted:
                return [
                    {"doc_id": r["doc_id"], "score": r["score"]}
                    for r in out[:limit]
                ]
            k *= 4

    def _doc_texts(self, ids: List[int]) -> Dict[int, str]:
        """Searchable doc text for the given doc ids (phrase verification).

        Entity mode recomputes the BM25 doc projection from docmeta
        columns (pushdown by doc_id — never a docmeta scan).  File mode
        reads raw content back from the corpus recorded at build time
        (docmeta deliberately stores no text).
        """
        import pyarrow.compute as pc

        dataset = pads.dataset(
            os.path.join(self.index_dir, "docmeta"), format="parquet"
        )
        if self.manifest.mode == "entity":
            from .build_index import _entity_doc_text

            t = dataset.to_table(filter=pads.field("doc_id").isin(ids))
            return dict(
                zip(t["doc_id"].to_pylist(), _entity_doc_text(t).to_pylist())
            )
        corpus = self.manifest.extra.get("corpus_dir")
        if not corpus or not os.path.exists(corpus):
            raise ValueError(
                "phrase search on a file-mode index needs the build-time "
                "corpus (manifest.extra['corpus_dir']) to be readable"
            )
        t = dataset.to_table(
            columns=["doc_id", "repo", "path", "commit"],
            filter=pads.field("doc_id").isin(ids),
        )
        ct = pads.dataset(corpus, format="parquet").to_table(
            columns=["repo", "path", "commit", "content"],
            filter=pads.field("path").isin(list(set(t["path"].to_pylist()))),
        )
        content = {
            (r, p, c): x
            for r, p, c, x in zip(
                ct["repo"].to_pylist(), ct["path"].to_pylist(),
                ct["commit"].to_pylist(), ct["content"].to_pylist(),
            )
        }
        return {
            d: content.get((r, p, c), "")
            for d, r, p, c in zip(
                t["doc_id"].to_pylist(), t["repo"].to_pylist(),
                t["path"].to_pylist(), t["commit"].to_pylist(),
            )
        }

    def _phrase_filter(
        self, rows: List[dict], phrases: List[str], limit: int
    ) -> List[dict]:
        """Keep rank order, drop docs not containing EVERY quoted phrase.

        Verified lazily in rank-ordered chunks so a selective phrase
        over a huge candidate list reads only as much text as the top-k
        needs (chunk = max(256, 4*limit) ids per pushdown read).
        """
        out: List[dict] = []
        chunk = max(256, 4 * limit)
        for lo in range(0, len(rows), chunk):
            part = rows[lo : lo + chunk]
            texts = self._doc_texts([r["doc_id"] for r in part])
            for r in part:
                text = texts.get(r["doc_id"], "")
                if all(p in text for p in phrases):
                    out.append(r)
            if len(out) >= limit:
                break
        return out

    @staticmethod
    def _parse_boolean(query: str) -> Tuple[str, List[str], List[str]]:
        """Split ``+term`` / ``-term`` boolean operators out of a query.

        Returns (scored_query, required, excluded): ``+chunk`` tokens are
        REQUIRED (and still score, Lucene MUST semantics), ``-chunk``
        tokens are EXCLUDED (and don't score, MUST_NOT).  Operators apply
        to whitespace chunks outside quoted phrases; a lone ``-``/``+``
        or a query of only exclusions yields no scored tokens (empty
        result, same as the empty-query guard).
        """
        required: List[str] = []
        excluded: List[str] = []
        scored: List[str] = []
        for seg in _re_mod.split(r'("[^"]*")', query):
            if seg.startswith('"'):
                scored.append(seg)
                continue
            for chunk in seg.split():
                if chunk.startswith("+") and len(chunk) > 1:
                    required.extend(tokenize(chunk[1:]))
                    scored.append(chunk[1:])
                elif chunk.startswith("-") and len(chunk) > 1:
                    excluded.extend(tokenize(chunk[1:]))
                else:
                    scored.append(chunk)
        return " ".join(scored), required, excluded

    def _wildcard_tokens(self, query: str, ranges: bool = False) -> List[str]:
        """Tokenize a query whose whitespace chunks may carry ``*``/``?``
        wildcards or (with ``ranges=True``) a ``lo..hi`` term range: plain
        chunks go through the code tokenizer, wildcard chunks expand
        against the lexicon (df-descending, capped), range chunks expand
        the lexicographic vocabulary slice ``[lo, hi)`` (TermRangeQuery)
        — the expanded terms then score as ordinary OR'd BM25 query
        tokens.

        Range syntax is OPT-IN (``range_syntax=True`` on
        search/search_batch/facets): ordinary queries with an embedded
        ``..`` ("0..10", "a..b") must tokenize literally, not silently
        range-expand.  Even when enabled, an empty expansion (lo >= hi,
        or no vocabulary in the slice) falls back to tokenizing the chunk
        literally instead of dropping it."""
        toks: List[str] = []
        for chunk in query.split():
            if ranges and ".." in chunk and "*" not in chunk and "?" not in chunk:
                lo, _, hi = chunk.partition("..")
                expanded = (
                    [t for t, _ in self.lexicon.expand_range(lo.lower(), hi.lower())]
                    if lo and hi
                    else []
                )
                toks.extend(expanded if expanded else tokenize(chunk))
            elif "*" in chunk or "?" in chunk:
                toks.extend(t for t, _ in self.lexicon.expand(chunk.lower()))
            else:
                toks.extend(tokenize(chunk))
        return toks

    def suggest(
        self, term: str, max_dist: int = 1, limit: int = 10
    ) -> List[Dict[str, object]]:
        """Spelling suggestions from the index vocabulary ("did you
        mean"): terms within ``max_dist`` edits, ranked (dist asc, df
        desc, term asc).  Pure lexicon work — no shard actors touched."""
        return [
            {"term": t, "df": df, "dist": d}
            for t, df, d in self.lexicon.suggest(term, max_dist=max_dist, limit=limit)
        ]

    def search_fuzzy(
        self,
        query: str,
        limit: int = 20,
        max_dist: int = 1,
        max_expansions: int = 50,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Fuzzy search (Elasticsearch ``fuzziness``): each query token
        expands to the vocabulary terms within ``max_dist`` Levenshtein
        edits — ranked (dist asc, df desc, term asc) and capped at
        ``max_expansions`` per token, like Lucene's FuzzyQuery — and the
        expanded multiset scores as ordinary OR'd BM25 terms (a term
        matched by two query tokens counts twice, the reference's
        duplicate-token rule).  Expansion is lexicon-only work (length
        band + capped DP, cost scales with vocabulary); scoring reuses
        the shard-actor path unchanged."""
        expanded: List[str] = []
        for tok in tokenize(query):
            expanded.extend(
                t
                for t, _, _ in self.lexicon.suggest(
                    tok, max_dist=max_dist, limit=max_expansions
                )
            )
        if not expanded:
            return []
        return self.search(" ".join(expanded), limit=limit, filters=filters)

    def search_common_terms(
        self,
        query: str,
        cutoff_milli: int = 600,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Lucene CommonTermsQuery: query terms whose document frequency
        is at most ``cutoff_milli``/1000 of the corpus are LOW-frequency
        and become MUST clauses (they still score); high-frequency terms
        stay optional SHOULD clauses.  The df classification is one
        lexicon stats read (integer cutoff compare, no float); the query
        then routes through the standard boolean search path, so scoring,
        threshold and merge are unchanged.  Terms absent from the
        vocabulary classify as low-frequency (df=0) and, being
        unsatisfiable MUSTs, empty the result — Lucene's behavior."""
        toks = tokenize(query)
        if not toks:
            return []
        stats = self.lexicon.stats(toks)
        n = max(self.manifest.n_docs, 1)
        low = {
            t
            for t in toks
            if stats.get(t, (0, 0.0))[0] * 1000 <= cutoff_milli * n
        }
        q2 = " ".join(("+" + t) if t in low else t for t in toks)
        return self.search(q2, limit=limit, filters=filters)

    def search_regexp(
        self,
        pattern: str,
        limit: int = 20,
        max_expansions: int = 64,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Lucene ``regexp`` query: the anchored pattern full-matches
        against the index vocabulary (df desc, term asc, capped — like
        RegexpQuery's rewrite) and the matching terms score as ordinary
        OR'd BM25 terms through the standard shard path.  Expansion is
        lexicon-only work; cost scales with vocabulary, never corpus."""
        expanded = [
            t for t, _ in self.lexicon.expand_regex(pattern, max_expansions)
        ]
        if not expanded:
            return []
        return self.search(" ".join(expanded), limit=limit, filters=filters)

    def search_term_range(
        self,
        lo: str,
        hi: str,
        limit: int = 20,
        max_expansions: int = 64,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Lucene ``TermRangeQuery``: vocabulary terms in ``[lo, hi)``
        expand against the term-sorted lexicon with one RANGE-predicate
        pushdown (df desc, term asc, capped — the scoring rewrite's cap)
        and score as ordinary OR'd BM25 terms through the standard shard
        path.  Expansion is lexicon-only work; scoring cost is the same
        as an OR query of ``max_expansions`` terms."""
        expanded = [
            t for t, _ in self.lexicon.expand_range(lo, hi, max_expansions)
        ]
        if not expanded:
            return []
        return self.search(" ".join(expanded), limit=limit, filters=filters)

    def close(self) -> None:
        """Park a small warm pool for the next engine over this same
        index state; kill larger pools outright (see class docstring).

        Parking is additionally disabled on small clusters (< 8 CPUs):
        even one parked pool's 0.5-CPU reservations are a meaningful
        slice of a 4-CPU cluster and can leave later actor-pool stages
        (fixed-min pools, join aggregators) pending forever."""
        import ray

        try:
            total_cpus = int(ray.cluster_resources().get("CPU", 0))
        except Exception:
            total_cpus = 0
        if (
            self.actors
            and self._pool
            and total_cpus >= 8
            and len(self.actors) <= _POOL_MAX_ACTORS
            and self._pool_key not in _POOLED_ACTORS
        ):
            # GLOBAL cap: at most ONE parked pool (newest wins).  Parked
            # actors keep their 0.5-CPU reservations; letting one pool per
            # index dir accumulate can reserve a small cluster solid and
            # starve 2-CPU build tasks into a deadlock.
            for k in list(_POOLED_ACTORS):
                for a in _POOLED_ACTORS.pop(k):
                    ray.kill(a)
            _POOLED_ACTORS[self._pool_key] = self.actors
        else:
            for a in self.actors:
                ray.kill(a)
        self.actors = []

    def search(
        self,
        query: str,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
        method: str = "dense",
        range_syntax: bool = False,
    ) -> List[dict]:
        """Reference-semantics BM25 search -> ranked [{doc_id, score}].

        ``method="fuzzy"`` routes through Levenshtein term expansion
        (``search_fuzzy``); ``"regexp"`` treats the query as a Lucene
        regexp over the vocabulary (``search_regexp``);
        ``"common_terms"`` classifies terms by document frequency
        (``search_common_terms``); ``"dense"``/``"wand"`` pick the shard
        scorer.  ``range_syntax=True`` opts in to ``lo..hi`` term-range
        chunks (otherwise ``..`` tokenizes literally)."""
        if method == "fuzzy":
            return self.search_fuzzy(query, limit=limit, filters=filters)
        if method == "regexp":
            return self.search_regexp(query, limit=limit, filters=filters)
        if method == "common_terms":
            return self.search_common_terms(query, limit=limit, filters=filters)
        if method == "decay":
            return self.search_decay_gauss(query, limit=limit, filters=filters)
        return self.search_batch(
            [(query, filters)], limit=limit, method=method,
            range_syntax=range_syntax,
        )[0]

    def search_pinned(
        self,
        query: str,
        pinned_ids: List[int],
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """ES pinned query: ``pinned_ids`` (those that exist) rank FIRST
        in their given order with sentinel scores, organic BM25 results
        follow with the pins excluded.  The organic pass over-fetches
        ``limit + |pins|`` rows (the max*0.01 threshold stays corpus-wide
        and unmasked), drops the pins, and fills the tail — one ordinary
        fan-out, no extra shard round.

        Pin existence = within the id space actually assigned (max
        partition ``doc_hi``, NOT ``n_docs`` — the live count undercounts
        the id bound once tombstones exist) and not tombstoned (a deleted
        doc must not resurface pinned with a sentinel score)."""
        doc_hi = max((p.doc_hi for p in self.manifest.partitions), default=0)
        dead = self._tombstoned_ids()
        pins = [p for p in pinned_ids if 0 <= p < doc_hi and p not in dead]
        hits = self.search(query, limit=limit + len(pins), filters=filters)
        pinset = set(pins)
        organic = [h for h in hits if h["doc_id"] not in pinset]
        out = [{"doc_id": p, "score": 0.0, "pinned": True} for p in pins]
        for h in organic[: max(limit - len(pins), 0)]:
            out.append({"doc_id": h["doc_id"], "score": h["score"], "pinned": False})
        return out

    def search_after(
        self,
        query: str,
        after: Tuple[float, int],
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Deep pagination (Elasticsearch ``search_after``): the next
        ``limit`` rows strictly after cursor ``after=(score, doc_id)`` in
        the global (score desc, doc_id asc) order — NO growing offset
        cost: each shard applies the cursor predicate before its local
        top-k, so page N moves the same ``shards x limit`` candidate rows
        as page 1.  The F4 threshold (global max x 0.01, max<=0 keep-all)
        is identical to ``search``'s, so paging enumerates exactly the
        rows a single big-limit search would return, in the same order.
        Plain term queries only (no phrase/wildcard/boolean operators)."""
        import ray

        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        refs = [
            a.search.remote(toks, q_idfs, limit, filters, False, "dense",
                            None, None, tuple(after))
            for a in self.actors
        ]
        parts = ray.get(refs)
        global_max = max((m for m, _ in parts), default=0.0)
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for _, rs in parts for r in rs if r["score"] >= min_score]
        else:
            refs2 = [
                a.search.remote(toks, q_idfs, limit, filters, True, "dense",
                                None, None, tuple(after))
                for a in self.actors
            ]
            rows = [r for _, rs in ray.get(refs2) for r in rs]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_rescore(
        self,
        query: str,
        rescore_query: str,
        window: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 2.0,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Elasticsearch ``rescore``: the top ``window`` hits of the
        primary query (standard F4-thresholded BM25 pipeline) are
        re-ranked by ``query_weight * primary + rescore_weight *
        secondary``, where the secondary BM25 score is computed ONLY for
        the window docs (``IndexShard.scores_for`` — an O(window)
        point-score fan-out, never a second corpus-wide top-k).  Docs
        outside the window are untouched, which is the whole point of the
        operator: an expensive secondary signal priced per window, not
        per corpus.  Weights should be short binary mantissas (1.0, 2.0,
        0.5...) so the combined expression stays float-exact against the
        SQL oracle."""
        import ray

        primary = self.search(query, limit=window, filters=filters)
        if not primary:
            return []
        ids = [h["doc_id"] for h in primary]
        sec: Dict[int, float] = {}
        toks2 = tokenize(rescore_query)
        if toks2:
            idfs2 = self.lexicon.idfs(toks2)
            refs = [a.scores_for.remote(toks2, idfs2, ids) for a in self.actors]
            for got_ids, got_scores in ray.get(refs):
                for d, s in zip(got_ids, got_scores):
                    sec[d] = s
        rows = [
            {
                "doc_id": h["doc_id"],
                "score": query_weight * h["score"]
                + rescore_weight * sec.get(h["doc_id"], 0.0),
            }
            for h in primary
        ]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return rows[:limit]

    def search_min_match(
        self,
        query: str,
        min_match: int,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """``minimum_should_match`` (Elasticsearch): rank with full BM25
        but keep only docs containing at least ``min_match`` DISTINCT
        query terms.  The membership mask applies per shard BEFORE the
        local top-k (exactly like +term operators); the F4 threshold max
        is over the unmasked scores, mirroring the reference's
        filters-after-scoring semantics."""
        import ray

        toks = tokenize(query)
        if not toks:
            return []
        import math

        k = min(min_match, len(set(toks)))
        q_idfs = self.lexicon.idfs(toks)
        # rank at MICRO grain (like more_like_this): membership-masked
        # result sets surface near-ulp score ties whose raw-float order
        # differs between independent scorers; micro-rounded ordering +
        # doc_id tie-break is stable on both sides.  Fetch a small
        # overhang per shard so the micro-order cut can't straddle a
        # raw-order shard cut.
        fetch = limit + 16
        refs = [
            a.search.remote(toks, q_idfs, fetch, filters, False, "dense",
                            None, None, None, k)
            for a in self.actors
        ]
        parts = ray.get(refs)
        global_max = max((m for m, _ in parts), default=0.0)
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for _, rs in parts for r in rs if r["score"] >= min_score]
        else:
            refs2 = [
                a.search.remote(toks, q_idfs, fetch, filters, True, "dense",
                                None, None, None, k)
                for a in self.actors
            ]
            rows = [r for _, rs in ray.get(refs2) for r in rs]
        rows.sort(
            key=lambda r: (-math.floor(r["score"] * 1e6 + 0.5), r["doc_id"])
        )
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_terms_set(
        self,
        query: str,
        dl_threshold: int,
        low_req: int = 2,
        high_req: int = 3,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """ES ``terms_set`` (minimum_should_match_field): full-BM25
        ranking restricted to docs containing at least a per-doc required
        number of distinct query terms — ``low_req`` below
        ``dl_threshold`` tokens, ``high_req`` at or above it.  Same
        micro-grain merge as ``search_min_match`` (membership-masked
        result sets surface near-ulp ties; micro rounding + doc_id
        tie-break is stable on both sides of the oracle compare)."""
        import math

        import ray

        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        fetch = limit + 16
        refs = [
            a.search_terms_set.remote(
                toks, q_idfs, fetch, dl_threshold, low_req, high_req, filters
            )
            for a in self.actors
        ]
        parts = ray.get(refs)
        global_max = max((m for m, _ in parts), default=0.0)
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for _, rs in parts for r in rs if r["score"] >= min_score]
        else:
            refs2 = [
                a.search_terms_set.remote(
                    toks, q_idfs, fetch, dl_threshold, low_req, high_req,
                    filters, True
                )
                for a in self.actors
            ]
            rows = [r for _, rs in ray.get(refs2) for r in rs]
        rows.sort(
            key=lambda r: (-math.floor(r["score"] * 1e6 + 0.5), r["doc_id"])
        )
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_boosting(
        self,
        positive: str,
        negative: str,
        boost: float = 0.5,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Boosting query (ES ``boosting``): rank by the positive query's
        BM25 score, demoting docs that match ANY negative-query term to
        score * ``boost`` (they stay in the results, unlike ``-term``
        exclusion).  Demotion happens inside the shard scorer before the
        F4 threshold; pick ``boost`` with a short binary mantissa (0.5,
        0.25) so the demoted floats stay bit-identical to the SQL
        oracle's CASE multiply.  Micro-grain global ordering (like
        min_match/dis_max) keeps near-ulp ties stable."""
        import math

        import ray

        toks = tokenize(positive)
        neg = tokenize(negative)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        fetch = limit + 16
        demote = (neg, float(boost)) if neg else None
        refs = [
            a.search.remote(toks, q_idfs, fetch, filters, False, "dense",
                            None, None, None, None, demote)
            for a in self.actors
        ]
        parts = ray.get(refs)
        global_max = max((m for m, _ in parts), default=0.0)
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for _, rs in parts for r in rs if r["score"] >= min_score]
        else:
            refs2 = [
                a.search.remote(toks, q_idfs, fetch, filters, True, "dense",
                                None, None, None, None, demote)
                for a in self.actors
            ]
            rows = [r for _, rs in ray.get(refs2) for r in rs]
        rows.sort(
            key=lambda r: (-math.floor(r["score"] * 1e6 + 0.5), r["doc_id"])
        )
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_span_first(
        self,
        query: str,
        span_term: str,
        n: int,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Lucene span_first: BM25-ranked docs whose FIRST occurrence of
        ``span_term`` is within the first ``n`` token positions — decided
        from the positional index (one postings decode per shard), never
        from text.  Requires ``with_positions=True`` at build."""
        import ray

        if not self.manifest.extra.get("positions"):
            raise RuntimeError(
                "index was built without positions; rebuild with "
                "with_positions=True to use span_first search"
            )
        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [
                a.search_span_first.remote(
                    toks, q_idfs, max(limit, 1), span_term, n, filters
                )
                for a in self.actors
            ]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        rows = [r for _, rs in parts for r in rs]
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for r in rows if r["score"] >= min_score]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_span_near(
        self,
        query: str,
        term_a: str,
        term_b: str,
        window: int = 3,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Lucene span_near (in_order=false): BM25-ranked docs where some
        occurrence of ``term_a`` lies within ``window`` positions of some
        occurrence of ``term_b``, in either order — decided from the
        positional index, never from text.  Requires
        ``with_positions=True`` at build."""
        import ray

        if not self.manifest.extra.get("positions"):
            raise RuntimeError(
                "index was built without positions; rebuild with "
                "with_positions=True to use span_near search"
            )
        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [
                a.search_span_near.remote(
                    toks, q_idfs, max(limit, 1), term_a, term_b, window, filters
                )
                for a in self.actors
            ]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        rows = [r for _, rs in parts for r in rs]
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for r in rows if r["score"] >= min_score]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_span_not(
        self,
        query: str,
        include: str,
        exclude: str,
        dist: int = 0,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Lucene span_not: BM25-ranked docs with at least one occurrence
        of ``include`` farther than ``dist`` positions from every
        occurrence of ``exclude`` — decided from the positional index
        (vectorized neighbor search per shard), never from text.
        Requires ``with_positions=True`` at build."""
        import ray

        if not self.manifest.extra.get("positions"):
            raise RuntimeError(
                "index was built without positions; rebuild with "
                "with_positions=True to use span_not search"
            )
        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [
                a.search_span_not.remote(
                    toks, q_idfs, max(limit, 1), include, exclude, dist, filters
                )
                for a in self.actors
            ]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        rows = [r for _, rs in parts for r in rs]
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for r in rows if r["score"] >= min_score]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_span_containing(
        self,
        query: str,
        term_a: str,
        term_b: str,
        term_c: str,
        width: int = 5,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
        term_d: Optional[str] = None,
    ) -> List[dict]:
        """Lucene span_containing / span_within: BM25-ranked docs where
        an ordered ``term_a .. term_b`` span of width <= ``width``
        contains the little span — ``term_c`` alone (span_containing) or
        the adjacent phrase ``term_c term_d`` (the doc-level
        SpanWithinQuery) — decided from the positional index (per-shard
        ragged neighbor merge), never from text.  Requires
        ``with_positions=True`` at build."""
        import ray

        if not self.manifest.extra.get("positions"):
            raise RuntimeError(
                "index was built without positions; rebuild with "
                "with_positions=True to use span_containing search"
            )
        toks = tokenize(query)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [
                a.search_span_containing.remote(
                    toks, q_idfs, max(limit, 1), term_a, term_b, term_c,
                    width, filters, term_d
                )
                for a in self.actors
            ]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        rows = [r for _, rs in parts for r in rs]
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for r in rows if r["score"] >= min_score]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_dismax(
        self,
        clauses: List[str],
        limit: int = 20,
        tie: float = 0.3,
        filters: Optional[Dict[str, str]] = None,
    ) -> List[dict]:
        """Disjunction-max over sub-queries (ES dis_max): rank by the
        best clause's BM25 score + ``tie`` x the remaining clauses.
        Per-clause scoring runs inside the shard actors (one fan-out);
        the F4 threshold applies to the combined score.  Micro-grain
        global ordering (like more_like_this/min_match) keeps near-ulp
        ties stable against the SQL oracle."""
        import math

        import ray

        token_lists = [tokenize(c) for c in clauses]
        token_lists = [t for t in token_lists if t]
        if not token_lists:
            return []
        all_toks = sorted({t for toks in token_lists for t in toks})
        q_idfs = self.lexicon.idfs(all_toks)
        fetch = limit + 16
        refs = [
            a.search_dismax.remote(token_lists, q_idfs, fetch, filters, False, tie)
            for a in self.actors
        ]
        parts = ray.get(refs)
        global_max = max((m for m, _ in parts), default=0.0)
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for _, rs in parts for r in rs if r["score"] >= min_score]
        else:
            refs2 = [
                a.search_dismax.remote(token_lists, q_idfs, fetch, filters, True, tie)
                for a in self.actors
            ]
            rows = [r for _, rs in ray.get(refs2) for r in rs]
        rows.sort(
            key=lambda r: (-math.floor(r["score"] * 1e6 + 0.5), r["doc_id"])
        )
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_batch(
        self,
        queries: List[Tuple[str, Optional[Dict[str, str]]]],
        limit: int = 20,
        method: str = "dense",
        range_syntax: bool = False,
    ) -> List[List[dict]]:
        import ray

        # +term/-term boolean operators come off first (outside quotes)
        parsed = [self._parse_boolean(q) if ("+" in q or "-" in q) else (q, [], [])
                  for q, _ in queries]
        token_lists = [
            self._wildcard_tokens(q, ranges=range_syntax)
            if ("*" in q or "?" in q or (range_syntax and ".." in q))
            else tokenize(q)
            for (q, _, _) in parsed
        ]
        # quoted segments are BOTH scored (their tokens) and required
        # verbatim (post-scoring phrase filter, F3-style: never touches
        # idf/avgdl)
        phrase_lists = [
            _PHRASE_RE.findall(q) if '"' in q else [] for (q, _, _) in parsed
        ]
        all_terms = [t for toks in token_lists for t in toks]
        idfs = self.lexicon.idfs(all_terms) if all_terms else {}

        results: List[List[dict]] = [[] for _ in queries]
        pending = []
        for qi, ((query, filters), toks) in enumerate(zip(queries, token_lists)):
            if not toks:
                continue
            _, req, excl = parsed[qi]
            q_idfs = {t: idfs.get(t, 0.0) for t in set(toks)}
            if phrase_lists[qi]:
                results[qi] = self._search_phrase(
                    toks, q_idfs, limit, filters, method, phrase_lists[qi],
                    required=req, excluded=excl,
                )
                continue
            refs = [
                a.search.remote(toks, q_idfs, limit, filters, False, method,
                                req, excl)
                for a in self.actors
            ]
            pending.append((qi, toks, q_idfs, limit, queries[qi][1], refs))
        from ray.exceptions import RayActorError

        for qi, toks, q_idfs, lim, filters, refs in pending:
            _, req, excl = parsed[qi]
            try:
                parts = ray.get(refs)
            except RayActorError:
                # a shard actor died mid-serve (node loss): revive the
                # dead strides from shared storage and retry this
                # fan-out once — warm survivors are untouched
                self.heal()
                parts = ray.get([
                    a.search.remote(toks, q_idfs, lim, filters, False,
                                    method, req, excl)
                    for a in self.actors
                ])
            global_max = max((m for m, _ in parts), default=0.0)
            if global_max > 0:
                min_score = global_max * 0.01
                rows = [r for _, rs in parts for r in rs if r["score"] >= min_score]
            else:
                # reference keeps everything when max <= 0: dense fallback
                refs2 = [
                    a.search.remote(toks, q_idfs, lim, filters, True, "dense",
                                    req, excl)
                    for a in self.actors
                ]
                try:
                    rows = [r for _, rs in ray.get(refs2) for r in rs]
                except RayActorError:
                    self.heal()
                    rows = [
                        r
                        for _, rs in ray.get([
                            a.search.remote(toks, q_idfs, lim, filters, True,
                                            "dense", req, excl)
                            for a in self.actors
                        ])
                        for r in rs
                    ]
            rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
            if phrase_lists[qi]:
                rows = self._phrase_filter(rows, phrase_lists[qi], lim)
            results[qi] = [
                {"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:lim]
            ]
        return results

    def search_phrase_positional(
        self,
        phrase: str,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
        slop: int = 0,
    ) -> List[dict]:
        """Positional phrase search (requires ``with_positions=True`` at
        build): docs whose token stream contains ``tokenize(phrase)``
        adjacently in order, BM25-ranked over those tokens with the
        standard threshold/merge.  Token-ADJACENCY semantics (Lucene
        PhraseQuery) — distinct from quoted-phrase ``search``, which
        requires the raw phrase verbatim in the text."""
        import ray

        if not self.manifest.extra.get("positions"):
            raise RuntimeError(
                "index was built without positions; rebuild with "
                "with_positions=True to use positional phrase search"
            )
        toks = tokenize(phrase)
        if not toks:
            return []
        q_idfs = self.lexicon.idfs(toks)
        parts = ray.get(
            [
                a.search_positional.remote(toks, q_idfs, max(limit, 1), filters, slop)
                for a in self.actors
            ]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        rows = [r for _, rs in parts for r in rs]
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for r in rows if r["score"] >= min_score]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def search_match_phrase_prefix(
        self,
        phrase: str,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
        max_expand: int = 1 << 20,
    ) -> List[dict]:
        """ES ``match_phrase_prefix``: the phrase's last token matches
        any vocabulary term with that PREFIX (Lucene MultiPhraseQuery's
        expanded final position); the fixed tokens must precede it
        adjacently.  The expansion comes from ONE lexicon prefix-range
        pushdown (cost scales with vocabulary, never corpus) and acts as
        a filter slot only — BM25 scores over the fixed tokens, with the
        standard threshold/merge, so ranking is expansion-independent
        (ES's constant-score-expansion analogue).  ``max_expand``
        defaults effectively-uncapped for oracle exactness; production
        ES caps at 50."""
        import ray

        if not self.manifest.extra.get("positions"):
            raise RuntimeError(
                "index was built without positions; rebuild with "
                "with_positions=True to use match_phrase_prefix"
            )
        toks = tokenize(phrase)
        if not toks:
            return []
        fixed, prefix = toks[:-1], toks[-1]
        expansion = [t for t, _ in self.lexicon.expand(prefix + "*", max_expand)]
        q_idfs = self.lexicon.idfs(fixed)
        parts = ray.get(
            [
                a.search_positional.remote(
                    fixed, q_idfs, max(limit, 1), filters, 0, expansion
                )
                for a in self.actors
            ]
        )
        global_max = max((m for m, _ in parts), default=0.0)
        rows = [r for _, rs in parts for r in rs]
        if global_max > 0:
            min_score = global_max * 0.01
            rows = [r for r in rows if r["score"] >= min_score]
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows[:limit]]

    def more_like_this(
        self,
        doc_id: int,
        limit: int = 20,
        max_terms: int = 25,
        filters: Optional[Dict[str, str]] = None,
        text: Optional[str] = None,
    ) -> List[dict]:
        """Find-similar ("more like this"): keep the source doc's
        ``max_terms`` strongest terms by tf*idf (tie-break term asc,
        idf = the index's eps-floored BM25 idf), run them as an ordinary
        BM25 query — identical threshold/tie-break semantics to
        ``search``, source doc included in the global max that feeds the
        0.01 threshold — then drop the source from the ranking.

        Term weights are quantized to 1e-6 before the cut so the
        selection is stable under last-ulp idf noise (the corpus-wide
        idf average is a distributed float sum; two near-tied terms at
        the ``max_terms`` boundary must not swap between runs).

        ``text`` overrides the pushdown doc-text read when the caller
        already holds the source text (file-mode indexes built from an
        in-memory corpus have no corpus_dir to re-read).
        """
        if text is None:
            text = self._doc_texts([doc_id]).get(doc_id, "")
        tf: Dict[str, int] = {}
        for t in tokenize(text):
            tf[t] = tf.get(t, 0) + 1
        if not tf:
            return []
        idfs = self.lexicon.idfs(list(tf))
        ranked = sorted(
            ((math.floor(tf[t] * idfs.get(t, 0.0) * 1e6 + 0.5), t) for t in tf),
            key=lambda wt: (-wt[0], wt[1]),
        )
        terms = [t for _, t in ranked[:max_terms]]
        hits = self.search(" ".join(terms), limit=limit + 1, filters=filters)
        return [h for h in hits if h["doc_id"] != doc_id][:limit]

    def search_rm3(
        self,
        query: str,
        limit: int = 20,
        fb_k: int = 10,
        n_exp: int = 10,
        filters: Optional[Dict[str, str]] = None,
        method: str = "dense",
    ) -> List[dict]:
        """Pseudo-relevance-feedback query expansion (the RM3/Rocchio
        shape): run the query, take the top ``fb_k`` feedback docs,
        extract their ``n_exp`` strongest non-query terms by summed
        tf*idf (idf = the index's eps-floored BM25 idf), append them to
        the original query (each once; originals keep their
        multiplicity) and re-rank with ordinary BM25 — identical
        threshold/tie-break semantics to ``search`` in both passes.

        Per-(doc, term) tf*idf partials are quantized to 1e-6 BEFORE
        summation so expansion weights are integer sums — term selection
        is order-independent and bit-stable against the SQL oracle
        (tie-break: weight desc, term asc).  No reference counterpart
        (the reference's query enhancement is the keyword-table rewrite
        of `search/engine.py:240-271`); this is the classical IR
        operator the enhancer approximates.
        """
        orig = tokenize(query)
        if not orig:
            return []
        fb = self.search(query, limit=fb_k, filters=filters, method=method)
        if not fb:
            return []
        texts = self._doc_texts([h["doc_id"] for h in fb])
        orig_set = set(orig)
        cand_tfs: List[Dict[str, int]] = []
        for h in fb:
            tf: Dict[str, int] = {}
            for t in tokenize(texts.get(h["doc_id"], "")):
                if t not in orig_set:
                    tf[t] = tf.get(t, 0) + 1
            cand_tfs.append(tf)
        cand_terms = sorted({t for tf in cand_tfs for t in tf})
        if not cand_terms:
            return self.search(query, limit=limit, filters=filters, method=method)
        idfs = self.lexicon.idfs(cand_terms)
        weights: Dict[str, int] = {}
        for tf in cand_tfs:
            for t, n in tf.items():
                weights[t] = weights.get(t, 0) + math.floor(
                    n * idfs.get(t, 0.0) * 1e6 + 0.5
                )
        exp = [t for _, t in sorted((-w, t) for t, w in weights.items())[:n_exp]]
        return self.search(
            " ".join(orig + exp), limit=limit, filters=filters, method=method
        )

    @staticmethod
    def _best_window(toks: List[str], qset: set, window: int) -> Tuple[int, int]:
        """Best snippet window (Lucene-highlighter shape): the ``window``-token
        window containing the most DISTINCT query terms; ties break to the
        earliest start.  Exact via per-term coverage intervals + a diff
        array (no O(n_starts * window) rescan)."""
        n = len(toks)
        n_starts = max(1, n - window + 1)
        cov = np.zeros(n_starts + 1, dtype=np.int32)
        pos_by_term: Dict[str, List[int]] = {}
        for i, t in enumerate(toks):
            if t in qset:
                pos_by_term.setdefault(t, []).append(i)
        for ps in pos_by_term.values():
            # window starts covering position p: [p - window + 1, p] clamped
            merged: List[List[int]] = []
            for p in ps:  # ps is ascending, so intervals arrive sorted
                a, b = max(0, p - window + 1), min(p, n_starts - 1)
                if merged and a <= merged[-1][1] + 1:
                    merged[-1][1] = max(merged[-1][1], b)
                else:
                    merged.append([a, b])
            for a, b in merged:
                cov[a] += 1
                cov[b + 1] -= 1
        counts = np.cumsum(cov[:-1])
        best = int(np.argmax(counts))  # first max == earliest tie-break
        return best, int(counts[best])

    def snippets(
        self,
        query: str,
        limit: int = 20,
        window: int = 12,
        filters: Optional[Dict[str, str]] = None,
        method: str = "dense",
    ) -> List[dict]:
        """Ranked hits + best snippet window per hit: for each of the
        top ``limit`` BM25 docs, the ``window``-token span of its
        searchable text containing the most DISTINCT query terms
        (tie-break: earliest start) — the query-dependent highlighter
        the reference lacks (its highlights are static
        ``[docstring[:200], signature]``, `search/engine.py:112-124`).

        Returns ``[{doc_id, score, win_start, n_terms, snippet}]`` with
        ``win_start`` a 0-based token offset into ``tokenize(doc_text)``
        and ``snippet`` the matching token span re-joined with spaces.
        """
        hits = self.search(query, limit=limit, filters=filters, method=method)
        if not hits:
            return []
        texts = self._doc_texts([h["doc_id"] for h in hits])
        qset = set(tokenize(query))
        out = []
        for h in hits:
            toks = tokenize(texts.get(h["doc_id"], ""))
            start, n_terms = self._best_window(toks, qset, window)
            out.append(
                {
                    **h,
                    "win_start": start,
                    "n_terms": n_terms,
                    "snippet": " ".join(toks[start : start + window]),
                }
            )
        return out

    def explain(self, query: str, limit: int = 3) -> List[dict]:
        """Lucene/ES ``_explain``: the top hits with the per-term BM25
        score breakdown — tf, df, epsilon-floored idf and the term's
        contribution ``mult * idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))``
        (the reference's per-term scoring decomposition,
        /root/reference/codesearch/search/bm25_index.py:157-170).

        Reads: one standard top-k search, one lexicon pushdown for
        (df, idf), one docmeta/corpus pushdown for the <=limit winning
        texts — never a corpus or postings scan."""
        from collections import Counter

        from ..functions.tokenizer import tokenize

        hits = self.search(query, limit=limit)
        mult: Dict[str, int] = {}
        for t in tokenize(query):
            mult[t] = mult.get(t, 0) + 1
        lexstats = self.lexicon.stats(sorted(mult))
        texts = self._doc_texts([h["doc_id"] for h in hits])
        k1, b, avgdl = self.manifest.k1, self.manifest.b, self.manifest.avgdl
        out: List[dict] = []
        for rank, h in enumerate(hits):
            dtoks = tokenize(texts.get(h["doc_id"], ""))
            dl = len(dtoks)
            c = Counter(dtoks)
            for t in sorted(mult):
                tf = int(c.get(t, 0))
                if tf == 0 or t not in lexstats:
                    continue
                df, idf = lexstats[t]
                contrib = (
                    mult[t] * idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1 - b + b * dl / avgdl))
                )
                out.append(
                    {
                        "rank": rank,
                        "doc_id": int(h["doc_id"]),
                        "score": float(h["score"]),
                        "term": t,
                        "tf": tf,
                        "df": int(df),
                        "idf": float(idf),
                        "contribution": contrib,
                    }
                )
        return out

    def search_with_meta(
        self,
        query: str,
        limit: int = 20,
        filters: Optional[Dict[str, str]] = None,
        columns: Optional[List[str]] = None,
        method: str = "dense",
        range_syntax: bool = False,
    ) -> pd.DataFrame:
        """Search + metadata join (docmeta parquet filtered by doc_id)."""
        hits = self.search(query, limit=limit, filters=filters, method=method,
                           range_syntax=range_syntax)
        return self.hits_with_meta(hits, columns=columns)

    def hits_with_meta(
        self, hits: List[dict], columns: Optional[List[str]] = None
    ) -> pd.DataFrame:
        """Join ranked hits to docmeta (parquet pushdown by doc_id)."""
        if not hits:
            return pd.DataFrame({"rank": [], "doc_id": [], "score": []})
        ids = [h["doc_id"] for h in hits]
        dataset = pads.dataset(os.path.join(self.index_dir, "docmeta"), format="parquet")
        cols = columns
        if cols is not None and "doc_id" not in cols:
            cols = ["doc_id"] + cols
        meta = dataset.to_table(columns=cols, filter=pads.field("doc_id").isin(ids)).to_pandas()
        out = pd.DataFrame(
            {"rank": np.arange(len(hits)), "doc_id": ids, "score": [h["score"] for h in hits]}
        )
        return out.merge(meta, on="doc_id", how="left")

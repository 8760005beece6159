"""BPE tokenizer TRAINING over a Ray Data corpus + an encoding stage.

The scale-honest shape (how SentencePiece / HF tokenizers train on big
corpora): the corpus is touched exactly ONCE — a distributed word-frequency
count (per-batch partial pandas groupby inside ``map_batches``, then one
``groupby(word).sum`` sized by vocabulary) — and the merge-learning loop
runs over that word-count table, whose size is the DISTINCT-word count,
independent of corpus bytes.  Nothing corpus-sized ever reaches the
driver; 100 TB of text with a 5M-word vocabulary trains as fast as 1 GB.

``learn_bpe`` is the classic Sennrich et al. 2016 procedure with a
deterministic tie-break (max pair count, then lexicographically smallest
pair) and an incremental pair-count index (only words containing the
merged pair are reprocessed per round).

``BPEEncoder`` applies the learned merges as a ``map_batches`` stage
(merge ranks built once per actor in ``__init__``), emitting per-doc BPE
token counts — the "train a tokenizer, then size your dataset in tokens"
step of an LLM data pipeline.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

Pair = Tuple[str, str]


def word_counts(ds, text_col: str = "text") -> pd.DataFrame:
    """Distributed (word, count) over lowercased whitespace tokens — the
    single corpus-sized pass of BPE training."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.utf8_lower(pc.fill_null(txt, ""))
        flat = pc.list_flatten(pc.split_pattern_regex(txt, r"\s+"))
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        if len(flat) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"), "c": vc.field("counts").cast(pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )


def _pair_stats(words: List[List[str]], counts: np.ndarray):
    """pair -> total count, and pair -> indices of words containing it."""
    stats: Dict[Pair, int] = Counter()
    index: Dict[Pair, set] = defaultdict(set)
    for i, (syms, c) in enumerate(zip(words, counts)):
        for a, b in zip(syms[:-1], syms[1:]):
            stats[(a, b)] += int(c)
            index[(a, b)].add(i)
    return stats, index


def _merge_word(syms: List[str], pair: Pair, joined: str) -> List[str]:
    out, i, n = [], 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe(wc: pd.DataFrame, n_merges: int) -> List[Pair]:
    """Sennrich-style merge learning over a (word, c) table.

    Deterministic: best pair = max summed count, ties -> lexicographically
    smallest (a, b).  Stops early when no pair occurs twice."""
    words = [list(w) for w in wc["word"].tolist()]
    counts = wc["c"].to_numpy(np.int64)
    stats, index = _pair_stats(words, counts)
    merges: List[Pair] = []
    for _ in range(n_merges):
        best = None
        best_n = 1
        for p, c in stats.items():
            if c > best_n or (c == best_n and (best is None or p < best)):
                best, best_n = p, c
        if best is None or best_n < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        affected = list(index.pop(best, ())) if best in index else []
        for i in affected:
            old = words[i]
            c = int(counts[i])
            for a, b in zip(old[:-1], old[1:]):
                stats[(a, b)] -= c
                if stats[(a, b)] <= 0:
                    del stats[(a, b)]
                index[(a, b)].discard(i)
            new = _merge_word(old, best, joined)
            words[i] = new
            for a, b in zip(new[:-1], new[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
                index[(a, b)].add(i)
    return merges


def encode_word(word: str, ranks: Dict[Pair, int]) -> List[str]:
    """Apply merges by rank (lowest-rank mergeable pair first) — the
    standard BPE encode."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms[:-1], syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BPEEncoder:
    """map_batches stage: per-doc BPE token counts under a learned merge
    list.  Merge ranks + a per-actor word cache are built once in
    ``__init__``; batches vectorize via value_counts so each DISTINCT word
    is encoded once per batch."""

    def __init__(self, merges: List[Pair], id_col: str = "doc_id", text_col: str = "text"):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.cache: Dict[str, int] = {}
        self.id_col, self.text_col = id_col, text_col

    def _tokens_per_word(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        txt = batch[self.text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.utf8_lower(pc.fill_null(txt, ""))
        ws = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(ws)
        par = pc.list_parent_indices(ws).to_numpy(zero_copy_only=False)
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        wordarr = flat.to_pandas().to_numpy()[keep]
        par = par[keep]
        # encode each distinct word once, then scatter counts back
        uniq, inv = np.unique(wordarr, return_inverse=True)
        per_word = np.array([self._tokens_per_word(w) for w in uniq], np.int64)
        bpe_tokens = np.bincount(par, weights=per_word[inv], minlength=n).astype(np.int64)
        ws_tokens = np.bincount(par, minlength=n).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "ws_tokens": pa.array(ws_tokens),
                "bpe_tokens": pa.array(bpe_tokens),
            }
        )


def train_and_count(
    ds,
    *,
    n_merges: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
):
    """Train BPE on ``ds`` and return (merges, per-doc token-count Dataset)."""
    wc = word_counts(ds, text_col=text_col)
    wc = wc.sort_values("word", ignore_index=True)  # deterministic input order
    merges = learn_bpe(wc, n_merges)
    return merges, ds.map_batches(
        BPEEncoder,
        fn_constructor_kwargs={"merges": merges, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        # autoscaling pool with min=1: a fixed pool equal to the CPU count
        # deadlocks a small cluster (actors hold every CPU the upstream
        # read needs) — the (1, N) range lets Ray size it to free slots
        concurrency=(1, concurrency),
    )

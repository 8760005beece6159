"""Text-analysis operators for training-data pipelines.

All implemented as vectorized ``map_batches`` transforms over Arrow string
columns (pyarrow.compute kernels + numpy; no per-row Python in the hot
path except the rolling-hash fingerprinter, which is numpy-vectorized per
document).

* quality metrics: token counts, length/punct/digit/upper/stopword ratios;
* token counting: whitespace tokens and a BPE-ish regex token count;
* language ID: character-frequency n-gram heuristic over built-in profiles;
* document fingerprinting: winnowing (rolling k-gram hash, window minima).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = {
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this",
}

# GPT-2-flavoured pretokenizer (RE2-compatible subset, no lookahead):
# contractions | word pieces | number runs | punct runs
BPE_ISH_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality metrics (vectorized)."""
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    n_chars = pc.utf8_length(txt).cast(pa.int64())
    ws_tokens = pc.split_pattern_regex(txt, r"\s+")
    flat = pc.list_flatten(ws_tokens)
    parents = pc.list_parent_indices(ws_tokens).to_numpy(zero_copy_only=False)
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    flat_ne = flat.filter(nonempty)
    par_ne = parents[nonempty.to_numpy(zero_copy_only=False)]
    n = len(batch)
    n_tokens = np.bincount(par_ne, minlength=n).astype(np.int64)
    tok_len_sum = np.bincount(
        par_ne, weights=pc.utf8_length(flat_ne).to_numpy(zero_copy_only=False), minlength=n
    )
    stop_mask = pc.is_in(
        pc.utf8_lower(flat_ne), value_set=pa.array(sorted(STOPWORDS))
    ).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(par_ne[stop_mask], minlength=n).astype(np.int64)

    def _char_class_count(pattern: str) -> np.ndarray:
        return pc.count_substring_regex(txt, pattern).to_numpy(zero_copy_only=False).astype(np.int64)

    n_punct = _char_class_count(r"[^\w\s]")
    n_digit = _char_class_count(r"[0-9]")
    n_upper = _char_class_count(r"[A-Z]")
    nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    nc_safe = np.maximum(nc, 1.0)
    nt_safe = np.maximum(n_tokens, 1).astype(np.float64)
    return pa.table(
        {
            "n_chars": n_chars,
            "n_tokens": pa.array(n_tokens),
            "avg_token_len": pa.array(tok_len_sum / nt_safe, pa.float64()),
            "stopword_ratio": pa.array(n_stop / nt_safe, pa.float64()),
            "punct_ratio": pa.array(n_punct / nc_safe, pa.float64()),
            "digit_ratio": pa.array(n_digit / nc_safe, pa.float64()),
            "upper_ratio": pa.array(n_upper / nc_safe, pa.float64()),
        }
    )


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace + BPE-ish token counts per document."""
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    ws = pc.split_pattern_regex(txt, r"\s+")
    flat = pc.list_flatten(ws)
    parents = pc.list_parent_indices(ws).to_numpy(zero_copy_only=False)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    n = len(batch)
    ws_count = np.bincount(parents[nonempty], minlength=n).astype(np.int64)
    bpe_count = pc.count_substring_regex(txt, BPE_ISH_PATTERN).to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "ws_tokens": pa.array(ws_count),
            "bpe_tokens": pa.array(bpe_count),
        }
    )


def repetition_stats(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A.1.1;
    the reference has no equivalent — this is a training-data-pipeline
    operator over the `documents` table).

    All outputs are EXACT integers (numerators/denominators, not float
    fractions) so a SQL oracle can hash-match them:

    - ``n_lines`` / ``n_uniq_lines``: line totals ("\\n" split, empties kept
      — the same ``str_split`` semantics DuckDB uses);
    - ``dup_line_chars``: characters in line occurrences BEYOND the first
      (``sum((cnt-1)*len)`` over distinct lines);
    - ``line_chars``: total line characters (``sum(cnt*len)``);
    - ``n_bigrams`` / ``n_uniq_bigrams``: whitespace-token word bigrams;
    - ``top_bigram_n``: occurrences of the most frequent bigram;
    - ``top_bigram_len``: max char length among bigrams at that count
      (deterministic tie-break shared with the SQL oracle).

    Everything is per-document, so the stage needs no shuffle: it is a
    plain ``map_batches`` transform (Arrow split/flatten + one pandas
    hash-groupby per batch for the duplicate counting, which must compare
    full strings, not hashes, to stay exactly SQL-mirrorable).
    """
    n = len(batch)
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")

    # --- duplicate-line signals
    lines = pc.split_pattern(txt, "\n")
    flat = pc.list_flatten(lines)
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    ldf = pd.DataFrame({"p": parents, "line": flat.to_pandas(), "len": lens})
    lc = (
        ldf.groupby(["p", "line"], sort=False)
        .agg(cnt=("len", "size"), len=("len", "first"))
        .reset_index()
    )
    n_lines = np.bincount(parents, minlength=n).astype(np.int64)
    n_uniq_lines = np.bincount(lc["p"], minlength=n).astype(np.int64)
    dup_line_chars = np.bincount(
        lc["p"], weights=(lc["cnt"] - 1) * lc["len"], minlength=n
    ).astype(np.int64)
    line_chars = np.bincount(parents, weights=lens, minlength=n).astype(np.int64)

    # --- top/duplicate word-bigram signals (whitespace tokens, empties out)
    ws = pc.split_pattern_regex(txt, r"\s+")
    wflat = pc.list_flatten(ws)
    wpar = pc.list_parent_indices(ws).to_numpy(zero_copy_only=False)
    nonempty = pc.greater(pc.utf8_length(wflat), 0).to_numpy(zero_copy_only=False)
    toks = wflat.to_pandas().to_numpy()[nonempty]
    tpar = wpar[nonempty]
    n_bigrams = np.zeros(n, np.int64)
    n_uniq_bigrams = np.zeros(n, np.int64)
    top_bigram_n = np.zeros(n, np.int64)
    top_bigram_len = np.zeros(n, np.int64)
    if len(toks) >= 2:
        pair_mask = tpar[1:] == tpar[:-1]
        if pair_mask.any():
            bser = pd.Series(toks[:-1][pair_mask]) + " " + pd.Series(toks[1:][pair_mask])
            bdf = pd.DataFrame({"p": tpar[:-1][pair_mask], "bg": bser})
            bc = bdf.groupby(["p", "bg"], sort=False).size().reset_index(name="cnt")
            n_bigrams = np.bincount(tpar[:-1][pair_mask], minlength=n).astype(np.int64)
            n_uniq_bigrams = np.bincount(bc["p"], minlength=n).astype(np.int64)
            top = bc.groupby("p", sort=False)["cnt"].max()
            top_bigram_n[top.index.to_numpy()] = top.to_numpy()
            bc["top"] = bc["p"].map(top)
            at_top = bc[bc["cnt"] == bc["top"]].copy()
            at_top["len"] = at_top["bg"].str.len()
            tl = at_top.groupby("p", sort=False)["len"].max()
            top_bigram_len[tl.index.to_numpy()] = tl.to_numpy()
    return pa.table(
        {
            id_col: batch[id_col],
            "n_lines": pa.array(n_lines),
            "n_uniq_lines": pa.array(n_uniq_lines),
            "dup_line_chars": pa.array(dup_line_chars),
            "line_chars": pa.array(line_chars),
            "n_bigrams": pa.array(n_bigrams),
            "n_uniq_bigrams": pa.array(n_uniq_bigrams),
            "top_bigram_n": pa.array(top_bigram_n),
            "top_bigram_len": pa.array(top_bigram_len),
        }
    )


# ------------------------------------------------------------ language id

# tiny per-language marker-word profiles (deterministic heuristic; a real
# system would use fasttext — out of scope for this container)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "to", "in", "that", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "dans"},
    "es": {"el", "la", "los", "las", "es", "una", "que", "por"},
    "zh": set(),  # CJK detected by codepoint range below
}


def lang_id_batch(texts: List[Optional[str]]) -> List[str]:
    """Marker-word + codepoint heuristic language ID.

    Deliberately a per-row loop: the heuristic is a stand-in for a model
    stage (fasttext-style), whose real shape is per-text inference inside
    an actor pool — vectorizing the placeholder would misrepresent the
    stage's cost model while the set-intersection itself is tiny.
    """
    out = []
    for t in texts:
        t = t or ""
        if any("一" <= ch <= "鿿" for ch in t[:2000]):
            out.append("zh")
            continue
        words = set(t.lower().split())
        best, best_score = "unknown", 0
        for lang, markers in _LANG_MARKERS.items():
            if not markers:
                continue
            score = len(words & markers)
            if score > best_score:
                best, best_score = lang, score
        out.append(best if best_score > 0 else "unknown")
    return out


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column(
        "lang_pred", pa.array(lang_id_batch(batch[text_col].to_pylist()), pa.string())
    )


# --------------------------------------------------------- fingerprinting


def winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> np.ndarray:
    """Winnowing document fingerprints: rolling k-gram hashes, per-window
    minima (standard local fingerprinting; deterministic)."""
    data = np.frombuffer((text or "").encode("utf-8", "replace"), dtype=np.uint8)
    if len(data) < k:
        return np.unique(pd.util.hash_array(np.asarray([text or ""], dtype=object)).astype(np.uint64))
    # rolling polynomial hash over k-byte grams, vectorized via strides
    n = len(data) - k + 1
    weights = np.power(np.uint64(257), np.arange(k - 1, -1, -1, dtype=np.uint64))
    grams = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    hashes = (grams * weights[None, :]).sum(axis=1)  # uint64 wraparound ok
    if n <= window:
        return np.unique(hashes.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(wins.min(axis=1))


def fingerprint_stats(batch: pa.Table, text_col: str = "text", k: int = 5, window: int = 4) -> pa.Table:
    fps = [winnow_fingerprints(t, k, window) for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
            "min_fingerprint": pa.array(
                [int(f.min()) if len(f) else 0 for f in fps], pa.uint64()
            ),
        }
    )


# C4-style cleaning regexes — RE2 syntax only, so the identical patterns
# run in Arrow (replace_substring_regex) and in the DuckDB oracle
# (regexp_replace 'g'): no lookarounds, no backrefs.
URL_PATTERN = r"https?://[^\s]+"
EMAIL_PATTERN = r"[^\s]+@[^\s]+\.[^\s]+"
WS_PATTERN = r"\s+"


# PII / number redaction — RE2-only patterns (usable verbatim in the
# DuckDB oracle's regexp_replace 'g' / regexp_extract_all), applied in a
# FIXED order so both sides see identical intermediate texts.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", URL_PATTERN, "<URL>"),
    ("ip", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    ("number", r"\d+", "<NUM>"),
)


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails / URLs / IPv4s / digit runs with typed placeholders
    and count each category (counts taken on the PRE-redaction text of
    each step, i.e. after the previous category's replacement).

    One vectorized RE2 pass per category — the PII-scrub stage of a
    training-data pipeline; map-side only.  Appends ``redacted`` +
    ``n_<category>`` columns.
    """
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    counts = {}
    for name, pattern, placeholder in PII_PATTERNS:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(txt, pattern), pa.int64()
        )
        txt = pc.replace_substring_regex(txt, pattern, placeholder)
    return batch.append_column("redacted", txt).append_column(
        "n_email", counts["n_email"]
    ).append_column("n_url", counts["n_url"]).append_column(
        "n_ip", counts["n_ip"]
    ).append_column("n_number", counts["n_number"])


def clean_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Normalize documents for training: lowercase, strip URLs and
    e-mail addresses, collapse whitespace runs, trim.

    Entirely pyarrow.compute kernels (one pass per regex, no Python per
    row); embarrassingly parallel map-side — the cleaning stage that
    fronts every web-corpus pipeline.  Appends ``clean_text``.
    """
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.utf8_lower(pc.fill_null(txt, ""))
    for pattern in (URL_PATTERN, EMAIL_PATTERN):
        txt = pc.replace_substring_regex(txt, pattern, " ")
    txt = pc.utf8_trim_whitespace(pc.replace_substring_regex(txt, WS_PATTERN, " "))
    return batch.append_column("clean_text", txt)


def gopher_gate(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 5000,
    min_avg_len: int = 4,
    max_avg_len: int = 12,
    min_stop: int = 2,
    max_dup_line_pct: int = 30,
    max_top_bigram_pct: int = 18,
    return_signals: bool = False,
) -> pa.Table:
    """Gopher-style document quality GATE (Rae et al. 2021 §A.1.1): the
    composed keep/drop verdict with one 0/1 flag per rule, not just the
    raw signals (those are ``repetition_stats`` / ``quality_stats``).

    All comparisons are integer-exact (cross-multiplied, never float
    ratios) so a SQL oracle hash-matches bit-for-bit:

    - ``f_words``:   min_words <= n_tokens <= max_words
    - ``f_wordlen``: min_avg_len*n <= sum(len(tok)) <= max_avg_len*n
    - ``f_stop``:    >= min_stop stopword occurrences (lowercased)
    - ``f_dupline``: 100*dup_line_chars <= max_dup_line_pct*line_chars
    - ``f_bigram``:  100*top_bigram_n <= max_top_bigram_pct*n_bigrams
      (vacuously true when the doc has no bigrams)
    - ``keep``: AND of all five.

    Pure per-doc map_batches stage — no shuffle; composes the vectorized
    token pass with ``repetition_stats``'s line/bigram signals.
    """
    n = len(batch)
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    ws = pc.split_pattern_regex(txt, r"\s+")
    flat = pc.list_flatten(ws)
    parents = pc.list_parent_indices(ws).to_numpy(zero_copy_only=False)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    flat_ne = flat.filter(pa.array(nonempty))
    par_ne = parents[nonempty]
    n_tokens = np.bincount(par_ne, minlength=n).astype(np.int64)
    tok_len_sum = np.bincount(
        par_ne,
        weights=pc.utf8_length(flat_ne).to_numpy(zero_copy_only=False),
        minlength=n,
    ).astype(np.int64)
    stop_mask = pc.is_in(
        pc.utf8_lower(flat_ne), value_set=pa.array(sorted(STOPWORDS))
    ).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(par_ne[stop_mask], minlength=n).astype(np.int64)

    rep = repetition_stats(batch, text_col=text_col, id_col=id_col)
    dup_line_chars = rep["dup_line_chars"].to_numpy(zero_copy_only=False)
    line_chars = rep["line_chars"].to_numpy(zero_copy_only=False)
    n_bigrams = rep["n_bigrams"].to_numpy(zero_copy_only=False)
    top_bigram_n = rep["top_bigram_n"].to_numpy(zero_copy_only=False)

    f_words = (n_tokens >= min_words) & (n_tokens <= max_words)
    f_wordlen = (min_avg_len * n_tokens <= tok_len_sum) & (
        tok_len_sum <= max_avg_len * n_tokens
    )
    f_stop = n_stop >= min_stop
    f_dupline = 100 * dup_line_chars <= max_dup_line_pct * line_chars
    f_bigram = 100 * top_bigram_n <= max_top_bigram_pct * n_bigrams
    f_bigram |= n_bigrams == 0
    keep = f_words & f_wordlen & f_stop & f_dupline & f_bigram
    as_i64 = lambda m: pa.array(m.astype(np.int64))  # noqa: E731
    cols = {
        id_col: batch[id_col],
        "n_tokens": pa.array(n_tokens),
        "f_words": as_i64(f_words),
        "f_wordlen": as_i64(f_wordlen),
        "f_stop": as_i64(f_stop),
        "f_dupline": as_i64(f_dupline),
        "f_bigram": as_i64(f_bigram),
        "keep": as_i64(keep),
    }
    if return_signals:
        # the raw counts the flags derive from, for callers that need
        # them too (one tokenization pass instead of two)
        cols["n_stop"] = pa.array(n_stop)
        cols["tok_len_sum"] = pa.array(tok_len_sum)
    return pa.table(cols)

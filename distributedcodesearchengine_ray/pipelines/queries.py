"""Driver-contract query implementations over the testdata tables.

Each function here backs one ``queries()`` entry in ``__ray_entry__.py`` and
is paired with an ANSI-SQL oracle (DuckDB) in ``oracle_sql()``.  Column
names and value encodings (micro/cent integer rounding for floats —
``floor(x*scale + 0.5)`` on BOTH sides) are chosen so the driver's
order-insensitive value-hash comparison is byte-stable.

The BM25 queries are the headline: they run the full distributed
build+query engine over the ``documents`` table (file mode, one document
per row) and are checked against a pure-SQL BM25Okapi implementation —
independent, end-to-end evidence of score/rank identity.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pcc
import pyarrow.dataset as pads

from ..functions.tokenizer import token_count_array, tokenize_array
from ..stages.text_stats import (
    BPE_ISH_PATTERN,
    EMAIL_PATTERN as _EMAIL_P,
    STOPWORDS,
    URL_PATTERN as _URL_P,
)

BM25_QUERY = "merge sort join the data stream"
BM25_QUERY_FILTERED = "hash table scan filter"


def _micro(x: np.ndarray, scale: float = 1e6) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5).astype(np.int64)


def _cents_col(arr) -> pa.Array:
    """Per-ELEMENT exact integer cents: ``floor(x*100 + 0.5)`` as int64.

    Money aggregates round each value to cents BEFORE summation (and the
    paired SQL oracles apply the same expression inside SUM), so grouped
    totals are integer-exact on both sides — immune to parallel float
    summation order, unlike rounding a float sum at a half-cent boundary.
    """
    x = pcc.cast(arr, pa.float64())
    return pcc.cast(
        pcc.floor(pcc.add(pcc.multiply(x, pa.scalar(100.0)), pa.scalar(0.5))),
        pa.int64(),
    )


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _join_parts(sf_dir: str, *tables: str, bytes_per_part: int = 32 << 20) -> int:
    """Hash-join partition count sized to the INPUT, not a constant:
    ~one partition per 32 MiB of parquet (≈128 MiB in memory), so small
    inputs pay 2 shuffle actors instead of 8+ (join setup cost scales
    with partition count) while 100-TB inputs fan out to thousands of
    partitions instead of 8 giant spilling blocks."""
    total = 0
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return max(2, min(4096, total // bytes_per_part + 1))


# ------------------------------------------------------------- tokenizer


def tokenize_counts(sf_dir: str):
    """Per-doc code-tokenizer token count (M7 over documents.text)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": token_count_array(t["text"])}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def term_df_top100(sf_dir: str):
    """Global document frequencies, top 100 by (df desc, term asc).

    Partial-aggregate pattern: per-batch distinct (term, doc) explosion ->
    one ``groupby(term)`` over partial dfs (A1's df computation).
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        flat = pcc.list_flatten(toks)
        parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        df_ = pd.DataFrame({"term": flat.to_pandas(), "d": parents})
        per_doc = df_.drop_duplicates()
        partial = per_doc.groupby("term", sort=False).size().reset_index(name="df")
        return pa.table(
            {"term": pa.array(partial["term"], pa.string()),
             "df": pa.array(partial["df"].to_numpy(), pa.int64())}
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    out = out.sort_values(["df", "term"], ascending=[False, True], kind="mergesort").head(100)
    return pa.table(
        {"term": pa.array(out["term"], pa.string()), "df": pa.array(out["df"], pa.int64())}
    )


SIGTERMS_FG_LANG = "de"
SIGTERMS_TOP_N = 20


def significant_terms(sf_dir: str):
    """Elasticsearch-style significant-terms aggregation: terms unusually
    frequent in a foreground slice (lang = SIGTERMS_FG_LANG) vs the whole
    corpus, scored by the G2 log-likelihood ratio of the 2x2 doc-frequency
    contingency table (Dunning 1993), milli-nat integer encoding.

    One distributed pass: per-batch distinct (term, doc, fg) explosion ->
    partial (df_fg, df_all) -> groupby(term) sum -> per-block scoring +
    local top-k -> driver merge of blocks*k rows.  The only all-to-all is
    the vocabulary-keyed groupby (same exchange term_df_top100 already
    uses); counts N / N_fg come from a single lang-column read.  The
    positive-association gate is integer-exact (a*N > df_all*N_fg); only
    the final G2 uses floats, rounded to milli-nats like pmi/lm oracles."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def explode(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        flat = pcc.list_flatten(toks)
        parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        fg = pcc.equal(t["lang"], SIGTERMS_FG_LANG).to_numpy(zero_copy_only=False)
        df_ = pd.DataFrame(
            {"term": flat.to_pandas(), "d": parents}
        ).drop_duplicates()
        df_["fg"] = fg[df_["d"].to_numpy()].astype(np.int64)
        partial = df_.groupby("term", sort=False).agg(
            df_fg=("fg", "sum"), df_all=("fg", "size")
        ).reset_index()
        return pa.table(
            {
                "term": pa.array(partial["term"], pa.string()),
                "df_fg": pa.array(partial["df_fg"].to_numpy(), pa.int64()),
                "df_all": pa.array(partial["df_all"].to_numpy(), pa.int64()),
            }
        )

    lang_counts = (
        _read(sf_dir, "documents", columns=["lang"])
        .map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array([len(t)], pa.int64()),
                    "n_fg": pa.array(
                        [pcc.sum(pcc.cast(pcc.equal(t["lang"], SIGTERMS_FG_LANG),
                                          pa.int64())).as_py() or 0],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    n_docs = int(lang_counts["n"].sum())
    n_fg = int(lang_counts["n_fg"].sum())

    def score_topk(t: pa.Table) -> pa.Table:
        a = t["df_fg"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_all = t["df_all"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = (t["df_fg"].to_numpy(zero_copy_only=False) > 0) & (
            t["df_fg"].to_numpy(zero_copy_only=False) * n_docs
            > t["df_all"].to_numpy(zero_copy_only=False) * n_fg
        )
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df_fg": pa.array([], pa.int64()),
                    "df_all": pa.array([], pa.int64()),
                    "llr_milli": pa.array([], pa.int64()),
                }
            )
        a, df_all = a[keep], df_all[keep]
        b = df_all - a
        c = n_fg - a
        d = (n_docs - n_fg) - b
        n = float(n_docs)

        def cell(o, e_num, e_den):
            with np.errstate(divide="ignore", invalid="ignore"):
                v = o * np.log(o * n / (e_num * e_den))
            return np.where(o > 0, v, 0.0)

        g2 = 2.0 * (
            cell(a, a + b, a + c)
            + cell(b, a + b, b + d)
            + cell(c, c + d, a + c)
            + cell(d, c + d, b + d)
        )
        llr = _micro(g2, scale=1e3)
        df_out = pd.DataFrame(
            {
                "term": t["term"].to_pandas(),
                "df_fg": t["df_fg"].to_pandas(),
                "df_all": t["df_all"].to_pandas(),
                "llr_milli": llr,
            }
        ).sort_values(["llr_milli", "term"], ascending=[False, True],
                      kind="mergesort").head(SIGTERMS_TOP_N)
        return pa.Table.from_pandas(df_out, preserve_index=False)

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_fg", alias_name="df_fg"), Sum("df_all", alias_name="df_all"))
        .map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()
    )
    if "llr_milli" not in out.columns:  # every block empty: no fg-assoc terms
        out = pd.DataFrame(columns=["term", "df_fg", "df_all", "llr_milli"])
    out = out.sort_values(["llr_milli", "term"], ascending=[False, True],
                          kind="mergesort", ignore_index=True).head(SIGTERMS_TOP_N)
    return pa.table(
        {
            "term": pa.array(out["term"], pa.string()),
            "df_fg": pa.array(out["df_fg"], pa.int64()),
            "df_all": pa.array(out["df_all"], pa.int64()),
            "llr_milli": pa.array(out["llr_milli"], pa.int64()),
        }
    )


SIGTEXT_QUERY = "dup data stream"  # rare head term -> coherent result set
SIGTEXT_FG_K = 50  # foreground = the query's top-50 BM25 hits
SIGTEXT_TOP_N = 20


def significant_text(sf_dir: str, query: str = SIGTEXT_QUERY):
    """Elasticsearch ``significant_text``: terms unusually frequent in the
    QUERY'S RESULT SET (top ``SIGTEXT_FG_K`` BM25 hits — the full
    reference pipeline incl. the F4 threshold) versus the whole corpus,
    scored by the same Dunning G2 / milli-nat encoding as
    ``significant_terms``.  Unlike significant_terms' fixed lang slice,
    the foreground here is search-driven — the "what is this result set
    about" operator.

    The fg doc set is tiny (<= K ids) and travels by closure; the
    background pass is ONE distinct-(term, doc) explosion ->
    vocabulary-keyed groupby -> per-block G2 top-k partials -> driver
    merge, identical shape (and exchange) to significant_terms."""
    from ray.data.aggregate import Sum

    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search(query, limit=SIGTEXT_FG_K)
    finally:
        engine.close()
    fg_ids = np.array(sorted(h["doc_id"] for h in hits), np.int64)
    n_fg = len(fg_ids)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()

    def explode(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        flat = pcc.list_flatten(toks)
        parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        fg = np.isin(t["doc_id"].to_numpy(zero_copy_only=False), fg_ids)
        df_ = pd.DataFrame(
            {"term": flat.to_pandas(), "d": parents}
        ).drop_duplicates()
        df_["fg"] = fg[df_["d"].to_numpy()].astype(np.int64)
        partial = df_.groupby("term", sort=False).agg(
            df_fg=("fg", "sum"), df_all=("fg", "size")
        ).reset_index()
        return pa.table(
            {
                "term": pa.array(partial["term"], pa.string()),
                "df_fg": pa.array(partial["df_fg"].to_numpy(), pa.int64()),
                "df_all": pa.array(partial["df_all"].to_numpy(), pa.int64()),
            }
        )

    def score_topk(t: pa.Table) -> pa.Table:
        dfg = t["df_fg"].to_numpy(zero_copy_only=False)
        dall = t["df_all"].to_numpy(zero_copy_only=False)
        keep = (dfg > 0) & (dfg * n_docs > dall * n_fg)
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df_fg": pa.array([], pa.int64()),
                    "df_all": pa.array([], pa.int64()),
                    "llr_milli": pa.array([], pa.int64()),
                }
            )
        a = dfg[keep].astype(np.float64)
        df_all = dall[keep].astype(np.float64)
        b = df_all - a
        c = n_fg - a
        d = (n_docs - n_fg) - b
        n = float(n_docs)

        def cell(o, e_num, e_den):
            with np.errstate(divide="ignore", invalid="ignore"):
                v = o * np.log(o * n / (e_num * e_den))
            return np.where(o > 0, v, 0.0)

        g2 = 2.0 * (
            cell(a, a + b, a + c)
            + cell(b, a + b, b + d)
            + cell(c, c + d, a + c)
            + cell(d, c + d, b + d)
        )
        llr = _micro(g2, scale=1e3)
        df_out = pd.DataFrame(
            {
                "term": t["term"].to_pandas(),
                "df_fg": t["df_fg"].to_pandas(),
                "df_all": t["df_all"].to_pandas(),
                "llr_milli": llr,
            }
        ).sort_values(["llr_milli", "term"], ascending=[False, True],
                      kind="mergesort").head(SIGTEXT_TOP_N)
        return pa.Table.from_pandas(df_out, preserve_index=False)

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_fg", alias_name="df_fg"), Sum("df_all", alias_name="df_all"))
        .map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()
    )
    if "llr_milli" not in out.columns:
        out = pd.DataFrame(columns=["term", "df_fg", "df_all", "llr_milli"])
    out = out.sort_values(["llr_milli", "term"], ascending=[False, True],
                          kind="mergesort", ignore_index=True).head(SIGTEXT_TOP_N)
    return pa.table(
        {
            "term": pa.array(out["term"], pa.string()),
            "df_fg": pa.array(out["df_fg"], pa.int64()),
            "df_all": pa.array(out["df_all"], pa.int64()),
            "llr_milli": pa.array(out["llr_milli"], pa.int64()),
        }
    )


VOCABDIFF_FG_LANG = "de"
VOCABDIFF_BG_LANG = "en"


def vocab_set_ops(sf_dir: str):
    """Distributed set algebra over the VOCABULARIES of two corpus
    slices: |V_fg UNION V_bg|, |V_fg INTERSECT V_bg|, |V_fg \\ V_bg|,
    |V_bg \\ V_fg|, plus each slice's df total for the intersection
    terms.  Shape: per-batch distinct (term, slice) membership bits ->
    ONE vocabulary-keyed groupby folding Max(in_fg) + Max(in_bg) +
    Sum(df_fg) -> per-block partial set-op counts -> a scalar driver
    fold.  The anti-/semi-joins are one-bit flags folded through the
    exchange the df counts already need — no distinct-set join, no
    second shuffle.  Oracle: four set-op COUNTs over count(DISTINCT)
    CTEs."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def explode(t: pa.Table) -> pa.Table:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        rel = (lang == VOCABDIFF_FG_LANG) | (lang == VOCABDIFF_BG_LANG)
        sub = t.filter(pa.array(rel))
        if len(sub) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df_fg": pa.array([], pa.int64()),
                    "df_bg": pa.array([], pa.int64()),
                }
            )
        toks = tokenize_array(sub["text"])
        flat = pcc.list_flatten(toks)
        parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        fg = (sub["lang"].to_numpy(zero_copy_only=False) == VOCABDIFF_FG_LANG)
        df_ = pd.DataFrame({"term": flat.to_pandas(), "d": parents}).drop_duplicates()
        is_fg = fg[df_["d"].to_numpy()]
        df_["fg"] = is_fg.astype(np.int64)
        df_["bg"] = (~is_fg).astype(np.int64)
        partial = df_.groupby("term", sort=False).agg(
            df_fg=("fg", "sum"), df_bg=("bg", "sum")
        ).reset_index()
        return pa.table(
            {
                "term": pa.array(partial["term"], pa.string()),
                "df_fg": pa.array(partial["df_fg"].to_numpy(), pa.int64()),
                "df_bg": pa.array(partial["df_bg"].to_numpy(), pa.int64()),
            }
        )

    def setop_partial(t: pa.Table) -> pa.Table:
        in_fg = t["df_fg"].to_numpy(zero_copy_only=False) > 0
        in_bg = t["df_bg"].to_numpy(zero_copy_only=False) > 0
        both = in_fg & in_bg
        return pa.table(
            {
                "n_union": pa.array([len(t)], pa.int64()),
                "n_intersect": pa.array([int(both.sum())], pa.int64()),
                "n_only_fg": pa.array([int((in_fg & ~in_bg).sum())], pa.int64()),
                "n_only_bg": pa.array([int((in_bg & ~in_fg).sum())], pa.int64()),
                "df_fg_shared": pa.array(
                    [int(t["df_fg"].to_numpy(zero_copy_only=False)[both].sum())],
                    pa.int64(),
                ),
                "df_bg_shared": pa.array(
                    [int(t["df_bg"].to_numpy(zero_copy_only=False)[both].sum())],
                    pa.int64(),
                ),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_fg", alias_name="df_fg"), Sum("df_bg", alias_name="df_bg"))
        .map_batches(setop_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    cols = ["n_union", "n_intersect", "n_only_fg", "n_only_bg",
            "df_fg_shared", "df_bg_shared"]
    vals = [int(out.get(c, 0)) for c in cols]
    return pa.table(
        {
            "op": pa.array(cols, pa.string()),
            "n": pa.array(vals, pa.int64()),
        }
    )


WILDCARD_PATTERN = "s*"


def wildcard_term_df(sf_dir: str, pattern: str = WILDCARD_PATTERN):
    """Wildcard term expansion against the real index lexicon (prefix
    range pushdown + RE2 residual): matching (term, df), df-descending.
    Oracle recomputes df from text via the tokenizer CTE + LIKE."""
    from .query import LexiconReader

    idx = _documents_index(sf_dir)
    rows = LexiconReader(idx).expand(pattern, max_expand=100)
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "df": pa.array([int(r[1]) for r in rows], pa.int64()),
        }
    )


# ------------------------------------------------------------------ bm25


SUGGEST_TERM = "pert"


def spell_suggest(sf_dir: str, term: str = SUGGEST_TERM, max_dist: int = 2):
    """Spelling suggestions ("did you mean") from the index vocabulary:
    lexicon-shard scan with a length-band prefilter + capped Levenshtein
    DP, ranked (dist asc, df desc, term asc)."""
    from .query import LexiconReader

    idx = _documents_index(sf_dir)
    rows = LexiconReader(idx).suggest(term, max_dist=max_dist, limit=10)
    return pa.table(
        {
            "term": pa.array([t for t, _, _ in rows], pa.string()),
            "df": pa.array([d for _, d, _ in rows], pa.int64()),
            "dist": pa.array([x for _, _, x in rows], pa.int64()),
        }
    )


def _documents_index(
    sf_dir: str, with_positions: bool = False, variant: str = ""
) -> str:
    """Build (resume-cached) the file-mode BM25 index over documents.
    ``variant`` names an independent cache copy (e.g. for destructive
    tombstone-delete queries).  The build runs under an exclusive file
    lock so two processes sharing /tmp/rcs_cache (e.g. parallel test
    runs) can't interleave the same build (the resume logic is
    idempotent per process, not concurrency-safe across them)."""
    from .build_index import build_index

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12] + "d"
    if with_positions:
        tag += "-pos"
    if variant:
        tag += f"-{variant}"
    idx = f"/tmp/rcs_cache/docidx-{tag}"
    os.makedirs(idx, exist_ok=True)
    with _cache_lock(idx):
        return _documents_index_locked(
            sf_dir, idx, with_positions=with_positions
        )


def _cache_lock(path: str):
    """Exclusive advisory lock guarding a /tmp/rcs_cache build dir."""
    import fcntl
    from contextlib import contextmanager

    @contextmanager
    def _lock():
        fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    return _lock()


def _documents_index_locked(
    sf_dir: str, idx: str, *, with_positions: bool = False
) -> str:
    from .build_index import build_index

    ds = _read(sf_dir, "documents")
    # bm25 queries compare engine doc_ids (lexicographic ranks of the
    # zero-padded synthesized paths) to the table's doc_id column, which is
    # only valid when doc_id is dense 0..N-1 — assert it instead of
    # silently mismatching on a gapped/offset corpus
    marker = os.path.join(idx, "_DOCID_DENSE")
    if not os.path.exists(marker):
        import pyarrow.dataset as pads
        from ray.data.aggregate import Max, Min

        agg = _read(sf_dir, "documents", columns=["doc_id"]).aggregate(
            Min("doc_id"), Max("doc_id")
        )
        n_rows = pads.dataset(
            os.path.join(sf_dir, "documents.parquet"), format="parquet"
        ).count_rows()
        if not (agg["min(doc_id)"] == 0 and agg["max(doc_id)"] == n_rows - 1):
            raise ValueError(
                "documents.doc_id must be dense 0..N-1 for rank==doc_id "
                f"equivalence (got min={agg['min(doc_id)']}, "
                f"max={agg['max(doc_id)']}, n={n_rows})"
            )
        open(marker, "w").write("ok")

    def to_corpus(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "repo": pa.array(["docs"] * len(t), pa.string()),
                "path": pa.array([f"{i:012d}.txt" for i in ids], pa.string()),
                "commit": pa.array(["0" * 40] * len(t), pa.string()),
                "lang": t["lang"],
                "content": t["text"],
            }
        )

    # stage the synthesized corpus to parquet so the manifest records a
    # readable corpus_dir — file-mode doc-text reads (quoted phrases,
    # more-like-this, RM3 feedback) then work through the standard
    # doc_id-pushdown path instead of per-query text plumbing
    corpus_dir = f"{idx}-corpus"
    done = f"{corpus_dir}._DONE"  # outside the dir: parquet discovery reads every file
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(corpus_dir, ignore_errors=True)
        ds.map_batches(to_corpus, batch_format="pyarrow").write_parquet(corpus_dir)
        open(done, "w").write("ok")
    build_index(
        corpus_dir, idx, mode="file", docs_per_partition=2000,
        apply_path_filters=False, resume=True, with_positions=with_positions,
    )
    return idx


def _documents_subindex(sf_dir: str, parity: int) -> str:
    """Build (resume-cached) a file-mode BM25 sub-index over HALF the
    documents table (``doc_id % 2 == parity``) — the federation fixture:
    two independently-built indexes whose union is the full corpus.
    Paths keep the ORIGINAL zero-padded doc_id, so each sub-index's
    insertion order is the ascending original ids of its half and the
    local->global id map is ``2*i + parity``."""
    from .build_index import build_index

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12] + f"d-fed{parity}"
    idx = f"/tmp/rcs_cache/docidx-{tag}"
    os.makedirs(idx, exist_ok=True)
    with _cache_lock(idx):
        corpus_dir = f"{idx}-corpus"
        done = f"{corpus_dir}._DONE"
        if not os.path.exists(done):
            import shutil

            shutil.rmtree(corpus_dir, ignore_errors=True)

            def to_corpus(t: pa.Table) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                keep = (ids % 2) == parity
                ids = ids[keep]
                return pa.table(
                    {
                        "repo": pa.array(["docs"] * len(ids), pa.string()),
                        "path": pa.array([f"{i:012d}.txt" for i in ids], pa.string()),
                        "commit": pa.array(["0" * 40] * len(ids), pa.string()),
                        "lang": t["lang"].filter(pa.array(keep)),
                        "content": t["text"].filter(pa.array(keep)),
                    }
                )

            _read(sf_dir, "documents").map_batches(
                to_corpus, batch_format="pyarrow"
            ).write_parquet(corpus_dir)
            open(done, "w").write("ok")
        build_index(
            corpus_dir, idx, mode="file", docs_per_partition=2000,
            apply_path_filters=False, resume=True,
        )
    return idx


def federated_search(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """Federated scatter-gather BM25 across TWO independently-built
    sub-indexes (even / odd doc_ids) with exact global-statistics
    recombination — N, avgdl, per-term df and the epsilon floor all
    recombine so results are SCORE-IDENTICAL to one index built over
    the union corpus (the oracle is the same whole-corpus BM25 SQL
    that checks ``bm25_topk``).  See ``pipelines/federated.py``."""
    from .federated import FederatedEngine

    idxs = [_documents_subindex(sf_dir, 0), _documents_subindex(sf_dir, 1)]
    eng = FederatedEngine(
        idxs,
        [lambda i: 2 * i, lambda i: 2 * i + 1],
        num_actors_each=2,
    )
    try:
        hits = eng.search(query, limit=limit)
    finally:
        eng.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


def bm25_topk(sf_dir: str, query: str = BM25_QUERY, limit: int = 20,
              filters: Optional[Dict[str, str]] = None):
    """Distributed BM25 top-k over documents -> (rank, doc_id, score_micro)."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search(query, limit=limit, filters=filters)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


PAGE_SIZE = 10


def bm25_page2(sf_dir: str, query: str = BM25_QUERY):
    """Search-after deep pagination: page 1 (limit 10) yields the cursor
    (score, doc_id) of its last hit; page 2 is ``engine.search_after``
    with that cursor — each shard applies the cursor predicate BEFORE its
    local top-k, so deep pages never pay a growing offset.  Emits page 2
    as global ranks 10..19.  Oracle: the same BM25-in-SQL ordering with
    ``LIMIT 10 OFFSET 10``."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        page1 = engine.search(query, limit=PAGE_SIZE)
        if len(page1) < PAGE_SIZE:
            hits = []
        else:
            cur = (page1[-1]["score"], page1[-1]["doc_id"])
            hits = engine.search_after(query, after=cur, limit=PAGE_SIZE)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(PAGE_SIZE + np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


def bm25_collapse(sf_dir: str, query: str = BM25_QUERY, limit: int = 3):
    """Field collapsing (Elasticsearch ``collapse``): the top ``limit``
    language groups by their best BM25 hit, at most one doc per lang —
    per-shard per-group bests merged on the driver (O(groups) wire cost,
    never per-doc rows).  Oracle: BM25-in-SQL CTE + row_number
    PARTITION BY lang = 1."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.collapse(query, collapse_col="language", limit=limit)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "lang": pa.array([r["group"] for r in rows], pa.string()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


EXPLAIN_K = 3
# 'dup' is the one positive-idf term in the synthetic documents vocab:
# anchoring the query on it keeps the threshold in the max>0 branch so the
# explained top hits genuinely match query terms (a BM25_QUERY explain is
# vacuously empty here — every term idf is the negative epsilon floor,
# max<=0 keeps all, and the zero-score docs win the tie-break)
EXPLAIN_QUERY = "dup stream merge sort"


def bm25_explain(sf_dir: str, query: str = EXPLAIN_QUERY):
    """Lucene/ES _explain: per-term BM25 score decomposition of the top
    EXPLAIN_K hits — one row per (doc, matched query term) carrying tf,
    df, epsilon-floored idf and the term contribution.  Engine side:
    one top-k search + one lexicon pushdown + one <=K-doc text pushdown
    (QueryEngine.explain); oracle: the shared BM25 CTE body with a
    per-term final join."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.explain(query, limit=EXPLAIN_K)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array([r["rank"] for r in rows], pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "term": pa.array([r["term"] for r in rows], pa.string()),
            "tf": pa.array([r["tf"] for r in rows], pa.int64()),
            "df": pa.array([r["df"] for r in rows], pa.int64()),
            "idf_micro": pa.array(
                _micro(np.array([r["idf"] for r in rows], dtype=np.float64)),
                pa.int64(),
            ),
            "contrib_micro": pa.array(
                _micro(np.array([r["contribution"] for r in rows],
                                dtype=np.float64)),
                pa.int64(),
            ),
        }
    )


BOOSTING_POS = "dup stream merge"
BOOSTING_NEG = "spark"
BOOSTING_FACTOR = 0.5  # float-exact multiply on both sides


def bm25_boosting(sf_dir: str):
    """Boosting query (ES ``boosting``): positive-query BM25 ranking
    with docs matching the negative term demoted to score*0.5 (still
    returned, unlike -term exclusion).  Demotion happens inside the
    shard scorer BEFORE the threshold; oracle multiplies inside
    scores_all identically."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search_boosting(
            BOOSTING_POS, BOOSTING_NEG, boost=BOOSTING_FACTOR, limit=20
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


SPAN_FIRST_TERM = "dup"
SPAN_FIRST_N = 50


def span_first_q(sf_dir: str):
    """Lucene span_first: BM25-ranked docs whose FIRST occurrence of the
    span term is within the first N token positions — resolved from the
    positional index (first decoded position per doc), never from text.
    Oracle: 1-based ``list_position(toks, term) <= N``."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir, with_positions=True)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search_span_first(
            SPAN_FIRST_TERM, SPAN_FIRST_TERM, SPAN_FIRST_N, limit=20
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: one streaming filter-sum over three pruned
    columns — shipdate year 1994, discount band 5-7 cents (integer-
    quantized compare, float-safe), quantity < 24.  Per-row cents
    rounding before the fold keeps both sides integer-exact."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
        )
        dc = _cents_col(t["l_discount"]).to_numpy(zero_copy_only=False)
        qc = _cents_col(t["l_quantity"]).to_numpy(zero_copy_only=False)
        mask = (
            (day >= np.datetime64("1994-01-01"))
            & (day < np.datetime64("1995-01-01"))
            & (dc >= 5)
            & (dc <= 7)
            & (qc < 2400)
        )
        rev = pcc.multiply(t["l_extendedprice"], t["l_discount"])
        rev_c = _cents_col(rev).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "revenue_c": pa.array([int(rev_c[mask].sum())], pa.int64()),
                "n": pa.array([int(mask.sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    return pa.table(
        {
            "revenue_c": pa.array([int(agg["revenue_c"])], pa.int64()),
            "n": pa.array([int(agg["n"])], pa.int64()),
        }
    )


CTQ_QUERY = "query merge dup stream"
CTQ_CUTOFF_MILLI = 600


def bm25_common_terms(sf_dir: str):
    """Lucene CommonTermsQuery: query terms with df/N <= 0.6 become MUST
    clauses (here the rare 'dup'), high-frequency terms stay optional —
    df classification from one lexicon stats read, then the standard
    boolean search path."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search_common_terms(
            CTQ_QUERY, cutoff_milli=CTQ_CUTOFF_MILLI, limit=20
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


SPAN_NEAR_A = "hash"
SPAN_NEAR_B = "join"
SPAN_NEAR_WINDOW = 3


def span_near_q(sf_dir: str):
    """Lucene span_near (in_order=false): BM25-ranked docs where 'hash'
    occurs within 3 positions of 'join' in either order — resolved from
    the positional index with one vectorized nearest-neighbor
    searchsorted per shard, never from text."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir, with_positions=True)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search_span_near(
            f"{SPAN_NEAR_A} {SPAN_NEAR_B}", SPAN_NEAR_A, SPAN_NEAR_B,
            window=SPAN_NEAR_WINDOW, limit=20,
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


SPAN_NOT_INCLUDE = "merge"
SPAN_NOT_EXCLUDE = "sort"
SPAN_NOT_DIST = 2


def span_not_q(sf_dir: str):
    """Lucene span_not: BM25-ranked docs with at least one occurrence of
    the include term farther than DIST positions from every occurrence
    of the exclude term — resolved from the positional index with one
    vectorized nearest-neighbor searchsorted per shard, never from
    text."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir, with_positions=True)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search_span_not(
            SPAN_NOT_INCLUDE, SPAN_NOT_INCLUDE, SPAN_NOT_EXCLUDE,
            dist=SPAN_NOT_DIST, limit=20,
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


SPAN_CONT_A, SPAN_CONT_B, SPAN_CONT_C = "merge", "stream", "data"
SPAN_CONT_WIDTH = 6


def span_containing_q(sf_dir: str):
    """Lucene span_containing: BM25-ranked docs where an ordered
    'merge'..'stream' span of width <= 6 contains an occurrence of
    'data' — resolved from the positional index with a three-way ragged
    neighbor merge per shard (tightest enclosing span per c-occurrence),
    never from text."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir, with_positions=True)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search_span_containing(
            f"{SPAN_CONT_A} {SPAN_CONT_B}", SPAN_CONT_A, SPAN_CONT_B,
            SPAN_CONT_C, width=SPAN_CONT_WIDTH, limit=20,
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


SPAN_WITHIN_D = "scan"  # little span = "data scan" adjacent phrase
SPAN_WITHIN_WIDTH = 24


def span_within_q(sf_dir: str):
    """Lucene span_within (doc level): BM25-ranked docs where the
    adjacent little phrase 'data scan' lies WITHIN some ordered
    'merge'..'stream' span of width <= 24 — the dual of
    span_containing, with a two-term little span, resolved from the
    positional index with a four-way ragged neighbor merge per shard
    (tightest enclosing span per little occurrence), never from
    text."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir, with_positions=True)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search_span_containing(
            f"{SPAN_CONT_A} {SPAN_CONT_B}", SPAN_CONT_A, SPAN_CONT_B,
            SPAN_CONT_C, width=SPAN_WITHIN_WIDTH, limit=20,
            term_d=SPAN_WITHIN_D,
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


WILDCARD_SEARCH_PATTERN = "s*"


def bm25_wildcard(sf_dir: str):
    """SCORED wildcard search (wildcard_term_df checks only expansion):
    the pattern expands against the lexicon (df desc, term asc, cap 64)
    and the expansions rank as ordinary OR'd BM25 terms through the
    standard engine path."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search(WILDCARD_SEARCH_PATTERN, limit=20)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


REGEXP_PATTERN = "[a-z]*a[a-z]*"
REGEXP_MAX_EXP = 8


def bm25_regexp(sf_dir: str):
    """Lucene regexp query: the anchored pattern FULL-matches against
    the index vocabulary (RE2 on both engines), the matches are cut to
    the top ``REGEXP_MAX_EXP`` by (df desc, term asc) — RegexpQuery's
    rewrite cap — and score as ordinary OR'd BM25 terms."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search_regexp(
            REGEXP_PATTERN, limit=20, max_expansions=REGEXP_MAX_EXP
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


TERM_RANGE_LO = "sl"
TERM_RANGE_HI = "st"
TERM_RANGE_MAX = 64


def bm25_term_range(sf_dir: str):
    """Lucene TermRangeQuery: the lexicographic vocabulary slice
    ``[TERM_RANGE_LO, TERM_RANGE_HI)`` expands against the term-sorted
    lexicon shards via ONE parquet range-predicate pushdown (df desc,
    term asc, capped at 64 — the scoring rewrite's cap) and the
    expansions rank as ordinary OR'd BM25 terms through the standard
    shard-actor path.  Expansion cost scales with vocabulary, never
    corpus; scoring cost equals an OR query of the expanded terms."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search_term_range(
            TERM_RANGE_LO, TERM_RANGE_HI, limit=20,
            max_expansions=TERM_RANGE_MAX,
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


TOP_HITS_K = 2


def bm25_top_hits(sf_dir: str, query: str = EXPLAIN_QUERY):
    """ES top_hits inside a terms agg: top-2 BM25 hits per language
    bucket, buckets ranked by their best hit — per-shard per-group
    top-k partials (groups x k wire cost), driver merge."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.top_hits(query, group_col="language", k=TOP_HITS_K,
                               limit_groups=10)
    finally:
        engine.close()
    return pa.table(
        {
            "grp_rank": pa.array([r["grp_rank"] for r in rows], pa.int64()),
            "lang": pa.array([r["group"] for r in rows], pa.string()),
            "hit_rank": pa.array([r["hit_rank"] for r in rows], pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


def docs_sorted_top(sf_dir: str):
    """Native distributed sort: documents ordered by (lang asc, n_chars
    desc, doc_id asc) — Ray Data's range-partitioned ``Dataset.sort``
    exercised end-to-end — truncated to the top 100 rows."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    out = (
        ds.sort(["lang", "n_chars", "doc_id"], descending=[False, True, False])
        .limit(100)
        .to_pandas()
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
            "lang": pa.array(out["lang"], pa.string()),
            "n_chars": pa.array(out["n_chars"].to_numpy(np.int64)),
        }
    )


QLD_MU = 500.0


def qld_topk(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """Query-likelihood Dirichlet ranking (Zhai & Lafferty 2001) over the
    SAME inverted index as BM25: per-term collection frequencies and the
    live token total come from one tiny shard round, scoring is dense
    per-shard with a driver top-k merge.  Oracle: the full smoothed LM
    in SQL (background model cf/|C|, candidates = docs with >=1 term)."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_qld(query, limit=limit, mu=QLD_MU)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


def qld_sql(query: str, limit: int = 20, mu: float = QLD_MU) -> str:
    """Pure-SQL Dirichlet query-likelihood — the oracle twin of
    ``QueryEngine.search_qld``: score = sum_t qtf_t * (ln(tf + mu*cf/|C|)
    - ln(dl + mu)) over docs containing >=1 query term; terms with no
    corpus occurrence drop out (inner join on cf)."""
    from ..functions.tokenizer import tokenize

    terms = tokenize(query)
    mult: Dict[str, int] = {}
    for t in terms:
        mult[t] = mult.get(t, 0) + 1
    qvalues = ", ".join(f"('{t}', {m})" for t, m in sorted(mult.items()))
    return f"""
WITH tok AS (SELECT doc_id, {_tok_sql('text')} AS toks FROM documents),
tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY doc_id, t
),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
tot AS (SELECT sum(dl) AS c FROM dl),
q(term, mult) AS (VALUES {qvalues}),
cand AS (SELECT DISTINCT tf.doc_id FROM tf JOIN q ON q.term = tf.term),
scored AS (
  SELECT cand.doc_id,
         sum(q.mult * (ln(COALESCE(tf.tf, 0) + {mu} * cf.cf / (SELECT c FROM tot))
                       - ln(dl.dl + {mu}))) AS score
  FROM cand
  CROSS JOIN q
  JOIN cf ON cf.term = q.term
  JOIN dl ON dl.doc_id = cand.doc_id
  LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.term = q.term
  GROUP BY cand.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rank,
       doc_id,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {limit}
"""


PHRASE_POS_QUERY = "table scan"


def phrase_positional(sf_dir: str, phrase: str = PHRASE_POS_QUERY, limit: int = 20):
    """Positional phrase search: BM25 over the phrase tokens restricted to
    docs containing them ADJACENTLY in token order (Lucene-PhraseQuery
    semantics over per-term position postings built with
    ``with_positions=True``).  Oracle: the shared BM25-in-SQL CTE + an
    ordered-token adjacency EXISTS (the SQL tokenizer is order-identical
    to the engine tokenizer)."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir, with_positions=True)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_phrase_positional(phrase, limit=limit)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


PHRASE_PROX_QUERY, PHRASE_PROX_SLOP = "stream data", 1


def phrase_proximity(sf_dir: str):
    """Ordered-proximity phrase search (slop=1): phrase tokens in order
    with at most one skipped token between neighbours.  Same positional
    machinery as phrase_positional; oracle uses the multi-index-variable
    gap-constraint EXISTS."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir, with_positions=True)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_phrase_positional(
            PHRASE_PROX_QUERY, limit=20, slop=PHRASE_PROX_SLOP
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


MPP_FIXED, MPP_PREFIX = "big order", "sc"


def match_phrase_prefix(sf_dir: str, limit: int = 20):
    """ES match_phrase_prefix: the fixed tokens adjacently in order,
    followed by ANY vocabulary term starting with the prefix (one
    lexicon prefix-range pushdown expands it; the expansion slot
    filters, scoring stays over the fixed tokens)."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir, with_positions=True)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_match_phrase_prefix(
            f"{MPP_FIXED} {MPP_PREFIX}", limit=limit
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


def bm25_function_score(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """ES function_score with field_value_factor(field=dl, modifier=
    sqrt): BM25 boosted by the IEEE-exact sqrt of each doc's token
    length before the threshold — longer docs rank up, bit-identically
    on both sides because sqrt is correctly rounded everywhere."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_function_score(query, limit=limit)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


DECAY_ORIGIN = 15  # gauss decay target doc length (tokens)
DECAY_SCALE = 10


def bm25_decay_gauss(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """ES function_score gauss DECAY on doc token length: score = BM25 *
    exp(-(dl-origin)^2 / (2*scale^2)) — docs near the target length rank
    up, the max*0.01 threshold applies to the decayed score.  The decay
    denominator is one shared double literal and (dl-origin)^2 is exact
    in both int and float, so both sides evaluate the identical
    expression tree through the same libm exp."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_decay_gauss(
            query, origin=DECAY_ORIGIN, scale=DECAY_SCALE, limit=limit
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


PINNED_IDS = [7, 3, 11]  # promoted in THIS order (ES pinned query)


def bm25_pinned(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """ES pinned query: the pinned ids rank FIRST in their given order
    (organic scores ignored for them), organic BM25 results follow with
    the pinned ids excluded — the editorial-curation shape.  The engine
    over-fetches ``limit + |pins|`` organic rows (threshold max stays
    corpus-wide and unmasked), drops the pinned, and fills the tail."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_pinned(query, PINNED_IDS, limit=limit)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "pinned": pa.array([int(h["pinned"]) for h in hits], pa.int64()),
            "score_micro": pa.array(
                [0 if h["pinned"] else int(x)
                 for h, x in zip(hits, _micro([h["score"] for h in hits]))],
                pa.int64(),
            ),
        }
    )


RF_WEIGHT = 2.5  # short binary mantissa: exact on both engines
RF_PIVOT = 30


def bm25_rank_feature(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """ES rank_feature (saturation function) as a bool-should clause:
    score = BM25 + 2.5 * dl/(dl+30) on every doc — the length feature
    promotes longer docs additively rather than multiplicatively, with
    the same expression tree on both sides (BIGINT/BIGINT division is
    IEEE double everywhere)."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_rank_feature(
            query, weight=RF_WEIGHT, pivot=RF_PIVOT, limit=limit
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


DF_WEIGHT = 3.0  # short binary mantissa: exact on both engines
DF_PIVOT = 7  # recency pivot in days
DF_MIX = 2654435761  # Knuth multiplicative hash constant (geo family)
DF_MOD = 3650  # derived age_days in [0, 3650)


def bm25_distance_feature(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """ES distance_feature query (recency boost) as a bool-should
    clause: score = BM25 + 3.0 * pivot/(pivot + age_days) — newer docs
    get a larger additive boost, with the standard distance_feature
    hyperbola.  The documents table carries no timestamp, so age_days
    is the deterministic hash mix ``(doc_id * 2654435761) % 3650``
    (the geo family's derived-attribute pattern); the feature
    expression tree is identical on both sides (DOUBLE / (INT +
    BIGINT))."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_rank_feature(
            query, weight=DF_WEIGHT, pivot=DF_PIVOT, limit=limit,
            mode="distance", age_mix=DF_MIX, age_mod=DF_MOD,
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


TOMBSTONE_LANG = "de"


def bm25_tombstone(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """BM25 top-k AFTER a tombstone delete of every lang='de' doc: partition
    files byte-untouched, alive mask + lex_ddf-corrected lexicon.  Oracle:
    the same BM25 SQL computed over ``documents WHERE lang <> 'de'`` — the
    delete must be indistinguishable from never having indexed those docs
    (surviving docs keep their original ids, so doc_id compares directly)."""
    from .build_index import tombstone_delete
    from .query import QueryEngine

    idx = _documents_index(sf_dir, variant="tomb")
    marker = os.path.join(idx, "_TOMB_DE")
    if not os.path.exists(marker):
        tombstone_delete(idx, "lang", TOMBSTONE_LANG)
        open(marker, "w").write("ok")
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search(query, limit=limit)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


def bm25_facets(sf_dir: str, query: str = BM25_QUERY):
    """Faceted search: language counts over the query's FULL thresholded
    result set — per-shard (facet, count) partials, per-doc rows never
    leave the shards."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        counts = engine.facets(query, facet_col="language")
    finally:
        engine.close()
    return pa.table(
        {
            "lang": pa.array(list(counts.keys()), pa.string()),
            "n_docs": pa.array(list(counts.values()), pa.int64()),
        }
    )


def bm25_count(sf_dir: str, query: str = BM25_QUERY):
    """ES ``_count`` API: the query's total thresholded match count,
    no hits fetched — only per-shard counts cross the wire."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        n = engine.count(query)
    finally:
        engine.close()
    return pa.table({"n": pa.array([n], pa.int64())})


def bm25_topk_lang(sf_dir: str):
    """BM25 with a post-scoring language filter (F3 semantics)."""
    return bm25_topk(sf_dir, query=BM25_QUERY_FILTERED, filters={"language": "en"})


def bm25_topk_wand(sf_dir: str):
    """Same query through the block-max WAND scorer — must be identical to
    the dense scorer, so it shares bm25_topk's SQL oracle."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search(BM25_QUERY, limit=20, method="wand")
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


# Boolean operators over the same scored token list as BM25_QUERY:
# "+join" is already a query term (MUST, still scores), "-hash" is an
# exclusion (MUST_NOT, never scores) — so this shares bm25_topk's scoring
# CTE with two membership predicates bolted onto the kept set.
BM25_BOOL_QUERY = "merge sort +join the data stream -hash"


def bm25_boolean(sf_dir: str, query: str = BM25_BOOL_QUERY, limit: int = 20):
    """BM25 with +term/-term boolean operators (Lucene MUST/MUST_NOT)."""
    return bm25_topk(sf_dir, query=query, limit=limit)


MLT_SRC_DOC = 7  # fixed find-similar source for the driver contract


def more_like_this(sf_dir: str, src: int = MLT_SRC_DOC, limit: int = 20):
    """Find-similar: BM25 over the source doc's top-25 tf*idf terms
    (Lucene/ES "more like this" shape on the reference's scoring
    contract), source doc excluded from the ranking."""
    import pyarrow.dataset as pads

    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    text = (
        pads.dataset(os.path.join(sf_dir, "documents.parquet"), format="parquet")
        .to_table(columns=["text"], filter=pads.field("doc_id") == src)["text"][0]
        .as_py()
    )
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        # Overfetch, then rank/truncate at micro grain: near-tied docs
        # (scores within 1e-6) must order by doc_id on BOTH sides of the
        # driver compare — the oracle's full-precision sums and the
        # engine's distributed idf sums disagree in the last ulp.
        hits = engine.more_like_this(src, limit=limit + 10, text=text)
    finally:
        engine.close()
    ids = np.array([h["doc_id"] for h in hits], np.int64)
    micro = np.asarray(_micro([h["score"] for h in hits]), np.int64)
    order = np.lexsort((ids, -micro))[:limit]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_micro": pa.array(micro[order], pa.int64()),
        }
    )


RESCORE_QUERY = BM25_QUERY  # primary ranking
RESCORE_SECONDARY = "hash table scan"  # window-priced secondary signal
RESCORE_WINDOW = 50
RESCORE_QW, RESCORE_RW = 1.0, 2.0  # short binary mantissas: float-exact


def bm25_rescore(sf_dir: str, limit: int = 20):
    """Elasticsearch ``rescore``: the primary BM25 top-``RESCORE_WINDOW``
    window re-ranked by ``qw*primary + rw*secondary``, the secondary BM25
    computed ONLY for window docs (O(window) point-score fan-out via
    ``IndexShard.scores_for`` — the expensive signal is priced per
    window, never per corpus).  Rank/truncate at micro grain so near-ulp
    ties order by doc_id on both sides of the driver compare."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_rescore(
            RESCORE_QUERY,
            RESCORE_SECONDARY,
            window=RESCORE_WINDOW,
            query_weight=RESCORE_QW,
            rescore_weight=RESCORE_RW,
            limit=RESCORE_WINDOW,  # overfetch: truncate at micro grain below
        )
    finally:
        engine.close()
    ids = np.array([h["doc_id"] for h in hits], np.int64)
    micro = np.asarray(_micro([h["score"] for h in hits]), np.int64)
    order = np.lexsort((ids, -micro))[:limit]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_micro": pa.array(micro[order], pa.int64()),
        }
    )


MM_QUERY = BM25_QUERY  # multi_match over the same reference query
MM_TITLE_K = 8  # "title" field = first 8 tokens of text, "body" = the rest
MM_BOOST_TITLE, MM_BOOST_BODY = 2.0, 1.0  # float-exact field boosts


def _mm_field_tfs(t: pa.Table, terms: List[str]):
    """Per-batch field decomposition for multi_match: tokenize ``text``
    vectorized, split each doc's token stream at ``MM_TITLE_K`` into
    title/body, and count per-term tfs per field with bincount segment
    sums (no Python loop over tokens — only over the handful of query
    terms).  Returns (doc_ids, dl_title, dl_body, tf_title, tf_body)
    where the tf entries are {term: int64[n]} dicts."""
    from ..functions.tokenizer import tokenize_array

    toks = tokenize_array(t["text"])
    n = len(toks)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    flat = toks.values
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], lens)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    is_title = pos < MM_TITLE_K
    dl_t = np.minimum(lens, MM_TITLE_K)
    dl_b = lens - dl_t
    tf_t: Dict[str, np.ndarray] = {}
    tf_b: Dict[str, np.ndarray] = {}
    for q in terms:
        hit = pcc.equal(flat, q).to_numpy(zero_copy_only=False).astype(bool)
        tf_t[q] = np.bincount(doc_idx[hit & is_title], minlength=n).astype(np.int64)
        tf_b[q] = np.bincount(doc_idx[hit & ~is_title], minlength=n).astype(np.int64)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, dl_t, dl_b, tf_t, tf_b


def multi_match_bm25f(sf_dir: str, query: str = MM_QUERY, limit: int = 20):
    """Elasticsearch ``multi_match`` (``most_fields``, BM25F shape): the
    query scores independently against a "title" field (first
    ``MM_TITLE_K`` tokens) and a "body" field (the rest), each with its
    OWN document length, average length, and document frequency; the doc
    score is ``2.0 * bm25_title + 1.0 * bm25_body``.  Field-level idf is
    Lucene's ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive, so
    no epsilon floor is involved at field granularity).

    Two streaming passes, no prebuilt index: a stats fold (N, per-field
    total length, per-field per-query-term df — one tiny partial row per
    batch, map-side combined) and a scoring pass with the broadcast
    stats, emitting per-block top-k partials (blocks x k wire cost).
    Rank/truncate at micro grain.  Oracle: two per-field scoring CTEs
    over the same list-slice field split."""
    from ..functions.tokenizer import tokenize

    qtoks = tokenize(query)
    terms = sorted(set(qtoks))
    mult = {t: qtoks.count(t) for t in terms}
    if not terms:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "score_micro": pa.array([], pa.int64())})
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_partial(t: pa.Table) -> pa.Table:
        _, dl_t, dl_b, tf_t, tf_b = _mm_field_tfs(t, terms)
        row = {
            "n": [len(dl_t)],
            "sum_dl_t": [int(dl_t.sum())],
            "sum_dl_b": [int(dl_b.sum())],
        }
        for i, q in enumerate(terms):
            row[f"df_t_{i}"] = [int(np.count_nonzero(tf_t[q]))]
            row[f"df_b_{i}"] = [int(np.count_nonzero(tf_b[q]))]
        return pa.table({k: pa.array(v, pa.int64()) for k, v in row.items()})

    agg = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()
        .sum(axis=0)
    )
    n_docs = int(agg["n"])
    avgdl_t = agg["sum_dl_t"] / n_docs
    avgdl_b = agg["sum_dl_b"] / n_docs
    idf_t = {
        q: float(np.log(1 + (n_docs - int(agg[f"df_t_{i}"]) + 0.5)
                        / (int(agg[f"df_t_{i}"]) + 0.5)))
        for i, q in enumerate(terms)
    }
    idf_b = {
        q: float(np.log(1 + (n_docs - int(agg[f"df_b_{i}"]) + 0.5)
                        / (int(agg[f"df_b_{i}"]) + 0.5)))
        for i, q in enumerate(terms)
    }
    k = limit + 10  # overfetch for the micro-grain driver truncation

    def score_block(t: pa.Table) -> pa.Table:
        ids, dl_t, dl_b, tf_t, tf_b = _mm_field_tfs(t, terms)
        score = np.zeros(len(ids), dtype=np.float64)
        for q in terms:  # sorted: deterministic accumulation order
            m = mult[q]
            tf = tf_t[q].astype(np.float64)
            score += (MM_BOOST_TITLE * m * idf_t[q] * tf * 2.5
                      / (tf + 1.5 * (1 - 0.75 + 0.75 * dl_t / avgdl_t)))
            tf = tf_b[q].astype(np.float64)
            score += (MM_BOOST_BODY * m * idf_b[q] * tf * 2.5
                      / (tf + 1.5 * (1 - 0.75 + 0.75 * dl_b / avgdl_b)))
        nz = np.flatnonzero(score > 0)
        top = nz[np.lexsort((ids[nz], -score[nz]))[:k]]
        return pa.table(
            {
                "doc_id": pa.array(ids[top], pa.int64()),
                "score": pa.array(score[top], pa.float64()),
            }
        )

    out = ds.map_batches(score_block, batch_format="pyarrow").to_pandas()
    ids = out["doc_id"].to_numpy(np.int64)
    micro = np.asarray(_micro(out["score"].to_numpy()), np.int64)
    order = np.lexsort((ids, -micro))[:limit]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_micro": pa.array(micro[order], pa.int64()),
        }
    )


# combined_fields boosts act as integer tf/length multipliers
CF_BOOST_TITLE, CF_BOOST_BODY = 2, 1


def combined_fields_bm25(sf_dir: str, query: str = MM_QUERY, limit: int = 20):
    """Elasticsearch ``combined_fields`` query (term-centric BM25F,
    Lucene's CombinedFieldQuery): the fields merge into ONE pseudo-field
    BEFORE scoring — ``tf_c = 2*tf_title + tf_body`` and ``dl_c =
    2*dl_title + dl_body`` (both integers: the field boosts act as term-
    frequency multipliers), one combined df/idf/avgdl, one BM25 kernel
    per term.  The term-centric dual of ``multi_match_bm25f``'s
    field-centric most_fields (bm25 per field, then weighted sum).

    Same scale shape: a map-side stats fold (one tiny partial row per
    batch) + a broadcast-stats scoring pass emitting per-block top-k
    partials; the text never shuffles.  Oracle: the identical combined
    tf/dl algebra as SQL CTEs."""
    from ..functions.tokenizer import tokenize

    qtoks = tokenize(query)
    terms = sorted(set(qtoks))
    mult = {t: qtoks.count(t) for t in terms}
    if not terms:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "score_micro": pa.array([], pa.int64())})
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_partial(t: pa.Table) -> pa.Table:
        _, dl_t, dl_b, tf_t, tf_b = _mm_field_tfs(t, terms)
        dlc = CF_BOOST_TITLE * dl_t + CF_BOOST_BODY * dl_b
        row = {"n": [len(dlc)], "sum_dlc": [int(dlc.sum())]}
        for i, q in enumerate(terms):
            tfc = CF_BOOST_TITLE * tf_t[q] + CF_BOOST_BODY * tf_b[q]
            row[f"df_{i}"] = [int(np.count_nonzero(tfc))]
        return pa.table({k: pa.array(v, pa.int64()) for k, v in row.items()})

    agg = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()
        .sum(axis=0)
    )
    n_docs = int(agg["n"])
    avgdl = agg["sum_dlc"] / n_docs
    idf = {
        q: float(np.log(1 + (n_docs - int(agg[f"df_{i}"]) + 0.5)
                        / (int(agg[f"df_{i}"]) + 0.5)))
        for i, q in enumerate(terms)
    }
    k = limit + 10  # overfetch for the micro-grain driver truncation

    def score_block(t: pa.Table) -> pa.Table:
        ids, dl_t, dl_b, tf_t, tf_b = _mm_field_tfs(t, terms)
        dlc = (CF_BOOST_TITLE * dl_t + CF_BOOST_BODY * dl_b).astype(np.float64)
        score = np.zeros(len(ids), dtype=np.float64)
        for q in terms:  # sorted: deterministic accumulation order
            tf = (CF_BOOST_TITLE * tf_t[q] + CF_BOOST_BODY * tf_b[q]).astype(
                np.float64
            )
            score += (mult[q] * idf[q] * tf * 2.5
                      / (tf + 1.5 * (1 - 0.75 + 0.75 * dlc / avgdl)))
        nz = np.flatnonzero(score > 0)
        top = nz[np.lexsort((ids[nz], -score[nz]))[:k]]
        return pa.table(
            {
                "doc_id": pa.array(ids[top], pa.int64()),
                "score": pa.array(score[top], pa.float64()),
            }
        )

    out = ds.map_batches(score_block, batch_format="pyarrow").to_pandas()
    ids = out["doc_id"].to_numpy(np.int64)
    micro = np.asarray(_micro(out["score"].to_numpy()), np.int64)
    order = np.lexsort((ids, -micro))[:limit]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_micro": pa.array(micro[order], pa.int64()),
        }
    )


SNIPPET_WINDOW = 12


def snippet_windows(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """Query-dependent snippet extraction (Lucene-highlighter shape):
    for each BM25 top-k doc, the ``SNIPPET_WINDOW``-token window of its
    text containing the most DISTINCT query terms (earliest start on
    ties).  Oracle: the shared BM25-in-SQL CTE + a window-count
    grouped-LEFT-JOIN tail."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.snippets(query, limit=limit, window=SNIPPET_WINDOW)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "win_start": pa.array([h["win_start"] for h in hits], pa.int64()),
            "n_terms": pa.array([h["n_terms"] for h in hits], pa.int64()),
        }
    )


RM3_FB_K = 5  # feedback depth for the driver contract
RM3_N_EXP = 5  # expansion terms


def bm25_rm3(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """Pseudo-relevance-feedback retrieval (RM3/Rocchio shape): BM25
    top-``RM3_FB_K`` feedback docs -> top-``RM3_N_EXP`` non-query terms
    by integer-summed tf*idf -> expanded query re-ranked with ordinary
    BM25.  Oracle: the two-pass BM25-in-SQL twin (``bm25_rm3_sql``).

    Like ``more_like_this``: overfetch then rank/truncate at micro
    grain — the expanded query sums ~10 per-term float contributions,
    so near-ties must order by doc_id on both sides."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_rm3(
            query, limit=limit + 10, fb_k=RM3_FB_K, n_exp=RM3_N_EXP
        )
    finally:
        engine.close()
    ids = np.array([h["doc_id"] for h in hits], np.int64)
    micro = np.asarray(_micro([h["score"] for h in hits]), np.int64)
    order = np.lexsort((ids, -micro))[:limit]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_micro": pa.array(micro[order], pa.int64()),
        }
    )


_TOKENIZE_SQL = r"""list_filter(regexp_split_to_array(
    regexp_replace(regexp_replace(lower(
      regexp_replace(regexp_replace({col},'([a-z])([A-Z])','\1 \2','g'),
                     '([A-Z]+)([A-Z][a-z])','\1 \2','g')),
      '[_\-./\\]',' ','g'),'[^a-z0-9\s]',' ','g'),'\s+'),
    x -> length(x) >= 2)"""


def _tok_sql(col: str) -> str:
    return _TOKENIZE_SQL.format(col=col)


# whitespace-token count of documents.text — the same expression
# token_totals' oracle uses, shared by the packing/quantile oracles
_WS_TOKENS_SQL = (
    "CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), "
    "x -> length(x) > 0)) AS BIGINT)"
)


def _hash_u32_sql(col: str) -> str:
    from ..stages.sampling import hash_u32_sql

    return hash_u32_sql(col)


def bm25_sql(
    query: str,
    limit: int = 20,
    lang_filter: Optional[str] = None,
    facet: bool = False,
    mlt_src: Optional[int] = None,
    max_terms: int = 25,
    required: Optional[List[str]] = None,
    excluded: Optional[List[str]] = None,
    phrase_adjacent: bool = False,
    phrase_prefix: Optional[str] = None,
    boost_sqrt_dl: bool = False,
    rank_feature: Optional[Tuple[float, int]] = None,
    distance_feature: Optional[Tuple[float, int]] = None,
    terms_set_dl: Optional[tuple] = None,
    slop: int = 0,
    corpus_where: Optional[str] = None,
    snippet_window: Optional[int] = None,
    offset: int = 0,
    collapse: bool = False,
    fuzzy_dist: Optional[int] = None,
    fuzzy_max_exp: int = 50,
    min_match: Optional[int] = None,
    micro_rank: bool = False,
    explain: bool = False,
    demote_terms: Optional[List[str]] = None,
    demote_boost: float = 0.5,
    span_first: Optional[Tuple[str, int]] = None,
    span_not: Optional[Tuple[str, str, int]] = None,
    span_near: Optional[Tuple[str, str, int]] = None,
    span_containing: Optional[Tuple[str, str, str, int]] = None,
    span_within: Optional[Tuple[str, str, str, str, int]] = None,
    common_cutoff_milli: Optional[int] = None,
    wildcard: Optional[str] = None,
    wildcard_max: int = 64,
    regexp: Optional[str] = None,
    term_range: Optional[Tuple[str, str]] = None,
    decay_gauss: Optional[Tuple[int, float]] = None,
    pinned_ids: Optional[List[int]] = None,
    bool_prefix: Optional[str] = None,
    top_hits_k: Optional[int] = None,
    top_hits_groups: int = 10,
) -> str:
    """Pure-SQL BM25Okapi (k1=1.5 b=0.75 eps=0.25) over documents.text.

    ``facet=True`` replaces the ranked top-k tail with language counts
    over the full thresholded result set (the faceted-search oracle).
    ``mlt_src`` switches the query-term source from ``query`` to the
    more-like-this selection: doc ``mlt_src``'s top ``max_terms`` terms
    by tf*idf (term-asc tie-break), source doc excluded from the final
    ranking but included in the threshold max — mirroring
    ``QueryEngine.more_like_this`` exactly.
    ``required``/``excluded`` mirror the +term/-term boolean operators:
    post-threshold membership predicates on the tokenized docs (the
    threshold max stays unmasked, exactly like the engine)."""
    from ..functions.tokenizer import tokenize

    if mlt_src is not None:
        # Term weights quantized to 1e-6 (matches QueryEngine.more_like_this)
        # so the max_terms cut is stable under last-ulp idf noise.
        q_cte = f"""q AS (
  SELECT term, 1 AS mult FROM (
    SELECT tf.term AS term,
           CAST(floor(tf.tf * idf.idf * 1000000 + 0.5) AS BIGINT) AS w
    FROM tf JOIN idf ON idf.term = tf.term
    WHERE tf.doc_id = {mlt_src}
    ORDER BY w DESC, term ASC LIMIT {max_terms}
  )
)"""
        not_src = f"WHERE doc_id <> {mlt_src} "
    elif wildcard is not None:
        # scored wildcard search: the pattern expands against the global
        # vocabulary (df desc, term asc, capped — LexiconReader.expand's
        # exact ordering) and the expansions score as ordinary OR'd BM25
        # terms with mult=1 (QueryEngine._wildcard_tokens)
        like = wildcard.replace("*", "%").replace("?", "_")
        q_cte = f"""q AS (
  SELECT term, 1 AS mult FROM (
    SELECT term FROM df WHERE term LIKE '{like}'
    ORDER BY df DESC, term ASC LIMIT {wildcard_max}
  )
)"""
        not_src = ""
    elif bool_prefix is not None:
        # ES match_bool_prefix: the leading chunks tokenize to regular
        # terms (duplicates keep their multiplicity), the final chunk is
        # a prefix expansion (df desc, term asc, capped) — a term hit by
        # both paths scores with the summed multiplicity, exactly like
        # QueryEngine._wildcard_tokens' concatenated token list.
        lead_toks = tokenize(query)
        qtvals = ", ".join(f"('{t}')" for t in lead_toks)
        q_cte = f"""q AS (
  SELECT term, CAST(count(*) AS BIGINT) AS mult FROM (
    SELECT t AS term FROM (VALUES {qtvals}) AS qt(t)
    UNION ALL
    SELECT term FROM (
      SELECT term FROM df WHERE term LIKE '{bool_prefix}%'
      ORDER BY df DESC, term ASC LIMIT {wildcard_max}
    )
  ) GROUP BY term
)"""
        not_src = ""
    elif term_range is not None:
        # Lucene TermRangeQuery: the vocabulary slice [lo, hi) cut to the
        # top wildcard_max by (df desc, term asc) — the scoring rewrite's
        # cap — scored as OR'd BM25 terms with mult=1
        # (LexiconReader.expand_range / QueryEngine.search_term_range)
        tr_lo, tr_hi = term_range
        q_cte = f"""q AS (
  SELECT term, 1 AS mult FROM (
    SELECT term FROM df WHERE term >= '{tr_lo}' AND term < '{tr_hi}'
    ORDER BY df DESC, term ASC LIMIT {wildcard_max}
  )
)"""
        not_src = ""
    elif regexp is not None:
        # Lucene regexp query: anchored FULL match against the vocabulary
        # (df desc, term asc, capped — LexiconReader.expand_regex), the
        # matches scored as OR'd BM25 terms with mult=1.  DuckDB's
        # regexp_full_match is RE2, same engine as the lexicon scan.
        q_cte = f"""q AS (
  SELECT term, 1 AS mult FROM (
    SELECT term FROM df WHERE regexp_full_match(term, '{regexp}')
    ORDER BY df DESC, term ASC LIMIT {wildcard_max}
  )
)"""
        not_src = ""
    elif fuzzy_dist is not None:
        # fuzzy expansion in SQL: each query token picks the vocab terms
        # within fuzzy_dist edits, ranked (dist asc, df desc, term asc)
        # and capped per token; a term matched by k tokens gets mult=k
        # (mirrors QueryEngine.search_fuzzy / LexiconReader.suggest)
        qtvals = ", ".join(
            f"({i}, '{t}')" for i, t in enumerate(tokenize(query))
        )
        q_cte = f"""q AS (
  SELECT term, CAST(count(*) AS BIGINT) AS mult FROM (
    SELECT qt.i, d.term
    FROM (VALUES {qtvals}) AS qt(i, t)
    JOIN df d ON levenshtein(d.term, qt.t) <= {fuzzy_dist}
    QUALIFY row_number() OVER (
      PARTITION BY qt.i
      ORDER BY levenshtein(d.term, qt.t) ASC, d.df DESC, d.term ASC
    ) <= {fuzzy_max_exp}
  ) GROUP BY term
)"""
        not_src = ""
    else:
        terms = tokenize(query)
        # duplicates in the query multiply their term's contribution
        mult: Dict[str, int] = {}
        for t in terms:
            mult[t] = mult.get(t, 0) + 1
        qvalues = ", ".join(f"('{t}', {m})" for t, m in sorted(mult.items()))
        q_cte = f"q(term, mult) AS (VALUES {qvalues})"
        not_src = ""
    filt = f"AND lang = '{lang_filter}'" if lang_filter else ""
    for t in required or ():
        filt += f"\n  AND doc_id IN (SELECT doc_id FROM tf WHERE term = '{t}')"
    if min_match is not None:
        msm_terms = ", ".join(f"'{t}'" for t in sorted(set(tokenize(query))))
        filt += (
            "\n  AND doc_id IN (SELECT doc_id FROM tf"
            f" WHERE term IN ({msm_terms})"
            f" GROUP BY doc_id HAVING count(DISTINCT term) >= {min_match})"
        )
    if terms_set_dl is not None:
        # ES terms_set (minimum_should_match_field): per-doc required
        # distinct-term count — low below the dl threshold, high at or
        # above it (IndexShard.search_terms_set's exact predicate)
        ts_thr, ts_lo, ts_hi = terms_set_dl
        ts_terms = ", ".join(f"'{t}'" for t in sorted(set(tokenize(query))))
        filt += (
            "\n  AND doc_id IN (SELECT t2.doc_id FROM tf t2"
            " JOIN dl ON dl.doc_id = t2.doc_id"
            f" WHERE t2.term IN ({ts_terms})"
            " GROUP BY t2.doc_id, dl.dl"
            " HAVING count(DISTINCT t2.term) >="
            f" CASE WHEN dl.dl >= {ts_thr} THEN {ts_hi} ELSE {ts_lo} END)"
        )
    for t in excluded or ():
        filt += f"\n  AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = '{t}')"
    if span_first is not None:
        # Lucene span_first: first occurrence of the span term within the
        # first n positions (list_position is 1-based first index)
        sp_t, sp_n = span_first
        filt += (
            "\n  AND doc_id IN (SELECT doc_id FROM tok"
            f" WHERE list_position(toks, '{sp_t}') IS NOT NULL"
            f" AND list_position(toks, '{sp_t}') <= {sp_n})"
        )
    if common_cutoff_milli is not None:
        # Lucene CommonTermsQuery: low-frequency query terms (df/N <=
        # cutoff, integer millis compare — absent terms classify low at
        # df=0) are MUST clauses; the doc must contain every one.  The
        # threshold max stays unmasked, like the engine's required terms.
        ct_qt = ", ".join(f"('{t}')" for t in sorted(set(tokenize(query))))
        lowq = (
            f"(SELECT DISTINCT t AS term FROM (VALUES {ct_qt}) v(t)"
            " WHERE (SELECT coalesce(max(df), 0) FROM df"
            " WHERE df.term = v.t) * 1000"
            f" <= {common_cutoff_milli} * (SELECT n FROM stats))"
        )
        filt += (
            f"\n  AND ((SELECT count(*) FROM {lowq} lq0) = 0"
            " OR doc_id IN ("
            f"SELECT tf.doc_id FROM tf JOIN {lowq} lq ON lq.term = tf.term"
            " GROUP BY tf.doc_id"
            f" HAVING count(DISTINCT tf.term) = (SELECT count(*) FROM {lowq} lq2)))"
        )
    if span_near is not None:
        # Lucene span_near unordered: some a-position within window of
        # some b-position (1-based subscripts; differences base-invariant)
        sa_t, sb_t, sn_w = span_near
        pos_sub2 = (
            "SELECT doc_id, toks[CAST(i AS INT)] AS t, CAST(i AS BIGINT) AS p"
            " FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i"
            " FROM tok)"
        )
        filt += (
            "\n  AND doc_id IN (SELECT DISTINCT pa.doc_id"
            f" FROM ({pos_sub2}) pa JOIN ({pos_sub2}) pb"
            " ON pb.doc_id = pa.doc_id"
            f" WHERE pa.t = '{sa_t}' AND pb.t = '{sb_t}'"
            f" AND abs(pa.p - pb.p) <= {sn_w})"
        )
    if span_containing is not None:
        # Lucene span_containing: an ordered a..b span of width <= W
        # contains a c-occurrence — exists (pa, pb, pc) with
        # pa <= pc <= pb and pb - pa <= W (1-based subscripts; the
        # differences and orderings are base-invariant)
        sc_a, sc_b, sc_c, sc_w = span_containing
        pos_sub3 = (
            "SELECT doc_id, toks[CAST(i AS INT)] AS t, CAST(i AS BIGINT) AS p"
            " FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i"
            " FROM tok)"
        )
        filt += (
            "\n  AND doc_id IN (SELECT DISTINCT pc.doc_id"
            f" FROM ({pos_sub3}) pc"
            f" JOIN ({pos_sub3}) pa ON pa.doc_id = pc.doc_id"
            f" JOIN ({pos_sub3}) pb ON pb.doc_id = pc.doc_id"
            f" WHERE pc.t = '{sc_c}' AND pa.t = '{sc_a}' AND pb.t = '{sc_b}'"
            f" AND pa.p <= pc.p AND pc.p <= pb.p AND pb.p - pa.p <= {sc_w})"
        )
    if span_within is not None:
        # Lucene span_within (doc level): the adjacent little phrase
        # c d lies within some ordered a..b span of width <= W —
        # exists (pa, pb, pc, pd) with pd = pc + 1, pa <= pc,
        # pd <= pb and pb - pa <= W
        sw_a, sw_b, sw_c, sw_d, sw_w = span_within
        pos_sub4 = (
            "SELECT doc_id, toks[CAST(i AS INT)] AS t, CAST(i AS BIGINT) AS p"
            " FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i"
            " FROM tok)"
        )
        filt += (
            "\n  AND doc_id IN (SELECT DISTINCT pc.doc_id"
            f" FROM ({pos_sub4}) pc"
            f" JOIN ({pos_sub4}) pd ON pd.doc_id = pc.doc_id"
            " AND pd.p = pc.p + 1"
            f" JOIN ({pos_sub4}) pa ON pa.doc_id = pc.doc_id"
            f" JOIN ({pos_sub4}) pb ON pb.doc_id = pc.doc_id"
            f" WHERE pc.t = '{sw_c}' AND pd.t = '{sw_d}'"
            f" AND pa.t = '{sw_a}' AND pb.t = '{sw_b}'"
            f" AND pa.p <= pc.p AND pd.p <= pb.p"
            f" AND pb.p - pa.p <= {sw_w})"
        )
    if span_not is not None:
        # Lucene span_not: some include-position farther than dist from
        # EVERY exclude-position (position differences are base-invariant,
        # so 1-based subscripts here match the 0-based index positions)
        sn_inc, sn_exc, sn_d = span_not
        pos_sub = (
            "SELECT doc_id, toks[CAST(i AS INT)] AS t, CAST(i AS BIGINT) AS p"
            " FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i"
            " FROM tok)"
        )
        filt += (
            "\n  AND doc_id IN (SELECT DISTINCT pi.doc_id"
            f" FROM ({pos_sub}) pi WHERE pi.t = '{sn_inc}'"
            " AND NOT EXISTS ("
            f"SELECT 1 FROM ({pos_sub}) pe WHERE pe.t = '{sn_exc}'"
            " AND pe.doc_id = pi.doc_id"
            f" AND abs(pe.p - pi.p) <= {sn_d}))"
        )
    boost_expr, boost_join = "", ""
    if rank_feature is not None:
        # ES rank_feature saturation as a bool-should clause: additive
        # weight * dl/(dl+pivot) on EVERY doc (scores_all semantics);
        # BIGINT/BIGINT division is double on both engines, same tree
        rf_w, rf_p = rank_feature
        boost_expr = f" + {rf_w} * (bdl.dl / (bdl.dl + {rf_p}))"
        boost_join = " JOIN dl bdl ON bdl.doc_id = d.doc_id"
    if distance_feature is not None:
        # ES distance_feature (recency hyperbola) on the hash-derived
        # age_days — same tree as the shard: DOUBLE / (INT + BIGINT)
        df_w, df_p = distance_feature
        boost_expr = (
            f" + {df_w} * ({float(df_p)!r} / ({df_p}"
            f" + (d.doc_id * {DF_MIX}) % {DF_MOD}))"
        )
    if boost_sqrt_dl:
        # function_score field_value_factor(sqrt): multiplies INSIDE
        # scores_all, before the threshold max — identical placement to
        # IndexShard.search_function_score; sqrt is IEEE-correctly-
        # rounded so both sides stay bit-identical
        boost_expr = " * sqrt(bdl.dl)"
        boost_join = " JOIN dl bdl ON bdl.doc_id = d.doc_id"
    if decay_gauss is not None:
        # function_score gauss decay on dl: (dl-origin)^2 is exact BIGINT
        # arithmetic cast to the same double the engine's float square
        # produces; denom is one shared double literal; exp is the same
        # libm on both engines (IndexShard.search_decay)
        dg_o, dg_denom = decay_gauss
        boost_expr = (
            f" * exp(-(CAST((bdl.dl - {dg_o}) * (bdl.dl - {dg_o})"
            f" AS DOUBLE)) / {dg_denom!r})"
        )
        boost_join = " JOIN dl bdl ON bdl.doc_id = d.doc_id"
    demote_expr = ""
    if demote_terms:
        dterms = ", ".join(f"'{t}'" for t in sorted(set(demote_terms)))
        # boosting query: demotion multiplies INSIDE scores_all, before
        # the threshold max — identical placement to the shard scorer's
        # demote; keep the boost a short binary mantissa for exactness
        demote_expr = (
            f" * (CASE WHEN d.doc_id IN (SELECT doc_id FROM tf"
            f" WHERE term IN ({dterms})) THEN {demote_boost} ELSE 1.0 END)"
        )
    if phrase_adjacent:
        # ordered-token adjacency / proximity (positional phrase): the SQL
        # tokenizer preserves token order.  slop=0: one index variable with
        # fixed offsets; slop>0: one index variable per token with pairwise
        # gap constraints 1..slop+1 (the engine's window-chain semantics).
        # The threshold max stays over ALL docs (adjacency filters after,
        # like lang filters — exactly QueryEngine.search_phrase_positional)
        ptoks = tokenize(query)
        k = len(ptoks)
        if slop == 0:
            cond_list = [
                f"toks[CAST(i AS BIGINT) + {j}] = '{t}'" for j, t in enumerate(ptoks)
            ]
            if phrase_prefix is not None:
                # match_phrase_prefix: one extra final slot matched by
                # ANY token with the prefix (scoring stays over ptoks)
                cond_list.append(
                    f"starts_with(toks[CAST(i AS BIGINT) + {k}],"
                    f" '{phrase_prefix}')"
                )
                k += 1
            conds = " AND ".join(cond_list)
            filt += (
                "\n  AND doc_id IN (SELECT doc_id FROM tok"
                f" WHERE len(toks) >= {k} AND EXISTS ("
                f"SELECT 1 FROM UNNEST(range(1, len(toks) - {k} + 2)) AS u(i)"
                f" WHERE {conds}))"
            )
        else:
            # positions self-join chain (multiple correlated UNNESTs inside
            # one EXISTS hit a DuckDB internal error)
            posn = (
                "(SELECT doc_id, unnest(toks) AS term,"
                " generate_subscripts(toks, 1) AS pos FROM tok)"
            )
            joins = "".join(
                f"\n    JOIN {posn} p{j} ON p{j}.doc_id = p0.doc_id"
                f" AND p{j}.term = '{ptoks[j]}'"
                f" AND p{j}.pos - p{j - 1}.pos BETWEEN 1 AND {slop + 1}"
                for j in range(1, k)
            )
            filt += (
                f"\n  AND doc_id IN (SELECT p0.doc_id FROM {posn} p0{joins}"
                f"\n    WHERE p0.term = '{ptoks[0]}')"
            )
    if snippet_window is not None:
        # best snippet window per top-k doc: the W-token window with the
        # most DISTINCT query terms, earliest start on ties (the SQL twin
        # of QueryEngine.snippets; subscripts are 1-based -> emit i-1)
        w = snippet_window
        qterms = ", ".join(f"'{t}'" for t in sorted(set(tokenize(query))))
        final = f"""topk AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rank
  FROM kept ORDER BY score DESC, doc_id ASC LIMIT {limit}
),
lens AS (SELECT t.doc_id, len(t.toks) AS n FROM tok t JOIN topk USING (doc_id)),
starts AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i
  FROM lens, unnest(generate_series(1, greatest(n - {w} + 1, 1))) AS g(i)
),
pos AS (
  SELECT t.doc_id, unnest(t.toks) AS term, generate_subscripts(t.toks, 1) AS p
  FROM tok t JOIN topk USING (doc_id)
),
wcnt AS (
  SELECT s.doc_id, s.i, count(DISTINCT p.term) AS n_terms
  FROM starts s LEFT JOIN pos p
    ON p.doc_id = s.doc_id AND p.p BETWEEN s.i AND s.i + {w} - 1
   AND p.term IN ({qterms})
  GROUP BY s.doc_id, s.i
),
best AS (
  SELECT doc_id, i, n_terms,
         row_number() OVER (PARTITION BY doc_id ORDER BY n_terms DESC, i ASC) AS rn
  FROM wcnt
)
SELECT k.rank, k.doc_id,
       CAST(b.i - 1 AS BIGINT) AS win_start,
       CAST(b.n_terms AS BIGINT) AS n_terms
FROM topk k JOIN best b ON b.doc_id = k.doc_id AND b.rn = 1
ORDER BY k.rank"""
        # the snippet final clause opens with its own CTEs, so splice it
        # into the WITH chain instead of after it
        final = "-- CTE-splice\n," + final
    elif explain:
        # per-term score decomposition of the top-k hits (_explain): one
        # row per (winning doc, matched query term) with tf/df/idf and
        # the term's BM25 contribution — identical expression tree to
        # QueryEngine.explain
        final = f"""topk AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rank
  FROM kept ORDER BY score DESC, doc_id ASC LIMIT {limit}
)
SELECT k.rank, tf.doc_id, tf.term,
       CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
       CAST(floor(idf.idf * 1000000 + 0.5) AS BIGINT) AS idf_micro,
       CAST(floor(q.mult * idf.idf * tf.tf * 2.5 /
            (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
            * 1000000 + 0.5) AS BIGINT) AS contrib_micro
FROM topk k
JOIN tf ON tf.doc_id = k.doc_id
JOIN q ON q.term = tf.term
JOIN df ON df.term = tf.term
JOIN idf ON idf.term = tf.term
JOIN dl ON dl.doc_id = k.doc_id
ORDER BY k.rank, tf.term"""
        final = "-- CTE-splice\n," + final
    elif top_hits_k is not None:
        # top_hits inside a terms agg: top k hits per lang bucket,
        # buckets ranked by their best hit — QueryEngine.top_hits' twin
        final = f"""SELECT gr.grp_rank, h.lang, h.hit_rank, h.doc_id,
       CAST(floor(h.score * 1000000 + 0.5) AS BIGINT) AS score_micro
FROM (SELECT lang, doc_id, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score DESC, doc_id ASC) - 1 AS hit_rank
      FROM kept) h
JOIN (SELECT lang,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS grp_rank
      FROM (SELECT lang, doc_id, score,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY score DESC, doc_id ASC) AS rn
            FROM kept) WHERE rn = 1) gr USING (lang)
WHERE h.hit_rank < {top_hits_k} AND gr.grp_rank < {top_hits_groups}
ORDER BY gr.grp_rank, h.hit_rank"""
    elif collapse:
        # field collapsing: best (score desc, doc_id asc) hit per lang,
        # groups ranked by their best hit — the SQL twin of
        # QueryEngine.collapse
        final = f"""SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rank,
       lang, doc_id,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
FROM (SELECT lang, doc_id, score,
             row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS rn
      FROM kept)
WHERE rn = 1
ORDER BY score DESC, doc_id ASC LIMIT {limit}"""
    elif facet:
        final = "SELECT lang, count(*) AS n_docs FROM kept GROUP BY lang ORDER BY lang"
    elif mlt_src is not None:
        # Rank/truncate at micro grain (see more_like_this): near-tied
        # docs order by doc_id identically on both sides of the compare.
        final = f"""SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) - 1 AS rank,
       doc_id, score_micro
FROM (SELECT doc_id, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM kept {not_src})
ORDER BY score_micro DESC, doc_id ASC LIMIT {limit}"""
    elif pinned_ids is not None:
        # ES pinned query: pins first in their GIVEN order with sentinel
        # scores, organic kept rows follow excluding the pins (threshold
        # max stayed corpus-wide above); one rank axis, one LIMIT
        pin_rows = ", ".join(
            f"({i}, {d}, 1, 0)" for i, d in enumerate(pinned_ids)
        )
        not_in = ", ".join(str(d) for d in pinned_ids)
        final = f"""SELECT CAST(rank AS BIGINT) AS rank, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(pinned AS BIGINT) AS pinned, CAST(score_micro AS BIGINT) AS score_micro
FROM (
  SELECT * FROM (VALUES {pin_rows}) p(rank, doc_id, pinned, score_micro)
  UNION ALL
  SELECT {len(pinned_ids)} - 1
           + row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, 0 AS pinned,
         CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
  FROM kept WHERE doc_id NOT IN ({not_in})
) ORDER BY rank LIMIT {limit}"""
    elif micro_rank:
        # micro-grain ranking (see more_like_this): near-ulp ties order
        # by doc_id identically on both sides of the compare
        final = f"""SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) - 1 AS rank,
       doc_id, score_micro
FROM (SELECT doc_id, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM kept)
ORDER BY score_micro DESC, doc_id ASC LIMIT {limit}"""
    else:
        off = f" OFFSET {offset}" if offset else ""
        final = f"""SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rank,
       doc_id,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
FROM kept ORDER BY score DESC, doc_id ASC LIMIT {limit}{off}"""
    corpus_pred = f" WHERE {corpus_where}" if corpus_where else ""
    return f"""
WITH src AS (SELECT * FROM documents{corpus_pred}),
tok AS (
  SELECT doc_id, {_tok_sql('text')} AS toks FROM src
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM tok),
tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY doc_id, t
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
idf0 AS (
  SELECT term, ln((SELECT n FROM stats) - df + 0.5) - ln(df + 0.5) AS idf_raw
  FROM df
),
eps AS (SELECT 0.25 * avg(idf_raw) AS e FROM idf0),
idf AS (
  SELECT term,
         CASE WHEN idf_raw < 0 THEN (SELECT e FROM eps) ELSE idf_raw END AS idf
  FROM idf0
),
{q_cte},
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
scores AS (
  SELECT tf.doc_id,
         sum(q.mult * idf.idf * tf.tf * 2.5 /
             (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))) AS score
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY tf.doc_id
),
scores_all AS (
  -- the reference scores EVERY doc (zeros for no-match); the max that feeds
  -- the threshold and the max<=0 keep-all branch both include those zeros
  SELECT d.doc_id, d.lang, COALESCE(s.score, 0){demote_expr}{boost_expr} AS score
  FROM src d LEFT JOIN scores s ON s.doc_id = d.doc_id{boost_join}
),
mx AS (SELECT max(score) AS m FROM scores_all),
kept AS (
  SELECT doc_id, lang, score FROM scores_all
  WHERE ((SELECT m FROM mx) <= 0 OR score >= 0.01 * (SELECT m FROM mx)) {filt}
)
{final}
"""


def bm25_rm3_sql(query: str, fb_k: int, n_exp: int, limit: int = 20) -> str:
    """Two-pass pseudo-relevance-feedback BM25 in SQL — the oracle twin
    of ``QueryEngine.search_rm3``.  Pass 0 is the standard BM25 CTE body
    (identical to ``bm25_sql``, including the epsilon floor and the
    max<=0 keep-all threshold branch); the top ``fb_k`` kept docs feed
    the expansion: per-(doc, term) tf*idf quantized to 1e-6 BEFORE the
    integer sum (order-independent, exactly the engine's arithmetic),
    original query terms excluded, top ``n_exp`` by (weight desc, term
    asc).  Pass 1 re-scores with the expanded term multiset (originals
    keep their multiplicity, expansions count once)."""
    from ..functions.tokenizer import tokenize

    terms = tokenize(query)
    mult: Dict[str, int] = {}
    for t in terms:
        mult[t] = mult.get(t, 0) + 1
    qvalues = ", ".join(f"('{t}', {m})" for t, m in sorted(mult.items()))
    notin = ", ".join(f"'{t}'" for t in sorted(mult))
    score_expr = """sum(q{p}.mult * idf.idf * tf.tf * 2.5 /
             (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats))))"""
    return f"""
WITH tok AS (
  SELECT doc_id, {_tok_sql('text')} AS toks FROM documents
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM tok),
tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY doc_id, t
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
idf0 AS (
  SELECT term, ln((SELECT n FROM stats) - df + 0.5) - ln(df + 0.5) AS idf_raw
  FROM df
),
eps AS (SELECT 0.25 * avg(idf_raw) AS e FROM idf0),
idf AS (
  SELECT term,
         CASE WHEN idf_raw < 0 THEN (SELECT e FROM eps) ELSE idf_raw END AS idf
  FROM idf0
),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
q0(term, mult) AS (VALUES {qvalues}),
scores0 AS (
  SELECT tf.doc_id,
         {score_expr.format(p='0')} AS score
  FROM tf
  JOIN q0 ON q0.term = tf.term
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY tf.doc_id
),
scores_all0 AS (
  SELECT d.doc_id, COALESCE(s.score, 0) AS score
  FROM documents d LEFT JOIN scores0 s ON s.doc_id = d.doc_id
),
mx0 AS (SELECT max(score) AS m FROM scores_all0),
fb AS (
  SELECT doc_id FROM scores_all0
  WHERE ((SELECT m FROM mx0) <= 0 OR score >= 0.01 * (SELECT m FROM mx0))
  ORDER BY score DESC, doc_id ASC LIMIT {fb_k}
),
expw AS (
  SELECT tf.term,
         sum(CAST(floor(tf.tf * idf.idf * 1000000 + 0.5) AS BIGINT)) AS w
  FROM tf JOIN idf ON idf.term = tf.term
  WHERE tf.doc_id IN (SELECT doc_id FROM fb)
    AND tf.term NOT IN ({notin})
  GROUP BY tf.term
),
expsel AS (SELECT term FROM expw ORDER BY w DESC, term ASC LIMIT {n_exp}),
q1 AS (SELECT term, mult FROM q0 UNION ALL SELECT term, 1 FROM expsel),
scores AS (
  SELECT tf.doc_id,
         {score_expr.format(p='1')} AS score
  FROM tf
  JOIN q1 ON q1.term = tf.term
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY tf.doc_id
),
scores_all AS (
  SELECT d.doc_id, COALESCE(s.score, 0) AS score
  FROM documents d LEFT JOIN scores s ON s.doc_id = d.doc_id
),
mx AS (SELECT max(score) AS m FROM scores_all),
kept AS (
  SELECT doc_id, score FROM scores_all
  WHERE ((SELECT m FROM mx) <= 0 OR score >= 0.01 * (SELECT m FROM mx))
)
SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) - 1 AS rank,
       doc_id, score_micro
FROM (SELECT doc_id, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM kept)
ORDER BY score_micro DESC, doc_id ASC LIMIT {limit}
"""


def significant_text_sql(query: str, fg_k: int, top_n: int) -> str:
    """SQL twin of ``significant_text``: the standard BM25 CTE body
    (epsilon floor, max<=0 keep-all threshold) picks the top ``fg_k``
    foreground docs; df_fg/df_all come from the distinct (doc, term)
    pairs; the G2 milli-nat expression and the integer positive-
    association gate are copied verbatim from the significant_terms
    oracle (same float trees as the engine's vectorized cells)."""
    from ..functions.tokenizer import tokenize

    qtoks = tokenize(query)
    mult: Dict[str, int] = {}
    for t in qtoks:
        mult[t] = mult.get(t, 0) + 1
    qvals = ", ".join(f"('{t}', {m})" for t, m in sorted(mult.items()))
    return f"""
WITH tok AS (
  SELECT doc_id, {_tok_sql('text')} AS toks FROM documents
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM tok),
tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY doc_id, t
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
idf0 AS (
  SELECT term, ln((SELECT n FROM stats) - df + 0.5) - ln(df + 0.5) AS idf_raw
  FROM df
),
eps AS (SELECT 0.25 * avg(idf_raw) AS e FROM idf0),
idf AS (
  SELECT term,
         CASE WHEN idf_raw < 0 THEN (SELECT e FROM eps) ELSE idf_raw END AS idf
  FROM idf0
),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
q(term, mult) AS (VALUES {qvals}),
scores AS (
  SELECT tf.doc_id,
         sum(q.mult * idf.idf * tf.tf * 2.5 /
             (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))) AS score
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY tf.doc_id
),
scores_all AS (
  SELECT d.doc_id, COALESCE(s.score, 0) AS score
  FROM documents d LEFT JOIN scores s ON s.doc_id = d.doc_id
),
mx AS (SELECT max(score) AS m FROM scores_all),
kept AS (
  SELECT doc_id, score FROM scores_all
  WHERE ((SELECT m FROM mx) <= 0 OR score >= 0.01 * (SELECT m FROM mx))
),
fg AS (SELECT doc_id FROM kept ORDER BY score DESC, doc_id ASC LIMIT {fg_k}),
nn AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM fg) AS n_fg
),
d AS (
  SELECT term,
         count(*) AS df_all,
         count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM fg)) AS df_fg
  FROM tf GROUP BY term
),
cells AS (
  SELECT term, df_fg, df_all,
         CAST(df_fg AS DOUBLE) AS a,
         CAST(df_all - df_fg AS DOUBLE) AS b,
         CAST(nn.n_fg - df_fg AS DOUBLE) AS c,
         CAST(nn.n_docs - nn.n_fg - (df_all - df_fg) AS DOUBLE) AS dd,
         CAST(nn.n_docs AS DOUBLE) AS n
  FROM d, nn
  WHERE df_fg > 0 AND df_fg * nn.n_docs > df_all * nn.n_fg
),
g AS (
  SELECT term,
         CAST(df_fg AS BIGINT) AS df_fg,
         CAST(df_all AS BIGINT) AS df_all,
         CAST(floor(2 * (
           CASE WHEN a > 0 THEN a * ln(a * n / ((a+b) * (a+c))) ELSE 0 END +
           CASE WHEN b > 0 THEN b * ln(b * n / ((a+b) * (b+dd))) ELSE 0 END +
           CASE WHEN c > 0 THEN c * ln(c * n / ((c+dd) * (a+c))) ELSE 0 END +
           CASE WHEN dd > 0 THEN dd * ln(dd * n / ((c+dd) * (b+dd))) ELSE 0 END
         ) * 1000 + 0.5) AS BIGINT) AS llr_milli
  FROM cells
)
SELECT term, df_fg, df_all, llr_milli FROM g
ORDER BY llr_milli DESC, term ASC LIMIT {top_n}
"""


def multi_match_sql(query: str, limit: int = 20) -> str:
    """SQL twin of ``multi_match_bm25f``: the same title/body split as a
    1-based list slice at ``MM_TITLE_K``, per-field stats (N, avg field
    length, per-term field df), Lucene idf ``ln(1 + (N-df+0.5)/(df+0.5))``
    and the identical per-field BM25 expression tree, field contributions
    combined by the boosted sum.  Micro-grain final ranking."""
    from ..functions.tokenizer import tokenize

    qtoks = tokenize(query)
    terms = sorted(set(qtoks))
    qvals = ", ".join(f"('{t}', {qtoks.count(t)})" for t in terms)
    inlist = ", ".join(f"'{t}'" for t in terms)
    K = MM_TITLE_K

    def field_cte(name: str, col: str, avg: str, boost: float) -> str:
        return f"""tf{name} AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest({col}) AS t FROM f)
  WHERE t IN ({inlist}) GROUP BY doc_id, t
),
idf{name} AS (
  SELECT term,
         ln(1 + ((SELECT n FROM stats) - df + 0.5) / (df + 0.5)) AS idf
  FROM (SELECT term, count(*) AS df FROM tf{name} GROUP BY term)
),
s{name} AS (
  SELECT x.doc_id,
         {boost} * q.mult * i.idf * x.tf * 2.5 /
         (x.tf + 1.5 * (1 - 0.75 + 0.75 * d.dl{name} / (SELECT {avg} FROM stats))) AS s
  FROM tf{name} x
  JOIN q ON q.term = x.term
  JOIN idf{name} i ON i.term = x.term
  JOIN dls d ON d.doc_id = x.doc_id
)"""

    return f"""
WITH tok AS (
  SELECT doc_id, {_tok_sql('text')} AS toks FROM documents
),
f AS (
  SELECT doc_id, toks[1:{K}] AS t_title, toks[{K + 1}:len(toks)] AS t_body
  FROM tok
),
dls AS (SELECT doc_id, len(t_title) AS dlt, len(t_body) AS dlb FROM f),
stats AS (
  SELECT count(*) AS n, avg(len(t_title)) AS avgdl_t, avg(len(t_body)) AS avgdl_b
  FROM f
),
q(term, mult) AS (VALUES {qvals}),
{field_cte('t', 't_title', 'avgdl_t', MM_BOOST_TITLE)},
{field_cte('b', 't_body', 'avgdl_b', MM_BOOST_BODY)},
scores AS (
  SELECT doc_id, sum(s) AS score
  FROM (SELECT * FROM st UNION ALL SELECT * FROM sb)
  GROUP BY doc_id
)
SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) - 1 AS rank,
       doc_id, score_micro
FROM (SELECT doc_id, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM scores WHERE score > 0)
ORDER BY score_micro DESC, doc_id ASC LIMIT {limit}
"""


def combined_fields_sql(query: str, limit: int = 20) -> str:
    """SQL twin of ``combined_fields_bm25``: the same title/body list
    slice, fields merged BEFORE scoring (``tf = 2*tf_title + tf_body``,
    ``dlc = 2*len(title) + len(body)``), one combined df/idf/avgdl, one
    BM25 expression tree per term, micro-grain final ranking."""
    from ..functions.tokenizer import tokenize

    qtoks = tokenize(query)
    terms = sorted(set(qtoks))
    qvals = ", ".join(f"('{t}', {qtoks.count(t)})" for t in terms)
    inlist = ", ".join(f"'{t}'" for t in terms)
    K = MM_TITLE_K
    wt, wb = CF_BOOST_TITLE, CF_BOOST_BODY

    return f"""
WITH tok AS (
  SELECT doc_id, {_tok_sql('text')} AS toks FROM documents
),
f AS (
  SELECT doc_id, toks[1:{K}] AS t_title, toks[{K + 1}:len(toks)] AS t_body
  FROM tok
),
dls AS (SELECT doc_id, {wt} * len(t_title) + {wb} * len(t_body) AS dlc FROM f),
stats AS (
  SELECT count(*) AS n,
         avg({wt} * len(t_title) + {wb} * len(t_body)) AS avgdlc
  FROM f
),
q(term, mult) AS (VALUES {qvals}),
tft AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t_title) AS t FROM f)
  WHERE t IN ({inlist}) GROUP BY doc_id, t
),
tfb AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t_body) AS t FROM f)
  WHERE t IN ({inlist}) GROUP BY doc_id, t
),
tfc AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         COALESCE(a.term, b.term) AS term,
         {wt} * COALESCE(a.tf, 0) + {wb} * COALESCE(b.tf, 0) AS tf
  FROM tft a FULL JOIN tfb b ON a.doc_id = b.doc_id AND a.term = b.term
),
idfc AS (
  SELECT term,
         ln(1 + ((SELECT n FROM stats) - df + 0.5) / (df + 0.5)) AS idf
  FROM (SELECT term, count(*) AS df FROM tfc GROUP BY term)
),
s AS (
  SELECT x.doc_id,
         q.mult * i.idf * x.tf * 2.5 /
         (x.tf + 1.5 * (1 - 0.75 + 0.75 * d.dlc / (SELECT avgdlc FROM stats))) AS s
  FROM tfc x
  JOIN q ON q.term = x.term
  JOIN idfc i ON i.term = x.term
  JOIN dls d ON d.doc_id = x.doc_id
),
scores AS (SELECT doc_id, sum(s) AS score FROM s GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) - 1 AS rank,
       doc_id, score_micro
FROM (SELECT doc_id, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM scores WHERE score > 0)
ORDER BY score_micro DESC, doc_id ASC LIMIT {limit}
"""


def bm25_rescore_sql(
    query: str,
    secondary: str,
    window: int,
    qw: float,
    rw: float,
    limit: int = 20,
) -> str:
    """SQL twin of ``QueryEngine.search_rescore`` (ES ``rescore``): the
    primary BM25 pipeline (identical CTE body to ``bm25_sql``, including
    the epsilon floor and the max<=0 keep-all threshold branch) picks the
    top ``window`` docs; those — and only those — get a secondary BM25
    score and re-rank by ``qw*primary + rw*secondary`` (weights are short
    binary mantissas, the combination is one float expression on both
    engines).  Final order at micro grain, doc_id-asc ties."""
    from ..functions.tokenizer import tokenize

    def vals(q: str) -> str:
        mult: Dict[str, int] = {}
        for t in tokenize(q):
            mult[t] = mult.get(t, 0) + 1
        return ", ".join(f"('{t}', {m})" for t, m in sorted(mult.items()))

    score_expr = """sum(q{p}.mult * idf.idf * tf.tf * 2.5 /
             (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats))))"""
    return f"""
WITH tok AS (
  SELECT doc_id, {_tok_sql('text')} AS toks FROM documents
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM tok),
tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY doc_id, t
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
idf0 AS (
  SELECT term, ln((SELECT n FROM stats) - df + 0.5) - ln(df + 0.5) AS idf_raw
  FROM df
),
eps AS (SELECT 0.25 * avg(idf_raw) AS e FROM idf0),
idf AS (
  SELECT term,
         CASE WHEN idf_raw < 0 THEN (SELECT e FROM eps) ELSE idf_raw END AS idf
  FROM idf0
),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
q1(term, mult) AS (VALUES {vals(query)}),
q2(term, mult) AS (VALUES {vals(secondary)}),
scores1 AS (
  SELECT tf.doc_id,
         {score_expr.format(p='1')} AS score
  FROM tf
  JOIN q1 ON q1.term = tf.term
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY tf.doc_id
),
scores_all AS (
  SELECT d.doc_id, COALESCE(s.score, 0) AS score
  FROM documents d LEFT JOIN scores1 s ON s.doc_id = d.doc_id
),
mx AS (SELECT max(score) AS m FROM scores_all),
kept AS (
  SELECT doc_id, score FROM scores_all
  WHERE ((SELECT m FROM mx) <= 0 OR score >= 0.01 * (SELECT m FROM mx))
),
win AS (
  SELECT doc_id, score FROM kept
  ORDER BY score DESC, doc_id ASC LIMIT {window}
),
scores2 AS (
  SELECT tf.doc_id,
         {score_expr.format(p='2')} AS score
  FROM tf
  JOIN q2 ON q2.term = tf.term
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY tf.doc_id
),
comb AS (
  SELECT w.doc_id, {qw} * w.score + {rw} * COALESCE(s2.score, 0.0) AS score
  FROM win w LEFT JOIN scores2 s2 ON s2.doc_id = w.doc_id
)
SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) - 1 AS rank,
       doc_id, score_micro
FROM (SELECT doc_id, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM comb)
ORDER BY score_micro DESC, doc_id ASC LIMIT {limit}
"""


# ----------------------------------------------------------------- dedup


def dedup_exact(sf_dir: str):
    """Exact dedup winners: min doc_id + count per identical text."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t["text"].to_pylist(), dtype=object))
        return pa.table({"doc_id": t["doc_id"], "__h": pa.array(h.astype(np.int64))})

    out = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__h")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n"))
        .to_pandas()
    )
    out = out.sort_values("doc_id", ignore_index=True)
    return pa.table(
        {"doc_id": pa.array(out["doc_id"], pa.int64()), "n": pa.array(out["n"], pa.int64())}
    )


def dedup_by_key(sf_dir: str):
    """First-per-group dedup on (lang, source): min doc_id + group size."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    out = (
        ds.groupby(["lang", "source"])
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "source"], ignore_index=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def minhash_near_dups(sf_dir: str):
    """Near-dup pairs (Jaccard >= 0.5) via MinHash-LSH candidates, verified
    with exact n-gram Jaccard.  No SQL oracle (rows-only check)."""
    from ..stages.dedup import jaccard, minhash_lsh_candidates

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = (
        minhash_lsh_candidates(ds, num_perm=64, bands=16)
        .to_pandas()
        .drop_duplicates(["id_a", "id_b"])
    )
    if len(pairs) == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard_micro": pa.array([], pa.int64())}
        )
    # pushdown-read only the candidate docs' texts (candidate set << corpus)
    import pyarrow.dataset as pads

    cand_ids = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    ttbl = pads.dataset(
        os.path.join(sf_dir, "documents.parquet"), format="parquet"
    ).to_table(columns=["doc_id", "text"], filter=pads.field("doc_id").isin(cand_ids))
    from ..stages.dedup import _shingle_hashes

    # shingle each candidate doc ONCE (docs appear in many pairs)
    sets = {
        d: set(map(int, _shingle_hashes(t or "")))
        for d, t in zip(ttbl["doc_id"].to_pylist(), ttbl["text"].to_pylist())
    }
    keep_a, keep_b, jac = [], [], []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        sa, sb = sets[a], sets[b]
        u = len(sa | sb)
        j = (len(sa & sb) / u) if u else 1.0
        if j >= 0.5:
            keep_a.append(int(a))
            keep_b.append(int(b))
            jac.append(j)
    order = np.lexsort((keep_b, keep_a))
    return pa.table(
        {
            "id_a": pa.array(np.asarray(keep_a, dtype=np.int64)[order]),
            "id_b": pa.array(np.asarray(keep_b, dtype=np.int64)[order]),
            "jaccard_micro": pa.array(_micro(np.asarray(jac, dtype=np.float64)[order])),
        }
    )


_NGRAM_PAIRS_MEMO: Dict[str, pa.Table] = {}


def _ngram_pairs(sf_dir: str) -> pa.Table:
    """Jaccard>=0.5 word-3-gram pair table, memoized per process: three
    driver queries (ngram_jaccard_dups, dedup_clusters, doc_pagerank)
    derive from the same similarity join — recomputing the join per query
    would triple its (dominant) cost.  The pair table is driver-sized."""
    hit = _NGRAM_PAIRS_MEMO.get(sf_dir)
    if hit is None:
        from ..stages.simjoin import ngram_jaccard_join

        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        hit = _NGRAM_PAIRS_MEMO[sf_dir] = ngram_jaccard_join(ds, threshold=0.5, n=3)
    return hit


def ngram_jaccard_dups(sf_dir: str):
    """EXACT word-3-gram Jaccard similarity join (prefix-filter/PPJoin):
    all pairs with Jaccard >= 0.5, exact scores — the exact counterpart of
    the MinHash pipeline, and the only dedup query whose SQL oracle is a
    full set-similarity self-join (exploded grams, intersection counts)."""
    out = _ngram_pairs(sf_dir)
    return pa.table(
        {
            "id_a": out["id_a"],
            "id_b": out["id_b"],
            "jaccard_micro": pa.array(
                _micro(out["jaccard"].to_numpy(zero_copy_only=False))
            ),
        }
    )


def dedup_clusters(sf_dir: str):
    """Transitive near-dup clusters: exact n-gram Jaccard pairs (>= 0.5)
    -> connected components -> (doc_id, cluster_id=min id of component).
    The step that makes "keep one per duplicate family" well-defined when
    similarity is not transitive (A~B, B~C, A!~C).  Oracle: the same
    pairs in SQL + a WITH RECURSIVE reachability closure."""
    from ..stages.components import connected_components

    return connected_components(_ngram_pairs(sf_dir))


def dedup_keep_best(sf_dir: str):
    """Cluster dedup with BEST-representative election: transitive
    near-dup clusters (exact n-gram Jaccard >= 0.5 pairs, shared with
    dedup_clusters) keep the LONGEST member — max whitespace-token count,
    min doc_id tie-break — the usual "keep the most complete copy"
    policy, instead of dedup_clusters' arbitrary min-id.  Token counts
    for the clustered docs come from a distributed filtered pass over
    documents (broadcast id-set via ray.put, never per-batch reship);
    the election itself runs on the driver over the pair-graph-sized
    cluster table, same size class as the memoized pair join.  Oracle:
    the recursive reachability closure + a first_value window."""
    import ray

    from ..stages.components import connected_components

    cc = connected_components(_ngram_pairs(sf_dir)).to_pandas()
    ids_ref = ray.put(np.sort(cc["doc_id"].to_numpy(np.int64)))

    def counts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        member = np.isin(ids, ray.get(ids_ref))
        if not member.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_tokens": pa.array([], pa.int64())}
            )
        sub = t.filter(pa.array(member))
        toks = pcc.split_pattern_regex(
            pcc.fill_null(pcc.cast(sub["text"], pa.string()), ""), r"\s+"
        )
        flat = pcc.list_flatten(toks)
        par = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ne = pcc.greater(pcc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        nt = np.bincount(par[ne], minlength=len(sub)).astype(np.int64)
        return pa.table({"doc_id": sub["doc_id"], "n_tokens": pa.array(nt)})

    nt = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(counts, batch_format="pyarrow")
        .to_pandas()
    )
    m = cc.merge(nt, on="doc_id")
    m = m.sort_values(["cluster_id", "n_tokens", "doc_id"],
                      ascending=[True, False, True], ignore_index=True)
    keeper = m.groupby("cluster_id", sort=False)["doc_id"].transform("first")
    m["keeper_id"] = keeper
    m["kept"] = (m["doc_id"] == keeper).astype(np.int64)
    m = m.sort_values("doc_id", ignore_index=True)
    return pa.table(
        {
            "doc_id": pa.array(m["doc_id"], pa.int64()),
            "cluster_id": pa.array(m["cluster_id"], pa.int64()),
            "keeper_id": pa.array(m["keeper_id"], pa.int64()),
            "kept": pa.array(m["kept"], pa.int64()),
        }
    )


BFS_SOURCE_MOD = 50


def dup_graph_bfs(sf_dir: str):
    """Multi-source BFS hop distances over the exact near-dup graph
    (shared memoized pair join): for every graph node, the hop distance
    to the NEAREST source doc (``doc_id % 50 == 0``) through
    Jaccard>=0.5 edges; nodes in components with no source keep -1 —
    the provenance-radius question ("how far is this doc from a known
    original").  Vectorized frontier relaxation
    ``dist = min(dist, dist[neighbor] + 1)`` runs to fixpoint (bounded
    by the graph diameter) over the pair-join-sized arrays — the same
    size class and driver/distributed split convention as
    ``dedup_clusters``; at the >=5M-edge scale the identical loop
    distributes as edges-join-frontier + groupby-min.  Oracle: a WITH
    RECURSIVE shortest-hop closure with a node-count depth bound."""
    pairs = _ngram_pairs(sf_dir)
    a = pairs["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    uidx = np.searchsorted(nodes, np.concatenate([a, b]))
    vidx = np.searchsorted(nodes, np.concatenate([b, a]))
    big = np.int64(1) << 40
    d = np.where(nodes % BFS_SOURCE_MOD == 0, 0, big).astype(np.int64)
    while True:
        nd = d.copy()
        np.minimum.at(nd, vidx, d[uidx] + 1)
        if np.array_equal(nd, d):
            break
        d = nd
    return pa.table(
        {
            "doc_id": pa.array(nodes),
            "dist": pa.array(np.where(d >= big, -1, d).astype(np.int64)),
        }
    )


def dup_triangles(sf_dir: str):
    """Triangle enumeration over the exact near-dup pair graph (shared
    memoized join): each a<b<c triple of mutually-similar docs once —
    the densest boilerplate/template families.  Oracle: the pair CTE +
    a three-way self-join."""
    from ..stages.components import enumerate_triangles

    return enumerate_triangles(_ngram_pairs(sf_dir))


# ------------------------------------------------------------ text stats


def heavy_hitter_tokens(sf_dir: str):
    """Terms exceeding 0.1% of all token occurrences, exact counts, via the
    two-pass heavy-hitter sketch (per-block local candidates + broadcast
    exact recount) — never shuffles the full vocabulary, unlike
    term_df_top100's groupby(term)."""
    from ..stages.sketch import exact_heavy_hitters

    ds = _read(sf_dir, "documents", columns=["text"])
    return exact_heavy_hitters(ds, denominator=1000)


def lang_histogram(sf_dir: str):
    from ray.data.aggregate import Count

    out = (
        _read(sf_dir, "documents", columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def quality_by_lang(sf_dir: str):
    """Per-lang averaged quality metrics (whitespace-token definition)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def stats(t: pa.Table) -> pa.Table:
        from ..stages.text_stats import quality_stats

        q = quality_stats(t)
        return pa.table(
            {
                "lang": t["lang"],
                "n_tokens": q["n_tokens"],
                "stop": pcc.multiply(
                    q["stopword_ratio"], pcc.cast(q["n_tokens"], pa.float64())
                ),
            }
        )

    out = (
        ds.map_batches(stats, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_tokens", alias_name="tok_sum"),
            Sum("stop", alias_name="stop_sum"),
            Count(alias_name="docs"),
        )
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "docs": pa.array(out["docs"], pa.int64()),
            "tok_sum": pa.array(out["tok_sum"], pa.int64()),
            "stop_micro": pa.array(_micro(out["stop_sum"].to_numpy())),
        }
    )


def token_totals(sf_dir: str):
    """Whitespace + BPE-ish token totals per lang."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def counts(t: pa.Table) -> pa.Table:
        from ..stages.text_stats import token_counts

        c = token_counts(t)
        return pa.table(
            {"lang": t["lang"], "ws_tokens": c["ws_tokens"], "bpe_tokens": c["bpe_tokens"]}
        )

    out = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("ws_tokens", alias_name="ws_tokens"),
            Sum("bpe_tokens", alias_name="bpe_tokens"),
        )
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _ws_token_counts(sf_dir: str, with_lang: bool = False):
    """documents -> (doc_id, n_tokens) with the whitespace-token
    definition whose SQL mirror is proven by token_totals."""
    cols = ["doc_id", "text"] + (["lang"] if with_lang else [])
    ds = _read(sf_dir, "documents", columns=cols)

    def counts(t: pa.Table) -> pa.Table:
        from ..stages.text_stats import token_counts

        c = token_counts(t)
        out = {"doc_id": t["doc_id"], "n_tokens": c["ws_tokens"]}
        if with_lang:
            out["lang"] = t["lang"]
        return pa.table(out)

    return ds.map_batches(counts, batch_format="pyarrow")


def pack_sequences_q(sf_dir: str, budget: int = 2048):
    """LLM sequence packing: lay the corpus on a token tape in doc_id
    order, cut chunks of ``budget`` tokens, report where each doc starts
    (distributed prefix sum: per-bucket sums -> broadcast offsets ->
    one bucket-keyed exchange).  Oracle: the SQL window prefix sum."""
    from ..stages.packing import pack_sequences

    out = (
        pack_sequences(_ws_token_counts(sf_dir), budget=budget)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "start_tok": pa.array(out["start_tok"], pa.int64()),
            "chunk_id": pa.array(out["chunk_id"], pa.int64()),
            "chunk_offset": pa.array(out["chunk_offset"], pa.int64()),
        }
    )


def training_mix(sf_dir: str, budget: int = 512):
    """END-TO-END training-set builder — the composed LLM-data pipeline:
    quality gate (C4-style rules) -> exact dedup (keep-first) -> token
    counts -> sequence packing onto a ``budget``-token tape.  Every stage
    reuses an individually-oracle-proven operator, and the WHOLE
    composition is checked against one composed SQL oracle."""
    from ..stages.dedup import exact_dedup
    from ..stages.packing import pack_sequences
    from ..stages.text_stats import quality_stats, token_counts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gate(t: pa.Table) -> pa.Table:
        q = quality_stats(t)
        nt = q["n_tokens"].to_numpy(zero_copy_only=False)
        sr = q["stopword_ratio"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((nt >= 20) & (nt <= 200) & (sr < 0.25)))

    survivors = exact_dedup(ds.map_batches(gate, batch_format="pyarrow"))

    def counts(t: pa.Table) -> pa.Table:
        c = token_counts(t)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": c["ws_tokens"]})

    out = (
        pack_sequences(
            survivors.map_batches(counts, batch_format="pyarrow"), budget=budget
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "start_tok": pa.array(out["start_tok"], pa.int64()),
            "chunk_id": pa.array(out["chunk_id"], pa.int64()),
            "chunk_offset": pa.array(out["chunk_offset"], pa.int64()),
        }
    )


SAMPLE_RATES = {"en": 0.5, "zh": 0.25, "de": 0.1}


def stratified_sample_q(sf_dir: str):
    """Deterministic per-language Bernoulli sample (multiplicative hash
    of doc_id vs per-stratum integer threshold) — membership reproduced
    exactly by the SQL oracle; no shuffle, pure map-side."""
    from ..stages.sampling import stratified_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    out = (
        stratified_sample(ds, rates=SAMPLE_RATES, stratum_col="lang")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "lang": pa.array(out["lang"], pa.string()),
        }
    )


def train_test_split_q(sf_dir: str):
    """90/5/5 train/val/test labels from the id hash, aggregated per
    (lang, split) — the deterministic split every training pipeline
    needs; same rows on every rerun and any partitioning."""
    from ray.data.aggregate import Count

    from ..stages.sampling import hash_split

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    out = (
        hash_split(ds)
        .groupby(["lang", "split"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "split"], ignore_index=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "split": pa.array(out["split"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


def redact_props(sf_dir: str):
    """PII/number redaction over the events ``props`` payload: one
    vectorized RE2 pass per category (email/url/ip/number), typed
    placeholders, per-category match counts.  The oracle chains the
    IDENTICAL patterns through regexp_replace 'g' in the same order."""
    from ..stages.text_stats import redact_pii

    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        return redact_pii(t, text_col="props").select(
            ["event_id", "redacted", "n_email", "n_url", "n_ip", "n_number"]
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def props_k_by_type(sf_dir: str):
    """Semi-structured field extraction: pull the integer ``k`` out of
    the JSON ``props`` string with one vectorized RE2 extract, then a
    partial-aggregated groupby(event_type)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ks = pcc.extract_regex(
            pcc.fill_null(t["props"], ""), r'"k":\s*(?P<k>\d+)'
        )
        k = pcc.fill_null(
            pcc.cast(pcc.struct_field(ks, "k"), pa.int64()), 0
        )
        df_ = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(), "k": k.to_pandas()}
        )
        g = df_.groupby("event_type", sort=False).agg(
            n=("k", "size"), sum_k=("k", "sum")
        ).reset_index()
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
                "sum_k": pa.array(g["sum_k"].to_numpy(), pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"))
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"].to_numpy(), pa.int64()),
            "sum_k": pa.array(out["sum_k"].to_numpy(), pa.int64()),
        }
    )


def clean_text_q(sf_dir: str):
    """C4-style normalization (lowercase, URL/e-mail strip, whitespace
    collapse) — one Arrow-kernel map pass; the oracle runs the identical
    RE2 patterns through DuckDB regexp_replace."""
    from ..stages.text_stats import clean_text

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = (
        ds.map_batches(clean_text, batch_format="pyarrow")
        .select_columns(["doc_id", "clean_text"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "clean_text": pa.array(out["clean_text"], pa.string()),
        }
    )


QUANTILE_QS = (0.1, 0.25, 0.5, 0.75, 0.9)


def token_quantiles(sf_dir: str):
    """Exact token-count deciles without a distributed sort: per-block
    (value, count) histograms merged on the driver (bounded integer
    domain), ranks read off the global CDF with quantile_disc
    semantics."""
    from ..stages.sketch import exact_quantiles

    return exact_quantiles(
        _ws_token_counts(sf_dir), qs=QUANTILE_QS, value_col="n_tokens"
    )


def lang_id_profile(sf_dir: str):
    """Heuristic language ID per document (marker-word argmax + CJK
    codepoint check) — the model-stage stand-in, exactly mirrored in SQL."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        from ..stages.text_stats import lang_id_batch

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array(lang_id_batch(t["text"].to_pylist()), pa.string()),
            }
        )

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def quality_filter(sf_dir: str):
    """Training-data quality gate: keep docs with 20..200 ws-tokens and
    stopword_ratio < 0.25 (the standard C4-style heuristic shape)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        from ..stages.text_stats import quality_stats

        q = quality_stats(t)
        nt = q["n_tokens"].to_numpy(zero_copy_only=False)
        sr = q["stopword_ratio"].to_numpy(zero_copy_only=False)
        keep = (nt >= 20) & (nt <= 200) & (sr < 0.25)
        return pa.table({"doc_id": t["doc_id"]}).filter(pa.array(keep))

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64())})


def repetition_stats_q(sf_dir: str):
    """Gopher-style repetition signals (dup-line counts/chars, top-bigram
    stats) per document — exact-integer outputs, shuffle-free map_batches."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        from ..stages.text_stats import repetition_stats

        return repetition_stats(t)

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    return pa.Table.from_pandas(out, preserve_index=False)


TOKEN_BUDGET_NUM, TOKEN_BUDGET_DEN = 3, 10


def token_budget_select_q(sf_dir: str):
    """Quality-ordered token-budget corpus selection: rank docs by
    stopword-ratio (milli-encoded, the natural-language-ness score),
    keep the (score DESC, doc_id ASC) prefix whose running token total
    stays within 30% of the corpus's tokens.  Distributed via the
    score-histogram threshold + cutoff-group prefix sum in
    stages/selection.py — no global sort.  Oracle: SUM() OVER window."""
    from ..stages.selection import token_budget_select

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        toks = pcc.split_pattern_regex(
            pcc.fill_null(pcc.cast(t["text"], pa.string()), ""), r"\s+"
        )
        flat = pcc.list_flatten(toks)
        par = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ne = pcc.greater(pcc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        n = len(t)
        n_tokens = np.bincount(par[ne], minlength=n).astype(np.int64)
        stop = pcc.is_in(
            pcc.utf8_lower(flat.filter(pa.array(ne))),
            value_set=pa.array(sorted(STOPWORDS)),
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(par[ne][stop], minlength=n).astype(np.int64)
        score = np.where(
            n_tokens > 0,
            np.floor(1000.0 * n_stop / np.maximum(n_tokens, 1) + 0.5).astype(np.int64),
            0,
        )
        return pa.table(
            {
                "doc_id": pcc.cast(t["doc_id"], pa.int64()),
                "score": pa.array(score),
                "n_tokens": pa.array(n_tokens),
            }
        )

    sel = token_budget_select(
        ds.map_batches(stats, batch_format="pyarrow"),
        TOKEN_BUDGET_NUM,
        TOKEN_BUDGET_DEN,
    )
    out = sel.to_pandas().sort_values("doc_id", ignore_index=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "score": pa.array(out["score"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
        }
    )


def gopher_gate_q(sf_dir: str):
    """Gopher-style composed quality GATE (Rae et al. 2021 §A.1.1): the
    full keep/drop verdict with one integer flag per rule (word count,
    mean word length, stopword floor, dup-line-chars cap, top-bigram
    cap).  Shuffle-free map_batches; integer-exact so the SQL oracle
    hash-matches."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        from ..stages.text_stats import gopher_gate

        return gopher_gate(t)

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def bpe_vocab(sf_dir: str, n_merges: int = 200):
    """BPE tokenizer training over the documents table: ONE distributed
    word-count pass, then vocabulary-sized merge learning on the driver.
    Rows-only for the driver (merge learning is not SQL-expressible); the
    trainer and encoder are exactness-gated in tests/test_bpe.py against a
    naive recount-from-scratch reference."""
    from ..stages.bpe import learn_bpe, word_counts

    ds = _read(sf_dir, "documents", columns=["text"])
    wc = word_counts(ds).sort_values("word", ignore_index=True)
    merges = learn_bpe(wc, n_merges)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([a for a, _ in merges], pa.string()),
            "right": pa.array([b for _, b in merges], pa.string()),
        }
    )


def lm_perplexity(sf_dir: str):
    """CCNet-style bigram-LM cross-entropy per document: distributed
    bigram-count training -> broadcast model -> actor-pool scoring.
    Exact-integer outputs (milli-nat per-pair rounding before summation)."""
    from ..stages.lm import perplexity_profile

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = perplexity_profile(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def nb_classify(sf_dir: str):
    """Multinomial-Naive-Bayes source classification of every document
    (model-based quality/domain gating shape): distributed (class, term)
    count training -> broadcast integer-milli-nat model -> actor-pool
    scoring.  Exact vs the unrolled-NB SQL oracle."""
    from ..stages.nbayes import classify

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    out = (
        classify(ds, label_col="source")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "pred": pa.array(out["pred"], pa.string()),
            "score_milli": pa.array(out["score_milli"], pa.int64()),
        }
    )


def fingerprint_profile(sf_dir: str):
    """Winnowing fingerprint counts per doc (rows-only: rolling-hash
    fingerprints are not expressible in SQL)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        from ..stages.text_stats import fingerprint_stats

        f = fingerprint_stats(t)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fingerprints": f["n_fingerprints"],
            }
        )

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SUBSTRING_NEEDLE = "sort merge"
REGEX_PATTERN = "sort (merge|scan) [a-z]+"


def _trigram_index(sf_dir: str) -> str:
    """Build (resume-cached) the trigram substring index over documents."""
    from ..stages.trigram import build_trigram_index

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    idx = f"/tmp/rcs_cache/tridx-{tag}"
    os.makedirs(idx, exist_ok=True)
    with _cache_lock(idx):
        marker = os.path.join(idx, "tri_manifest.json")
        if not os.path.exists(marker):
            ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
            build_trigram_index(ds, idx)
    return idx


def substring_search(sf_dir: str, needle: str = SUBSTRING_NEEDLE):
    """Exact substring (grep) search via the trigram index: needle
    trigrams -> rarest posting lists -> intersect -> verify candidates
    only.  Oracle: ``WHERE contains(text, needle)``."""
    from ..stages.trigram import substring_search as tri_substring

    idx = _trigram_index(sf_dir)
    docs = os.path.join(sf_dir, "documents.parquet")
    ids = tri_substring(idx, docs, needle)
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


NOCASE_NEEDLE = "SoRt MeRge"


def substring_search_nocase(sf_dir: str, needle: str = NOCASE_NEEDLE):
    """Case-insensitive substring search: per-position case-variant
    trigram groups (union within, intersect across) + RE2 ``(?i)``
    verification — same engine as the oracle's regexp_matches 'i'."""
    from ..stages.trigram import substring_search_nocase as tri_nocase

    idx = _trigram_index(sf_dir)
    docs = os.path.join(sf_dir, "documents.parquet")
    ids = tri_nocase(idx, docs, needle)
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def grep_lines(sf_dir: str, needle: str = SUBSTRING_NEEDLE):
    """grep over the corpus: line-level matches (doc_id, line_no, line)
    via trigram candidate pruning + vectorized line explode.  Oracle:
    zipped unnest(str_split) + generate_subscripts + contains(line)."""
    from ..stages.trigram import grep_lines as tri_grep

    idx = _trigram_index(sf_dir)
    docs = os.path.join(sf_dir, "documents.parquet")
    return tri_grep(idx, docs, needle)


def regex_search(sf_dir: str, pattern: str = REGEX_PATTERN):
    """Exact regex search: required-literal trigram pruning + RE2
    verification (same regex engine as the DuckDB oracle)."""
    from ..stages.trigram import regex_search as tri_regex

    idx = _trigram_index(sf_dir)
    docs = os.path.join(sf_dir, "documents.parquet")
    ids = tri_regex(idx, docs, pattern)
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def clone_pairs(sf_dir: str):
    """MOSS-style code-clone candidates: pairs sharing >= 3 winnowing
    fingerprints at containment >= 0.5 (rows-only — the rolling hash is
    not SQL-expressible; exactness is gated in pytest against a
    brute-force pure-Python winnowing oracle)."""
    from ..stages.clones import fingerprint_clone_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = fingerprint_clone_pairs(ds).to_pandas()
    if len(out) == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "shared": pa.array([], pa.int64()),
             "containment_micro": pa.array([], pa.int64())}
        )
    out = out.sort_values(["id_a", "id_b"], ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def simhash_near_dups(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs (Hamming <= 3 over 64-bit signatures) on the
    documents table.  Rows-only (siphash word hashing is not expressible in
    SQL); gated locally against the per-doc scalar oracle in
    tests/test_driver_contract.py."""
    from ..stages.dedup import simhash_candidates

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = (
        simhash_candidates(ds)
        .to_pandas()
        .drop_duplicates(["id_a", "id_b"])
    )
    pairs = pairs[pairs["hamming"] <= max_hamming]
    pairs = pairs.sort_values(["id_a", "id_b"], ignore_index=True)
    return pa.table(
        {
            "id_a": pa.array(pairs["id_a"], pa.int64()),
            "id_b": pa.array(pairs["id_b"], pa.int64()),
            "hamming": pa.array(pairs["hamming"], pa.int64()),
        }
    )


def embed_cosine_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs: all (id_a < id_b) with cosine >=
    0.35, via the exact blocked all-pairs stage (broadcast matrix, per-block
    matmul).  Threshold is data-driven: the shipped embeddings are weakly
    label-clustered random vectors (max off-diagonal cosine ~0.51), so the
    classic 0.9+ dup thresholds select nothing — 0.35 keeps the ~0.2%
    most-similar tail (271 pairs at sf0.01), a non-trivial exact check of
    the pair-join semantics.  The LSH-blocked ``embedding_near_dups``
    (the scale path, approximate) is recall-tested in
    tests/test_dedup_textstats.py::test_embedding_near_dups."""
    from ..stages.dedup import embedding_cosine_dups_exact

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = (
        embedding_cosine_dups_exact(ds, threshold=0.35)
        .to_pandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    return pa.table(
        {
            "id_a": pa.array(out["id_a"], pa.int64()),
            "id_b": pa.array(out["id_b"], pa.int64()),
            "cos_micro": pa.array(_micro(out["cosine"].to_numpy())),
        }
    )


# ------------------------------------------------------------ similarity


def knn_cosine(sf_dir: str):
    """Brute-force cosine top-10 of query vectors (vec_id < 3) vs all."""
    from ..stages.annsearch import vector_topk

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = vector_topk(ds, qs, k=10, id_column="vec_id", normalize=True, dtype=np.float64).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    return pa.table(
        {
            "q_id": pa.array(qids[out["query_idx"].to_numpy()], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "score_micro": pa.array(_micro(out["score"].to_numpy())),
        }
    )


def knn_int8(sf_dir: str):
    """Cosine top-10 via int8 scalar quantization + exact rescore (the
    ES ``int8_hnsw`` / FAISS SQ8 compressed-domain path): per-block
    approximate int8 candidates (top-64) rescored with the exact
    float64 dot, so the result EQUALS the brute-force ``knn_cosine``
    answer — same SQL oracle — at a quarter of the scan bandwidth.
    The equality precondition (true top-10 inside approx top-64 per
    block) is asserted by tests/test_hybrid.py on this data."""
    from ..stages.annsearch import vector_topk_int8

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = vector_topk_int8(ds, qs, k=10, candidates=64, id_column="vec_id").to_pandas()
    qids = qdf["vec_id"].to_numpy()
    return pa.table(
        {
            "q_id": pa.array(qids[out["query_idx"].to_numpy()], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "score_micro": pa.array(_micro(out["score"].to_numpy())),
        }
    )


KNN_RADIUS_TAU = 0.2


def knn_radius(sf_dir: str):
    """Cosine RADIUS search (ES knn ``similarity`` threshold / Qdrant
    score_threshold): every vector with cosine >= 0.2 to each query
    vector (vec_id < 3), no top-k cap.  The threshold applies inside
    each block, so the exchange carries only matches — O(answer), never
    O(corpus)."""
    from ..stages.annsearch import vector_radius

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    # membership and ordering decide on the INTEGER micro score on both
    # sides (oracle thresholds the same CAST): the raw-float tau compare
    # would let a similarity within an ulp of tau flip membership between
    # the engine's normalize-then-dot and DuckDB's dot/(|x||y|) trees.
    # The block-side tau is nudged an ulp-safe hair low so the boundary
    # rows always reach the exact micro filter here.
    out = vector_radius(
        ds, qs, KNN_RADIUS_TAU - 1e-9, id_column="vec_id", normalize=True,
        dtype=np.float64,
    ).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    res = pd.DataFrame(
        {
            "q_id": qids[out["query_idx"].to_numpy()].astype(np.int64),
            "vec_id": out["vec_id"].to_numpy(np.int64),
            "score_micro": _micro(out["score"].to_numpy()),
        }
    )
    tau_micro = int(round(KNN_RADIUS_TAU * 1_000_000))
    res = res[res["score_micro"] >= tau_micro].sort_values(
        ["q_id", "score_micro", "vec_id"],
        ascending=[True, False, True],
        ignore_index=True,
    )
    return pa.table(
        {
            "q_id": pa.array(res["q_id"].to_numpy(np.int64)),
            "vec_id": pa.array(res["vec_id"].to_numpy(np.int64)),
            "score_micro": pa.array(res["score_micro"].to_numpy(np.int64)),
        }
    )


def knn_l2(sf_dir: str):
    """Exact EUCLIDEAN (L2) top-10 of the same query vectors as
    ``knn_cosine`` — the unnormalized-metric twin (Qdrant/FAISS distance
    mode).  Same broadcast-query / per-block-top-k shape; distances
    rank ASCENDING with vec_id tie-break.  The per-vector sum of squared
    differences accumulates STRICTLY sequentially over dimensions (a
    64-step vectorized loop over rows), matching the oracle kernel's
    element order, so both sides produce identical doubles."""
    import ray

    from ..stages.annsearch import _emb_matrix

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qref = ray.put(qs)
    k = 10

    class BlockL2:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            E = _emb_matrix(t["embedding"], np.float64)
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            out = {"query_idx": [], "vec_id": [], "dist": []}
            for qi in range(len(self.q)):
                acc = np.zeros(len(E), np.float64)
                for j in range(E.shape[1]):  # sequential over dims
                    d = E[:, j] - self.q[qi, j]
                    acc += d * d
                dist = np.sqrt(acc)
                order = np.lexsort((ids, dist))[:k]
                out["query_idx"].extend([qi] * len(order))
                out["vec_id"].extend(ids[order].tolist())
                out["dist"].extend(dist[order].tolist())
            return pa.table(
                {
                    "query_idx": pa.array(out["query_idx"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "dist": pa.array(out["dist"], pa.float64()),
                }
            )

    cands = ds.map_batches(
        BlockL2, batch_format="pyarrow", batch_size=8192, concurrency=(1, 2)
    ).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    rows = {"q_id": [], "rank": [], "vec_id": [], "dist_micro": []}
    for qi, grp in cands.groupby("query_idx"):
        grp = grp.sort_values(["dist", "vec_id"], kind="mergesort").head(k)
        rows["q_id"].extend([int(qids[qi])] * len(grp))
        rows["rank"].extend(range(len(grp)))
        rows["vec_id"].extend(grp["vec_id"].tolist())
        rows["dist_micro"].extend(int(x) for x in _micro(grp["dist"].to_numpy()))
    return pa.table(
        {
            "q_id": pa.array(rows["q_id"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
            "vec_id": pa.array(rows["vec_id"], pa.int64()),
            "dist_micro": pa.array(rows["dist_micro"], pa.int64()),
        }
    )


def knn_pq(sf_dir: str):
    """Product-quantization ANN (the compressed-domain scale path):
    train m=8/k=16 codebooks on a hash-sample, encode the corpus to
    8-byte codes in one map_batches pass, ADC top-10 for the same
    queries as knn_cosine.  Rows-only (codebook training is not SQL);
    tests/test_pq.py gates the distributed path bit-exactly against a
    numpy ADC oracle and enforces a recall floor vs exact cosine."""
    from ..stages.pq import pq_encode, pq_search, train_pq_codebooks

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    books = train_pq_codebooks(ds, m=8, k=16)
    out = pq_search(pq_encode(ds, books), books, qs, k=10).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    return pa.table(
        {
            "q_id": pa.array(qids[out["query_idx"].to_numpy()], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "adc_micro": pa.array(_micro(out["adc_dist"].to_numpy())),
        }
    )


ALPHA_MIX_NUM, ALPHA_MIX_DEN = 2, 5  # overall 40% token^0-doc budget


def alpha_mix_sample(sf_dir: str):
    """Temperature-sampled LANGUAGE MIXTURE (the mT5/T5 multilingual
    recipe, alpha=0.5): a 40% overall doc budget split across languages
    proportional to sqrt(n_lang) — upsampling tail languages — with
    EXACT integer per-language targets and deterministic hash-rank
    selection (never Bernoulli).  Emits the per-language audit incl. a
    selected-id checksum so the oracle pins membership.  See
    stages/sampling.py::temperature_sample for the three-bounded-pass
    scale shape."""
    from ..stages.sampling import temperature_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return temperature_sample(ds, ALPHA_MIX_NUM, ALPHA_MIX_DEN)


def media_pipeline(sf_dir: str):
    """End-to-end MULTIMODAL pipeline over a deterministic synthetic
    media table (binary payload + typed metadata — the opaque-column
    convention): real netpbm/WAV decode -> 64-bin byte-histogram
    features -> real frame sampling of concatenated-netpbm videos, all
    FUSED into one actor-pool ``map_batches`` pass
    (``MediaSummaryStage``) so the dataset executes once and payloads
    decode once.  Emits one summary row per
    media kind (n, decoded width/sample stats, embedding dim, sampled
    frames).  Rows-only: the payloads are synthesized binaries, not a
    SQL-reachable table; the per-stage exactness gates live in
    tests/test_dedup_textstats.py (true dims, per-pixel resize
    identity, frame round-trips)."""
    import ray.data as rd

    from ..stages.multimodal import MediaSummaryStage, gen_media_table

    base = gen_media_table(120, seed=42, real_formats=True)
    # keep the REAL-decodable rows (gen_media_table's videos are opaque
    # fakes); videos here are concatenated netpbm streams built from the
    # image payloads — the real container the frame sampler parses
    kinds = base["kind"].to_pylist()
    keep = pa.array([k in ("image", "audio") for k in kinds])
    base = base.filter(keep)
    imgs = [p for p, k in zip(base["payload"].to_pylist(),
                              base["kind"].to_pylist()) if k == "image"][:12]
    vids = [b"".join(imgs[i::4]) for i in range(4)]
    vid_tbl = pa.table(
        {
            "media_id": pa.array(
                [1_000_000 + i for i in range(len(vids))], pa.int64()
            ),
            "kind": pa.array(["video"] * len(vids), pa.string()),
            "payload": pa.array(vids, pa.binary()),
        }
    )
    media = pa.concat_tables(
        [base.select(["media_id", "kind", "payload"]), vid_tbl]
    )
    ds = rd.from_arrow(media)

    # ONE fused execution: decode + features + frame-sample compose inside
    # MediaSummaryStage, so the payload bytes are read once and only tiny
    # per-kind partial counter rows leave each task (map-side pre-agg).
    partials = ds.map_batches(
        MediaSummaryStage,
        fn_constructor_kwargs={"use_real": True, "every": 2},
        batch_format="pyarrow", concurrency=(1, 2),
    ).to_pandas()

    fold = (
        partials.groupby("kind", as_index=False)
        .agg(
            n=("n", "sum"),
            width_sum=("width_sum", "sum"),
            emb_dim=("emb_dim", "max"),
            frames_sampled=("frames_sampled", "sum"),
        )
        .sort_values("kind", ignore_index=True)
    )
    return pa.table(
        {
            "kind": pa.array(fold["kind"], pa.string()),
            "n": pa.array(fold["n"], pa.int64()),
            "width_sum": pa.array(fold["width_sum"], pa.int64()),
            "emb_dim": pa.array(fold["emb_dim"], pa.int64()),
            "frames_sampled": pa.array(fold["frames_sampled"], pa.int64()),
        }
    )


HARDNEG_POS_TAU = 0.95  # above this cosine = positive/near-dup, not a negative
HARDNEG_K = 5


def hard_negatives(sf_dir: str):
    """Contrastive-training HARD-NEGATIVE mining (DPR/Contriever
    recipe): for each anchor (vec_id < 3), the top-5 most-similar
    vectors that are NOT near-positives — cosine <= 0.95 and not the
    anchor itself — ranked (cosine desc, vec_id asc).  The band filter
    applies INSIDE each block before its top-k partial, so the exchange
    stays blocks x k rows; scores compare on integer micro grain on
    both sides (the knn_radius ulp rule)."""
    import ray

    from ..stages.annsearch import _emb_matrix

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qn = qs / np.maximum(np.linalg.norm(qs, axis=1, keepdims=True), 1e-300)
    qref = ray.put(qn)
    qids = qdf["vec_id"].to_numpy(np.int64)
    tau_micro = int(round(HARDNEG_POS_TAU * 1_000_000))

    class BlockNeg:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = _emb_matrix(t["embedding"], np.float64)
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1.0
            sims = (mat / n) @ self.q.T
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            micro = np.floor(sims * 1_000_000 + 0.5).astype(np.int64)
            out_q, out_id, out_m = [], [], []
            for qi in range(self.q.shape[0]):
                col = micro[:, qi]
                ok = (col <= tau_micro) & (ids != qids[qi])
                rows = np.flatnonzero(ok)
                order = np.lexsort((ids[rows], -col[rows]))[:HARDNEG_K]
                pick = rows[order]
                out_q.append(np.full(len(pick), qi, dtype=np.int64))
                out_id.append(ids[pick])
                out_m.append(col[pick])
            cat = np.concatenate
            return pa.table(
                {
                    "query_idx": pa.array(cat(out_q) if out_q else []),
                    "vec_id": pa.array(cat(out_id) if out_id else []),
                    "score_micro": pa.array(cat(out_m) if out_m else []),
                }
            )

    cand = ds.map_batches(BlockNeg, batch_format="pyarrow",
                          concurrency=(1, 4)).to_pandas()
    out_q, out_r, out_id, out_m = [], [], [], []
    for qi, grp in cand.groupby("query_idx"):
        top = grp.sort_values(["score_micro", "vec_id"],
                              ascending=[False, True],
                              kind="mergesort").head(HARDNEG_K)
        out_q.append(np.full(len(top), qids[qi], dtype=np.int64))
        out_r.append(np.arange(len(top), dtype=np.int64))
        out_id.append(top["vec_id"].to_numpy(np.int64))
        out_m.append(top["score_micro"].to_numpy(np.int64))
    cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
    return pa.table(
        {
            "q_id": pa.array(cat(out_q)),
            "rank": pa.array(cat(out_r)),
            "vec_id": pa.array(cat(out_id)),
            "score_micro": pa.array(cat(out_m)),
        }
    )


def knn_ivfpq(sf_dir: str):
    """IVF-PQ ANN (the composed billion-vector scale path — FAISS
    IVF16,PQ8 shape): coarse cells from a hash-sampled k-means, 8-byte
    PQ codes, query = ADC over each query's 4 probed cells only.  The
    scan touches ~1/4 of the code table (file-pruned when the table is
    cell-partitioned) and reads codes, not vectors.  Rows-only
    (codebook/centroid training is not SQL); tests/test_pq.py gates the
    distributed path bit-exactly against a restricted numpy ADC oracle
    and enforces a recall floor vs exact cosine."""
    from ..stages.annsearch import ivf_train_centroids
    from ..stages.pq import ivfpq_encode, ivfpq_search, train_pq_codebooks

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    books = train_pq_codebooks(ds, m=8, k=16)
    cent = ivf_train_centroids(ds, n_centroids=16, id_column="vec_id")
    out = ivfpq_search(
        ivfpq_encode(ds, books, cent), books, cent, qs, k=10, n_probe=4
    ).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    return pa.table(
        {
            "q_id": pa.array(qids[out["query_idx"].to_numpy()], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "adc_micro": pa.array(_micro(out["adc_dist"].to_numpy())),
        }
    )


def hybrid_rrf(sf_dir: str, limit: int = 20):
    """Hybrid retrieval through the REAL fusion code path (J1/K3,
    `pipelines/hybrid.py::rrf_fuse`): distributed BM25 top-20 over
    ``documents`` + distributed cosine top-20 over ``embeddings`` (query
    = vec 0), weighted-RRF full-outer merged and max-normalized.  The
    oracle re-derives BOTH legs and the fusion arithmetic in SQL —
    including the low-spread weight flip and the ``1 - w`` float shape."""
    from ..stages.annsearch import vector_topk
    from .hybrid import rrf_fuse

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id == 0").to_pandas()
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    sem_tbl = vector_topk(
        emb, qs, k=limit, id_column="vec_id", normalize=True, dtype=np.float64
    ).to_pandas()
    semantic = list(
        zip(sem_tbl["vec_id"].astype(int), sem_tbl["score"].astype(float))
    )

    bm_tbl = bm25_topk(sf_dir, limit=limit).to_pandas().sort_values("rank")
    bm25 = list(
        zip(
            bm_tbl["doc_id"].astype(int),
            (bm_tbl["score_micro"].astype(np.int64) / 1e6),
        )
    )

    fused = rrf_fuse(semantic, bm25, semantic_weight=0.7)
    ids = np.array([f[0] for f in fused], np.int64)
    combined = np.array([f[1] for f in fused], np.float64)
    sem_raw = np.array([f[2] for f in fused], np.float64)
    bm_raw = np.array([f[3] for f in fused], np.float64)
    order = np.argsort(ids)
    return pa.table(
        {
            "doc_id": pa.array(ids[order]),
            "fused_micro": pa.array(_micro(combined[order])),
            "sem_micro": pa.array(_micro(sem_raw[order])),
            "bm25_micro": pa.array(_micro(bm_raw[order])),
        }
    )


HYBRID_LIN_W_BM = 0.7
HYBRID_LIN_W_SEM = 0.3


def hybrid_linear(sf_dir: str, limit: int = 20):
    """ES 8.16+ ``linear`` retriever: weighted sum of MIN-MAX-NORMALIZED
    scores from two retrievers — the BM25 top-20 window (weight 0.7) and
    the cosine-knn top-20 window for query vec_id=0 (weight 0.3); a doc
    absent from a window contributes 0 from it, and a degenerate window
    (max == min) normalizes its members to 1.0.  Both sides normalize
    from the SAME integer micro scores, so the double expression trees —
    ``(micro - mn) / (mx - mn)`` then ``0.7*b + 0.3*s`` — are
    bit-identical between engine and oracle (the knn_radius micro
    rule).  Distinct from hybrid_rrf: rank-free score interpolation
    (ES linear) vs reciprocal-rank fusion (ES rrf)."""
    from ..stages.annsearch import vector_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id == 0").to_pandas()
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    sem_tbl = vector_topk(
        emb, qs, k=limit, id_column="vec_id", normalize=True, dtype=np.float64
    ).to_pandas()
    sem_ids = sem_tbl["vec_id"].to_numpy(np.int64)
    sem_micro = np.asarray(_micro(sem_tbl["score"].to_numpy()), np.int64)

    bm_tbl = bm25_topk(sf_dir, limit=limit).to_pandas()
    bm_ids = bm_tbl["doc_id"].to_numpy(np.int64)
    bm_micro = bm_tbl["score_micro"].to_numpy(np.int64)

    def norm(micro: np.ndarray) -> np.ndarray:
        mn, mx = int(micro.min()), int(micro.max())
        if mx == mn:
            return np.ones(len(micro), np.float64)
        return (micro - mn).astype(np.float64) / np.float64(mx - mn)

    bnorm = dict(zip(bm_ids.tolist(), norm(bm_micro).tolist()))
    snorm = dict(zip(sem_ids.tolist(), norm(sem_micro).tolist()))
    ids = sorted(set(bm_ids.tolist()) | set(sem_ids.tolist()))
    fused = np.array(
        [
            HYBRID_LIN_W_BM * bnorm.get(i, 0.0) + HYBRID_LIN_W_SEM * snorm.get(i, 0.0)
            for i in ids
        ],
        np.float64,
    )
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, np.int64)),
            "fused_micro": pa.array(_micro(fused)),
            "in_bm25": pa.array(
                np.asarray([1 if i in bnorm else 0 for i in ids], np.int64)
            ),
            "in_knn": pa.array(
                np.asarray([1 if i in snorm else 0 for i in ids], np.int64)
            ),
        }
    )


def knn_cosine_filtered(sf_dir: str, label: int = 3):
    """Pre-filtered vector search (Qdrant filter semantics,
    vector_store.py:229-253): restrict the corpus to one label BEFORE the
    cosine top-k — filter pushdown inside the read, no post-filter rerank."""
    from ..stages.annsearch import vector_topk

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]).filter(
        expr=f"label == {int(label)}"
    )
    qdf = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = vector_topk(
        ds.select_columns(["vec_id", "embedding"]), qs, k=10,
        id_column="vec_id", normalize=True, dtype=np.float64,
    ).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    return pa.table(
        {
            "q_id": pa.array(qids[out["query_idx"].to_numpy()], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "score_micro": pa.array(_micro(out["score"].to_numpy())),
        }
    )


def kmeans_clusters(sf_dir: str):
    """Fixed-2-iteration deterministic Lloyd's KMeans (k=8, seeds = the 8
    smallest vec_ids) over the embeddings table — the iterative-ML pattern
    (broadcast centroids, map-side partial sums, driver combine) with an
    exact SQL oracle: the same two unrolled iterations in DuckDB."""
    from ..stages.kmeans import kmeans_fit

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assignments, _ = kmeans_fit(ds, k=8, n_iter=2)
    return assignments


def semantic_dedup_q(sf_dir: str):
    """SemDeDup over the embeddings table: kmeans (k=8, the driver-proven
    2-iteration config) then keep-first-by-id within-cluster cosine dedup
    at the data-calibrated 0.35 threshold (see embed_cosine_dups)."""
    from ..stages.semdedup import semantic_dedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = (
        semantic_dedup(ds, k=8, n_iter=2, threshold=0.35)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    return pa.table(
        {
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "cluster": pa.array(out["cluster"], pa.int64()),
            "keep": pa.array(out["keep"], pa.int64()),
        }
    )


def label_centroids(sf_dir: str):
    """Per-label embedding centroid (the IVF-training primitive) as a
    map-side pre-aggregated vector groupby: each batch emits ONE partial
    (label, sum_vec, n) row per label, the tiny groupby combines partials —
    the combiner pattern that avoids shuffling raw vectors."""
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        if pa.types.is_fixed_size_list(emb.type):
            dim = emb.type.list_size
            mat = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(-1, dim)
        else:
            mat = np.asarray(emb.to_pylist(), dtype=np.float64)
        labels = t["label"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(uniq.astype(np.int64)),
                "sum_vec": pa.array(list(sums)),
                "n": pa.array(counts),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        total = np.sum(np.stack(df["sum_vec"].to_numpy()), axis=0)
        n = int(df["n"].sum())
        return pd.DataFrame({"label": [df["label"].iloc[0]], "centroid": [total / n], "n": [n]})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .sort_values("label", ignore_index=True)
    )
    # explode to (label, dim_idx, mean) rows so the SQL oracle can compare
    labels, dims, means = [], [], []
    for _, row in out.iterrows():
        c = np.asarray(row["centroid"])
        labels.extend([int(row["label"])] * len(c))
        dims.extend(range(len(c)))
        means.extend(c.tolist())
    return pa.table(
        {
            "label": pa.array(labels, pa.int64()),
            "dim_idx": pa.array(dims, pa.int64()),
            "mean_micro": pa.array(_micro(np.asarray(means))),
        }
    )


# ---------------------------------------------------------- events tables


def events_hourly(sf_dir: str):
    """Tumbling 1h windows per event_type: count + cent-summed value."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def window(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pcc.floor_temporal(t["ts"], unit="hour"),
                "value_c": _cents_col(t["value"]),
            }
        )

    out = (
        ds.map_batches(window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="value_c"))
        .to_pandas()
        .sort_values(["event_type", "window_start"], ignore_index=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "window_start": pa.array(out["window_start"]),
            "n": pa.array(out["n"], pa.int64()),
            "value_c": pa.array(out["value_c"], pa.int64()),
        }
    )


def events_sliding(sf_dir: str, window_min: int = 60, hop_min: int = 15):
    """HOPPING (sliding) windows: each event lands in window_min/hop_min
    overlapping windows (flat-map window assignment, then one groupby) —
    the streaming-window shape beyond the tumbling case."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    k = window_min // hop_min

    def assign(t: pa.Table) -> pa.Table:
        # ts floored to the hop, then replicated into the k windows that
        # contain it: starts = floor(ts) - j*hop for j in 0..k-1
        base = pcc.floor_temporal(t["ts"], multiple=hop_min, unit="minute")
        parts = []
        for j in range(k):
            start = pcc.subtract(
                base, pa.scalar(pd.Timedelta(minutes=j * hop_min).to_pytimedelta())
            )
            parts.append(
                pa.table(
                    {
                        "event_type": t["event_type"],
                        "window_start": start,
                        "value_c": _cents_col(t["value"]),
                    }
                )
            )
        return pa.concat_tables(parts)

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="value_c"))
        .to_pandas()
        .sort_values(["event_type", "window_start"], ignore_index=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "window_start": pa.array(out["window_start"]),
            "n": pa.array(out["n"], pa.int64()),
            "value_c": pa.array(out["value_c"], pa.int64()),
        }
    )


def user_last_event(sf_dir: str):
    """Last-touch attribution: each user's most recent event (argmax by
    (ts, event_id)) — the ALGEBRAIC argmax shape: per-batch partial
    argmax (one row per user per batch) -> one user-keyed groupby of
    partials -> final argmax per group.  The exchange carries at most
    blocks x users-per-block rows, never the event stream."""

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "ts_us": t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64),
                "event_id": t["event_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_pandas(),
            }
        )
        df = df.sort_values(["user_id", "ts_us", "event_id"]).groupby("user_id", sort=False).tail(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["ts_us", "event_id"]).tail(1)[
            ["user_id", "event_id", "event_type", "ts_us"]
        ]

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    return pa.table(
        {
            "user_id": pa.array(out["user_id"], pa.int64()),
            "event_id": pa.array(out["event_id"], pa.int64()),
            "event_type": pa.array(out["event_type"], pa.string()),
            "ts_us": pa.array(out["ts_us"], pa.int64()),
        }
    )


FUNNEL_STAGES = ["view", "click", "purchase"]


def funnel_counts(sf_dir: str):
    """Ordered funnel analysis: per stage, how many users reached it IN
    SEQUENCE (first 'view', then a 'click' strictly after it, then a
    'purchase' strictly after that).  One user-keyed exchange of the
    (user, type, ts) triples the funnel needs (events pre-filtered to
    funnel stages per batch); per-user stage walk is a tiny numpy scan.
    Oracle: chained min-after-min joins."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    stage_of = {s: i for i, s in enumerate(FUNNEL_STAGES)}

    def prefilter(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_pandas()
        keep = types.isin(stage_of).to_numpy()
        sub = t.filter(pa.array(keep))
        return pa.table(
            {
                "user_id": sub["user_id"],
                "ts_us": pa.array(
                    sub["ts"].to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]").astype(np.int64)
                ),
                "stage": pa.array(
                    types[keep].map(stage_of).to_numpy(np.int64)
                ),
            }
        )

    def walk(df: pd.DataFrame) -> pd.DataFrame:
        reached = np.zeros(len(FUNNEL_STAGES), dtype=np.int64)
        t_prev = -1
        for i in range(len(FUNNEL_STAGES)):
            ts = df.loc[(df["stage"] == i) & (df["ts_us"] > t_prev), "ts_us"]
            if ts.empty:
                break
            reached[i] = 1
            t_prev = int(ts.min())
        return pd.DataFrame(
            {"stage": np.arange(len(FUNNEL_STAGES), dtype=np.int64), "reached": reached}
        )

    out = (
        ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(walk, batch_format="pandas")
        .groupby("stage")
        .aggregate(Sum("reached", alias_name="n_users"))
        .to_pandas()
        .sort_values("stage", ignore_index=True)
    )
    return pa.table(
        {
            "stage": pa.array([FUNNEL_STAGES[int(i)] for i in out["stage"]], pa.string()),
            "n_users": pa.array(out["n_users"], pa.int64()),
        }
    )


EQL_SEQ = ("view", "click", "purchase")  # sequence by user_id [A][B][C]
EQL_MAXSPAN_US = 7 * 86400 * 1_000_000  # with maxspan=7d
_EQL_EMPTY = pd.DataFrame(
    {
        "user_id": pd.Series([], dtype=np.int64),
        "n_seq": pd.Series([], dtype=np.int64),
    }
)


def eql_sequence(sf_dir: str):
    """EQL-style sequence query (Elastic Event Query Language:
    ``sequence by user_id with maxspan=7d [view] [click] [purchase]``):
    for every 'view' event, the FIRST 'click' strictly after it, then
    the FIRST 'purchase' strictly after that click; a match completes
    when the whole chain fits inside ``maxspan`` of the head event.
    Emits per-user completed-sequence counts.

    One user-keyed exchange of the pre-filtered (user, stage, ts)
    triples — events not in the sequence never shuffle; the per-user
    chain walk is two vectorized searchsorteds (no Python loop over
    events).  Oracle: chained min-after correlated subqueries on
    epoch-microsecond integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    stage_of = {s: i for i, s in enumerate(EQL_SEQ)}

    def prefilter(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_pandas()
        keep = types.isin(stage_of).to_numpy()
        sub = t.filter(pa.array(keep))
        return pa.table(
            {
                "user_id": sub["user_id"],
                "ts_us": pa.array(
                    sub["ts"].to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]").astype(np.int64)
                ),
                "stage": pa.array(types[keep].map(stage_of).to_numpy(np.int64)),
            }
        )

    def chain(df: pd.DataFrame) -> pd.DataFrame:
        uid = int(df["user_id"].iloc[0])
        ts = df["ts_us"].to_numpy(np.int64)
        st = df["stage"].to_numpy(np.int64)
        ta = np.sort(ts[st == 0])
        tb = np.sort(ts[st == 1])
        tc = np.sort(ts[st == 2])
        if not (len(ta) and len(tb) and len(tc)):
            return _EQL_EMPTY
        # first B strictly after each A, then first C strictly after that B
        ib = np.searchsorted(tb, ta, side="right")
        ok = ib < len(tb)
        ta, ib = ta[ok], ib[ok]
        ic = np.searchsorted(tc, tb[ib], side="right")
        ok = ic < len(tc)
        n = int(np.count_nonzero(tc[ic[ok]] - ta[ok] <= EQL_MAXSPAN_US))
        if n == 0:
            return _EQL_EMPTY
        return pd.DataFrame({"user_id": [uid], "n_seq": [n]})

    out = (
        ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(chain, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    return pa.table(
        {
            "user_id": pa.array(out["user_id"], pa.int64()),
            "n_seq": pa.array(out["n_seq"], pa.int64()),
        }
    )


def cohort_retention(sf_dir: str):
    """Weekly cohort-retention matrix (the standard product-analytics
    triangle): cohort = each user's first active ISO week (Monday-
    aligned), n_users = distinct users from that cohort active again
    ``week_offset`` weeks later.

    One user-keyed exchange: per-batch distinct (user, week) pairs ->
    ``groupby(user)`` computes the cohort + offsets per user -> a tiny
    (cohort, offset)-keyed count.  Week truncation is integer day
    arithmetic on epoch days ((d + 3) % 7 back to Monday), identical to
    the oracle's date_trunc('week')."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def weeks(t: pa.Table) -> pa.Table:
        d = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        monday = d - (d + 3) % 7  # 1970-01-01 was a Thursday
        df_ = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(zero_copy_only=False), "wk": monday}
        ).drop_duplicates()
        return pa.Table.from_pandas(df_, preserve_index=False)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        wks = np.unique(df["wk"].to_numpy(np.int64))
        return pd.DataFrame(
            {"cw": np.full(len(wks), wks[0], dtype=np.int64),
             "off": (wks - wks[0]) // 7}
        )

    out = (
        ds.map_batches(weeks, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["cw", "off"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
        .sort_values(["cw", "off"], ignore_index=True)
    )
    cohort = out["cw"].to_numpy(np.int64).astype("datetime64[D]")
    return pa.table(
        {
            "cohort_week": pa.array([str(x) for x in cohort], pa.string()),
            "week_offset": pa.array(out["off"], pa.int64()),
            "n_users": pa.array(out["n_users"], pa.int64()),
        }
    )


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap > 30min opens a session): session count
    and event count (the streaming-shaped operator: sort-within-partition +
    stateful scan inside ``map_groups``)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        new_sess = df["ts"].diff().isna() | (df["ts"].diff() > gap)
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "n_events": [len(df)],
                "n_sessions": [int(new_sess.sum())],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    return pa.table(
        {
            "user_id": pa.array(out["user_id"], pa.int64()),
            "n_events": pa.array(out["n_events"], pa.int64()),
            "n_sessions": pa.array(out["n_sessions"], pa.int64()),
        }
    )


# ------------------------------------------------------------- relational


def _click_purchase_streams(sf_dir: str):
    """Shared preamble of the as-of / range join queries: the click stream
    (event_id, user_id, ts) and the purchase stream projected to
    (pid, user_id, ts, value)."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts", "value"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"]
    )
    purchases = ev.filter(expr="event_type == 'purchase'").map_batches(
        lambda t: pa.table(
            {
                "pid": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value": t["value"],
            }
        ),
        batch_format="pyarrow",
    )
    return clicks, purchases


def clicks_last_purchase(sf_dir: str):
    """As-of join: for every click, the most recent purchase at or before
    it by the same user (inner — clicks with no prior purchase drop).
    One user-keyed exchange + per-group vectorized searchsorted; oracle is
    DuckDB's native ASOF JOIN."""
    from ..stages.asof import asof_join

    clicks, purchases = _click_purchase_streams(sf_dir)
    # tiebreak pins the match when a user has two purchases at one ts
    out = asof_join(
        clicks, purchases, by="user_id", on="ts", right_tiebreak=["pid"]
    ).to_pandas()
    if len(out) == 0:  # all-empty datasets lose their schema in to_pandas
        return pa.table(
            {"event_id": pa.array([], pa.int64()), "matched_id": pa.array([], pa.int64()),
             "value_c": pa.array([], pa.int64()), "gap_us": pa.array([], pa.int64())}
        )
    out = out.sort_values("event_id", ignore_index=True)
    gap = out["ts"].astype("int64") - out["ts_r"].astype("int64")
    return pa.table(
        {
            "event_id": pa.array(out["event_id"].astype(np.int64)),
            "matched_id": pa.array(out["pid"].astype(np.int64)),
            "value_c": _cents_col(pa.array(out["value"].astype(np.float64))),
            "gap_us": pa.array(gap.astype(np.int64)),
        }
    )


def purchases_before_click(sf_dir: str):
    """Range join: EVERY purchase in the 24 h window before each click by
    the same user (inclusive bounds) — one user-keyed exchange, per-group
    interval searchsorted with grouped-arange pair expansion.  Oracle:
    plain SQL join with a BETWEEN predicate."""
    from ..stages.asof import range_join

    clicks, purchases = _click_purchase_streams(sf_dir)
    out = range_join(
        clicks, purchases,
        lower=np.timedelta64(-24, "h"), upper=np.timedelta64(0, "h"),
        by="user_id", on="ts",
    ).to_pandas()
    if len(out) == 0:  # all-empty datasets lose their schema in to_pandas
        return pa.table(
            {"event_id": pa.array([], pa.int64()), "pid": pa.array([], pa.int64()),
             "value_c": pa.array([], pa.int64())}
        )
    out = out.sort_values(["event_id", "pid"], ignore_index=True)
    return pa.table(
        {
            "event_id": pa.array(out["event_id"].astype(np.int64)),
            "pid": pa.array(out["pid"].astype(np.int64)),
            "value_c": _cents_col(pa.array(out["value"].astype(np.float64))),
        }
    )


def q1_lineitem(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate (pre-aggregated inside batches)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        disc = pcc.multiply(t["l_extendedprice"], pcc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": _cents_col(t["l_quantity"]),
                "base_c": _cents_col(t["l_extendedprice"]),
                "disc_c": _cents_col(disc),
            }
        )

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("base_c", alias_name="sum_base_c"),
            Sum("disc_c", alias_name="sum_disc_c"),
            Count(alias_name="n"),
        )
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"], ignore_index=True)
    )
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
            "sum_qty_c": pa.array(out["sum_qty_c"], pa.int64()),
            "sum_base_c": pa.array(out["sum_base_c"], pa.int64()),
            "sum_disc_c": pa.array(out["sum_disc_c"], pa.int64()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


def top_parts_by_revenue(sf_dir: str):
    """Broadcast hash join (small side via ray.put) + grouped top-10."""
    import ray
    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"]).to_pandas()
    part_ref = ray.put(dict(zip(part["p_partkey"], part["p_name"])))

    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    class JoinRevenue:
        def __init__(self):
            self.names = ray.get(part_ref)  # fetched once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            rev = pcc.multiply(
                t["l_extendedprice"], pcc.subtract(pa.scalar(1.0), t["l_discount"])
            )
            return pa.table({"p_partkey": t["l_partkey"], "revenue_c": _cents_col(rev)})

    out = (
        ds.map_batches(JoinRevenue, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("p_partkey")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()
    )
    out = out.sort_values(
        ["revenue_c", "p_partkey"], ascending=[False, True], kind="mergesort"
    ).head(10)
    names = dict(zip(part["p_partkey"], part["p_name"]))
    return pa.table(
        {
            "p_partkey": pa.array(out["p_partkey"], pa.int64()),
            "p_name": pa.array([names.get(k) for k in out["p_partkey"]], pa.string()),
            "revenue_c": pa.array(out["revenue_c"], pa.int64()),
        }
    )


def revenue_by_part_type(sf_dir: str):
    """Distributed hash join via ``Dataset.join`` (both sides as Datasets),
    then grouped revenue by part type — exercises the native join operator
    (the broadcast pattern in ``top_parts_by_revenue`` remains the
    preferred shape when one side is small)."""
    from ray.data.aggregate import Sum

    line = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pcc.multiply(t["l_extendedprice"], pcc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"p_partkey": t["l_partkey"], "revenue_c": _cents_col(rev)})

    line = line.map_batches(revenue, batch_format="pyarrow")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    joined = line.join(part, join_type="inner",
                       num_partitions=_join_parts(sf_dir, "lineitem", "part"),
                       on=("p_partkey",))
    out = (
        joined.groupby("p_type")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()
        .sort_values("p_type", ignore_index=True)
    )
    return pa.table(
        {
            "p_type": pa.array(out["p_type"], pa.string()),
            "revenue_c": pa.array(out["revenue_c"], pa.int64()),
        }
    )


def orders_by_nation(sf_dir: str):
    """orders x customer x nation: customer is sf-proportional, so it joins
    via the distributed ``Dataset.join`` (never broadcast whole); only the
    25-row nation dimension is broadcast (``ray.put`` once, mapped inside
    batches)."""
    import ray
    from ray.data.aggregate import Count, Sum

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nref = ray.put(dict(zip(nation["n_nationkey"].tolist(), nation["n_name"].tolist())))

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table({"c_custkey": t["o_custkey"], "total_c": _cents_col(t["o_totalprice"])}),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = orders.join(cust, join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"), on=("c_custkey",))

    class AddNation:
        def __init__(self):
            self.nmap = ray.get(nref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["c_nationkey"].to_numpy(zero_copy_only=False)
            names = [self.nmap.get(int(k)) for k in keys]
            return pa.table(
                {"n_name": pa.array(names, pa.string()), "total_c": t["total_c"]}
            )

    out = (
        joined.map_batches(AddNation, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("n_name")
        .aggregate(Count(alias_name="n_orders"), Sum("total_c", alias_name="total_c"))
        .to_pandas()
        .sort_values("n_name", ignore_index=True)
    )
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "n_orders": pa.array(out["n_orders"], pa.int64()),
            "total_c": pa.array(out["total_c"], pa.int64()),
        }
    )


def nation_above_avg_orders(sf_dir: str):
    """Correlated-aggregate shape ("how many orders beat their own
    nation's average order value"): orders x customer via distributed
    ``Dataset.join``, then the joined compact (nation, total_c)
    projection is materialized ONCE and traversed twice — pass 1 folds
    per-nation (count, sum-of-cents), pass 2 re-filters against the
    broadcast per-nation stats.  "Above average" is the exact integer
    predicate ``x * n > S`` (x, S in cents), so no float-threshold
    flips against the SQL window-AVG oracle."""
    import ray
    from ray.data.aggregate import Count, Sum

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nation["n_nationkey"].tolist(), nation["n_name"].tolist()))

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": t["o_custkey"], "total_c": _cents_col(t["o_totalprice"])}
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = (
        orders.join(cust, join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"), on=("c_custkey",))
        .select_columns(["c_nationkey", "total_c"])
        .materialize()
    )

    stats = (
        joined.groupby("c_nationkey")
        .aggregate(Count(alias_name="n_orders"), Sum("total_c", alias_name="s_c"))
        .to_pandas()
    )
    sref = ray.put(
        {
            int(r.c_nationkey): (int(r.n_orders), int(r.s_c))
            for r in stats.itertuples(index=False)
        }
    )

    class AboveAvg:
        def __init__(self):
            self.stats = ray.get(sref)

        def __call__(self, t: pa.Table) -> pa.Table:
            nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
            x = t["total_c"].to_numpy(zero_copy_only=False)
            n = np.array([self.stats[int(k)][0] for k in nk], dtype=np.int64)
            s = np.array([self.stats[int(k)][1] for k in nk], dtype=np.int64)
            return pa.table(
                {
                    "c_nationkey": t["c_nationkey"],
                    "above": pa.array((x * n > s).astype(np.int64)),
                }
            )

    above = (
        joined.map_batches(AboveAvg, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("c_nationkey")
        .aggregate(Sum("above", alias_name="n_above"))
        .to_pandas()
    )
    m = stats.merge(above, on="c_nationkey")
    m["n_name"] = m["c_nationkey"].map(nmap)
    m = m.sort_values("n_name", ignore_index=True)
    return pa.table(
        {
            "n_name": pa.array(m["n_name"], pa.string()),
            "n_orders": pa.array(m["n_orders"], pa.int64()),
            "n_above": pa.array(m["n_above"], pa.int64()),
        }
    )


def q3_shipping(sf_dir: str, segment: str = "BUILDING", cut: str = "1998-06-01"):
    """TPC-H Q3 shape: customer(segment) x orders(date<cut) x
    lineitem(ship>cut) via two distributed ``Dataset.join``s, grouped
    revenue, top-10 by (revenue desc, orderkey)."""
    from ray.data.aggregate import Sum

    cut_ts = pd.Timestamp(cut)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pcc.equal(t["c_mktsegment"], segment)).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "c_custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
            }
        ).filter(pcc.less(t["o_orderdate"], pa.scalar(cut_ts))),
        batch_format="pyarrow",
    )
    line = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "revenue_c": _cents_col(
                    pcc.multiply(
                        t["l_extendedprice"], pcc.subtract(pa.scalar(1.0), t["l_discount"])
                    )
                ),
            }
        ).filter(pcc.greater(t["l_shipdate"], pa.scalar(cut_ts))),
        batch_format="pyarrow",
    )
    oc = orders.join(cust, join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"), on=("c_custkey",))
    j = line.join(
        oc.select_columns(["o_orderkey", "o_orderdate"]),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("o_orderkey",),
    )
    out = (
        j.groupby(["o_orderkey", "o_orderdate"])
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()
        .sort_values(["revenue_c", "o_orderkey"], ascending=[False, True], kind="mergesort")
        .head(10)
    )
    return pa.table(
        {
            "o_orderkey": pa.array(out["o_orderkey"], pa.int64()),
            "o_orderdate": pa.array(out["o_orderdate"]),
            "revenue_c": pa.array(out["revenue_c"], pa.int64()),
        }
    )


def _with_join_sentinels(ds, key: str, n: int = 64):
    """Work around a ``Dataset.join`` failure mode: a hash partition that
    receives NO rows from one side materializes as a schema-less empty
    table and pyarrow's join then errors ("No match ... for key field").
    Pad the side with ``n`` sentinel rows on never-matching NEGATIVE keys
    (all corpus keys are >= 0) so every partition is non-empty; inner
    joins drop the sentinels by construction.  O(n) rows — free at any
    scale."""
    import ray.data as rd

    sch = ds.schema()
    arrays = []
    for name, typ in zip(sch.names, sch.types):
        if name == key:
            arrays.append(pa.array(np.arange(-1, -n - 1, -1), typ))
        else:
            arrays.append(pa.nulls(n, typ))
    return ds.union(rd.from_arrow(pa.table(dict(zip(sch.names, arrays)))))


Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01"
Q5_TO = "1997-01-01"


def q5_local_supplier_volume(sf_dir: str, region: str = Q5_REGION):
    """TPC-H Q5 shape — the widest join composition in the suite:
    region x nation x customer x orders(date range) x lineitem x
    supplier with the local-supplier condition (customer and supplier
    in the SAME nation), revenue per nation.

    Distributed plan: region->nation resolves to a tiny broadcast key
    set (shipped in task closures); customer and supplier are
    sf-proportional so they join DISTRIBUTED (never collected):
    lineitem⋈supplier on suppkey, orders(date)⋈customer on custkey,
    then one orderkey-keyed join, the local-supplier equality applied
    as a vectorized mask, and a nation-keyed partial-aggregated
    groupby.  Cents-exact money on both sides."""
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp(Q5_FROM), pd.Timestamp(Q5_TO)
    nat = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rkey = set(reg[reg["r_name"] == region]["r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(rkey)]
    nkeys = set(nat["n_nationkey"].astype(int))
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {"l_suppkey": t["s_suppkey"], "s_nationkey": t["s_nationkey"]}
        ).filter(
            pa.array(np.isin(t["s_nationkey"].to_numpy(zero_copy_only=False),
                             list(nkeys)))
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {"o_custkey": t["c_custkey"], "c_nationkey": t["c_nationkey"]}
        ).filter(
            pa.array(np.isin(t["c_nationkey"].to_numpy(zero_copy_only=False),
                             list(nkeys)))
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]})
        .filter(
            pcc.and_(
                pcc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pcc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    )
    line = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "revenue_c": _cents_col(
                    pcc.multiply(
                        t["l_extendedprice"],
                        pcc.subtract(pa.scalar(1.0), t["l_discount"]),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    # supplier is ~1/6000 of lineitem rows (TPC-H ratio): when its region
    # slice is small enough to ship (<64 MiB parquet), broadcast the
    # suppkey->nationkey map once via ray.put and fold the join into the
    # lineitem scan — one full lineitem shuffle removed.  Falls back to
    # the distributed hash join above that size.
    supp_small = os.path.getsize(os.path.join(sf_dir, "supplier.parquet")) < (64 << 20)
    if supp_small:
        import ray as _ray

        sp = supp.to_pandas()
        s_order = np.argsort(sp["l_suppkey"].to_numpy(np.int64), kind="mergesort")
        smap_ref = _ray.put(
            (
                sp["l_suppkey"].to_numpy(np.int64)[s_order],
                sp["s_nationkey"].to_numpy(np.int64)[s_order],
            )
        )

        class JoinSupp:
            def __init__(self):
                self.skeys, self.snat = _ray.get(smap_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                keys = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
                if len(self.skeys) == 0:
                    hit = np.zeros(len(keys), dtype=bool)
                    idx_c = np.zeros(len(keys), dtype=np.int64)
                    nat_col = np.full(len(keys), -1, dtype=np.int64)
                else:
                    idx = np.searchsorted(self.skeys, keys)
                    idx_c = np.clip(idx, 0, len(self.skeys) - 1)
                    hit = self.skeys[idx_c] == keys
                    nat_col = self.snat[idx_c]
                return pa.table(
                    {
                        "o_orderkey": t["l_orderkey"],
                        "s_nationkey": pa.array(nat_col),
                        "revenue_c": t["revenue_c"],
                    }
                ).filter(pa.array(hit))

        ls = line.map_batches(JoinSupp, batch_format="pyarrow", concurrency=(1, 2))
    else:
        ls = line.join(
            _with_join_sentinels(supp, "l_suppkey"),
            join_type="inner", num_partitions=_join_parts(sf_dir, "lineitem", "supplier"),
            on=("l_suppkey",),
        ).map_batches(
            lambda t: pa.table(
                {"o_orderkey": t["l_orderkey"], "s_nationkey": t["s_nationkey"],
                 "revenue_c": t["revenue_c"]}
            ),
            batch_format="pyarrow",
        )
    # customer attaches through the gated broadcast-or-join helper: under
    # 64 MiB on disk the (custkey -> nationkey) map ships once via ray.put
    # and folds into the orders scan (no shuffle); above, it falls back to
    # the distributed hash join — same pattern as the supplier side.
    oc = _attach_int_lookup(orders, cust, sf_dir, "customer", "o_custkey", "orders")
    j = ls.join(
        _with_join_sentinels(oc.select_columns(["o_orderkey", "c_nationkey"]), "o_orderkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("o_orderkey",),
    )

    def local_only(t: pa.Table) -> pa.Table:
        m = pcc.equal(t["s_nationkey"], t["c_nationkey"])
        return pa.table(
            {"n_nationkey": t["s_nationkey"], "revenue_c": t["revenue_c"]}
        ).filter(m)

    out = (
        j.map_batches(local_only, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()
    )
    if "revenue_c" not in out.columns:
        out = pd.DataFrame({"n_nationkey": [], "revenue_c": []}).astype(np.int64)
    out["n_name"] = [names[int(k)] for k in out["n_nationkey"]]
    out = out.sort_values(["revenue_c", "n_name"], ascending=[False, True],
                          kind="mergesort", ignore_index=True)
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "revenue_c": pa.array(out["revenue_c"], pa.int64()),
        }
    )


def top2_orders_per_nation(sf_dir: str):
    """Windowed rank: top-2 orders by price per nation (groupby ->
    sort-within-group head(2)), exact cents tie-broken by orderkey."""
    import ray

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nref = ray.put(dict(zip(nation["n_nationkey"].tolist(), nation["n_name"].tolist())))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "c_custkey": t["o_custkey"],
                "total_c": _cents_col(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    joined = orders.join(cust, join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"), on=("c_custkey",))

    class AddNation:
        def __init__(self):
            self.nmap = ray.get(nref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["c_nationkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "n_name": pa.array([self.nmap.get(int(k)) for k in keys], pa.string()),
                    "o_orderkey": t["o_orderkey"],
                    "total_c": t["total_c"],
                }
            )

    def top2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["total_c", "o_orderkey"], ascending=[False, True], kind="mergesort").head(2)
        df = df.reset_index(drop=True)
        df["rnk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    out = (
        joined.map_batches(AddNation, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("n_name")
        .map_groups(top2, batch_format="pandas")
        .to_pandas()
        .sort_values(["n_name", "rnk"], ignore_index=True)
    )
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "rnk": pa.array(out["rnk"], pa.int64()),
            "o_orderkey": pa.array(out["o_orderkey"], pa.int64()),
            "total_c": pa.array(out["total_c"], pa.int64()),
        }
    )


def supplier_balance_by_region(sf_dir: str):
    """supplier x nation x region via a two-hop broadcast dimension map
    (both dims tiny), grouped balance."""
    import ray
    from ray.data.aggregate import Count, Sum

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    rmap = dict(zip(region["r_regionkey"].tolist(), region["r_name"].tolist()))
    nmap = {
        int(k): rmap[int(v)]
        for k, v in zip(nation["n_nationkey"], nation["n_regionkey"])
    }
    nref = ray.put(nmap)

    ds = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    class AddRegion:
        def __init__(self):
            self.nmap = ray.get(nref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["s_nationkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "r_name": pa.array([self.nmap.get(int(k)) for k in keys], pa.string()),
                    "bal_c": _cents_col(t["s_acctbal"]),
                }
            )

    out = (
        ds.map_batches(AddRegion, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("bal_c", alias_name="bal_c"))
        .to_pandas()
        .sort_values("r_name", ignore_index=True)
    )
    return pa.table(
        {
            "r_name": pa.array(out["r_name"], pa.string()),
            "n_suppliers": pa.array(out["n_suppliers"], pa.int64()),
            "bal_c": pa.array(out["bal_c"], pa.int64()),
        }
    )


def distinct_users_by_type(sf_dir: str):
    """COUNT(DISTINCT) as two-level aggregation: dedup (type, user) pairs
    with a groupby, then count per type — the scale-correct shape (never a
    driver-side set)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_n"))
    out = (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="users"))
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "users": pa.array(out["users"], pa.int64()),
        }
    )


# ------------------------------------------- decontamination / shuffle / windows

DECONTAM_BENCH_MOD = 19  # docs with doc_id % 19 == 0 play the benchmark set


def decontaminate_q(sf_dir: str):
    """Benchmark decontamination: the training half of ``documents``
    (doc_id % 19 != 0) flagged when it shares any 5-gram with the
    benchmark half (doc_id % 19 == 0).  Benchmark gram set is computed
    distributed and BROADCAST (never joined); the corpus side is one
    streaming actor-pool pass.  Oracle: exploded-gram semi-join."""
    from ..stages.decontam import decontaminate

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def is_bench(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % DECONTAM_BENCH_MOD == 0))

    def is_train(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % DECONTAM_BENCH_MOD != 0))

    bench = docs.map_batches(is_bench, batch_format="pyarrow")
    train = docs.map_batches(is_train, batch_format="pyarrow")
    out = (
        decontaminate(train, bench, n=5)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "lang": pa.array(out["lang"], pa.string()),
            "contaminated": pa.array(out["contaminated"], pa.int64()),
        }
    )


DSIR_TARGET_LANG = "en"


def dsir_weights_q(sf_dir: str):
    """DSIR importance weights: target domain = lang='en' docs, raw =
    the whole corpus; per-doc milli-nat log-ratio of the two add-one
    unigram LMs.  One counting pass + broadcast model + map-side
    scoring.  Oracle: the same two LMs and rounding in SQL."""
    from ..stages.dsir import dsir_weights

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def is_target(t: pa.Table) -> np.ndarray:
        return pcc.equal(
            t["lang"], pa.scalar(DSIR_TARGET_LANG)
        ).to_numpy(zero_copy_only=False)

    out = (
        dsir_weights(ds, is_target)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "dsir_milli": pa.array(out["dsir_milli"], pa.int64()),
        }
    )


DSIR_SELECT_N = 50
DSIR_SELECT_SEED = "s1"

# shared CTE prefix for the dsir_weights / dsir_select oracles: the two
# add-one unigram LMs and the per-doc milli-nat ratio sums
_DSIR_SQL_CTE = f"""
            WITH tok AS (
              SELECT doc_id, lang,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS toks
              FROM documents),
            flat AS (SELECT doc_id, lang, unnest(toks) AS term FROM tok),
            ct AS (
              SELECT term, count(*) AS n_raw,
                     count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS n_tgt
              FROM flat GROUP BY term),
            tot AS (
              SELECT count(*) AS t_raw,
                     count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS t_tgt,
                     (SELECT count(*) FROM ct) AS v
              FROM flat),
            ratio AS (
              SELECT term,
                     CAST(floor(ln((n_tgt + 1.0) / (tot.t_tgt + tot.v)) * 1000 + 0.5) AS BIGINT)
                   - CAST(floor(ln((n_raw + 1.0) / (tot.t_raw + tot.v)) * 1000 + 0.5) AS BIGINT)
                       AS r_milli
              FROM ct, tot),
            doc_sum AS (
              SELECT f.doc_id, CAST(sum(r.r_milli) AS BIGINT) AS w,
                     CAST(count(*) AS BIGINT) AS n
              FROM flat f JOIN ratio r ON r.term = f.term GROUP BY f.doc_id)"""


def _gumbel_sql(id_expr: str, seed: str) -> str:
    from ..stages.selection import gumbel_sql_expr

    return gumbel_sql_expr(id_expr, seed)


def dsir_select_q(sf_dir: str):
    """DSIR importance RESAMPLING: Gumbel-top-k over the dsir_weights
    scores (key = dsir_milli + deterministic md5-seeded Gumbel noise in
    milli-nats).  Oracle: the same weights CTE + the bit-identical
    base-16-fraction Gumbel expression in SQL."""
    from ..stages.selection import dsir_select

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def is_target(t: pa.Table) -> np.ndarray:
        return pcc.equal(
            t["lang"], pa.scalar(DSIR_TARGET_LANG)
        ).to_numpy(zero_copy_only=False)

    return dsir_select(ds, is_target, DSIR_SELECT_N, seed=DSIR_SELECT_SEED)


def tfidf_keywords_q(sf_dir: str):
    """Top-3 TF-IDF keywords per document, integer-exact (int64
    tf x milli-nat idf).  One df exchange + broadcast idf model +
    map-side per-doc top-k.  Oracle: tokenizer CTE + window row_number."""
    from ..stages.tfidf import tfidf_keywords

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = (
        tfidf_keywords(ds, k=3)
        .to_pandas()
        .sort_values(["doc_id", "kw_rank"], ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "kw_rank": pa.array(out["kw_rank"], pa.int64()),
            "term": pa.array(out["term"], pa.string()),
            "tf": pa.array(out["tf"], pa.int64()),
            "score_milli": pa.array(out["score_milli"], pa.int64()),
        }
    )


COOC_VOCAB, COOC_MIN_COUNT, COOC_TOP_N = 50, 5, 50


def term_cooccurrence_q(sf_dir: str):
    """PMI co-occurrence of the top-50 vocabulary: df exchange -> per-batch
    docs x vocab presence matmul -> <=C(50,2)-row pair exchange; milli-nat
    PMI.  Oracle: distinct doc-term self-join over the same top vocab."""
    from ..stages.tfidf import term_cooccurrence

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return term_cooccurrence(
        ds, vocab_size=COOC_VOCAB, min_count=COOC_MIN_COUNT, top_n=COOC_TOP_N
    )


PAGERANK_ITERS = 3


def doc_pagerank(sf_dir: str):
    """Integer PageRank over the near-dup similarity graph (the same
    Jaccard>=0.5 pairs dedup_clusters uses), 3 iterations, micro-unit
    floor arithmetic.  Oracle: the pair CTE + 3 unrolled iterations with
    DuckDB's // integer division."""
    from ..stages.pagerank import pagerank

    pairs = _ngram_pairs(sf_dir)
    nodes = _read(sf_dir, "documents", columns=["doc_id"])
    out = (
        pagerank(pairs, nodes, num_iters=PAGERANK_ITERS)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "rank_micro": pa.array(out["rank_micro"], pa.int64()),
        }
    )


def _pagerank_sql(num_iters: int) -> str:
    """Unrolled integer-PageRank oracle over the shared jaccard-pair CTE."""
    head = """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
              FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 3),
            sz AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            prs AS (
              SELECT id_a, id_b
              FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
              WHERE i / (sa.s + sb.s - i) >= 0.5),
            edges AS (SELECT id_a AS src, id_b AS dst FROM prs
                      UNION ALL SELECT id_b, id_a FROM prs),
            deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
            r0 AS (SELECT doc_id AS v, CAST(1000000 AS BIGINT) AS r FROM documents)"""
    body = ""
    for k in range(1, num_iters + 1):
        body += f""",
            s{k} AS (
              SELECT e.dst AS v, sum(r{k - 1}.r // deg.d) AS s
              FROM edges e
              JOIN deg ON deg.src = e.src
              JOIN r{k - 1} ON r{k - 1}.v = e.src
              GROUP BY e.dst),
            r{k} AS (
              SELECT d.doc_id AS v,
                     CAST(150000 + (850 * COALESCE(s{k}.s, 0)) // 1000 AS BIGINT) AS r
              FROM documents d LEFT JOIN s{k} ON s{k}.v = d.doc_id)"""
    tail = f"""
            SELECT v AS doc_id, r AS rank_micro FROM r{num_iters} ORDER BY doc_id
        """
    return head + body + tail


def distinct_users_hll(sf_dir: str):
    """Approximate distinct users per event type via mergeable
    HyperLogLog sketches (map-side folds, one 4-KiB-row exchange —
    never a user-keyed shuffle).  Estimate is approximate by design:
    driver check is rows-only; exactness (register-identical folds) and
    accuracy (<8% vs exact) are pytest-gated."""
    from ..stages.hll import hll_distinct_by_group

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    out = hll_distinct_by_group(ds, "event_type", "user_id")
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "estimate_milli": pa.array(
                _micro(out["estimate"].to_numpy(np.float64), scale=1e3), pa.int64()
            ),
        }
    )


LINE_CHUNK = 20  # tokens per synthetic "paragraph" for line_dedup


DUP_SPAN_WIDTH = 8


def dup_spans(sf_dir: str):
    """Per-doc duplicated-span statistics (the exact-substring dedup
    shape of Lee et al. 2022 over fixed-width whitespace-token windows):
    ``n_spans`` = number of ``DUP_SPAN_WIDTH``-token windows in the doc,
    ``n_dup_spans`` = how many of them occur >= 2 times corpus-wide
    (across docs or repeated within one).  Oracle: exploded window texts
    + GROUP BY span + FILTER count."""
    from ..stages.spans import dup_span_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = (
        dup_span_stats(ds, width=DUP_SPAN_WIDTH)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_spans": pa.array(out["n_spans"], pa.int64()),
            "n_dup_spans": pa.array(out["n_dup_spans"], pa.int64()),
        }
    )


CHUNK_WINDOW = 32
CHUNK_STRIDE = 24


def doc_chunks(sf_dir: str):
    """Sliding-window long-document chunking (the context-window layout
    for training / embedding long docs with overlap): each doc's
    whitespace tokens are cut into ``CHUNK_WINDOW``-token windows every
    ``CHUNK_STRIDE`` tokens, provenance carried as (doc_id, chunk_idx,
    start_tok, n_tok).  1->many ``map_batches`` kernel, fully vectorized
    on the flat Arrow token buffer.  Oracle: generate_series starts +
    list slice + array_to_string."""
    from ..stages.packing import chunk_sliding_windows

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = (
        ds.map_batches(
            chunk_sliding_windows,
            batch_format="pyarrow",
            fn_kwargs=dict(window=CHUNK_WINDOW, stride=CHUNK_STRIDE),
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "chunk_idx": pa.array(out["chunk_idx"], pa.int64()),
            "start_tok": pa.array(out["start_tok"], pa.int64()),
            "n_tok": pa.array(out["n_tok"], pa.int64()),
            "chunk_text": pa.array(out["chunk_text"], pa.string()),
        }
    )


def line_dedup(sf_dir: str):
    """CCNet-style corpus-wide paragraph dedup: texts are chunked into
    20-token lines (deterministic, same expression in the oracle), then
    every distinct line survives only at its first (doc_id, line_idx)
    occurrence; docs are reassembled from their surviving lines.
    Oracle: exploded chunks + row_number + ordered string_agg."""
    from ..stages.linededup import dedup_lines

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk_project(t: pa.Table) -> pa.Table:
        toks = pcc.utf8_split_whitespace(
            pcc.utf8_lower(pcc.fill_null(pcc.cast(t["text"], pa.string()), ""))
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.values.to_numpy(zero_copy_only=False), dtype=object)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok_doc = np.repeat(np.arange(len(ids)), np.diff(offsets))
        keep = flat != ""
        flat, tok_doc = flat[keep], tok_doc[keep]
        if len(flat) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
            )
        starts = np.flatnonzero(np.r_[True, tok_doc[1:] != tok_doc[:-1]])
        pos = np.arange(len(flat)) - np.repeat(starts, np.diff(np.r_[starts, len(flat)]))
        seps = np.where(pos % LINE_CHUNK == 0, "\n", " ").astype(object)
        seps[starts] = ""
        joined = (
            pd.DataFrame({"d": tok_doc, "s": seps + flat})
            .groupby("d", sort=True)["s"]
            .agg("".join)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[joined.index.to_numpy()]),
                "text": pa.array(joined.to_numpy(), pa.string()),
            }
        )

    out = (
        dedup_lines(ds.map_batches(chunk_project, batch_format="pyarrow"))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
        }
    )


SHUFFLE_SEED = "s0"


def global_shuffle(sf_dir: str):
    """Deterministic seeded global shuffle: every document's position in
    the md5-keyed permutation (dense 0..N-1), identical on any run or
    partitioning.  Oracle: ``row_number() OVER (ORDER BY md5(...))``."""
    from ..stages.shuffle import shuffle_positions

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    out = (
        shuffle_positions(ds, id_col="doc_id", seed=SHUFFLE_SEED)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "pos": pa.array(out["pos"], pa.int64()),
        }
    )


def orders_with_returns(sf_dir: str):
    """Distributed SEMI-join (the EXISTS counterpart of
    customers_no_urgent's anti-join): orders with at least one returned
    lineitem (l_returnflag = 'R'), counted per order priority.  Same
    tag-and-union shape — orders rows src=0 carry the priority, returned
    lineitem orderkeys src=1 — one key-partitioned groupby keeps groups
    that DO have a src=1 row; no driver-side key set at any scale."""
    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def order_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pcc.cast(t["o_orderkey"], pa.int64()),
                "priority": pcc.cast(t["o_orderpriority"], pa.string()),
                "src": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    def returned_side(t: pa.Table) -> pa.Table:
        m = pcc.equal(t["l_returnflag"], pa.scalar("R"))
        keys = pcc.unique(pcc.cast(t.filter(m)["l_orderkey"], pa.int64()))
        return pa.table(
            {
                "key": keys,
                "priority": pa.array([""] * len(keys), pa.string()),
                "src": pa.array(np.ones(len(keys), dtype=np.int64)),
            }
        )

    tagged = orders.map_batches(order_side, batch_format="pyarrow").union(
        li.map_batches(returned_side, batch_format="pyarrow")
    )

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        if not (df["src"] == 1).any():
            return pd.DataFrame({"priority": pd.Series([], dtype=object)})
        return pd.DataFrame({"priority": df.loc[df["src"] == 0, "priority"]})

    out = (
        tagged.groupby("key")
        .map_groups(semi, batch_format="pandas")
        .groupby("priority")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("priority", ignore_index=True)
    )
    return pa.table(
        {
            "priority": pa.array(out["priority"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


def ttr_by_lang(sf_dir: str):
    """Type-token ratio per language (lexical-diversity corpus statistic):
    distinct terms vs total token occurrences per lang, micro-encoded.
    Types come from per-batch distinct (lang, term) partials -> one
    (lang, term)-keyed groupby (the vocabulary exchange term_df_top100
    already pays, here lang-salted so hot languages spread); totals from
    a shuffle-free bincount partial + tiny groupby(lang) sum."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        flat = toks.values if not isinstance(toks, pa.ChunkedArray) else toks.combine_chunks().values
        par = pcc.list_parent_indices(
            toks if not isinstance(toks, pa.ChunkedArray) else toks.combine_chunks()
        ).to_numpy(zero_copy_only=False)
        lang = t["lang"].to_pandas().to_numpy()
        df_ = pd.DataFrame({"lang": lang[par], "term": flat.to_pandas()}).drop_duplicates()
        return pa.Table.from_pandas(df_, preserve_index=False)

    types = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame({"lang": t["lang"].to_pandas()})
                .groupby("lang", sort=False).size().rename("n_types").reset_index(),
                preserve_index=False,
            ),
            batch_format="pyarrow",
        )
        .groupby("lang")
        .aggregate(Sum("n_types", alias_name="n_types"))
        .to_pandas()
    )

    def totals(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        par = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = np.bincount(par, minlength=len(t)).astype(np.int64)
        return pa.Table.from_pandas(
            pd.DataFrame({"lang": t["lang"].to_pandas(), "n": n})
            .groupby("lang", sort=False)["n"].sum().rename("n_tokens").reset_index(),
            preserve_index=False,
        )

    totals_df = (
        ds.map_batches(totals, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"))
        .to_pandas()
    )
    out = types.merge(totals_df, on="lang").sort_values("lang", ignore_index=True)
    ttr = _micro(
        out["n_types"].to_numpy(np.float64) / np.maximum(out["n_tokens"].to_numpy(np.float64), 1.0)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_types": pa.array(out["n_types"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "ttr_micro": pa.array(ttr),
        }
    )


def customers_no_urgent(sf_dir: str):
    """Distributed ANTI-join: customers with no URGENT order, counted per
    nation.  Shape: tag-and-union on the join key (customer rows src=0,
    distinct urgent-order custkeys src=1) -> one key-partitioned
    ``groupby(key)`` keeps groups with no src=1 row — never a driver-side
    key set; the tiny nation dimension is a broadcast lookup."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def cust_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pcc.cast(t["c_custkey"], pa.int64()),
                "nationkey": pcc.cast(t["c_nationkey"], pa.int64()),
                "src": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    def urgent_side(t: pa.Table) -> pa.Table:
        m = pcc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))
        keys = pcc.cast(t.filter(m)["o_custkey"], pa.int64())
        return pa.table(
            {
                "key": keys,
                "nationkey": pa.array(np.full(len(keys), -1, dtype=np.int64)),
                "src": pa.array(np.ones(len(keys), dtype=np.int64)),
            }
        )

    tagged = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(urgent_side, batch_format="pyarrow")
    )

    def nation_partial(t: pa.Table) -> pa.Table:
        # post-groupby each key is globally unique: max(src)=0 <=> the
        # customer has no urgent order; max(nationkey) recovers the
        # customer row's nation (urgent rows carry -1).  Fold per-block
        # (nationkey, n) partials — 25-key driver sum, no second shuffle.
        keep = t["max_src"].to_numpy(zero_copy_only=False) == 0
        nk = t["max_nationkey"].to_numpy(zero_copy_only=False)[keep]
        u, c = np.unique(nk, return_counts=True)
        return pa.table({"nationkey": pa.array(u), "n": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Max

    per_nation = (
        tagged.groupby("key")
        .aggregate(
            Max("src", alias_name="max_src"),
            Max("nationkey", alias_name="max_nationkey"),
        )
        .map_batches(nation_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("nationkey", as_index=False)["n"].sum()
    )
    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    out = (
        per_nation.merge(nation, left_on="nationkey", right_on="n_nationkey")
        .sort_values("n_name", ignore_index=True)
    )
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


def events_rollup(sf_dir: str):
    """ROLLUP aggregate over (event_type, day): leaf groups via one
    distributed pre-aggregated groupby; the two super-levels are folded
    from the (tiny) leaf aggregate — algebraic, so no second scan.
    Oracle: ``GROUP BY ROLLUP``."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "day": pcc.strftime(t["ts"], format="%Y-%m-%d"),
                "value_c": _cents_col(t["value"]),
            }
        )

    leaf = (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="value_c"))
        .to_pandas()
    )
    lvl1 = (
        leaf.groupby("event_type", as_index=False)[["n", "value_c"]]
        .sum()
        .assign(day="ALL")
    )
    lvl2 = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "day": ["ALL"],
            "n": [leaf["n"].sum()],
            "value_c": [leaf["value_c"].sum()],
        }
    )
    out = pd.concat([leaf, lvl1, lvl2], ignore_index=True).sort_values(
        ["event_type", "day"], ignore_index=True
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "day": pa.array(out["day"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "value_c": pa.array(out["value_c"], pa.int64()),
        }
    )


def user_running_value(sf_dir: str):
    """Per-user RUNNING cumulative value (the ordered-window aggregate):
    cents-exact cumsum over (ts, event_id) order inside one
    key-partitioned ``groupby(user_id)``.  Oracle: ``SUM() OVER
    (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED PRECEDING)``."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value_c": _cents_col(t["value"]),
            }
        )

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], ignore_index=True)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "cum_value_c": df["value_c"].to_numpy().cumsum(),
            }
        )

    out = (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(running, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    return pa.table(
        {
            "event_id": pa.array(out["event_id"], pa.int64()),
            "user_id": pa.array(out["user_id"], pa.int64()),
            "cum_value_c": pa.array(out["cum_value_c"], pa.int64()),
        }
    )


def events_cube(sf_dir: str):
    """CUBE grouping sets over (event_type, day): the full lattice —
    leaf, each single-attribute rollup, and the grand total.  Like
    ``events_rollup``, only the LEAF aggregate is distributed (one
    pre-aggregated groupby); all three super-levels fold algebraically
    from the tiny leaf table, so the data is scanned once regardless of
    how many grouping sets the lattice has.  Oracle: ``GROUP BY CUBE``."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "day": pcc.strftime(t["ts"], format="%Y-%m-%d"),
                "value_c": _cents_col(t["value"]),
            }
        )

    leaf = (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="value_c"))
        .to_pandas()
    )
    by_type = (
        leaf.groupby("event_type", as_index=False)[["n", "value_c"]]
        .sum()
        .assign(day="ALL")
    )
    by_day = (
        leaf.groupby("day", as_index=False)[["n", "value_c"]]
        .sum()
        .assign(event_type="ALL")
    )
    total = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "day": ["ALL"],
            "n": [leaf["n"].sum()],
            "value_c": [leaf["value_c"].sum()],
        }
    )
    out = pd.concat([leaf, by_type, by_day, total], ignore_index=True).sort_values(
        ["event_type", "day"], ignore_index=True
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "day": pa.array(out["day"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "value_c": pa.array(out["value_c"], pa.int64()),
        }
    )


def user_moving_sum(sf_dir: str, window: int = 4):
    """Per-user MOVING window aggregate: cents-exact sum of the last
    ``window`` events in (ts, event_id) order — the bounded-frame
    counterpart of ``user_running_value``'s unbounded cumsum.  One
    key-partitioned ``groupby(user_id)``; inside each group the frame
    sum is ``cumsum - shift(cumsum, window)`` (vectorized, no per-row
    loop).  Oracle: ``SUM() OVER (... ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW)``."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value_c": _cents_col(t["value"]),
            }
        )

    def moving(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], ignore_index=True)
        c = df["value_c"].to_numpy(dtype=np.int64).cumsum()
        lag = np.concatenate([np.zeros(min(window, len(c)), dtype=np.int64), c[:-window]])
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "win_value_c": c - lag,
            }
        )

    out = (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(moving, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    return pa.table(
        {
            "event_id": pa.array(out["event_id"], pa.int64()),
            "user_id": pa.array(out["user_id"], pa.int64()),
            "win_value_c": pa.array(out["win_value_c"], pa.int64()),
        }
    )


def user_event_gaps(sf_dir: str):
    """LAG/LEAD shape: per-user inter-arrival gaps — count of gaps and
    their total in INTEGER seconds (exact on both sides).  One
    key-partitioned ``groupby(user_id)`` with a vectorized diff inside
    the group.  Oracle: ``lag(ts) OVER`` + ``date_diff('second', ...)``."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], ignore_index=True)
        d = df["ts"].diff().dropna()
        # integer microseconds floor-divided to seconds — the exact
        # expression the SQL oracle applies (epoch_us diff // 1e6)
        secs = d.to_numpy().astype("timedelta64[us]").astype(np.int64) // 1_000_000
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "n_gaps": [len(secs)],
                "gap_total_s": [int(secs.sum())],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(gaps, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    return pa.table(
        {
            "user_id": pa.array(out["user_id"], pa.int64()),
            "n_gaps": pa.array(out["n_gaps"], pa.int64()),
            "gap_total_s": pa.array(out["gap_total_s"], pa.int64()),
        }
    )


QUANTILE_QS_GROUPED = (0.25, 0.5, 0.75)


def token_quantiles_by_lang(sf_dir: str):
    """GROUPED exact quantiles: p25/p50/p75 whitespace-token counts per
    language — ``exact_quantiles``' bounded-domain histogram pattern,
    keyed.  The only exchange is the (lang, value, count) histogram
    partials; no sort, no full shuffle.  Oracle: ``quantile_disc``
    per group (rank-rule-identical)."""
    from ..stages.sketch import exact_quantiles_by_key

    return exact_quantiles_by_key(
        _ws_token_counts(sf_dir, with_lang=True),
        qs=QUANTILE_QS_GROUPED,
        value_col="n_tokens",
        key_col="lang",
    )


def length_outliers(sf_dir: str):
    """Per-language token-length outliers: documents whose whitespace
    token count deviates from their language's mean by more than 1.5
    population standard deviations.  The z-score test is evaluated in
    EXACT int64 arithmetic — ``|x - mu| > 1.5*sigma``  <=>
    ``4*(n*x - S)^2 > 9*(n*Q - S^2)`` with S = sum(x), Q = sum(x^2) —
    so both sides of the oracle compare identically (no float threshold
    flips).  Shape: one pass of per-batch moment partials (lang, n, S, Q)
    -> tiny per-lang groupby -> stats broadcast to a second filter pass;
    the document table itself never shuffles.  int64 is exact while
    n*Q < 2^63 (~1e5-token docs up to ~1e8 rows per language); beyond
    that, split groups or widen to object ints."""
    import ray
    from ray.data.aggregate import Sum

    # compact (doc_id, n_tokens, lang) projection is consumed twice
    # (moments pass + filter pass): materialize once instead of
    # re-tokenizing the corpus on the second traversal
    counts = _ws_token_counts(sf_dir, with_lang=True).materialize()

    def moments(t: pa.Table) -> pa.Table:
        x = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        df_ = pd.DataFrame({"lang": t["lang"].to_pandas(), "x": x, "xx": x * x})
        g = df_.groupby("lang", sort=False).agg(
            n=("x", "size"), s=("x", "sum"), q=("xx", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (
        counts.map_batches(moments, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("q", alias_name="q"))
        .to_pandas()
    )
    sref = ray.put(
        {
            r.lang: (int(r.n), int(r.s), int(r.q))
            for r in stats.itertuples(index=False)
        }
    )

    class FilterOutliers:
        def __init__(self):
            self.stats = ray.get(sref)

        def __call__(self, t: pa.Table) -> pa.Table:
            langs = t["lang"].to_pandas()
            x = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = langs.map(lambda l: self.stats[l][0]).to_numpy(np.int64)
            s = langs.map(lambda l: self.stats[l][1]).to_numpy(np.int64)
            q = langs.map(lambda l: self.stats[l][2]).to_numpy(np.int64)
            dev = n * x - s
            keep = 4 * dev * dev > 9 * (n * q - s * s)
            return t.filter(pa.array(keep))

    out = counts.map_batches(FilterOutliers, batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    if "doc_id" not in out.columns:  # every block filtered empty: no outliers
        out = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "lang": pd.Series([], dtype=str),
                "n_tokens": pd.Series([], dtype="int64"),
            }
        )
    out = out.sort_values("doc_id", ignore_index=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "lang": pa.array(out["lang"], pa.string()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
        }
    )


SETOP_TYPE_A = "click"
SETOP_TYPE_B = "purchase"


def user_set_ops(sf_dir: str):
    """Distributed set operations over the distinct-user sets of two
    event types: |A UNION B|, |A INTERSECT B|, |A EXCEPT B|.  Shape:
    one membership-bitmask exchange — project each event to
    (user_id, bit_a, bit_b), ``groupby(user_id).max`` collapses to one
    row per user carrying its set membership, and the three counts fold
    from the bitmask aggregate (map-side pre-aggregation keeps the
    exchange at distinct-user size).  Oracle: three set-op COUNTs."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def bits(t: pa.Table) -> pa.Table:
        a = pcc.equal(t["event_type"], pa.scalar(SETOP_TYPE_A))
        b = pcc.equal(t["event_type"], pa.scalar(SETOP_TYPE_B))
        keep = pcc.or_(a, b)
        tt = pa.table(
            {
                "user_id": t["user_id"],
                "bit_a": pcc.cast(a, pa.int64()),
                "bit_b": pcc.cast(b, pa.int64()),
            }
        ).filter(keep)
        # local pre-aggregation: one row per (user present in this batch)
        df = tt.to_pandas().groupby("user_id", as_index=False)[["bit_a", "bit_b"]].max()
        return pa.Table.from_pandas(df, preserve_index=False)

    members = (
        ds.map_batches(bits, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("bit_a", alias_name="a"), Max("bit_b", alias_name="b"))
        .to_pandas()
    )
    a = members["a"].to_numpy(dtype=np.int64)
    b = members["b"].to_numpy(dtype=np.int64)
    rows = {
        "except_ab": int(((a == 1) & (b == 0)).sum()),
        "intersect": int(((a == 1) & (b == 1)).sum()),
        "union": int(len(members)),
    }
    return pa.table(
        {
            "op": pa.array(sorted(rows), pa.string()),
            "n_users": pa.array([rows[k] for k in sorted(rows)], pa.int64()),
        }
    )


SAMPLE_SEED = "smp1"
SAMPLE_PER_GROUP = 3


def event_type_sample(sf_dir: str):
    """Deterministic per-group sampling: ``SAMPLE_PER_GROUP`` events per
    event_type, chosen by md5 rank (seeded, partitioning-independent —
    the grouped counterpart of ``global_shuffle``'s permutation).  Shape:
    each block keeps only its LOCAL top-3-per-type candidates (map-side
    combiner — at most ``groups x 3`` rows leave any block), the driver
    merges ``blocks x groups x 3`` tiny partials.  No shuffle at all.
    Oracle: ``row_number() OVER (PARTITION BY event_type ORDER BY
    md5(...))``."""
    import hashlib as _hl

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def local_top(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        digs = np.array(
            [
                _hl.md5(f"{SAMPLE_SEED}:{i}".encode()).hexdigest()
                for i in ids
            ],
            dtype=object,
        )
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "event_id": ids,
                "dig": digs,
            }
        )
        df = df.sort_values(["event_type", "dig"]).groupby("event_type").head(
            SAMPLE_PER_GROUP
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    out = (
        cand.sort_values(["event_type", "dig"])
        .groupby("event_type")
        .head(SAMPLE_PER_GROUP)
        .sort_values(["event_type", "dig"], ignore_index=True)
    )
    rank = out.groupby("event_type").cumcount() + 1
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "rn": pa.array(rank.to_numpy(), pa.int64()),
            "event_id": pa.array(out["event_id"], pa.int64()),
        }
    )


# ----------------------------------------------------------- SQL oracles


def _lang_id_sql() -> str:
    """SQL mirror of ``lang_id_batch``: distinct lowered words, per-language
    marker hits, first-language-wins-ties argmax, CJK codepoint override.
    Marker lists are generated from the SAME dict the Python heuristic uses
    so the two can never drift."""
    from ..stages.text_stats import _LANG_MARKERS

    order = [lang for lang, m in _LANG_MARKERS.items() if m]  # en, de, fr, es
    score_cols = []
    for lang in order:
        markers = ", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang]))
        score_cols.append(
            f"len(list_filter(words, x -> x IN ({markers}))) AS s_{lang}"
        )
    # Python replaces best only on STRICTLY greater score, so the earliest
    # language in dict order wins ties: lang_i wins iff s_i >= s_j for j > i
    cases = []
    for i, lang in enumerate(order[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{later}" for later in order[i + 1 :])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    all_scores = ", ".join(f"s_{lang}" for lang in order)
    return f"""
        WITH w AS (
          SELECT doc_id, text,
                 list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                           x -> length(x) > 0)) AS words
          FROM documents),
        s AS (SELECT doc_id, text, {", ".join(score_cols)} FROM w)
        SELECT doc_id,
               CASE WHEN regexp_matches(substr(text, 1, 2000), '[一-鿿]') THEN 'zh'
                    WHEN greatest({all_scores}) = 0 THEN 'unknown'
                    {" ".join(cases)}
                    ELSE '{order[-1]}' END AS lang_pred
        FROM s ORDER BY doc_id
    """


def _redact_sql() -> str:
    """Chained regexp_replace oracle mirroring redact_pii's fixed pattern
    order; counts taken per stage on that stage's input text."""
    from ..stages.text_stats import PII_PATTERNS

    prev = "props"
    ctes, selects = [], []
    for i, (name, pattern, placeholder) in enumerate(PII_PATTERNS):
        ctes.append(
            f"s{i} AS (SELECT event_id, "
            f"len(regexp_extract_all({prev}, '{pattern}')) AS n_{name}, "
            f"regexp_replace({prev}, '{pattern}', '{placeholder}', 'g') AS t{i}"
            + (f", {', '.join(selects)}" if selects else "")
            + f" FROM {'events' if i == 0 else f's{i-1}'})"
        )
        selects.append(f"n_{name}")
        prev = f"t{i}"
    names = ", ".join(selects)
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT event_id, {prev} AS redacted, {names} "
        + f"FROM s{len(PII_PATTERNS) - 1} ORDER BY event_id"
    )


NTILE_TILES = 10


def doc_deciles(sf_dir: str, tiles: int = NTILE_TILES):
    """Distributed NTILE(tiles) over the corpus-wide total order
    (n_chars, doc_id) — the global-window operator the reference never
    needed but any training-data curriculum (size-tiered sampling,
    length-balanced batching) does.

    A global sort is avoided with the low-cardinality-key rank trick:
    n_chars has few distinct values relative to rows, so

    - phase 1: ``groupby(n_chars).count`` -> tiny table to the driver ->
      exclusive cumsum in key order = each value-group's global starting
      rank (same shape as the shuffle/packing prefix sums);
    - phase 2: one ``groupby(n_chars)`` exchange, rank within the group
      by doc_id, tile from the SQL NTILE fill rule (first ``N % tiles``
      tiles get one extra row).

    At 100 TB the per-value groups are corpus/|distinct|; a high-
    cardinality measure would first be coarsened (bucket = value range
    from sampled boundaries, exactly like the index build's doc-range
    partitioner) — same two phases.  Oracle: ``ntile() OVER (ORDER BY
    n_chars, doc_id)``.
    """
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    counts = (
        ds.groupby("n_chars")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("n_chars", ignore_index=True)
    )
    n_total = int(counts["n"].sum())
    offs = np.concatenate(([0], np.cumsum(counts["n"].to_numpy())[:-1]))
    offsets = dict(
        zip(counts["n_chars"].to_numpy(np.int64), offs.astype(np.int64))
    )
    q, rem = divmod(n_total, tiles)
    big = rem * (q + 1)  # ranks below this go in the (q+1)-row tiles

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", ignore_index=True)
        base = offsets[int(df["n_chars"].iloc[0])]
        r = base + np.arange(len(df), dtype=np.int64)
        tile = np.where(r < big, r // (q + 1), rem + (r - big) // max(q, 1))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_chars": df["n_chars"].to_numpy(np.int64),
                "tile": tile.astype(np.int64) + 1,
            }
        )

    out = (
        ds.groupby("n_chars")
        .map_groups(rank_group, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
            "tile": pa.array(out["tile"], pa.int64()),
        }
    )


HIST_BUCKET_WIDTH = 256


def length_histogram(sf_dir: str, width: int = HIST_BUCKET_WIDTH):
    """Numeric range facet: fixed-width histogram of document length
    (bucket = n_chars // width) with per-bucket count and actual value
    extent — the ES-style histogram aggregation alongside bm25_facets'
    categorical facets.  Single partial-aggregate pass: the bucket key is
    computed per batch (Arrow integer divide, zero-copy) and one
    ``groupby(bucket)`` folds count/min/max; the exchange carries one row
    per (block, bucket), never the corpus."""
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def bucketize(t: pa.Table) -> pa.Table:
        n = pcc.cast(t["n_chars"], pa.int64())
        return pa.table(
            {"bucket": pcc.divide(n, pa.scalar(width, pa.int64())), "n_chars": n}
        )

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Count(alias_name="n"),
            Min("n_chars", alias_name="lo"),
            Max("n_chars", alias_name="hi"),
        )
        .to_pandas()
        .sort_values("bucket", ignore_index=True)
    )
    return pa.table(
        {
            "bucket": pa.array(out["bucket"], pa.int64()),
            "n": pa.array(out["n"], pa.int64()),
            "lo": pa.array(out["lo"], pa.int64()),
            "hi": pa.array(out["hi"], pa.int64()),
        }
    )


PROFILE_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


def lineitem_profile(sf_dir: str):
    """Column-profiling operator (the DESCRIBE/data-quality pass every
    ingestion pipeline runs first): per column, row count, null count,
    EXACT distinct count, and min/max — values micro-encoded so both
    sides compare integer-exactly.

    Distributed shape: pass A explodes batches to per-batch-distinct
    (col, v) pairs, a ``groupby(col, v)`` collapses them globally, then a
    second tiny ``groupby(col)`` reduces the distinct-value stream to
    (n_distinct, min, max) — the distinct set is never collected to the
    driver, so a high-cardinality column at 100 TB stays distributed.
    Pass B folds per-batch (n, n_null) partials.  4 rows join on the
    driver."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", columns=PROFILE_COLS)

    def distinct_pairs(t: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in PROFILE_COLS:
            v = np.unique(
                _micro(pcc.drop_null(t[c]).to_numpy(zero_copy_only=False))
            )
            cols.append(np.full(len(v), PROFILE_COLS.index(c), dtype=np.int64))
            vals.append(v)
        return pa.table(
            {
                "ci": pa.array(np.concatenate(cols)),
                "v": pa.array(np.concatenate(vals)),
            }
        )

    def block_partial(t: pa.Table) -> pa.Table:
        # after the (ci, v) groupby every pair is globally unique, so a
        # per-block (count, min, max) partial folds exactly on the
        # driver — no second all-to-all exchange needed
        df_ = pd.DataFrame(
            {
                "ci": t["ci"].to_numpy(zero_copy_only=False),
                "v": t["v"].to_numpy(zero_copy_only=False),
            }
        )
        g = df_.groupby("ci", sort=False).agg(
            n_distinct=("v", "size"),
            min_micro=("v", "min"),
            max_micro=("v", "max"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    dist = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["ci", "v"])
        .aggregate(Count(alias_name="_"))
        .map_batches(block_partial, batch_format="pyarrow")
        .to_pandas()
    )
    dist = dist.groupby("ci", as_index=False).agg(
        n_distinct=("n_distinct", "sum"),
        min_micro=("min_micro", "min"),
        max_micro=("max_micro", "max"),
    )

    def count_partials(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ci": pa.array(np.arange(len(PROFILE_COLS), dtype=np.int64)),
                "n": pa.array(np.full(len(PROFILE_COLS), len(t), dtype=np.int64)),
                "n_null": pa.array(
                    np.array([t[c].null_count for c in PROFILE_COLS], dtype=np.int64)
                ),
            }
        )

    cnt = (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .groupby("ci")
        .aggregate(Sum("n", alias_name="n"), Sum("n_null", alias_name="n_null"))
        .to_pandas()
    )
    m = dist.merge(cnt, on="ci").sort_values("ci", ignore_index=True)
    return pa.table(
        {
            "col_name": pa.array([PROFILE_COLS[int(i)] for i in m["ci"]], pa.string()),
            "n": pa.array(m["n"], pa.int64()),
            "n_null": pa.array(m["n_null"], pa.int64()),
            "n_distinct": pa.array(m["n_distinct"], pa.int64()),
            "min_micro": pa.array(m["min_micro"], pa.int64()),
            "max_micro": pa.array(m["max_micro"], pa.int64()),
        }
    )


# ---------------------------------------------- round-2 relational shapes

Q17_BRAND = "Brand#13"
Q18_MIN_QTY = 280
Q18_LIMIT = 100
Q18_DRIVER_MAX_BIG = 100_000
PCT_QUANTILES = (0.25, 0.5, 0.75)  # dyadic: interpolation is float-EXACT
SEMI_PRIORITY = "1-URGENT"


def custdist(sf_dir: str):
    """TPC-H Q13 shape: LEFT OUTER JOIN customer -> non-urgent orders,
    orders-per-customer, then the distribution of those counts.

    Distributed WITHOUT shuffling the customer table: per-batch
    (custkey -> n) partials over the filtered orders -> one
    groupby(custkey) sum -> a tiny groupby(c_count) count.  The LEFT-JOIN
    zero bucket is |customer| (parquet metadata count, no scan) minus the
    custkeys seen — valid because o_custkey is a foreign key into
    customer, so the two sets differ only by no-order customers."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def per_cust(t: pa.Table) -> pa.Table:
        m = pcc.not_equal(t["o_orderpriority"], pa.scalar(SEMI_PRIORITY))
        ck = pcc.cast(t.filter(m)["o_custkey"], pa.int64()).to_pandas()
        g = ck.groupby(ck, sort=False).size()
        return pa.table(
            {
                "c_custkey": pa.array(g.index.to_numpy(np.int64)),
                "n": pa.array(g.to_numpy(np.int64)),
            }
        )

    dist = (
        orders.map_batches(per_cust, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
        .groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
        .to_pandas()
    )
    n_cust = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    zero = int(n_cust) - int(dist["custdist"].sum())
    if zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    dist = dist.sort_values(
        ["custdist", "c_count"], ascending=[False, False], ignore_index=True
    )
    return pa.table(
        {
            "c_count": pa.array(dist["c_count"].to_numpy(np.int64)),
            "custdist": pa.array(dist["custdist"].to_numpy(np.int64)),
        }
    )


def small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape (correlated per-group average, decorrelated):
    revenue from lineitems of one brand's parts with quantity below 20%
    of that part's average lineitem quantity.

    The correlated subquery becomes: Bloom-prefilter lineitem on the
    brand's partkeys MAP-SIDE (stages/bloom.py — the probe volume drops
    to roughly the brand's 1/25 share before any exchange), then ONE
    groupby(partkey) computes the per-part average AND applies the
    integer-exact inequality ``qty*5*cnt < sum_qty`` (== qty < 0.2*avg,
    exact because l_quantity is integral) inside the same group.  A
    Bloom false-positive partkey carries no src=1 tag row and is dropped
    in the group — the result is exact."""
    import ray

    from ..stages.bloom import BloomPrefilter, build_bloom

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def brand_keys(t: pa.Table) -> pa.Table:
        m = pcc.equal(t["p_brand"], pa.scalar(Q17_BRAND))
        return pa.table({"key": pcc.cast(t.filter(m)["p_partkey"], pa.int64())})

    keys_ds = part.map_batches(brand_keys, batch_format="pyarrow")
    n_bits, k = 1 << 20, 5
    bloom_ref = ray.put(build_bloom(keys_ds, "key", n_bits=n_bits, k=k))

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def li_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pcc.cast(t["l_partkey"], pa.int64()),
                "q": pcc.cast(t["l_quantity"], pa.int64()),
                "price_c": _cents_col(t["l_extendedprice"]),
                "src": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    def tag_keys(t: pa.Table) -> pa.Table:
        z = np.zeros(len(t), dtype=np.int64)
        return pa.table(
            {
                "key": t["key"],
                "q": pa.array(z),
                "price_c": pa.array(z),
                "src": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )

    probe = li.map_batches(li_rows, batch_format="pyarrow").map_batches(
        BloomPrefilter,
        fn_constructor_kwargs={
            "bitmap_ref": bloom_ref,
            "column": "key",
            "n_bits": n_bits,
            "k": k,
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    tagged = probe.union(keys_ds.map_batches(tag_keys, batch_format="pyarrow"))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if not (df["src"] == 1).any():
            return pd.DataFrame({"price_c": pd.Series([], dtype=np.int64)})
        rows = df[df["src"] == 0]
        sumq = int(rows["q"].sum())
        cnt = len(rows)
        keep = rows[rows["q"].to_numpy(np.int64) * 5 * cnt < sumq]
        return pd.DataFrame({"price_c": keep["price_c"].to_numpy(np.int64)})

    from ray.data.aggregate import Count, Sum

    agg = (
        tagged.groupby("key")
        .map_groups(per_part, batch_format="pandas")
        .aggregate(Sum("price_c", alias_name="revenue_cents"), Count(alias_name="n_items"))
    ) or {}
    rev = int(agg.get("revenue_cents") or 0)
    n = int(agg.get("n_items") or 0)
    return pa.table(
        {
            "revenue_cents": pa.array([rev], pa.int64()),
            "n_items": pa.array([n], pa.int64()),
        }
    )


def large_volume_orders(sf_dir: str):
    """TPC-H Q18 shape (HAVING on a grouped sum, then enrich-join):
    orders whose total lineitem quantity exceeds ``Q18_MIN_QTY``, with
    customer name and order fields, top-``Q18_LIMIT`` by
    (totalprice desc, orderkey asc).

    The grouped sum is map-side partial (orderkey -> qty ints) + one
    groupby(orderkey); the HAVING filter keeps a ~1e-2 fraction.  Below
    ``Q18_DRIVER_MAX_BIG`` survivors the enrichment is driver pushdown
    reads (orderkey/custkey predicate pushdown on the parquet, the
    repo's gated-shortcut convention); above it, the survivors join
    orders and customer via ``Dataset.join`` and the top-k is per-block
    partial + driver merge (k rows per block, never a global sort)."""
    import pyarrow.dataset as pads

    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def per_order(t: pa.Table) -> pa.Table:
        ok = pcc.cast(t["l_orderkey"], pa.int64()).to_pandas()
        q = pcc.cast(t["l_quantity"], pa.int64()).to_pandas()
        g = q.groupby(ok, sort=False).sum()
        return pa.table(
            {
                "o_orderkey": pa.array(g.index.to_numpy(np.int64)),
                "qty": pa.array(g.to_numpy(np.int64)),
            }
        )

    big = (
        li.map_batches(per_order, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("qty", alias_name="total_qty"))
        .map_batches(
            lambda t: t.filter(
                pcc.greater(t["total_qty"], pa.scalar(Q18_MIN_QTY))
            ),
            batch_format="pyarrow",
        )
        .materialize()  # HAVING keeps ~1e-2 of orders; blocks stay in the store
    )
    n_big = big.count()

    def _topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(
            ["totalprice_cents", "o_orderkey"], ascending=[False, True]
        ).head(Q18_LIMIT)
        return pa.table(
            {
                "c_name": pa.array(df["c_name"].astype(str), pa.string()),
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64)),
                "o_orderdate": pa.array(df["o_orderdate"]),
                "totalprice_cents": pa.array(df["totalprice_cents"].to_numpy(np.int64)),
                "total_qty": pa.array(df["total_qty"].to_numpy(np.int64)),
            }
        )

    if n_big <= Q18_DRIVER_MAX_BIG:
        big_df = big.to_pandas()
        if big_df.empty:
            return _topk(
                pd.DataFrame(
                    columns=[
                        "c_name", "o_orderkey", "o_orderdate",
                        "totalprice_cents", "total_qty",
                    ]
                ).astype({"o_orderkey": np.int64, "totalprice_cents": np.int64,
                          "total_qty": np.int64, "o_orderdate": "datetime64[us]"})
            )
        keys = big_df["o_orderkey"].to_numpy(np.int64)
        otbl = (
            pads.dataset(os.path.join(sf_dir, "orders.parquet"))
            .to_table(
                columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
                filter=pads.field("o_orderkey").isin(keys),
            )
            .to_pandas()
        )
        ctbl = (
            pads.dataset(os.path.join(sf_dir, "customer.parquet"))
            .to_table(
                columns=["c_custkey", "c_name"],
                filter=pads.field("c_custkey").isin(otbl["o_custkey"].unique()),
            )
            .to_pandas()
        )
        m = big_df.merge(otbl, on="o_orderkey").merge(
            ctbl, left_on="o_custkey", right_on="c_custkey"
        )
        m["totalprice_cents"] = _micro(m["o_totalprice"].to_numpy(np.float64), 100.0)
        return _topk(m)

    # distributed path: Dataset.join enrich + per-block top-k partials
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    nparts = _join_parts(sf_dir, "orders", "customer")
    joined = big.join(
        _with_join_sentinels(orders, "o_orderkey"),
        join_type="inner",
        num_partitions=nparts,
        on=("o_orderkey",),
    )
    joined = joined.join(
        _with_join_sentinels(cust, "c_custkey"),
        join_type="inner",
        num_partitions=nparts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["totalprice_cents"] = _micro(df["o_totalprice"].to_numpy(np.float64), 100.0)
        return _topk(df)

    parts = joined.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    return _topk(parts)


def value_percentiles(sf_dir: str):
    """Interpolated percentiles (SQL ``quantile_cont``) over events.value,
    EXACT and sort-free: values have 2-decimal resolution, so the cents
    domain is bounded (<=~50k distinct) — per-batch ``np.unique`` partial
    histograms -> one groupby(cents) sum -> driver CDF -> the two order
    statistics around ``pos = q*(N-1)`` -> linear interpolation.  The
    quantiles are dyadic (1/4, 1/2, 3/4), so interpolation arithmetic on
    integer cents is float-EXACT — the milli-cent encoding matches the
    SQL oracle bit-for-bit regardless of evaluation order."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["value"])

    def hist(t: pa.Table) -> pa.Table:
        c = _cents_col(t["value"]).to_numpy(zero_copy_only=False)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cents": pa.array(u), "n": pa.array(n.astype(np.int64))})

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("cents", ignore_index=True)
    )
    vals = h["cents"].to_numpy(np.int64)
    cum = h["n"].to_numpy(np.int64).cumsum()
    n_total = int(cum[-1])
    labels, millis = [], []
    for q in PCT_QUANTILES:
        pos = q * (n_total - 1)
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        frac = pos - lo
        vlo = float(vals[np.searchsorted(cum, lo + 1)])
        vhi = float(vals[np.searchsorted(cum, hi + 1)])
        qc = vlo + (vhi - vlo) * frac
        labels.append(f"p{int(q * 100)}")
        millis.append(int(np.floor(qc * 1000.0 + 0.5)))
    return pa.table(
        {
            "pct": pa.array(labels, pa.string()),
            "q_milli_cents": pa.array(millis, pa.int64()),
        }
    )


def entropy_by_lang(sf_dir: str):
    """Character-distribution profile per language (an entropy-style
    quality signal): per doc, ``S = sum_c floor(n_c*ln(n_c)*1000 + 0.5)``
    over its byte classes (integer milli-nats; Shannon entropy is
    ``ln(N) - S/(1000*N)``, derivable from the emitted integer partials,
    which stay order-independent under any partitioning).  The corpus is
    ASCII (asserted per batch), so byte classes == SQL character classes.
    One vectorized bincount over (row, byte) per batch; shuffle-free
    map-side partials -> tiny groupby(lang) sum."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def per_batch(t: pa.Table) -> pa.Table:
        arr = t["text"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        b = pcc.cast(arr, pa.large_binary())
        off = np.frombuffer(b.buffers()[1], dtype=np.int64)[
            b.offset : b.offset + len(b) + 1
        ]
        data = np.frombuffer(b.buffers()[2], dtype=np.uint8)
        lens = np.diff(off)
        raw = data[off[0] : off[-1]]
        if raw.size and int(raw.max()) >= 128:
            raise ValueError(
                "entropy_by_lang assumes an ASCII corpus (bytes == chars)"
            )
        parent = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        cnt = np.bincount(parent * 128 + raw, minlength=len(b) * 128).reshape(
            len(b), 128
        )
        s = (
            np.where(
                cnt > 0,
                np.floor(cnt * np.log(np.maximum(cnt, 1)) * 1000.0 + 0.5),
                0.0,
            )
            .sum(axis=1)
            .astype(np.int64)
        )
        g = (
            pd.DataFrame(
                {"lang": t["lang"].to_pandas(), "s": s, "n": lens.astype(np.int64)}
            )
            .groupby("lang", sort=False)
            .agg(
                sum_nlogn_milli=("s", "sum"),
                sum_chars=("n", "sum"),
                n_docs=("s", "size"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(per_batch, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("sum_nlogn_milli", alias_name="sum_nlogn_milli"),
            Sum("sum_chars", alias_name="sum_chars"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_docs": pa.array(out["n_docs"].to_numpy(np.int64)),
            "sum_chars": pa.array(out["sum_chars"].to_numpy(np.int64)),
            "sum_nlogn_milli": pa.array(out["sum_nlogn_milli"].to_numpy(np.int64)),
        }
    )


def urgent_lineitems_semi(sf_dir: str):
    """EXISTS semi-join sized for corpus scale via Bloom prefilter:
    lineitem counts per returnflag where the order is URGENT.

    Build side: URGENT orderkeys -> one streaming pass into a broadcast
    Bloom bitmap (``stages/bloom.py`` — NO exchange, one fixed-size
    partial per block).  Probe side: lineitem rows drop MAP-SIDE unless
    maybe-members (~20% of rows here + <1% false positives), so only
    survivors enter the exact verify — a partitioned hash join against
    the (unique) urgent keys that removes false positives without any
    per-key Python group dispatch.  The result is exact; the Bloom pass
    only sizes the exchange."""
    import ray

    from ray.data.aggregate import Count

    from ..stages.bloom import BloomPrefilter, build_bloom

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def urgent_keys(t: pa.Table) -> pa.Table:
        m = pcc.equal(t["o_orderpriority"], pa.scalar(SEMI_PRIORITY))
        return pa.table({"key": pcc.cast(t.filter(m)["o_orderkey"], pa.int64())})

    keys_ds = orders.map_batches(urgent_keys, batch_format="pyarrow")
    n_bits, k = 1 << 20, 5
    bloom_ref = ray.put(build_bloom(keys_ds, "key", n_bits=n_bits, k=k))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def li_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pcc.cast(t["l_orderkey"], pa.int64()),
                "flag": pcc.cast(t["l_returnflag"], pa.string()),
            }
        )

    probe = li.map_batches(li_rows, batch_format="pyarrow").map_batches(
        BloomPrefilter,
        fn_constructor_kwargs={
            "bitmap_ref": bloom_ref,
            "column": "key",
            "n_bits": n_bits,
            "k": k,
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    # exact verify: orderkeys are unique, so an inner hash join IS the
    # semi-join (no row multiplication, no per-key group dispatch)
    joined = probe.join(
        _with_join_sentinels(keys_ds, "key"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem"),
        on=("key",),
    )
    out = (
        joined.groupby("flag")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    if "flag" not in out.columns or not len(out):
        return pa.table(
            {"l_returnflag": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    out = out.sort_values("flag", ignore_index=True)
    return pa.table(
        {
            "l_returnflag": pa.array(out["flag"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


def order_skyline(sf_dir: str):
    """Skyline (Pareto-frontier) query over orders: the orders no other
    order beats on BOTH price (maximize) and order date (minimize) —
    Börzsönyi et al. 2001's operator, the "best trade-off rows" shape
    relational engines answer with a quadratic NOT EXISTS.  Distributed:
    per-block local skylines (a global frontier point always survives its
    block) union-merged once on the driver; all comparisons in integer
    cents / epoch-microseconds so the frontier is bit-stable.  Oracle:
    the textbook NOT-EXISTS dominance definition."""
    from ..stages.skyline import skyline

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def enc(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pcc.cast(t["o_orderkey"], pa.int64()),
                "price_c": _cents_col(t["o_totalprice"]),
                "date_us": pcc.cast(pcc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()),
            }
        )

    out = skyline(
        ds.map_batches(enc, batch_format="pyarrow"),
        max_col="price_c",
        min_col="date_us",
        id_col="o_orderkey",
    )
    return out.select(["o_orderkey", "price_c", "date_us"])


DECAY_TAU_US = 30 * 86_400 * 1_000_000  # 30-day exponential half-life scale
DECAY_TOP_N = 50


def events_time_decay(sf_dir: str):
    """Recency-weighted user activity: every event scores
    ``exp(-(t_max - ts) / tau)`` (tau = 30 days), integer milli-rounded
    PER EVENT before the user-keyed sum — the time-decay scoring shape of
    feed ranking / trending detection.  One metadata-cheap max(ts) pass,
    then a single partial-aggregated groupby; top users by
    (score desc, user asc).  Oracle: the same epoch arithmetic in SQL."""
    from ray.data.aggregate import Max, Sum

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    tmax = ds.aggregate(Max("ts", alias_name="m"))["m"]
    tmax_us = int(pa.scalar(tmax, pa.timestamp("us")).cast(pa.int64()).as_py())

    def score(t: pa.Table) -> pa.Table:
        ts_us = pcc.cast(pcc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        age = (tmax_us - ts_us).astype(np.float64) / DECAY_TAU_US
        return pa.table(
            {
                "user_id": pcc.cast(t["user_id"], pa.int64()),
                "s": pa.array(_micro(np.exp(-age), scale=1e3)),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("s", alias_name="score_milli"))
        .to_pandas()
        .sort_values(["score_milli", "user_id"], ascending=[False, True])
        .head(DECAY_TOP_N)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "user_id": pa.array(out["user_id"], pa.int64()),
            "score_milli": pa.array(out["score_milli"], pa.int64()),
        }
    )


def dup_degree_hist(sf_dir: str):
    """Degree distribution of the near-dup similarity graph (the shared
    Jaccard>=0.5 pair table): how many documents have 0, 1, 2, ... near
    duplicates — the graph-health profile run before any clustering pass.
    Isolated docs are counted via n_docs minus touched nodes, never a
    per-doc join.  Oracle: the pair CTE + both-direction degree count
    right-joined onto documents."""
    pairs = _ngram_pairs(sf_dir)
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    a = pairs["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.concatenate([a, b])
    if len(ids):
        _, deg = np.unique(ids, return_counts=True)
        degs, n_nodes = np.unique(deg, return_counts=True)
    else:
        degs, n_nodes = np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    n_isolated = n_docs - int(n_nodes.sum())
    out_deg = np.concatenate([[0], degs]).astype(np.int64)
    out_n = np.concatenate([[n_isolated], n_nodes]).astype(np.int64)
    keep = out_n > 0
    return pa.table(
        {"degree": pa.array(out_deg[keep]), "n_nodes": pa.array(out_n[keep])}
    )


NDCG_K = 10
NDCG_QUERIES = (BM25_QUERY, BM25_QUERY_FILTERED, "read the file and write buffer")


def search_ndcg(sf_dir: str):
    """IR quality evaluation of the distributed BM25 run: NDCG@10 and
    MRR per query against synthetic graded qrels (rel(doc) = doc_id % 4
    — derivable on both sides with no external judgment file).  All
    arithmetic integer-exact: per-hit gain micro-rounded BEFORE the sum,
    NDCG = dcg*1000 // idcg (ideal = the retrieved list's own best
    permutation), MRR = 1000 // (first rel-3 rank + 1).  Oracle: the
    full BM25-in-SQL ranking wrapped in the same DCG window math."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    out_q, out_ndcg, out_mrr = [], [], []
    try:
        for q in NDCG_QUERIES:
            hits = engine.search(q, limit=NDCG_K)
            doc_ids = np.array([h["doc_id"] for h in hits], np.int64)
            rel = (doc_ids % 4).astype(np.float64)
            ranks = np.arange(len(doc_ids), dtype=np.float64)
            gains = np.floor(
                (2.0**rel - 1.0) / np.log2(ranks + 2.0) * 1e6 + 0.5
            ).astype(np.int64)
            dcg = int(gains.sum())
            rel_sorted = np.sort(rel)[::-1]
            rn = np.arange(1, len(rel_sorted) + 1, dtype=np.float64)
            idcg = int(
                np.floor(
                    (2.0**rel_sorted - 1.0) / np.log2(rn + 1.0) * 1e6 + 0.5
                ).astype(np.int64).sum()
            )
            first = np.flatnonzero(doc_ids % 4 == 3)
            out_q.append(q)
            out_ndcg.append(0 if idcg == 0 else (dcg * 1000) // idcg)
            out_mrr.append(1000 // (int(first[0]) + 1) if len(first) else 0)
    finally:
        engine.close()
    return pa.table(
        {
            "query": pa.array(out_q, pa.string()),
            "ndcg_milli": pa.array(out_ndcg, pa.int64()),
            "mrr_milli": pa.array(out_mrr, pa.int64()),
        }
    )


def _ndcg_sql() -> str:
    parts = []
    for q in NDCG_QUERIES:
        inner = bm25_sql(q, limit=NDCG_K)
        parts.append(
            f"""
            SELECT '{q}' AS query,
                   CAST(CASE WHEN i.idcg_micro = 0 THEN 0
                        ELSE (d.dcg_micro * 1000) // i.idcg_micro END AS BIGINT) AS ndcg_milli,
                   CAST(COALESCE(m.mrr_milli, 0) AS BIGINT) AS mrr_milli
            FROM
              (SELECT COALESCE(sum(CAST(floor((pow(2, doc_id % 4) - 1)
                         / log2(rank + 2) * 1000000 + 0.5) AS BIGINT)), 0) AS dcg_micro
               FROM ({inner})) d,
              (SELECT COALESCE(sum(CAST(floor((pow(2, rel) - 1)
                         / log2(rn + 1) * 1000000 + 0.5) AS BIGINT)), 0) AS idcg_micro
               FROM (SELECT doc_id % 4 AS rel,
                            row_number() OVER (ORDER BY doc_id % 4 DESC) AS rn
                     FROM ({inner}))) i,
              (SELECT CAST(1000 // (min(rank) + 1) AS BIGINT) AS mrr_milli
               FROM ({inner}) WHERE doc_id % 4 = 3) m
            """
        )
    return " UNION ALL ".join(parts)


# Percolator (reverse search): a REGISTERED query set matched against every
# incoming document — Elasticsearch's percolate shape.  Queries are static
# boolean term predicates (must / must-not over tokenizer terms).
PERC_QUERIES = (
    ("q_merge_sort", ("merge", "sort"), ()),
    ("q_join_no_hash", ("join",), ("hash",)),
    ("q_data_stream", ("data", "stream"), ()),
    ("q_scan_filter", ("scan", "filter"), ()),
    ("q_table_no_sort", ("table",), ("sort",)),
    ("q_read_write", ("read", "write"), ()),
    ("q_index", ("index",), ()),
    ("q_hash_table_scan", ("hash", "table", "scan"), ()),
)


def percolate_queries(sf_dir: str):
    """Reverse search (percolator): count, for each registered boolean
    query, how many documents match it.  The query set is broadcast in
    the task closure (static, tiny); each batch computes per-query doc
    masks from one tokenizer pass and emits #queries partial-count rows
    — so the exchange is O(blocks * queries), never row-keyed.  Oracle:
    one COUNT(*) FILTER (list_contains...) per query."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text"])
    need = sorted({t for _, must, mnot in PERC_QUERIES for t in (*must, *mnot)})

    def match(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        flat = pcc.list_flatten(toks)
        parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = len(t)
        dfp = pd.DataFrame({"term": flat.to_pandas(), "d": parents})
        dfp = dfp[dfp["term"].isin(need)].drop_duplicates()
        has = {tm: np.zeros(n, dtype=bool) for tm in need}
        for tm, grp in dfp.groupby("term", sort=False):
            has[tm][grp["d"].to_numpy()] = True
        qids, counts = [], []
        for qid, must, mnot in PERC_QUERIES:
            m = np.ones(n, dtype=bool)
            for tm in must:
                m &= has[tm]
            for tm in mnot:
                m &= ~has[tm]
            qids.append(qid)
            counts.append(int(m.sum()))
        return pa.table(
            {"query_id": pa.array(qids, pa.string()),
             "n_docs": pa.array(counts, pa.int64())}
        )

    out = (
        ds.map_batches(match, batch_format="pyarrow")
        .groupby("query_id")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
        .sort_values("query_id", ignore_index=True)
    )
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.string()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
        }
    )


MMR_K = 10
MMR_CAND = 50
MMR_LAMBDA = 0.7


def knn_mmr(sf_dir: str):
    """Diversified vector retrieval: distributed exact cosine top-50
    candidates per query (the knn_cosine pass), then a driver-side MMR
    greedy (lambda=0.7) picks 10 results trading relevance against
    redundancy — the standard rerank shape for dedup-heavy corpora.
    Candidate vectors come from one pushdown-filtered read of the tiny
    id set.  Rows-only for the driver (greedy argmax is not SQL);
    tests/test_mmr.py gates it against an independent full-numpy MMR."""
    from ..stages.annsearch import mmr_rerank, vector_topk

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qs = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy(np.int64)
    cand = vector_topk(
        ds, qs, k=MMR_CAND, id_column="vec_id", normalize=True, dtype=np.float64
    ).to_pandas()
    need = np.unique(cand["vec_id"].to_numpy(np.int64))
    need_arr = pa.array(need, type=pa.int64())
    vecs = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(
            lambda t: t.filter(pcc.is_in(t["vec_id"], value_set=need_arr)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index("vec_id")
    )
    out_q, out_rank, out_id, out_s = [], [], [], []
    for qi, qid in enumerate(qids):
        sub = cand[cand["query_idx"] == qi]
        ids = sub["vec_id"].to_numpy(np.int64)
        mat = np.stack(vecs.loc[ids]["embedding"].to_numpy()).astype(np.float64)
        picks = mmr_rerank(qs[qi], ids, mat, k=MMR_K, lam=MMR_LAMBDA)
        for r, (vid, s) in enumerate(picks):
            out_q.append(int(qid))
            out_rank.append(r)
            out_id.append(vid)
            out_s.append(s)
    return pa.table(
        {
            "q_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "mmr_micro": pa.array(_micro(np.array(out_s)), pa.int64()),
        }
    )


def value_mad_by_type(sf_dir: str):
    """Robust location/scale per event_type: exact interpolated median and
    MAD (median absolute deviation) over events.value — the outlier-immune
    sibling of mean/stddev.  Values have 2-decimal resolution, so the cents
    domain is bounded: per-batch (event_type, cents) count partials -> one
    small groupby sum -> per-group driver CDF gives the exact order
    statistics without any sort of the event stream.  Median interpolation
    at q=0.5 lands on half-cents and the MAD on quarter-cents, both
    float-exact, so the milli-cent integer encodings match the SQL
    ``quantile_cont`` oracle bit-for-bit under any partitioning."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "cents": _cents_col(t["value"]).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["event_type", "cents"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )

    def _median_half_units(vals: np.ndarray, cnt: np.ndarray) -> int:
        # exact 2x-median of the weighted values: vlo + vhi at pos q(n-1)
        cum = cnt.cumsum()
        n = int(cum[-1])
        pos = 0.5 * (n - 1)
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        vlo = int(vals[np.searchsorted(cum, lo + 1)])
        vhi = int(vals[np.searchsorted(cum, hi + 1)])
        return vlo + vhi

    types, ns, meds, mads = [], [], [], []
    for etype, grp in h.groupby("event_type", sort=True):
        grp = grp.sort_values("cents")
        cents = grp["cents"].to_numpy(np.int64)
        cnt = grp["n"].to_numpy(np.int64)
        # vlo+vhi over cents == 2*median == median in half-cent units
        med_half = _median_half_units(cents, cnt)
        dev = np.abs(cents * 2 - med_half)  # half-cent units, integer
        order = np.argsort(dev, kind="stable")
        ddf = pd.DataFrame({"d": dev[order], "n": cnt[order]}).groupby("d", sort=True)["n"].sum()
        mad_quarter = _median_half_units(
            ddf.index.to_numpy(np.int64), ddf.to_numpy(np.int64)
        )  # quarter-cent units
        types.append(etype)
        ns.append(int(cnt.sum()))
        meds.append(med_half * 500)  # half-cents -> milli-cents
        mads.append(mad_quarter * 250)  # quarter-cents -> milli-cents
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "med_milli": pa.array(meds, pa.int64()),
            "mad_milli": pa.array(mads, pa.int64()),
        }
    )


ROLLING_WINDOW_HOURS = 24


def rolling_distinct_users(sf_dir: str, window_hours: int = ROLLING_WINDOW_HOURS):
    """Rolling 24h EXACT distinct users per observed hour — the sliding
    COUNT(DISTINCT) shape that naive windowing makes quadratic.  Inverted
    per-user: each user's deduped hour set is merged into coverage
    intervals [h, h+23], and the user contributes exactly 1 to every
    window-end hour inside them — turning "distinct users per window"
    into a plain integer sum per hour.  The exchange carries (user,hour)
    pairs (deduped map-side) and the final groupby is hour-keyed, so no
    window ever holds a user set in memory."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    w = window_hours

    def pairs(t: pa.Table) -> pa.Table:
        hrs = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        )
        df = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(zero_copy_only=False), "hour": hrs}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        # merged coverage intervals [h, h+w) -> +1/-1 boundary deltas:
        # 2 rows per interval instead of w rows per interval (the naive
        # per-covered-hour emission made the final fold the bottleneck)
        hrs = np.unique(df["hour"].to_numpy(np.int64))
        starts = np.flatnonzero(np.diff(hrs, prepend=hrs[0] - w) >= w)
        ends = np.append(starts[1:], hrs.size) - 1
        s, e = hrs[starts], hrs[ends] + w  # end exclusive
        return pd.DataFrame(
            {
                "hour": np.concatenate([s, e]),
                "d": np.concatenate(
                    [np.ones(s.size, np.int64), -np.ones(e.size, np.int64)]
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        # map-side combine: coalesces the many tiny per-group outputs
        # before the hour-keyed exchange
        g = t.to_pandas().groupby("hour", as_index=False)["d"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    dd = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(deltas, batch_format="pandas")
        .map_batches(fold, batch_format="pyarrow", batch_size=16384)
        .groupby("hour")
        .aggregate(Sum("d", alias_name="d"))
        .to_pandas()
        .sort_values("hour", ignore_index=True)
    )
    # observed hours (window anchors): tiny per-batch-unique partials
    obs = np.unique(
        ds.map_batches(
            lambda t: pa.table(
                {
                    "hour": pa.array(
                        np.unique(
                            t["ts"]
                            .to_numpy(zero_copy_only=False)
                            .astype("datetime64[us]")
                            .astype(np.int64)
                            // 3_600_000_000
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["hour"]
        .to_numpy(np.int64)
    )
    # piecewise-constant prefix sum: n_users(h) = cumsum at the last
    # boundary <= h.  Driver work is O(distinct boundary hours) — bounded
    # by the time span, never by data volume.
    bnd = dd["hour"].to_numpy(np.int64)
    cum = dd["d"].to_numpy(np.int64).cumsum()
    n_users = cum[np.searchsorted(bnd, obs, side="right") - 1]
    return pa.table(
        {
            "hour": pa.array(obs),
            "n_users": pa.array(n_users.astype(np.int64)),
        }
    )


def top_user_by_type(sf_dir: str):
    """Grouped mode / per-group heavy hitter: for each event_type the user
    with the most events (ties -> smallest user_id).  Algebraic all the
    way down: per-batch (type,user) count partials collapse each block to
    its distinct pairs, one groupby sums them, a per-batch partial argmax
    folds each block to <= n_types rows, and the driver finishes the fold
    over blocks x n_types rows — the event stream itself is never
    exchanged."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial_counts(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "event_type": t["event_type"].to_pandas(),
                    "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["event_type", "user_id"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def partial_argmax(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = (
            df.sort_values(["event_type", "n", "user_id"], ascending=[True, False, True])
            .groupby("event_type", sort=False)
            .head(1)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(partial_argmax, batch_format="pyarrow")
        .to_pandas()
    )
    out = (
        out.sort_values(["event_type", "n", "user_id"], ascending=[True, False, True])
        .groupby("event_type", sort=False)
        .head(1)
        .sort_values("event_type", ignore_index=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "user_id": pa.array(out["user_id"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


def hour_dow_pivot(sf_dir: str):
    """Pivot / heatmap shape: event counts by hour-of-day x day-of-week,
    emitted WIDE (one row per hour, one column per weekday) — the
    crosstab layout BI layers ask for.  The distributed part is a tiny
    (hod, dow) partial-count fold (<=168 cells per block); the pivot is a
    driver-side reshape of 168 rows.  Oracle: FILTER-aggregate columns."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts"])

    def cells(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hrs = us // 3_600_000_000
        hod = hrs % 24
        dow = (hrs // 24 + 4) % 7  # epoch day 0 = Thursday; 0 = Sunday like SQL
        key = hod * 7 + dow
        u, n = np.unique(key, return_counts=True)
        return pa.table(
            {
                "hod": pa.array(u // 7, pa.int64()),
                "dow": pa.array(u % 7, pa.int64()),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["hod", "dow"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    wide = (
        out.pivot_table(index="hod", columns="dow", values="n", fill_value=0, aggfunc="sum")
        .reindex(index=range(24), columns=range(7), fill_value=0)
        .astype(np.int64)
    )
    cols = {"hod": pa.array(np.arange(24, dtype=np.int64))}
    for d in range(7):
        cols[f"n_d{d}"] = pa.array(wide[d].to_numpy(np.int64))
    return pa.table(cols)


def event_transitions(sf_dir: str):
    """Markov transition counts: global (prev_type -> next_type) bigram
    frequencies over each user's time-ordered event stream — the
    session-flow shape behind funnels and next-action models.  One
    user-keyed exchange of (ts, type) pairs; inside each group a sort +
    shifted zip emits transitions, then a tiny (src,dst) groupby sums
    them.  Oracle: LAG window over (user, ts, event_id) order."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def pergroup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        et = df["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"src": [], "dst": [], "n": []}).astype(
                {"src": str, "dst": str, "n": np.int64}
            )
        g = (
            pd.DataFrame({"src": et[:-1], "dst": et[1:]})
            .groupby(["src", "dst"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    def fold(t: pa.Table) -> pa.Table:
        # map-side combine: coalesce the tiny per-group outputs (<=T^2
        # rows each) before the (src,dst)-keyed exchange
        g = t.to_pandas().groupby(["src", "dst"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.groupby("user_id")
        .map_groups(pergroup, batch_format="pandas")
        .map_batches(fold, batch_format="pyarrow", batch_size=16384)
        .groupby(["src", "dst"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["src", "dst"], ignore_index=True)
    )
    return pa.table(
        {
            "src": pa.array(out["src"], pa.string()),
            "dst": pa.array(out["dst"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


def value_corr_by_type(sf_dir: str):
    """Pearson correlation between value (cents) and hour-of-day per
    event_type — the algebraic-moments shape: per-batch integer partials
    (n, Sx, Sy, Sxx, Syy, Sxy) fold associatively under any partitioning,
    and BOTH sides derive r from the same exact integers with the same
    float64 expression, so the micro-encoded r matches bit-for-bit.
    Int64 partials bound the corpus at ~1e12 rows of 2-decimal values —
    beyond that, promote the squared sums to float128/two-level folds."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partials(t: pa.Table) -> pa.Table:
        x = _cents_col(t["value"]).to_numpy(zero_copy_only=False)
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        y = (us // 3_600_000_000) % 24
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "one": np.ones(len(x), np.int64),
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        g = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("one", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    n = out["n"].to_numpy(np.int64).astype(np.float64)
    sx = out["sx"].to_numpy(np.int64).astype(np.float64)
    sy = out["sy"].to_numpy(np.int64).astype(np.float64)
    sxx = out["sxx"].to_numpy(np.int64).astype(np.float64)
    syy = out["syy"].to_numpy(np.int64).astype(np.float64)
    sxy = out["sxy"].to_numpy(np.int64).astype(np.float64)
    r = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "r_micro": pa.array(_micro(r), pa.int64()),
        }
    )


IDLE_CUTOFF = "2001-01-01"
Q16_EXCL_BRAND = "Brand#13"
Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)


def supplier_cnt_by_parttype(sf_dir: str):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    for a filtered part subset, excluding flagged suppliers.  Fully
    distributed: lineitem's (part,supp) pairs are deduped map-side, hash
    joined against the pushdown-filtered part and the good-supplier
    keys (NOT IN bad == inner join with the good complement — every
    suppkey exists in supplier), then one 4-key groupby makes pairs
    globally unique and per-batch partials fold the distinct counts."""
    from ray.data.aggregate import Count

    npart = _join_parts(sf_dir, "lineitem", "part")
    pairs = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]).map_batches(
        lambda t: pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "p_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
                    "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                }
            ).drop_duplicates(),
            preserve_index=False,
        ),
        batch_format="pyarrow",
    )

    def part_filter(t: pa.Table) -> pa.Table:
        m = pcc.and_(
            pcc.not_equal(t["p_brand"], pa.scalar(Q16_EXCL_BRAND)),
            pcc.is_in(t["p_size"], value_set=pa.array(Q16_SIZES, t["p_size"].type)),
        )
        return t.filter(m)

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]).map_batches(
        part_filter, batch_format="pyarrow"
    )
    good_supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]).map_batches(
        lambda t: t.filter(pcc.greater_equal(t["s_acctbal"], pa.scalar(0.0))).select(
            ["s_suppkey"]
        ),
        batch_format="pyarrow",
    )
    j = pairs.join(part, join_type="inner", num_partitions=npart, on=("p_partkey",))
    j = j.join(good_supp, join_type="inner", num_partitions=npart, on=("s_suppkey",))

    def partial_cnt(t: pa.Table) -> pa.Table:
        # one batch per suppkey-hash join partition: every suppkey's rows
        # are all here, so the (brand,type,size,supp) distinct is local —
        # no global 4-key groupby needed
        g = (
            t.select(["p_brand", "p_type", "p_size", "s_suppkey"])
            .to_pandas()
            .drop_duplicates()
            .groupby(["p_brand", "p_type", "p_size"], sort=False)
            .size()
            .reset_index(name="supplier_cnt")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        j.map_batches(partial_cnt, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .groupby(["p_brand", "p_type", "p_size"], as_index=False)["supplier_cnt"]
        .sum()
        .sort_values(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            ascending=[False, True, True, True],
            ignore_index=True,
        )
    )
    return pa.table(
        {
            "p_brand": pa.array(out["p_brand"], pa.string()),
            "p_type": pa.array(out["p_type"], pa.string()),
            "p_size": pa.array(out["p_size"].to_numpy(np.int64)),
            "supplier_cnt": pa.array(out["supplier_cnt"].to_numpy(np.int64)),
        }
    )


def idle_customers(sf_dir: str):
    """TPC-H Q22 shape (lapsed high-value customers): per market segment,
    count + total balance of customers whose balance beats the
    positive-balance average and who placed NO order on/after the
    cutoff.  Two passes: a scalar integer fold (sum/count of positive
    cents -> the float threshold both sides derive identically), then
    the tag-and-union distributed anti-join on custkey (customer rows
    carry segment/balance, recent-order rows are key-only), one groupby,
    and per-batch segment partials."""
    from ray.data.aggregate import Max, Sum

    scal = (
        _read(sf_dir, "customer", columns=["c_acctbal"])
        .map_batches(
            lambda t: pa.table(
                {
                    "s": pa.array(
                        [
                            int(
                                pcc.sum(
                                    _cents_col(
                                        t.filter(pcc.greater(t["c_acctbal"], pa.scalar(0.0)))[
                                            "c_acctbal"
                                        ]
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    ),
                    "n": pa.array(
                        [
                            int(
                                pcc.sum(
                                    pcc.cast(
                                        pcc.greater(t["c_acctbal"], pa.scalar(0.0)), pa.int64()
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sum()
    )
    thresh = float(scal["s"]) / float(scal["n"])

    def cust_side(t: pa.Table) -> pa.Table:
        cents = _cents_col(t["c_acctbal"])
        m = pcc.greater(pcc.cast(cents, pa.float64()), pa.scalar(thresh))
        t = t.filter(m)
        cents = _cents_col(t["c_acctbal"])
        return pa.table(
            {
                "key": pcc.cast(t["c_custkey"], pa.int64()),
                "segment": t["c_mktsegment"],
                "bal_c": cents,
                "src": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    def order_side(t: pa.Table) -> pa.Table:
        cut = np.datetime64(IDLE_CUTOFF).astype("datetime64[us]").astype(np.int64)
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        keys = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False)[ts >= cut])
        return pa.table(
            {
                "key": pa.array(keys.astype(np.int64)),
                "segment": pa.array([""] * len(keys), pa.string()),
                "bal_c": pa.array(np.full(len(keys), -1, dtype=np.int64)),
                "src": pa.array(np.ones(len(keys), dtype=np.int64)),
            }
        )

    tagged = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
        .map_batches(cust_side, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).map_batches(
                order_side, batch_format="pyarrow"
            )
        )
    )

    def seg_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        # max_src==0 <=> no orders; max_segment/max_bal recover the
        # customer row (order rows carry ""/-1, below any real value).
        # max_bal==-1 (order rows whose customer missed the threshold)
        # can't reach here with max_src==0, but guard anyway.
        df = df[(df["max_src"] == 0) & (df["max_bal"] >= 0)]
        g = (
            df.groupby("max_segment", sort=False)
            .agg(n_cust=("max_bal", "size"), total_bal_c=("max_bal", "sum"))
            .reset_index()
            .rename(columns={"max_segment": "c_mktsegment"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = (
        tagged.groupby("key")
        .aggregate(
            Max("src", alias_name="max_src"),
            Max("segment", alias_name="max_segment"),
            Max("bal_c", alias_name="max_bal"),
        )
        .map_batches(seg_partial, batch_format="pyarrow")
        .to_pandas()
    )
    if folded.empty:
        folded = pd.DataFrame({"c_mktsegment": pd.Series([], dtype=str),
                               "n_cust": pd.Series([], dtype=np.int64),
                               "total_bal_c": pd.Series([], dtype=np.int64)})
    out = (
        folded.groupby("c_mktsegment", as_index=False)
        .sum()
        .sort_values("c_mktsegment", ignore_index=True)
    )
    return pa.table(
        {
            "c_mktsegment": pa.array(out["c_mktsegment"], pa.string()),
            "n_cust": pa.array(out["n_cust"].to_numpy(np.int64)),
            "total_bal_c": pa.array(out["total_bal_c"].to_numpy(np.int64)),
        }
    )


def spend_rank_in_nation(sf_dir: str):
    """Aggregation-then-rank window: each nation's top-3 customers by
    lifetime order spend with DENSE_RANK (ties share a rank and extend
    the cut).  Map-side per-custkey partial sums shrink the orders scan,
    one custkey groupby finishes the spend, a distributed hash join
    attaches nations via customer, and the rank window runs per nation
    group — only the 25-row nation map is broadcast."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "c_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                    "spend_c": _cents_col(t["o_totalprice"]).to_numpy(zero_copy_only=False),
                }
            )
            .groupby("c_custkey", as_index=False)
            .sum(),
            preserve_index=False,
        ),
        batch_format="pyarrow",
    )
    spend = orders.groupby("c_custkey").aggregate(Sum("spend_c", alias_name="spend_c"))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    j = spend.join(
        cust,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"),
        on=("c_custkey",),
    )

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["spend_c", "c_custkey"], ascending=[False, True])
        rnk = df["spend_c"].rank(method="dense", ascending=False).astype(np.int64)
        df = df.assign(rnk=rnk)
        return df[df["rnk"] <= 3][["c_nationkey", "rnk", "c_custkey", "spend_c"]]

    out = (
        j.groupby("c_nationkey")
        .map_groups(rank_group, batch_format="pandas")
        .to_pandas()
    )
    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    out = out.merge(nation, left_on="c_nationkey", right_on="n_nationkey").sort_values(
        ["n_name", "rnk", "c_custkey"], ignore_index=True
    )
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "rnk": pa.array(out["rnk"].to_numpy(np.int64)),
            "c_custkey": pa.array(out["c_custkey"].to_numpy(np.int64)),
            "spend_c": pa.array(out["spend_c"].to_numpy(np.int64)),
        }
    )


ANOM_WINDOW = 24
ANOM_SIGMA = 3.0


def hourly_anomalies(sf_dir: str):
    """Rolling z-score anomaly detection: hours whose per-type event count
    exceeds mean + 3*sigma of the trailing 24 EXCLUSIVE hours.  The
    distributed work is the (type, hour) count fold; the rolling moments
    then run WITHIN each type's group (a per-type window, not a global
    sort) from integer window sums — both sides derive mean/sigma from
    the same exact integers with the same float64 expression.  Hours with
    no events count 0 (the hour grid is densified per type), matching
    the oracle's generate_series scaffold."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def hours(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table({"event_type": t["event_type"], "hour": pa.array(us // 3_600_000_000)})

    counts = (
        ds.map_batches(hours, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"))
    )
    # global hour range (per-type grids must agree with the oracle's
    # corpus-wide scaffold): tiny min/max fold
    from ray.data.aggregate import Max, Min

    rng = counts.aggregate(Min("hour"), Max("hour"))
    h_lo, h_hi = int(rng["min(hour)"]), int(rng["max(hour)"])

    def detect(df: pd.DataFrame) -> pd.DataFrame:
        etype = df["event_type"].iloc[0]
        grid = np.arange(h_lo, h_hi + 1, dtype=np.int64)
        n = np.zeros(grid.size, dtype=np.int64)
        n[df["hour"].to_numpy(np.int64) - h_lo] = df["n"].to_numpy(np.int64)
        s = np.concatenate([[0], n.cumsum()])
        s2 = np.concatenate([[0], (n * n).cumsum()])
        idx = np.arange(grid.size)
        lo = np.maximum(idx - ANOM_WINDOW, 0)
        w = (idx - lo).astype(np.float64)  # window sizes (exclusive of self)
        ws = (s[idx] - s[lo]).astype(np.float64)
        ws2 = (s2[idx] - s2[lo]).astype(np.float64)
        valid = w >= 2  # sample variance needs n>=2
        mean = np.where(valid, ws / np.maximum(w, 1.0), 0.0)
        var = np.where(
            valid, (ws2 - ws * ws / np.maximum(w, 1.0)) / np.maximum(w - 1.0, 1.0), 0.0
        )
        sigma = np.sqrt(np.maximum(var, 0.0))
        flag = valid & (n > mean + ANOM_SIGMA * sigma)
        out = pd.DataFrame(
            {
                "event_type": etype,
                "hour": grid[flag],
                "n": n[flag],
                "mean_micro": _micro(mean[flag]),
                "sigma_micro": _micro(sigma[flag]),
            }
        )
        return out

    out = (
        counts.groupby("event_type")
        .map_groups(detect, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "hour"], ignore_index=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "hour": pa.array(out["hour"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "mean_micro": pa.array(out["mean_micro"].to_numpy(np.int64)),
            "sigma_micro": pa.array(out["sigma_micro"].to_numpy(np.int64)),
        }
    )


def full_outer_balance(sf_dir: str):
    """FULL OUTER join shape: per nation, total customer balance vs total
    supplier balance, keeping nations present on either side only (and
    nations with neither as NULL-free zeros are excluded, like SQL).
    Both sides pre-aggregate map-side to <=25-key partials, so the outer
    join itself is a driver-size merge of two tiny folds — the 100-TB
    pattern for outer joins on low-cardinality keys."""
    from ray.data.aggregate import Sum

    cust = (
        _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
        .map_batches(
            lambda t: pa.table(
                {"nationkey": pcc.cast(t["c_nationkey"], pa.int64()),
                 "bal_c": _cents_col(t["c_acctbal"])}
            ),
            batch_format="pyarrow",
        )
        .groupby("nationkey")
        .aggregate(Sum("bal_c", alias_name="cust_bal_c"))
        .to_pandas()
    )
    supp = (
        _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
        .map_batches(
            lambda t: pa.table(
                {"nationkey": pcc.cast(t["s_nationkey"], pa.int64()),
                 "bal_c": _cents_col(t["s_acctbal"])}
            ),
            batch_format="pyarrow",
        )
        .groupby("nationkey")
        .aggregate(Sum("bal_c", alias_name="supp_bal_c"))
        .to_pandas()
    )
    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    merged = cust.merge(supp, on="nationkey", how="outer")
    merged = merged.merge(nation, left_on="nationkey", right_on="n_nationkey")
    merged["has_cust"] = (~merged["cust_bal_c"].isna()).astype(np.int64)
    merged["has_supp"] = (~merged["supp_bal_c"].isna()).astype(np.int64)
    merged = merged.fillna({"cust_bal_c": 0, "supp_bal_c": 0}).sort_values(
        "n_name", ignore_index=True
    )
    return pa.table(
        {
            "n_name": pa.array(merged["n_name"], pa.string()),
            "cust_bal_c": pa.array(merged["cust_bal_c"].to_numpy(np.int64)),
            "supp_bal_c": pa.array(merged["supp_bal_c"].to_numpy(np.int64)),
            "has_cust": pa.array(merged["has_cust"].to_numpy(np.int64)),
            "has_supp": pa.array(merged["has_supp"].to_numpy(np.int64)),
        }
    )


def lineitem_unpivot(sf_dir: str):
    """UNPIVOT / melt shape: the four lineitem numeric measures folded to
    long (returnflag, metric, total) rows in ONE scan — each batch emits
    4 partial rows per flag, the groupby is over <=flags x 4 keys.
    Quantities are integral and prices 2-decimal, so integer cents keep
    both sides exact.  Oracle: UNION ALL of FILTERed aggregates."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def melt(t: pa.Table) -> pa.Table:
        flags = t["l_returnflag"].to_pandas()
        frames = []
        for metric, col in (
            ("quantity", "l_quantity"),
            ("extendedprice", "l_extendedprice"),
            ("discount", "l_discount"),
            ("tax", "l_tax"),
        ):
            c = _cents_col(t[col]).to_numpy(zero_copy_only=False)
            g = (
                pd.DataFrame({"l_returnflag": flags, "total_c": c})
                .groupby("l_returnflag", sort=False)["total_c"]
                .sum()
                .reset_index()
            )
            g.insert(1, "metric", metric)
            frames.append(g)
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

    out = (
        ds.map_batches(melt, batch_format="pyarrow")
        .groupby(["l_returnflag", "metric"])
        .aggregate(Sum("total_c", alias_name="total_c"))
        .to_pandas()
        .sort_values(["l_returnflag", "metric"], ignore_index=True)
    )
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "metric": pa.array(out["metric"], pa.string()),
            "total_c": pa.array(out["total_c"].to_numpy(np.int64)),
        }
    )


MSM_K = 5


def bm25_msm(sf_dir: str, query: str = BM25_QUERY, limit: int = 20, k: int = MSM_K):
    """minimum_should_match search: full-BM25 ranking restricted to docs
    containing >= k distinct query terms (``QueryEngine.search_min_match``
    — membership masks from the same decoded postings the scorer uses,
    applied per shard before the local top-k; threshold max unmasked)."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_min_match(query, k, limit=limit)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


FUZZY_QUERY = "joim strean"
FUZZY_DIST = 1
FUZZY_MAX_EXP = 50


def bm25_fuzzy(sf_dir: str, query: str = FUZZY_QUERY, limit: int = 20):
    """Fuzzy keyword search: typo'd query tokens expand against the index
    vocabulary (Levenshtein <= 1, Lucene-style per-token expansion cap)
    and the expansion scores as ordinary BM25 — see
    ``QueryEngine.search_fuzzy``.  Oracle: the same expansion ranked by
    (levenshtein, df desc, term) inside the BM25-in-SQL machinery."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_fuzzy(
            query, limit=limit, max_dist=FUZZY_DIST, max_expansions=FUZZY_MAX_EXP
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


CDC_INSERT_OFFSET = 1_000_000
CDC_UPDATE_DELTA = 1_000


def cdc_upsert(sf_dir: str):
    """CDC MERGE / upsert shape: apply a change stream (delete / update /
    insert keyed by doc_id) onto the base table and fold the FINAL state
    per lang.  The change stream is derived deterministically from the
    base (doc_id % 10: 0 -> delete, 1/2 -> update n_chars+1000, 3 ->
    insert at doc_id+1e6) so the oracle can derive the identical stream.
    The merge itself is the honest generic algorithm — base (ver=0) and
    changes (ver=1) tag-unioned, ONE doc_id-keyed groupby resolves the
    winner fully algebraically (ver-split columns + Max folds: no
    map_groups, no row iteration), losers' sentinel fields fold away —
    then per-batch lang partials.  At 100 TB the doc_id exchange is the
    irreducible cost of an upsert; everything else is map-side."""
    from ray.data.aggregate import Max

    cols = ["doc_id", "lang", "n_chars"]

    def base_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "doc_id": pcc.cast(t["doc_id"], pa.int64()),
                "ver": pa.array(np.zeros(n, np.int64)),
                "del_": pa.array(np.zeros(n, np.int64)),
                "lang_v": pa.array([""] * n, pa.string()),
                "lang_b": t["lang"],
                "nch_v": pa.array(np.zeros(n, np.int64)),
                "nch_b": pcc.cast(t["n_chars"], pa.int64()),
            }
        )

    def change_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = t["lang"].to_pandas().to_numpy()
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        mod = ids % 10
        parts = []
        d = mod == 0
        parts.append((ids[d], np.ones(d.sum(), np.int64), lang[d], np.zeros(d.sum(), np.int64)))
        u = (mod == 1) | (mod == 2)
        parts.append((ids[u], np.zeros(u.sum(), np.int64), lang[u], nch[u] + CDC_UPDATE_DELTA))
        i = mod == 3
        parts.append((ids[i] + CDC_INSERT_OFFSET, np.zeros(i.sum(), np.int64), lang[i], nch[i]))
        out_ids = np.concatenate([p[0] for p in parts])
        out_del = np.concatenate([p[1] for p in parts])
        out_lang = np.concatenate([p[2] for p in parts])
        out_nch = np.concatenate([p[3] for p in parts])
        n = out_ids.size
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "ver": pa.array(np.ones(n, np.int64)),
                "del_": pa.array(out_del),
                "lang_v": pa.array(out_lang, pa.string()),
                "lang_b": pa.array([""] * n, pa.string()),
                "nch_v": pa.array(out_nch),
                "nch_b": pa.array(np.zeros(n, np.int64)),
            }
        )

    tagged = _read(sf_dir, "documents", columns=cols).map_batches(
        base_rows, batch_format="pyarrow"
    ).union(
        _read(sf_dir, "documents", columns=cols).map_batches(
            change_rows, batch_format="pyarrow"
        )
    )

    def lang_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        win = df["max_ver"] == 1
        keep = ~(win & (df["max_del"] == 1))
        df = df[keep]
        win = win[keep]
        lang = np.where(win, df["max_lang_v"], df["max_lang_b"])
        nch = np.where(win, df["max_nch_v"], df["max_nch_b"]).astype(np.int64)
        g = (
            pd.DataFrame({"lang": lang, "nch": nch})
            .groupby("lang", sort=False)
            .agg(n_docs=("nch", "size"), sum_chars=("nch", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        tagged.groupby("doc_id")
        .aggregate(
            Max("ver", alias_name="max_ver"),
            Max("del_", alias_name="max_del"),
            Max("lang_v", alias_name="max_lang_v"),
            Max("lang_b", alias_name="max_lang_b"),
            Max("nch_v", alias_name="max_nch_v"),
            Max("nch_b", alias_name="max_nch_b"),
        )
        .map_batches(lang_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("lang", as_index=False)
        .sum()
        .sort_values("lang", ignore_index=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_docs": pa.array(out["n_docs"].to_numpy(np.int64)),
            "sum_chars": pa.array(out["sum_chars"].to_numpy(np.int64)),
        }
    )


def cdc_incremental_agg(sf_dir: str):
    """Incremental materialized-view maintenance: the per-lang (count,
    sum_chars) aggregate after the CDC stream, computed as base-aggregate
    PLUS the change-stream's algebraic deltas (delete: -1/-n, update:
    +1000, insert: +1/+n) — the base table is scanned once for its
    aggregate and NEVER rejoined; the delta fold touches only changes.
    At 100 TB the base aggregate would be the persisted view; maintenance
    cost is O(|changes|).  Shares ``cdc_upsert``'s full-recompute oracle:
    identical final state proves the incremental algebra."""
    from ray.data.aggregate import Count, Sum

    base = (
        _read(sf_dir, "documents", columns=["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
        .to_pandas()
    )

    def deltas(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = t["lang"].to_pandas().to_numpy()
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        mod = ids % 10
        d, u, i = mod == 0, (mod == 1) | (mod == 2), mod == 3
        dl = np.concatenate([lang[d], lang[u], lang[i]])
        dn = np.concatenate(
            [-np.ones(d.sum(), np.int64), np.zeros(u.sum(), np.int64), np.ones(i.sum(), np.int64)]
        )
        dc = np.concatenate(
            [-nch[d], np.full(u.sum(), CDC_UPDATE_DELTA, np.int64), nch[i]]
        )
        g = (
            pd.DataFrame({"lang": dl, "d_docs": dn, "d_chars": dc})
            .groupby("lang", sort=False)
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    delta = (
        _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
        .map_batches(deltas, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("d_docs", alias_name="d_docs"), Sum("d_chars", alias_name="d_chars"))
        .to_pandas()
    )
    out = base.merge(delta, on="lang", how="outer").fillna(0)
    out["n_docs"] = (out["n_docs"] + out["d_docs"]).astype(np.int64)
    out["sum_chars"] = (out["sum_chars"] + out["d_chars"]).astype(np.int64)
    out = out[out["n_docs"] > 0].sort_values("lang", ignore_index=True)
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_docs": pa.array(out["n_docs"].to_numpy(np.int64)),
            "sum_chars": pa.array(out["sum_chars"].to_numpy(np.int64)),
        }
    )


def user_value_twap(sf_dir: str):
    """Time-weighted average value per user (step/LOCF integral — the
    TWAP shape): each observation holds until the next one, weighted by
    its holding gap in integer seconds; users with a single event are
    excluded (zero horizon).  One user-keyed exchange; in-group sort +
    shifted diff builds integer (cents x gap_s) partials, so the weighted
    sum is exact and the final division is the same float64 expression
    the oracle computes.  Emits twap_micro (micro-cents)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def pergroup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        sec = us // 1_000_000
        if len(sec) < 2 or sec[-1] == sec[0]:
            return pd.DataFrame(
                {"user_id": [], "wsum": [], "horizon": []}
            ).astype({"user_id": np.int64, "wsum": np.int64, "horizon": np.int64})
        cents = np.floor(df["value"].to_numpy(np.float64) * 100.0 + 0.5).astype(np.int64)
        gaps = np.diff(sec)
        wsum = int((cents[:-1] * gaps).sum())
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "wsum": [wsum],
                "horizon": [int(sec[-1] - sec[0])],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(pergroup, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    twap = out["wsum"].to_numpy(np.int64).astype(np.float64) / out["horizon"].to_numpy(
        np.int64
    ).astype(np.float64)
    return pa.table(
        {
            "user_id": pa.array(out["user_id"].to_numpy(np.int64)),
            "horizon_s": pa.array(out["horizon"].to_numpy(np.int64)),
            "twap_micro": pa.array(_micro(twap * 10_000.0, scale=1.0), pa.int64()),
        }
    )


BOOST_QUERY = "merge^3 stream"


def bm25_boosted(sf_dir: str, query: str = BOOST_QUERY, limit: int = 20):
    """Query-time term boosting (Lucene ``term^k`` syntax): integer
    boosts multiply the term's score contribution — implemented exactly
    as the reference's duplicate-query-token rule (boost k == the term
    repeated k times), so the shard scorers are untouched.  Oracle: the
    BM25-in-SQL machinery over the boost-expanded token multiset."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search(_expand_boosts(query), limit=limit)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


def _expand_boosts(query: str) -> str:
    """``term^k`` -> the term repeated k times (k >= 1, driver-side)."""
    out: List[str] = []
    for chunk in query.split():
        if "^" in chunk:
            term, _, k = chunk.rpartition("^")
            out.extend([term] * max(1, int(k)))
        else:
            out.append(chunk)
    return " ".join(out)


def length_gini(sf_dir: str):
    """Gini coefficient of document length per lang — the inequality
    measure data-curation dashboards use.  Sort-free and integer-exact:
    the bounded n_chars domain folds to per-(lang, value) count
    histograms; on the driver each tie-run of c copies of value v at
    cumulative offset lo contributes ``v*c*(2*lo + c - n)`` to the
    numerator (the closed form of sum (2i-n-1)*x_i over the run, which
    is order-invariant within ties), so both sides divide the SAME exact
    integers in float64."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def hist(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "lang": t["lang"].to_pandas(),
                    "x": t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64),
                }
            )
            .groupby(["lang", "x"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["lang", "x"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    langs, ns, ginis = [], [], []
    for lang, grp in h.groupby("lang", sort=True):
        grp = grp.sort_values("x")
        v = grp["x"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(c.sum())
        lo = np.concatenate(([0], c.cumsum()[:-1]))
        num = int((v * c * (2 * lo + c - n)).sum())
        sx = int((v * c).sum())
        langs.append(lang)
        ns.append(n)
        ginis.append(float(num) / (float(n) * float(sx)))
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "gini_micro": pa.array(_micro(np.array(ginis)), pa.int64()),
        }
    )


def query_term_stats(sf_dir: str, query: str = BM25_QUERY):
    """Index introspection (ES _termvectors shape): per query term, its
    document frequency, collection frequency and epsilon-floored IDF.
    df/idf come straight from the lexicon (bucket-hash + pushdown); cf
    decodes ONLY the query terms' tf buffers, one task per postings
    partition — never a corpus scan."""
    import ray

    from ..functions.codec import varint_decode
    from ..functions.tokenizer import tokenize
    from .query import LexiconReader

    idx = _documents_index(sf_dir)
    terms = sorted(set(tokenize(query)))
    lex = LexiconReader(idx)
    idfs = lex.idfs(terms)

    post_dir = os.path.join(idx, "postings")
    files = sorted(
        os.path.join(post_dir, f) for f in os.listdir(post_dir) if f.endswith(".parquet")
    )

    @ray.remote(num_cpus=1)
    def part_stats(path: str, ts: List[str]) -> Dict[str, List[int]]:
        import pyarrow.dataset as pads

        t = pads.dataset(path, format="parquet").to_table(
            columns=["term", "df", "tfs"], filter=pads.field("term").isin(ts)
        )
        out: Dict[str, List[int]] = {}
        for term, df, buf in zip(
            t["term"].to_pylist(), t["df"].to_pylist(), t["tfs"].to_pylist()
        ):
            out[term] = [int(df), int(varint_decode(buf).sum())]
        return out

    parts = ray.get([part_stats.remote(f, terms) for f in files])
    dfs = {t: 0 for t in terms}
    cfs = {t: 0 for t in terms}
    for p in parts:
        for t, (d, cf) in p.items():
            dfs[t] += d
            cfs[t] += cf
    present = [t for t in terms if dfs[t] > 0]
    return pa.table(
        {
            "term": pa.array(present, pa.string()),
            "df": pa.array([dfs[t] for t in present], pa.int64()),
            "cf": pa.array([cfs[t] for t in present], pa.int64()),
            "idf_micro": pa.array(
                _micro(np.array([idfs[t] for t in present])), pa.int64()
            ),
        }
    )


TOPTERMS_K = 3


def top_terms_concat(sf_dir: str):
    """Grouped ordered string aggregation (SQL ``string_agg`` with ORDER
    BY): per lang, the top-3 terms by document frequency joined with
    commas.  Distinct (lang, doc, term) partials -> one (lang, term) df
    fold -> per-batch partial top-3 -> driver concat."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        from ..functions.tokenizer import tokenize_array

        toks = tokenize_array(t["text"])
        counts = pcc.list_value_length(toks).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "lang": np.repeat(t["lang"].to_pandas().to_numpy(), counts),
                "doc_id": np.repeat(
                    t["doc_id"].to_numpy(zero_copy_only=False), counts
                ),
                "term": pcc.list_flatten(toks).to_pandas().to_numpy(),
            }
        ).drop_duplicates()
        g = df.groupby(["lang", "term"], sort=False).size().reset_index(name="df")
        return pa.Table.from_pandas(g, preserve_index=False)

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["lang", "df", "term"], ascending=[True, False, True]
        )
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False).head(TOPTERMS_K), preserve_index=False
        )

    out = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("df", alias_name="df"))
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["lang", "df", "term"], ascending=[True, False, True])
        .groupby("lang", sort=True)
        .head(TOPTERMS_K)
    )
    agg = (
        out.groupby("lang", sort=True)["term"]
        .apply(lambda s: ",".join(s))
        .reset_index(name="top_terms")
    )
    return pa.table(
        {
            "lang": pa.array(agg["lang"], pa.string()),
            "top_terms": pa.array(agg["top_terms"], pa.string()),
        }
    )


def region_nation_rollup(sf_dir: str):
    """Dimension-hierarchy ROLLUP (region -> nation) over a fact join:
    customer balance totals at nation grain, with region subtotals and a
    grand total, from ONE fact scan — the fact table folds map-side to
    <=25 nation partials, the 25/5-row dimension tables are driver-side,
    and both super-levels are algebraic folds of the leaf aggregate.
    NULL markers become '' so the column hashes cleanly."""
    from ray.data.aggregate import Count, Sum

    leaf = (
        _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
        .map_batches(
            lambda t: pa.table(
                {
                    "nationkey": pcc.cast(t["c_nationkey"], pa.int64()),
                    "bal_c": _cents_col(t["c_acctbal"]),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("nationkey")
        .aggregate(Count(alias_name="n_cust"), Sum("bal_c", alias_name="bal_c"))
        .to_pandas()
    )
    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    j = (
        leaf.merge(nation, left_on="nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    rows = []
    for (r, n), g in j.groupby(["r_name", "n_name"]):
        rows.append((r, n, int(g["n_cust"].sum()), int(g["bal_c"].sum())))
    for r, g in j.groupby("r_name"):
        rows.append((r, "", int(g["n_cust"].sum()), int(g["bal_c"].sum())))
    rows.append(("", "", int(j["n_cust"].sum()), int(j["bal_c"].sum())))
    rows.sort()
    return pa.table(
        {
            "r_name": pa.array([x[0] for x in rows], pa.string()),
            "n_name": pa.array([x[1] for x in rows], pa.string()),
            "n_cust": pa.array([x[2] for x in rows], pa.int64()),
            "bal_c": pa.array([x[3] for x in rows], pa.int64()),
        }
    )


DEBOUNCE_MINUTES = 60


def events_debounce(sf_dir: str):
    """Debounce / dedup-within-window: drop an event when the SAME
    (user, event_type) fired within the previous 60 minutes (LAG
    semantics — gap measured to the immediately preceding event of the
    key, the standard alert/telemetry suppression shape).  One
    (user,type)-keyed exchange; in-group sort + shifted integer diff;
    kept/dropped counts fold per event_type."""
    from ray.data.aggregate import Sum

    gap_us = DEBOUNCE_MINUTES * 60 * 1_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def pergroup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        prev = np.concatenate(([np.iinfo(np.int64).min // 2], us[:-1]))
        kept = (us - prev) > gap_us
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_kept": [int(kept.sum())],
                "n_dropped": [int((~kept).sum())],
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby("event_type", as_index=False)[["n_kept", "n_dropped"]]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.groupby(["user_id", "event_type"])
        .map_groups(pergroup, batch_format="pandas")
        .map_batches(fold, batch_format="pyarrow", batch_size=16384)
        .groupby("event_type")
        .aggregate(Sum("n_kept", alias_name="n_kept"), Sum("n_dropped", alias_name="n_dropped"))
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_kept": pa.array(out["n_kept"].to_numpy(np.int64)),
            "n_dropped": pa.array(out["n_dropped"].to_numpy(np.int64)),
        }
    )


def orders_yoy(sf_dir: str):
    """Year-over-year revenue: per order year, total revenue plus the
    delta and basis-point growth vs the prior year (LAG over the yearly
    aggregate).  The distributed part is a per-batch (year, cents) fold;
    the window runs over <=N_years rows on the driver with the same
    integer/float expressions as the SQL LAG oracle."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def per_batch(t: pa.Table) -> pa.Table:
        yrs = pcc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"year": yrs, "rev_c": _cents_col(t["o_totalprice"]).to_numpy(zero_copy_only=False)})
        g = df.groupby("year", as_index=False).agg(n=("rev_c", "size"), rev_c=("rev_c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(per_batch, batch_format="pyarrow")
        .groupby("year")
        .aggregate(Sum("n", alias_name="n"), Sum("rev_c", alias_name="rev_c"))
        .to_pandas()
        .sort_values("year", ignore_index=True)
    )
    rev = out["rev_c"].to_numpy(np.int64)
    prev = np.concatenate(([0], rev[:-1]))
    delta = rev - prev
    with np.errstate(divide="ignore", invalid="ignore"):
        bps = np.where(
            prev > 0,
            np.floor(delta.astype(np.float64) / prev.astype(np.float64) * 10000.0 + 0.5),
            0.0,
        ).astype(np.int64)
    first = np.arange(len(out)) == 0
    return pa.table(
        {
            "year": pa.array(out["year"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "rev_c": pa.array(rev),
            "delta_c": pa.array(np.where(first, 0, delta).astype(np.int64)),
            "growth_bps": pa.array(np.where(first, 0, bps).astype(np.int64)),
        }
    )


COVERAGE_CUTOFF = "2001-01-01"


def supplier_coverage(sf_dir: str):
    """Relational DIVISION: suppliers whose RECENT shipments (l_shipdate
    >= cutoff, where coverage is genuinely partial) cover EVERY p_brand
    — the "supplies all X" shape SQL expresses with
    HAVING count(DISTINCT) = total.  The date predicate prunes at the
    READ (parquet row-group pushdown); deduped (suppkey, partkey) pairs
    hash-join the brand projection, one (supp, brand) groupby makes
    pairs globally unique, per-batch partials fold the per-supplier
    brand counts, and the divisor (total brands) is a tiny distinct
    fold broadcast as a driver scalar."""
    from ray.data.aggregate import Count

    npart = _join_parts(sf_dir, "lineitem", "part")
    cut = np.datetime64(COVERAGE_CUTOFF).astype("datetime64[us]").astype(np.int64)

    def recent_pairs(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        t = t.filter(pa.array(ts >= cut))
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "p_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
                    "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                }
            ).drop_duplicates(),
            preserve_index=False,
        )

    pairs = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_shipdate"]
    ).map_batches(recent_pairs, batch_format="pyarrow")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    n_brands = int(
        part.map_batches(
            lambda t: pa.table({"b": pcc.unique(t["p_brand"])}), batch_format="pyarrow"
        )
        .to_pandas()["b"]
        .nunique()
    )
    j = pairs.join(part, join_type="inner", num_partitions=npart, on=("p_partkey",))

    def partial_cnt(t: pa.Table) -> pa.Table:
        g = (
            t.select(["s_suppkey"])
            .to_pandas()
            .groupby("s_suppkey", sort=False)
            .size()
            .reset_index(name="n_brands")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        j.groupby(["s_suppkey", "p_brand"])
        .aggregate(Count(alias_name="_"))
        .map_batches(partial_cnt, batch_format="pyarrow")
        .to_pandas()
        .groupby("s_suppkey", as_index=False)["n_brands"]
        .sum()
    )
    out = out[out["n_brands"] == n_brands].sort_values("s_suppkey", ignore_index=True)
    return pa.table(
        {
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
            "n_brands": pa.array(out["n_brands"].to_numpy(np.int64)),
        }
    )


def user_day_streak(sf_dir: str):
    """Gaps-and-islands: per user, active-day count and the LONGEST run
    of consecutive active days.  Distinct (user, day) pairs dedupe
    map-side; inside each user group, one sorted diff splits islands
    vectorized (no row loop) — the SQL twin is the classic
    ``day - row_number()`` island key."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        days = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        df = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(zero_copy_only=False), "day": days}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def pergroup(df: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(df["day"].to_numpy(np.int64))
        starts = np.flatnonzero(np.diff(days, prepend=days[0] - 2) > 1)
        lens = np.diff(np.append(starts, days.size))
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "n_days": [int(days.size)],
                "longest_streak": [int(lens.max())],
            }
        )

    out = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(pergroup, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    return pa.table(
        {
            "user_id": pa.array(out["user_id"].to_numpy(np.int64)),
            "n_days": pa.array(out["n_days"].to_numpy(np.int64)),
            "longest_streak": pa.array(out["longest_streak"].to_numpy(np.int64)),
        }
    )


def priority_share(sf_dir: str):
    """RATIO_TO_REPORT / percent-of-total window: each order priority's
    revenue share of the grand total in basis points.  One map-side
    cents fold to <=5 partials; the share divides the SAME exact
    integers in float64 on both sides."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def per_batch(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "o_orderpriority": t["o_orderpriority"].to_pandas(),
                    "rev_c": _cents_col(t["o_totalprice"]).to_numpy(zero_copy_only=False),
                }
            )
            .groupby("o_orderpriority", as_index=False)
            .agg(n=("rev_c", "size"), rev_c=("rev_c", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(per_batch, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n"), Sum("rev_c", alias_name="rev_c"))
        .to_pandas()
        .sort_values("o_orderpriority", ignore_index=True)
    )
    total = float(out["rev_c"].sum())
    share = np.floor(
        out["rev_c"].to_numpy(np.int64).astype(np.float64) / total * 10000.0 + 0.5
    ).astype(np.int64)
    return pa.table(
        {
            "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "rev_c": pa.array(out["rev_c"].to_numpy(np.int64)),
            "share_bps": pa.array(share),
        }
    )


def weighted_median_price(sf_dir: str):
    """Quantity-weighted LOWER median price per return flag: the smallest
    price whose cumulative quantity weight reaches half the total —
    integer-exact end to end (no interpolation), from the same bounded
    cents-domain histogram machinery as the MAD/quantile operators,
    with integer quantity weights folded per (flag, cents)."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice", "l_quantity"]
    )

    # Two-pass exact weighted quantile (extendedprice cents are nearly
    # unique, so a (flag, cents) groupby would be a corpus-sized
    # exchange): pass 1 folds a COARSE $1000-bucket histogram (flags x
    # ~100 buckets), the driver locates each flag's median bucket and
    # the cumulative weight before it, pass 2 re-streams only the rows
    # inside that one bucket per flag (~1/100 of the data) at full cents
    # resolution.  Both exchanges stay bounded; the result is the same
    # integer-exact lower weighted median.
    COARSE = 100_000  # cents per coarse bucket ($1000)

    def coarse_hist(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "l_returnflag": t["l_returnflag"].to_pandas(),
                    "b": _cents_col(t["l_extendedprice"]).to_numpy(
                        zero_copy_only=False
                    )
                    // COARSE,
                    "w": _cents_col(t["l_quantity"]).to_numpy(zero_copy_only=False)
                    // 100,
                }
            )
            .groupby(["l_returnflag", "b"], as_index=False)["w"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    h = (
        ds.map_batches(coarse_hist, batch_format="pyarrow")
        .groupby(["l_returnflag", "b"])
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
    )
    target: Dict[str, tuple] = {}
    for flag, grp in h.groupby("l_returnflag", sort=True):
        grp = grp.sort_values("b")
        w = grp["w"].to_numpy(np.int64)
        cum = w.cumsum()
        total = int(cum[-1])
        idx = int(np.searchsorted(2 * cum, total))
        before = int(cum[idx - 1]) if idx > 0 else 0
        target[str(flag)] = (int(grp["b"].to_numpy(np.int64)[idx]), before, total)

    def fine_hist(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "cents": _cents_col(t["l_extendedprice"]).to_numpy(
                    zero_copy_only=False
                ),
                "w": _cents_col(t["l_quantity"]).to_numpy(zero_copy_only=False)
                // 100,
            }
        )
        bucket = df["l_returnflag"].map({f: b for f, (b, _, _) in target.items()})
        df = df[df["cents"] // COARSE == bucket]
        g = df.groupby(["l_returnflag", "cents"], as_index=False)["w"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = (
        ds.map_batches(fine_hist, batch_format="pyarrow")
        .groupby(["l_returnflag", "cents"])
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
    )
    flags, totals, medians = [], [], []
    for flag, grp in fine.groupby("l_returnflag", sort=True):
        grp = grp.sort_values("cents")
        b, before, total = target[str(flag)]
        cum = before + grp["w"].to_numpy(np.int64).cumsum()
        idx = int(np.searchsorted(2 * cum, total))
        flags.append(flag)
        totals.append(total)
        medians.append(int(grp["cents"].to_numpy(np.int64)[idx]))
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "total_qty": pa.array(totals, pa.int64()),
            "wmedian_cents": pa.array(medians, pa.int64()),
        }
    )


SYNONYMS = {
    "merge": ["join", "combine"],
    "stream": ["flow"],
    "sort": ["order"],
}
SYN_QUERY = "merge stream"


def _expand_synonyms(query: str) -> str:
    from ..functions.tokenizer import tokenize

    out: List[str] = []
    for t in tokenize(query):
        out.append(t)
        out.extend(SYNONYMS.get(t, ()))
    return " ".join(out)


def bm25_synonyms(sf_dir: str, query: str = SYN_QUERY, limit: int = 20):
    """Query-time synonym expansion (ES synonym_graph at query time): each
    query token contributes its synonym set additively — expansion is a
    broadcast-size static map applied driver-side, the expanded multiset
    scores as ordinary BM25 (shard scorers untouched).  Oracle: the
    BM25-in-SQL machinery over the identical expansion."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search(_expand_synonyms(query), limit=limit)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


def abc_analysis(sf_dir: str):
    """Pareto / ABC classification: users ranked by lifetime event value;
    A = the head covering 80% of total value, B = next 15%, C = the tail.
    One user-keyed cents fold (map-side partials first); the cumulative
    cut runs over per-user totals ordered (value desc, user asc), with
    INTEGER cross-multiplied thresholds (10*cum <= 8*total, 20*cum <=
    19*total) so the class boundaries are float-free on both sides.  At
    driver scale the ordered cut is per-user rows; at 100 TB replace the
    driver sort with the doc_deciles total-order machinery."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def partials(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                    "v": _cents_col(t["value"]).to_numpy(zero_copy_only=False),
                }
            )
            .groupby("user_id", as_index=False)["v"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()
        .sort_values(["v", "user_id"], ascending=[False, True], ignore_index=True)
    )
    v = out["v"].to_numpy(np.int64)
    total = int(v.sum())
    cum = v.cumsum()
    cls = np.where(10 * cum <= 8 * total, "A", np.where(20 * cum <= 19 * total, "B", "C"))
    g = (
        pd.DataFrame({"cls": cls, "v": v})
        .groupby("cls", as_index=False)
        .agg(n_users=("v", "size"), value_c=("v", "sum"))
        .sort_values("cls", ignore_index=True)
    )
    return pa.table(
        {
            "cls": pa.array(g["cls"], pa.string()),
            "n_users": pa.array(g["n_users"].to_numpy(np.int64)),
            "value_c": pa.array(g["value_c"].to_numpy(np.int64)),
        }
    )


def lang_id_confusion(sf_dir: str):
    """Data-quality confusion matrix: declared ``lang`` vs the n-gram
    language-ID heuristic's prediction, counted per (lang, lang_pred)
    cell — the drift monitor a labeling pipeline runs.  The heuristic is
    the SAME marker-word argmax both sides use (`_lang_id_sql` generates
    the SQL from the Python marker dict, so they cannot diverge)."""
    from ray.data.aggregate import Sum

    from ..stages.text_stats import lang_id

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def cells(t: pa.Table) -> pa.Table:
        pred = lang_id(t)["lang_pred"].to_pandas()
        g = (
            pd.DataFrame({"lang": t["lang"].to_pandas(), "lang_pred": pred})
            .groupby(["lang", "lang_pred"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "lang_pred"], ignore_index=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "lang_pred": pa.array(out["lang_pred"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


WAU_WINDOW_WEEKS = 4


def wau_mau(sf_dir: str):
    """WAU / MAU stickiness: per observed week, exact weekly active users,
    exact trailing-4-week active users (the rolling COUNT(DISTINCT) via
    the same per-user interval-delta coverage as
    ``rolling_distinct_users``, at week grain), and the stickiness ratio
    in basis points from the same exact integers on both sides."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    w = WAU_WINDOW_WEEKS

    def pairs(t: pa.Table) -> pa.Table:
        wk = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 604_800_000_000
        )
        df = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(zero_copy_only=False), "wk": wk}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow")

    wau = (
        pair_ds.groupby(["user_id", "wk"])
        .aggregate(Count(alias_name="_"))
        .groupby("wk")
        .aggregate(Count(alias_name="wau"))
        .to_pandas()
        .sort_values("wk", ignore_index=True)
    )

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        wks = np.unique(df["wk"].to_numpy(np.int64))
        starts = np.flatnonzero(np.diff(wks, prepend=wks[0] - w) >= w)
        ends = np.append(starts[1:], wks.size) - 1
        s, e = wks[starts], wks[ends] + w
        return pd.DataFrame(
            {
                "wk": np.concatenate([s, e]),
                "d": np.concatenate(
                    [np.ones(s.size, np.int64), -np.ones(e.size, np.int64)]
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("wk", as_index=False)["d"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    dd = (
        pair_ds.groupby("user_id")
        .map_groups(deltas, batch_format="pandas")
        .map_batches(fold, batch_format="pyarrow", batch_size=16384)
        .groupby("wk")
        .aggregate(Sum("d", alias_name="d"))
        .to_pandas()
        .sort_values("wk", ignore_index=True)
    )
    obs = wau["wk"].to_numpy(np.int64)
    bnd = dd["wk"].to_numpy(np.int64)
    cum = dd["d"].to_numpy(np.int64).cumsum()
    mau = cum[np.searchsorted(bnd, obs, side="right") - 1]
    wa = wau["wau"].to_numpy(np.int64)
    bps = np.floor(wa.astype(np.float64) / mau.astype(np.float64) * 10000.0 + 0.5).astype(np.int64)
    return pa.table(
        {
            "week": pa.array(obs),
            "wau": pa.array(wa),
            "mau": pa.array(mau.astype(np.int64)),
            "stickiness_bps": pa.array(bps),
        }
    )


BASKET_TOP_N = 10

# ES frequent_item_sets defaults: minimum_support 0.1 (as an integer-exact
# ratio), set sizes 1..3 over the per-(user, day) event-type baskets
FIS_SUPPORT_NUM = 1
FIS_SUPPORT_DEN = 10
FIS_MAX_SIZE = 3


def frequent_itemsets(sf_dir: str):
    """ES ``frequent_item_sets`` aggregation (8.4+): itemsets of event
    types (size 1..3) whose SUPPORT — the share of (user, day) baskets
    containing every item — is at least ``minimum_support`` = 10%,
    integer-exact (``support * 10 >= n_baskets``).

    Scale shape — fully vectorized, NO per-basket Python: (0) the type
    universe (tiny by nature) comes from a single-column per-block
    distinct + driver union and broadcasts by closure; (1) one
    int64-keyed groupby over ``(bkey << 5) | type_id`` dedupes the
    (basket, type) pairs globally; (2) a second int64-keyed groupby
    sums the now-distinct type BITS per basket — sum of distinct
    powers of two == the basket's bitmask OR; (3) each mask block
    counts ``(mask & m) == m`` for the <= C(T,1..3) itemset masks with
    numpy and emits a bounded per-block histogram the driver sums.
    Both exchanges move slim integer rows (<= baskets x types); the
    itemset space is bounded by the type universe, never corpus-sized.
    Oracle: the classic 1/2/3-way distinct self-joins with the same
    integer threshold."""
    from itertools import combinations

    from ray.data.aggregate import Count, Sum

    # pass 0: the type universe (pruned single-column read, tiny union)
    tset = set()
    for part in (
        _read(sf_dir, "events", columns=["event_type"])
        .map_batches(
            lambda t: pa.table({"t": pcc.unique(t["event_type"])}),
            batch_format="pyarrow",
        )
        .to_pandas()["t"]
    ):
        tset.add(part)
    types = sorted(tset)
    tid = {t: i for i, t in enumerate(types)}
    T = len(types)
    if T >= 32:  # bkey packing below reserves 5 bits for the type id
        raise ValueError(f"event_type universe too large for itemset mining ({T})")

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def pair_keys(t: pa.Table) -> pa.Table:
        tus = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        day = tus // 86_400_000_000
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkey = (uid << np.int64(20)) | day.astype(np.int64)
        tids = np.array(
            [tid[x] for x in t["event_type"].to_pylist()], np.int64
        )
        key = (bkey << np.int64(5)) | tids
        # per-block pre-distinct cuts the exchange to the block's
        # distinct pairs before the global dedupe groupby
        return pa.table({"key": pa.array(np.unique(key))})

    def key_to_bit(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkey": pa.array(key >> np.int64(5)),
                "bit": pa.array(
                    np.int64(1) << (key & np.int64(31)).astype(np.int64)
                ),
            }
        )

    # itemset masks (bounded by the type universe)
    masks, names, sizes = [], [], []
    for k in range(1, FIS_MAX_SIZE + 1):
        for combo in combinations(range(T), k):
            masks.append(sum(1 << i for i in combo))
            names.append("+".join(types[i] for i in combo))
            sizes.append(k)
    mask_arr = np.array(masks, np.int64)

    def block_hist(t: pa.Table) -> pa.Table:
        m = t["mask"].to_numpy(zero_copy_only=False)
        # (blocks x itemsets) boolean reduce — vectorized across the
        # whole block, one row out per itemset plus the basket counter
        sup = ((m[None, :] & mask_arr[:, None]) == mask_arr[:, None]).sum(axis=1)
        return pa.table(
            {
                "items": pa.array(["__baskets__"] + names, pa.string()),
                "set_size": pa.array(np.concatenate(([0], np.asarray(sizes, np.int64)))),
                "n": pa.array(np.concatenate(([np.int64(len(m))], sup.astype(np.int64)))),
            }
        )

    hist = (
        ds.map_batches(pair_keys, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Count())  # global pair dedupe: one slim int exchange
        .map_batches(key_to_bit, batch_format="pyarrow")
        .groupby("bkey")
        .aggregate(Sum("bit", alias_name="mask"))  # distinct bits -> OR
        .map_batches(block_hist, batch_format="pyarrow")
        .to_pandas()
        .groupby(["items", "set_size"], as_index=False)["n"].sum()
    )
    n_baskets = int(hist.loc[hist["items"] == "__baskets__", "n"].sum())
    out = hist[
        (hist["items"] != "__baskets__")
        & (hist["n"].to_numpy() * FIS_SUPPORT_DEN >= FIS_SUPPORT_NUM * n_baskets)
    ].sort_values(["n", "items"], ascending=[False, True], ignore_index=True)
    return pa.table(
        {
            "items": pa.array(out["items"], pa.string()),
            "set_size": pa.array(out["set_size"].to_numpy(np.int64)),
            "support": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


def basket_pairs(sf_dir: str):
    """Market-basket affinity: the top co-occurring part pairs across
    orders ("bought together").  One orderkey-keyed exchange; inside each
    order the deduped part set emits its C(k,2) pairs (k is the basket
    size, naturally small — the quadratic term is bounded per ORDER, not
    per corpus, unlike LSH mega-buckets); a map-side combine folds pair
    counts before the (a,b)-keyed groupby; per-batch partial top-k +
    driver fold finish.  Oracle: the classic self-join."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def perorder(df: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(df["l_partkey"].to_numpy(np.int64))
        k = parts.size
        if k < 2:
            return pd.DataFrame({"a": [], "b": [], "n": []}).astype(
                {"a": np.int64, "b": np.int64, "n": np.int64}
            )
        ia, ib = np.triu_indices(k, 1)
        return pd.DataFrame(
            {"a": parts[ia], "b": parts[ib], "n": np.ones(ia.size, np.int64)}
        )

    def fold(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["a", "b"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n", "a", "b"], ascending=[False, True, True]
        )
        return pa.Table.from_pandas(df.head(BASKET_TOP_N), preserve_index=False)

    out = (
        ds.groupby("l_orderkey")
        .map_groups(perorder, batch_format="pandas")
        .map_batches(fold, batch_format="pyarrow", batch_size=16384)
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "a", "b"], ascending=[False, True, True], ignore_index=True)
        .head(BASKET_TOP_N)
    )
    return pa.table(
        {
            "part_a": pa.array(out["a"].to_numpy(np.int64)),
            "part_b": pa.array(out["b"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


DISMAX_CLAUSES = ["merge sort", "data stream"]
DISMAX_TIE = 0.3


def bm25_dismax(sf_dir: str, clauses: Optional[List[str]] = None, limit: int = 20):
    """Disjunction-max multi-clause search (ES dis_max): rank by the best
    clause's BM25 score plus a tie-breaker share of the rest —
    ``QueryEngine.search_dismax`` (per-clause dense scoring inside the
    shard actors, one fan-out, F4 threshold over the combined score)."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_dismax(
            clauses or DISMAX_CLAUSES, limit=limit, tie=DISMAX_TIE
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


def dismax_sql(clauses: List[str], tie: float = DISMAX_TIE, limit: int = 20) -> str:
    """SQL twin of ``QueryEngine.search_dismax``: per-clause BM25 score
    CTEs over the shared tf/idf/dl machinery, combined as
    ``greatest + tie * (sum - greatest)``, micro-grain final ordering."""
    from ..functions.tokenizer import tokenize

    tok = _tok_sql("text")
    q_ctes, s_ctes = [], []
    for i, c in enumerate(clauses):
        mult: Dict[str, int] = {}
        for t in tokenize(c):
            mult[t] = mult.get(t, 0) + 1
        qvalues = ", ".join(f"('{t}', {m})" for t, m in sorted(mult.items()))
        q_ctes.append(f"q{i}(term, mult) AS (VALUES {qvalues})")
        s_ctes.append(
            f"""s{i} AS (
  SELECT tf.doc_id,
         sum(q{i}.mult * idf.idf * tf.tf * 2.5 /
             (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))) AS s
  FROM tf
  JOIN q{i} ON q{i}.term = tf.term
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY tf.doc_id
)"""
        )
    svars = [f"s{i}v" for i in range(len(clauses))]
    coalesces = ", ".join(
        f"coalesce(s{i}.s, 0) AS {v}" for i, v in enumerate(svars)
    )
    left_joins = "\n  ".join(
        f"LEFT JOIN s{i} ON s{i}.doc_id = d.doc_id" for i in range(len(clauses))
    )
    gexpr = f"greatest({', '.join(svars)})"
    sexpr = " + ".join(svars)
    return f"""
WITH src AS (SELECT * FROM documents),
tok AS (
  SELECT doc_id, {tok} AS toks FROM src
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM tok),
tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY doc_id, t
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
idf0 AS (
  SELECT term, ln((SELECT n FROM stats) - df + 0.5) - ln(df + 0.5) AS idf_raw
  FROM df
),
eps AS (SELECT 0.25 * avg(idf_raw) AS e FROM idf0),
idf AS (
  SELECT term,
         CASE WHEN idf_raw < 0 THEN (SELECT e FROM eps) ELSE idf_raw END AS idf
  FROM idf0
),
{", ".join(q_ctes)},
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
{", ".join(s_ctes)},
scores_all AS (
  SELECT d.doc_id, {coalesces}
  FROM src d
  {left_joins}
),
comb AS (
  SELECT doc_id,
         {gexpr} + {tie} * (({sexpr}) - {gexpr}) AS score
  FROM scores_all
),
mx AS (SELECT max(score) AS m FROM comb),
kept AS (
  SELECT doc_id, score FROM comb
  WHERE ((SELECT m FROM mx) <= 0 OR score >= 0.01 * (SELECT m FROM mx))
)
SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) - 1 AS rank,
       doc_id, score_micro
FROM (SELECT doc_id, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
      FROM kept)
ORDER BY score_micro DESC, doc_id ASC LIMIT {limit}
"""


def customer_rfm(sf_dir: str):
    """RFM (recency / frequency / monetary) customer metrics — the
    segmentation basis of every CRM pipeline: per customer, days since
    last order (vs the corpus max date), order count, and lifetime cents.
    Fully algebraic: per-batch (max date, count, sum) partials per
    custkey, one groupby fold, recency derived from two exact integer
    day stamps."""
    from ray.data.aggregate import Max, Sum

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partials(t: pa.Table) -> pa.Table:
        days = (
            t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        g = (
            pd.DataFrame(
                {
                    "c_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                    "last_day": days,
                    "frequency": np.ones(len(days), np.int64),
                    "monetary_c": _cents_col(t["o_totalprice"]).to_numpy(zero_copy_only=False),
                }
            )
            .groupby("c_custkey", as_index=False)
            .agg(
                last_day=("last_day", "max"),
                frequency=("frequency", "sum"),
                monetary_c=("monetary_c", "sum"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(
            Max("last_day", alias_name="last_day"),
            Sum("frequency", alias_name="frequency"),
            Sum("monetary_c", alias_name="monetary_c"),
        )
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)
    )
    anchor = int(out["last_day"].max())
    return pa.table(
        {
            "c_custkey": pa.array(out["c_custkey"].to_numpy(np.int64)),
            "recency_days": pa.array(anchor - out["last_day"].to_numpy(np.int64)),
            "frequency": pa.array(out["frequency"].to_numpy(np.int64)),
            "monetary_c": pa.array(out["monetary_c"].to_numpy(np.int64)),
        }
    )


def _attach_int_lookup(ds, side, sf_dir: str, side_table: str, key: str,
                       *size_tables: str):
    """Attach a dimension table's value columns to ``ds`` by integer key.

    ``side`` is a Dataset of (``key``, value-columns) with the key already
    RENAMED to match ``ds``'s column.  When the dimension parquet is
    < 64 MiB on disk the whole side is collected once, shipped via
    ``ray.put`` and applied inside ``map_batches`` as a vectorized
    ``np.searchsorted`` lookup — a broadcast join with NO shuffle (the
    q5 supplier rationale: dimensions are orders of magnitude smaller
    than the fact table).  Above that size it falls back to a
    distributed hash join sized by ``_join_parts`` over ``size_tables``.
    Rows with no match are dropped (inner-join semantics) in both paths.
    """
    small = os.path.getsize(os.path.join(sf_dir, f"{side_table}.parquet")) < (64 << 20)
    if not small:
        return ds.join(
            _with_join_sentinels(side, key),
            join_type="inner",
            num_partitions=_join_parts(sf_dir, side_table, *size_tables),
            on=(key,),
        )
    import ray as _ray

    sp = side.to_pandas()
    order = np.argsort(sp[key].to_numpy(np.int64), kind="mergesort")
    skeys = sp[key].to_numpy(np.int64)[order]
    vals = {
        c: sp[c].to_numpy()[order] for c in sp.columns if c != key
    }
    ref = _ray.put((skeys, vals))

    class Attach:
        def __init__(self):
            self.skeys, self.vals = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(self.skeys, keys)
            idx_c = np.clip(idx, 0, len(self.skeys) - 1)
            hit = (len(self.skeys) > 0) & (self.skeys[idx_c] == keys)
            cols = {c: t[c] for c in t.column_names}
            for c, v in self.vals.items():
                cols[c] = pa.array(v[idx_c])
            return pa.table(cols).filter(pa.array(hit))

    # autoscaling (min=1) pool: a FIXED concurrency=2 demands 2 whole CPUs
    # before the stage can start — on a small cluster with other actors
    # resident (e.g. a parked query pool) chained attach stages then
    # deadlock the streaming executor waiting on pending actors forever.
    return ds.map_batches(Attach, batch_format="pyarrow", concurrency=(1, 2))


def _share_bps(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Integer-exact basis points: ``(num*10000 + den//2) // den`` —
    bit-identical to the DuckDB ``//`` expression on the oracle side,
    immune to float division."""
    num = num.astype(np.int64)
    den = den.astype(np.int64)
    out = np.zeros(len(num), dtype=np.int64)
    nz = den > 0
    out[nz] = (num[nz] * 10000 + den[nz] // 2) // den[nz]
    return out


Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_FROM = "1996-01-01"
Q7_TO = "1998-01-01"


def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape — bilateral trade volume: revenue shipped between
    two nations (supplier in one, customer in the other, both
    directions) per ship year.

    Distributed plan: the supplier side attaches via the
    broadcast-or-join helper (dimension ~1/6000 of lineitem rows and
    pre-filtered to the two nations); customer is sf-proportional so it
    hash-joins orders DISTRIBUTED; one orderkey-keyed fact join, then a
    vectorized cross-pair mask and a 3-key groupby over per-batch cent
    partials.  Output is <= 2 x n_years rows on the driver."""
    from ray.data.aggregate import Sum

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    pair = [int(k) for k, v in names.items() if v in (Q7_NATION_A, Q7_NATION_B)]
    lo, hi = pd.Timestamp(Q7_FROM), pd.Timestamp(Q7_TO)

    def proj_line(t: pa.Table) -> pa.Table:
        m = pcc.and_(
            pcc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pcc.less(t["l_shipdate"], pa.scalar(hi)),
        )
        t = t.filter(m)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "year": pcc.cast(pcc.year(t["l_shipdate"]), pa.int64()),
                "revenue_c": _cents_col(
                    pcc.multiply(
                        t["l_extendedprice"],
                        pcc.subtract(pa.scalar(1.0), t["l_discount"]),
                    )
                ),
            }
        )

    line = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(proj_line, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {"l_suppkey": t["s_suppkey"], "s_nationkey": t["s_nationkey"]}
        ).filter(
            pa.array(np.isin(t["s_nationkey"].to_numpy(zero_copy_only=False), pair))
        ),
        batch_format="pyarrow",
    )
    ls = _attach_int_lookup(line, supp, sf_dir, "supplier", "l_suppkey", "lineitem")

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {"o_custkey": t["c_custkey"], "c_nationkey": t["c_nationkey"]}
        ).filter(
            pa.array(np.isin(t["c_nationkey"].to_numpy(zero_copy_only=False), pair))
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    oc = orders.join(
        _with_join_sentinels(cust, "o_custkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"),
        on=("o_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])

    j = ls.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["l_orderkey"], "s_nationkey": t["s_nationkey"],
             "year": t["year"], "revenue_c": t["revenue_c"]}
        ),
        batch_format="pyarrow",
    ).join(
        _with_join_sentinels(oc, "o_orderkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("o_orderkey",),
    )

    def cross_pair(t: pa.Table) -> pa.Table:
        m = pcc.not_equal(t["s_nationkey"], t["c_nationkey"])
        t = t.filter(m)
        return pa.table(
            {"s_nationkey": t["s_nationkey"], "c_nationkey": t["c_nationkey"],
             "year": t["year"], "revenue_c": t["revenue_c"]}
        )

    out = (
        j.map_batches(cross_pair, batch_format="pyarrow")
        .groupby(["s_nationkey", "c_nationkey", "year"])
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()
    )
    if len(out) == 0:
        return pa.table(
            {"supp_nation": pa.array([], pa.string()),
             "cust_nation": pa.array([], pa.string()),
             "year": pa.array([], pa.int64()),
             "revenue_c": pa.array([], pa.int64())}
        )
    out["supp_nation"] = [names[int(k)] for k in out["s_nationkey"]]
    out["cust_nation"] = [names[int(k)] for k in out["c_nationkey"]]
    out = out.sort_values(["supp_nation", "cust_nation", "year"], ignore_index=True)
    return pa.table(
        {
            "supp_nation": pa.array(out["supp_nation"], pa.string()),
            "cust_nation": pa.array(out["cust_nation"], pa.string()),
            "year": pa.array(out["year"].to_numpy(np.int64)),
            "revenue_c": pa.array(out["revenue_c"].to_numpy(np.int64)),
        }
    )


Q8_REGION = "EUROPE"
Q8_TYPE_PREFIX = "PROMO"
Q8_NATION = "NATION_5"
Q8_FROM = "1996-01-01"
Q8_TO = "1998-01-01"


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape — national market share: the fraction of revenue
    (basis points, integer-exact) supplied by one nation within the
    market "region-R customers buying prefix-T parts", per order year.

    Distributed plan: part membership and supplier nation attach via the
    broadcast-or-join helper; region->customer membership hash-joins
    orders distributed; one orderkey fact join; numerator/denominator
    fold as per-batch cent partials -> one tiny year-keyed groupby."""
    from ray.data.aggregate import Sum

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rkeys = set(reg[reg["r_name"] == Q8_REGION]["r_regionkey"].astype(int))
    region_nk = nat[nat["n_regionkey"].isin(rkeys)]["n_nationkey"].astype(int).to_numpy()
    target_nk = int(nat[nat["n_name"] == Q8_NATION]["n_nationkey"].iloc[0])
    lo, hi = pd.Timestamp(Q8_FROM), pd.Timestamp(Q8_TO)

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table(
            {"l_partkey": t["p_partkey"],
             "p_one": pa.array(np.ones(len(t), dtype=np.int64))}
        ).filter(pcc.starts_with(t["p_type"], Q8_TYPE_PREFIX)),
        batch_format="pyarrow",
    )
    line = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "revenue_c": _cents_col(
                    pcc.multiply(
                        t["l_extendedprice"],
                        pcc.subtract(pa.scalar(1.0), t["l_discount"]),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    lp = _attach_int_lookup(line, part, sf_dir, "part", "l_partkey", "lineitem")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {"l_suppkey": t["s_suppkey"], "s_nationkey": t["s_nationkey"]}
        ),
        batch_format="pyarrow",
    )
    lps = _attach_int_lookup(lp, supp, sf_dir, "supplier", "l_suppkey", "lineitem")

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {"o_custkey": t["c_custkey"],
             "c_one": pa.array(np.ones(len(t), dtype=np.int64))}
        ).filter(
            pa.array(np.isin(t["c_nationkey"].to_numpy(zero_copy_only=False),
                             region_nk))
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
             "year": pcc.cast(pcc.year(t["o_orderdate"]), pa.int64())}
        ).filter(
            pcc.and_(
                pcc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pcc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    )
    oc = orders.join(
        _with_join_sentinels(cust, "o_custkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"),
        on=("o_custkey",),
    ).select_columns(["o_orderkey", "year"])

    j = lps.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["l_orderkey"], "s_nationkey": t["s_nationkey"],
             "revenue_c": t["revenue_c"]}
        ),
        batch_format="pyarrow",
    ).join(
        _with_join_sentinels(oc, "o_orderkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = t["revenue_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_t = (
            t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            == target_nk
        )
        df = pd.DataFrame(
            {"year": t["year"].to_numpy(zero_copy_only=False).astype(np.int64),
             "nation_rev_c": np.where(is_t, rev, 0), "total_rev_c": rev}
        )
        g = df.groupby("year", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("year")
        .aggregate(Sum("nation_rev_c", alias_name="nation_rev_c"),
                   Sum("total_rev_c", alias_name="total_rev_c"))
        .to_pandas()
        .sort_values("year", ignore_index=True)
    )
    num = out["nation_rev_c"].to_numpy(np.int64) if len(out) else np.array([], np.int64)
    den = out["total_rev_c"].to_numpy(np.int64) if len(out) else np.array([], np.int64)
    return pa.table(
        {
            "year": pa.array(out["year"].to_numpy(np.int64) if len(out) else [],
                             pa.int64()),
            "nation_rev_c": pa.array(num),
            "total_rev_c": pa.array(den),
            "share_bps": pa.array(_share_bps(num, den)),
        }
    )


Q10_FROM = "1996-04-01"
Q10_TO = "1996-07-01"
Q10_TOP_N = 20


def q10_returned_items(sf_dir: str):
    """TPC-H Q10 shape — top customers by revenue lost to returns:
    returnflag='R' lineitems of one order quarter, revenue per customer,
    top 20, enriched with name/nation/balance.

    Distributed plan: both fact filters prune at the batch level,
    lineitem joins orders on orderkey DISTRIBUTED, revenue folds by
    custkey, then per-block top-k -> driver heap merge (never the full
    customer table on the driver); the <=20 winners enrich via a
    row-group-pruned point read of customer."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp(Q10_FROM), pd.Timestamp(Q10_TO)
    line = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "revenue_c": _cents_col(
                    pcc.multiply(
                        t["l_extendedprice"],
                        pcc.subtract(pa.scalar(1.0), t["l_discount"]),
                    )
                ),
            }
        ).filter(pcc.equal(t["l_returnflag"], "R")),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]}
        ).filter(
            pcc.and_(
                pcc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pcc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    )
    j = line.join(
        _with_join_sentinels(orders, "o_orderkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("o_orderkey",),
    )

    def block_topk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"c_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
             "revenue_c": t["revenue_c"].to_numpy(zero_copy_only=False)}
        ).sort_values(["revenue_c", "c_custkey"], ascending=[False, True],
                      kind="mergesort").head(Q10_TOP_N)
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (
        j.groupby("o_custkey")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["revenue_c", "c_custkey"], ascending=[False, True],
                     kind="mergesort")
        .head(Q10_TOP_N)
        .reset_index(drop=True)
    )
    if len(agg) == 0:
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_name": pa.array([], pa.string()),
             "n_name": pa.array([], pa.string()),
             "acctbal_c": pa.array([], pa.int64()),
             "revenue_c": pa.array([], pa.int64())}
        )
    keys = [int(k) for k in agg["c_custkey"]]
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
        filters=[("c_custkey", "in", keys)],
    ).to_pandas().set_index("c_custkey")
    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    cmeta = cust.loc[agg["c_custkey"]]
    return pa.table(
        {
            "c_custkey": pa.array(agg["c_custkey"].to_numpy(np.int64)),
            "c_name": pa.array(cmeta["c_name"].tolist(), pa.string()),
            "n_name": pa.array(
                [names[int(k)] for k in cmeta["c_nationkey"]], pa.string()
            ),
            "acctbal_c": pa.array(
                _micro(cmeta["c_acctbal"].to_numpy(np.float64), 100.0)
            ),
            "revenue_c": pa.array(agg["revenue_c"].to_numpy(np.int64)),
        }
    )


Q14_FROM = "1996-09-01"
Q14_TO = "1996-10-01"
Q14_TYPE_PREFIX = "PROMO"


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape — promotion revenue share: of one ship month's
    revenue, the integer-exact basis-point fraction from PROMO-prefix
    parts.  Lineitem prunes to the month per batch, the part-type flag
    attaches via the broadcast-or-join helper, and the whole answer is
    a two-counter fold (per-batch partials -> one-row groupby)."""
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp(Q14_FROM), pd.Timestamp(Q14_TO)
    line = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "revenue_c": _cents_col(
                    pcc.multiply(
                        t["l_extendedprice"],
                        pcc.subtract(pa.scalar(1.0), t["l_discount"]),
                    )
                ),
            }
        ).filter(
            pcc.and_(
                pcc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pcc.less(t["l_shipdate"], pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["p_partkey"],
                "is_promo": pcc.cast(
                    pcc.starts_with(t["p_type"], Q14_TYPE_PREFIX), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    lp = _attach_int_lookup(line, part, sf_dir, "part", "l_partkey", "lineitem")

    def partial(t: pa.Table) -> pa.Table:
        rev = t["revenue_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        promo = t["is_promo"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "promo_rev_c": pa.array([int((rev * promo).sum())], pa.int64()),
                "total_rev_c": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    out = (
        lp.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("promo_rev_c", alias_name="promo_rev_c"),
                   Sum("total_rev_c", alias_name="total_rev_c"))
        .to_pandas()
    )
    num = out["promo_rev_c"].to_numpy(np.int64)
    den = out["total_rev_c"].to_numpy(np.int64)
    return pa.table(
        {
            "promo_rev_c": pa.array(num),
            "total_rev_c": pa.array(den),
            "promo_share_bps": pa.array(_share_bps(num, den)),
        }
    )


_HILO_SHIFT = 40
_HILO_MASK = (1 << _HILO_SHIFT) - 1


def _hilo(v: int) -> tuple:
    """Split a non-negative Python int into (hi, lo) int64 halves at
    2^40 so higher-moment partial sums (which exceed int64 at
    trillion-row scale) ride through ``groupby().aggregate(Sum)``
    exactly: sum hi and lo independently, recombine on the driver as
    ``sum_hi << 40 | carry(sum_lo)``.  lo < 2^40 so ~8M partials fit
    int64; hi keeps ~2^23 headroom at 10^12 rows of 5000-deci values."""
    return int(v) >> _HILO_SHIFT, int(v) & _HILO_MASK


def _unhilo(hi, lo) -> int:
    return (int(hi) << _HILO_SHIFT) + int(lo)


def _chunked_int_sum(x: np.ndarray, chunk: int = 8192) -> int:
    """Exact sum of an int64 array whose TOTAL may overflow int64:
    np.sum per chunk (each chunk-safe for |x| <= 2^49), folded into an
    arbitrary-precision Python int."""
    return sum(int(x[i : i + chunk].sum()) for i in range(0, len(x), chunk))


EXT_STATS_SCALE = 10.0  # deci units: x**4 stays < 2^63 per element


def extended_stats_by_type(sf_dir: str):
    """Elasticsearch extended_stats over events.value per event_type:
    count, sum, mean, population std, skewness and excess kurtosis.

    Distributed plan: ONE pass of per-batch raw-moment partials
    (n, S1..S4 over deci-scaled int values), each carried as exact
    hi/lo int64 halves through a 5-row groupby; the driver recombines
    arbitrary-precision moments and evaluates the closed forms with the
    SAME double expression tree as the SQL oracle (which sums HUGEINT
    moments), so micro-rounded outputs are bit-stable."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        x = _micro(t["value"].to_numpy(zero_copy_only=False), EXT_STATS_SCALE)
        df = pd.DataFrame({"k": t["event_type"].to_pandas(), "x": x})
        rows = {"event_type": [], "n": []}
        for m in range(1, 5):
            rows[f"s{m}_hi"] = []
            rows[f"s{m}_lo"] = []
        for k, grp in df.groupby("k", sort=False):
            xs = grp["x"].to_numpy(np.int64)
            rows["event_type"].append(k)
            rows["n"].append(len(xs))
            p = xs
            for m in range(1, 5):
                hi, lo = _hilo(_chunked_int_sum(p))
                rows[f"s{m}_hi"].append(hi)
                rows[f"s{m}_lo"].append(lo)
                if m < 4:
                    p = p * xs
        return pa.table({c: pa.array(v, pa.int64() if c != "event_type" else None)
                         for c, v in rows.items()})

    aggs = [Sum("n", alias_name="n")]
    for m in range(1, 5):
        aggs.append(Sum(f"s{m}_hi", alias_name=f"s{m}_hi"))
        aggs.append(Sum(f"s{m}_lo", alias_name=f"s{m}_lo"))
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(*aggs)
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    res = {"event_type": [], "n": [], "sum_deci": [], "mean_micro": [],
           "std_micro": [], "skew_micro": [], "kurt_micro": []}
    import math

    for r in out.itertuples(index=False):
        n = int(r.n)
        s1 = _unhilo(r.s1_hi, r.s1_lo)
        s2 = _unhilo(r.s2_hi, r.s2_lo)
        s3 = _unhilo(r.s3_hi, r.s3_lo)
        s4 = _unhilo(r.s4_hi, r.s4_lo)
        fn, f1, f2, f3, f4 = float(n), float(s1), float(s2), float(s3), float(s4)
        mean = f1 / fn
        m2 = f2 / fn - mean * mean
        m3 = f3 / fn - 3.0 * mean * (f2 / fn) + 2.0 * mean * mean * mean
        m4 = (f4 / fn - 4.0 * mean * (f3 / fn)
              + 6.0 * mean * mean * (f2 / fn)
              - 3.0 * mean * mean * mean * mean)
        std = math.sqrt(m2)
        skew = m3 / (std * std * std)
        kurt = m4 / (m2 * m2) - 3.0
        res["event_type"].append(r.event_type)
        res["n"].append(n)
        res["sum_deci"].append(s1)
        res["mean_micro"].append(int(math.floor(mean * 1e6 + 0.5)))
        res["std_micro"].append(int(math.floor(std * 1e6 + 0.5)))
        res["skew_micro"].append(int(math.floor(skew * 1e6 + 0.5)))
        res["kurt_micro"].append(int(math.floor(kurt * 1e6 + 0.5)))
    return pa.table(
        {
            "event_type": pa.array(res["event_type"], pa.string()),
            "n": pa.array(res["n"], pa.int64()),
            "sum_deci": pa.array(res["sum_deci"], pa.int64()),
            "mean_micro": pa.array(res["mean_micro"], pa.int64()),
            "std_micro": pa.array(res["std_micro"], pa.int64()),
            "skew_micro": pa.array(res["skew_micro"], pa.int64()),
            "kurt_micro": pa.array(res["kurt_micro"], pa.int64()),
        }
    )


def value_boxplot_by_type(sf_dir: str):
    """Boxplot aggregation per event_type: exact q1/median/q3 over cent
    values plus Tukey-fence outlier counts (|x - quartile| beyond
    1.5*IQR).  Reuses the bounded-domain histogram pattern: per-batch
    (type, cent, count) partials merge on the driver (domain-sized, row
    -count-independent); quartiles read with quantile_disc rank
    semantics and the fences evaluate in scaled INTEGER arithmetic
    (2x < 2*q1 - 3*iqr) on the same histogram — one pass total."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def local_hist(t: pa.Table) -> pa.Table:
        x = _micro(t["value"].to_numpy(zero_copy_only=False), 100.0)
        df = pd.DataFrame({"k": t["event_type"].to_pandas(), "v": x})
        g = df.groupby(["k", "v"], sort=False).size().reset_index(name="c")
        return pa.table({"k": pa.array(g["k"]), "v": pa.array(g["v"], pa.int64()),
                         "c": pa.array(g["c"], pa.int64())})

    partials = ds.map_batches(local_hist, batch_format="pyarrow").to_pandas()
    rows = {"event_type": [], "n": [], "q1_c": [], "median_c": [], "q3_c": [],
            "iqr_c": [], "n_outliers": []}
    for k, grp in partials.groupby("k", sort=True):
        merged = grp.groupby("v", sort=True)["c"].sum()
        values = merged.index.to_numpy(np.int64)
        cnts = merged.to_numpy(np.int64)
        cum = cnts.cumsum()
        n = int(cum[-1]) if len(cum) else 0
        qv = {}
        for q in (0.25, 0.5, 0.75):
            rank = max(1, int(np.ceil(q * n)))
            qv[q] = int(values[int(np.searchsorted(cum, rank, side="left"))])
        iqr = qv[0.75] - qv[0.25]
        lo_mask = 2 * values < 2 * qv[0.25] - 3 * iqr
        hi_mask = 2 * values > 2 * qv[0.75] + 3 * iqr
        rows["event_type"].append(k)
        rows["n"].append(n)
        rows["q1_c"].append(qv[0.25])
        rows["median_c"].append(qv[0.5])
        rows["q3_c"].append(qv[0.75])
        rows["iqr_c"].append(iqr)
        rows["n_outliers"].append(int(cnts[lo_mask | hi_mask].sum()))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "q1_c": pa.array(rows["q1_c"], pa.int64()),
            "median_c": pa.array(rows["median_c"], pa.int64()),
            "q3_c": pa.array(rows["q3_c"], pa.int64()),
            "iqr_c": pa.array(rows["iqr_c"], pa.int64()),
            "n_outliers": pa.array(rows["n_outliers"], pa.int64()),
        }
    )


TTEST_TYPE_A = "click"
TTEST_TYPE_B = "purchase"


def value_ttest(sf_dir: str):
    """Welch's two-sample t-test between two event types' values (deci
    scale): t statistic and Welch-Satterthwaite degrees of freedom,
    micro-rounded.  One pass of exact (n, S1, S2) hi/lo moment partials
    -> 2-row groupby; the driver evaluates the IDENTICAL double
    expression tree as the HUGEINT-summing SQL oracle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        mask = pcc.is_in(
            t["event_type"], value_set=pa.array([TTEST_TYPE_A, TTEST_TYPE_B])
        )
        t = t.filter(mask)
        x = _micro(t["value"].to_numpy(zero_copy_only=False), EXT_STATS_SCALE)
        df = pd.DataFrame({"k": t["event_type"].to_pandas(), "x": x})
        rows = {"k": [], "n": [], "s1_hi": [], "s1_lo": [], "s2_hi": [], "s2_lo": []}
        for k, grp in df.groupby("k", sort=False):
            xs = grp["x"].to_numpy(np.int64)
            h1, l1 = _hilo(_chunked_int_sum(xs))
            h2, l2 = _hilo(_chunked_int_sum(xs * xs))
            rows["k"].append(k)
            rows["n"].append(len(xs))
            rows["s1_hi"].append(h1)
            rows["s1_lo"].append(l1)
            rows["s2_hi"].append(h2)
            rows["s2_lo"].append(l2)
        return pa.table({c: pa.array(v, pa.int64() if c != "k" else None)
                         for c, v in rows.items()})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("s1_hi", alias_name="s1_hi"), Sum("s1_lo", alias_name="s1_lo"),
                   Sum("s2_hi", alias_name="s2_hi"), Sum("s2_lo", alias_name="s2_lo"))
        .to_pandas()
        .set_index("k")
    )
    import math

    def stats(k):
        r = out.loc[k]
        n = int(r["n"])
        s1 = float(_unhilo(r["s1_hi"], r["s1_lo"]))
        s2 = float(_unhilo(r["s2_hi"], r["s2_lo"]))
        fn = float(n)
        var = (s2 - s1 * s1 / fn) / (fn - 1.0)
        return n, s1 / fn, var

    na, ma, va = stats(TTEST_TYPE_A)
    nb, mb, vb = stats(TTEST_TYPE_B)
    sea = va / float(na)
    seb = vb / float(nb)
    t_stat = (ma - mb) / math.sqrt(sea + seb)
    df_w = (sea + seb) * (sea + seb) / (
        sea * sea / (float(na) - 1.0) + seb * seb / (float(nb) - 1.0)
    )
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "t_micro": pa.array([int(math.floor(t_stat * 1e6 + 0.5))], pa.int64()),
            "df_micro": pa.array([int(math.floor(df_w * 1e6 + 0.5))], pa.int64()),
        }
    )


def value_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of each event type's HOURLY revenue series
    (derivative/serial-correlation pipeline-agg shape): hourly cent sums
    fold distributed, then lag pairs over consecutive present hours and
    the Pearson closed form evaluate on the driver over the tiny
    (type x hour) series with exact Python-int sums — identical to the
    SQL oracle's HUGEINT LAG-join formulation."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def hourly(t: pa.Table) -> pa.Table:
        sec = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hr = sec // (3600 * 1_000_000)
        cents = _micro(t["value"].to_numpy(zero_copy_only=False), 100.0)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(), "hr": hr,
                           "v": cents})
        g = df.groupby(["event_type", "hr"], as_index=False)["v"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    series = (
        ds.map_batches(hourly, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()
        .sort_values(["event_type", "hr"], ignore_index=True)
    )
    import math

    rows = {"event_type": [], "n": [], "r1_micro": []}
    for k, grp in series.groupby("event_type", sort=True):
        hrs = grp["hr"].to_numpy(np.int64)
        vs = grp["v"].to_numpy(np.int64)
        nxt = dict(zip(hrs.tolist(), vs.tolist()))
        xs = [int(v) for h, v in zip(hrs, vs) if int(h) + 1 in nxt]
        ys = [nxt[int(h) + 1] for h in hrs if int(h) + 1 in nxt]
        n = len(xs)
        if n < 2:
            continue
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        fn = float(n)
        r1 = (fn * float(sxy) - float(sx) * float(sy)) / math.sqrt(
            (fn * float(sxx) - float(sx) * float(sx))
            * (fn * float(syy) - float(sy) * float(sy))
        )
        rows["event_type"].append(k)
        rows["n"].append(n)
        rows["r1_micro"].append(int(math.floor(r1 * 1e6 + 0.5)))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "r1_micro": pa.array(rows["r1_micro"], pa.int64()),
        }
    )


COMPOSITE_AFTER = ("en", "src15")  # after-key: resume past this (lang, source)
COMPOSITE_PAGE = 5


def composite_buckets_page(sf_dir: str):
    """Elasticsearch composite-aggregation pagination: (lang, source)
    buckets with doc count and char sum, ordered by the bucket key,
    resumed AFTER a cursor key — the bucket-paging analogue of
    search_after.  The groupby exchange carries only bucket partials
    (map-side pre-aggregated); the after-key predicate and page cut
    run on the driver over the tiny bucket table."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": t["lang"].to_pandas(), "source": t["source"].to_pandas(),
             "chars": t["n_chars"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("chars", "size"), sum_chars=("chars", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_chars", alias_name="sum_chars"))
        .to_pandas()
        .sort_values(["lang", "source"], ignore_index=True)
    )
    al, asrc = COMPOSITE_AFTER
    keep = (out["lang"] > al) | ((out["lang"] == al) & (out["source"] > asrc))
    page = out[keep].head(COMPOSITE_PAGE).reset_index(drop=True)
    return pa.table(
        {
            "lang": pa.array(page["lang"], pa.string()),
            "source": pa.array(page["source"], pa.string()),
            "n_docs": pa.array(page["n_docs"].to_numpy(np.int64)),
            "sum_chars": pa.array(page["sum_chars"].to_numpy(np.int64)),
        }
    )


def hapax_by_lang(sf_dir: str):
    """Rare-terms aggregation: per language, vocabulary size, hapax
    legomena count (terms whose within-language document frequency is
    exactly 1) and the hapax ratio in basis points.  The standard df
    shuffle shape keyed by (lang, term) with per-batch distinct
    pre-aggregation, then a per-lang two-counter fold — rare-term
    detection never materializes postings."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        flat = pcc.list_flatten(toks)
        parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        langs = t["lang"].to_pandas().to_numpy()
        df = pd.DataFrame(
            {"lang": langs[parents], "term": flat.to_pandas(), "d": parents}
        ).drop_duplicates()
        g = df.groupby(["lang", "term"], as_index=False, sort=False).size()
        g = g.rename(columns={"size": "df"})
        return pa.Table.from_pandas(g, preserve_index=False)

    per_term = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("df", alias_name="df"))
    )

    def fold(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"lang": t["lang"].to_pandas(),
                           "hapax": (t["df"].to_numpy(zero_copy_only=False) == 1)})
        g = df.groupby("lang", as_index=False).agg(
            n_terms=("hapax", "size"), n_hapax=("hapax", "sum"))
        g["n_hapax"] = g["n_hapax"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        per_term.map_batches(fold, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_terms", alias_name="n_terms"),
                   Sum("n_hapax", alias_name="n_hapax"))
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    nt = out["n_terms"].to_numpy(np.int64)
    nh = out["n_hapax"].to_numpy(np.int64)
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_terms": pa.array(nt),
            "n_hapax": pa.array(nh),
            "hapax_bps": pa.array(_share_bps(nh, nt)),
        }
    )


def events_hourly_dense(sf_dir: str):
    """date_histogram with min_doc_count=0: each event type's hourly
    count + cent sum over a DENSE hour axis between that type's first
    and last hour, empty buckets zero-filled.  The fold is the standard
    distributed hourly groupby; densification happens on the driver
    over the aggregate (bounded by the time span, independent of row
    count) — exactly where ES fills empty buckets (coordinating node)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def hourly(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hr = us // (3600 * 1_000_000)
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(), "hr": hr,
             "v": _micro(t["value"].to_numpy(zero_copy_only=False), 100.0)}
        )
        g = df.groupby(["event_type", "hr"], as_index=False).agg(
            n=("v", "size"), value_c=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(hourly, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_c", alias_name="value_c"))
        .to_pandas()
    )
    frames = []
    for k, grp in agg.groupby("event_type", sort=True):
        lo, hi = int(grp["hr"].min()), int(grp["hr"].max())
        dense = pd.DataFrame({"hr": np.arange(lo, hi + 1, dtype=np.int64)})
        dense["event_type"] = k
        m = dense.merge(grp[["hr", "n", "value_c"]], on="hr", how="left").fillna(0)
        frames.append(m)
    out = pd.concat(frames, ignore_index=True).sort_values(
        ["event_type", "hr"], ignore_index=True)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "hr": pa.array(out["hr"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "value_c": pa.array(out["value_c"].to_numpy(np.int64)),
        }
    )


def user_type_adjacency(sf_dir: str):
    """Elasticsearch adjacency_matrix aggregation: for every unordered
    pair of event types (diagonal included), how many distinct users
    intersect both.  One membership exchange: per-batch (user, bitmask
    columns) local max -> groupby(user).max collapses to one row per
    user, then per-batch B^T B matmul partials (k x k co-membership
    counts, k = #types) fold through a tiny pair-keyed groupby — the
    user table itself never reaches the driver."""
    from ray.data.aggregate import Max, Sum

    types = sorted(
        _read(sf_dir, "events", columns=["event_type"])
        .groupby("event_type")
        .count()
        .to_pandas()["event_type"]
        .tolist()
    )
    k = len(types)
    bit_cols = [f"b{i}" for i in range(k)]

    def bits(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"].to_pandas()}
        et = t["event_type"].to_pandas().to_numpy()
        for i, ty in enumerate(types):
            cols[bit_cols[i]] = (et == ty).astype(np.int64)
        df = pd.DataFrame(cols).groupby("user_id", as_index=False).max()
        return pa.Table.from_pandas(df, preserve_index=False)

    members = (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .map_batches(bits, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Max(c, alias_name=c) for c in bit_cols])
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        B = np.stack(
            [t[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in bit_cols],
            axis=1,
        )
        M = B.T @ B
        ii, jj = np.triu_indices(k)
        return pa.table(
            {
                "i": pa.array(ii.astype(np.int64)),
                "j": pa.array(jj.astype(np.int64)),
                "n_users": pa.array(M[ii, jj].astype(np.int64)),
            }
        )

    out = (
        members.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
        .sort_values(["i", "j"], ignore_index=True)
    )
    out = out[out["n_users"] > 0].reset_index(drop=True)  # match inner-join oracle
    return pa.table(
        {
            "type_a": pa.array([types[int(i)] for i in out["i"]], pa.string()),
            "type_b": pa.array([types[int(j)] for j in out["j"]], pa.string()),
            "n_users": pa.array(out["n_users"].to_numpy(np.int64)),
        }
    )


PCT_RANK_THRESHOLDS_C = (5000, 15000, 30000)  # cents


def value_percentile_ranks(sf_dir: str):
    """ES percentile_ranks aggregation: for fixed cent thresholds, the
    fraction (basis points, integer-exact) of each event type's values
    at or below the threshold.  One pass of per-batch counter partials
    (|thresholds| counters + total per type) -> tiny groupby."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    ths = list(PCT_RANK_THRESHOLDS_C)

    def partial(t: pa.Table) -> pa.Table:
        x = _micro(t["value"].to_numpy(zero_copy_only=False), 100.0)
        df = pd.DataFrame({"k": t["event_type"].to_pandas()})
        for i, th in enumerate(ths):
            df[f"le{i}"] = (x <= th).astype(np.int64)
        df["n"] = 1
        g = df.groupby("k", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    aggs = [Sum(f"le{i}", alias_name=f"le{i}") for i in range(len(ths))]
    aggs.append(Sum("n", alias_name="n"))
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(*aggs)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    rows = {"event_type": [], "threshold_c": [], "n_le": [], "n": [],
            "pct_bps": []}
    for r in out.itertuples(index=False):
        for i, th in enumerate(ths):
            n_le, n = int(getattr(r, f"le{i}")), int(r.n)
            rows["event_type"].append(r.k)
            rows["threshold_c"].append(th)
            rows["n_le"].append(n_le)
            rows["n"].append(n)
            rows["pct_bps"].append((n_le * 10000 + n // 2) // n if n else 0)
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "threshold_c": pa.array(rows["threshold_c"], pa.int64()),
            "n_le": pa.array(rows["n_le"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "pct_bps": pa.array(rows["pct_bps"], pa.int64()),
        }
    )


def cumulative_users(sf_dir: str):
    """ES cumulative_cardinality pipeline agg: per day, the count of
    FIRST-SEEN users and the running total of distinct users ever seen.
    The distributed part is a per-user min-day fold (groupby user over
    per-batch min partials) + a per-day count; the cumsum runs on the
    driver over the bounded day axis."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def per_batch(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        day = us // (86400 * 1_000_000)
        df = pd.DataFrame({"user_id": t["user_id"].to_pandas(), "day": day})
        g = df.groupby("user_id", as_index=False)["day"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    first = (
        ds.map_batches(per_batch, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="day"))
    )

    def day_counts(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame({"day": t["day"].to_numpy(zero_copy_only=False)})
            .groupby("day", as_index=False)
            .size()
            .rename(columns={"size": "new_users"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    days = (
        first.map_batches(day_counts, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("new_users", alias_name="new_users"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    new = days["new_users"].to_numpy(np.int64)
    return pa.table(
        {
            "day": pa.array(days["day"].to_numpy(np.int64)),
            "new_users": pa.array(new),
            "cum_users": pa.array(np.cumsum(new)),
        }
    )


CCNET_Q1 = 1 / 3
CCNET_Q2 = 2 / 3


def ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail perplexity bucketing per language: each
    doc's bigram-LM cross-entropy (the existing distributed
    train->broadcast->score pipeline) reduces to an integer centi-nat
    per-pair rate; per-language tercile thresholds come from a
    bounded-domain histogram (quantile_disc rank rule) and the bucket
    counts read off the SAME histogram — one scoring pass, one
    histogram exchange, no doc-level driver materialization."""
    from ..stages.lm import perplexity_profile

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    prof = perplexity_profile(ds)
    lang_ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    joined = prof.join(
        lang_ds, join_type="inner",
        num_partitions=_join_parts(sf_dir, "documents"), on=("doc_id",),
    )

    def hist(t: pa.Table) -> pa.Table:
        n_pairs = t["n_pairs"].to_numpy(zero_copy_only=False).astype(np.int64)
        ll = t["ll_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n_pairs >= 1
        nll_centi = (-ll[keep]) // (n_pairs[keep] * 10)
        df = pd.DataFrame({"lang": t["lang"].to_pandas().to_numpy()[keep],
                           "v": nll_centi})
        g = df.groupby(["lang", "v"], as_index=False).size().rename(
            columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = joined.map_batches(hist, batch_format="pyarrow").to_pandas()
    rows = {"lang": [], "bucket": [], "n_docs": []}
    for lang, grp in partials.groupby("lang", sort=True):
        merged = grp.groupby("v", sort=True)["c"].sum()
        values = merged.index.to_numpy(np.int64)
        cnts = merged.to_numpy(np.int64)
        cum = cnts.cumsum()
        n = int(cum[-1]) if len(cum) else 0
        if n == 0:
            continue
        qv = {}
        for q in (CCNET_Q1, CCNET_Q2):
            rank = max(1, int(np.ceil(q * n)))
            qv[q] = int(values[int(np.searchsorted(cum, rank, side="left"))])
        head = int(cnts[values <= qv[CCNET_Q1]].sum())
        mid = int(cnts[(values > qv[CCNET_Q1]) & (values <= qv[CCNET_Q2])].sum())
        tail = n - head - mid
        for b, c in (("head", head), ("middle", mid), ("tail", tail)):
            if c == 0:
                continue  # GROUP BY on the oracle side emits no empty bucket
            rows["lang"].append(lang)
            rows["bucket"].append(b)
            rows["n_docs"].append(c)
    return pa.table(
        {
            "lang": pa.array(rows["lang"], pa.string()),
            "bucket": pa.array(rows["bucket"], pa.string()),
            "n_docs": pa.array(rows["n_docs"], pa.int64()),
        }
    )


def value_trend_by_type(sf_dir: str):
    """Distributed simple linear regression (OLS trend): per event type,
    the slope and intercept of cent value over absolute epoch-hour —
    exact (n, Sx, Sy, Sxx, Sxy) moment partials carried as hi/lo int64
    halves (x*y products overflow int64 at trillion-row scale), closed
    forms evaluated with the SAME double expression tree as the
    HUGEINT-summing SQL oracle (regr_slope/regr_intercept semantics)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    moment_cols = ["sx", "sy", "sxx", "sxy"]

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        x = us // (3600 * 1_000_000)
        y = _micro(t["value"].to_numpy(zero_copy_only=False), 100.0)
        df = pd.DataFrame({"k": t["event_type"].to_pandas(), "x": x, "y": y})
        rows = {"event_type": [], "n": []}
        for c in moment_cols:
            rows[f"{c}_hi"] = []
            rows[f"{c}_lo"] = []
        for k, grp in df.groupby("k", sort=False):
            xs = grp["x"].to_numpy(np.int64)
            ys = grp["y"].to_numpy(np.int64)
            rows["event_type"].append(k)
            rows["n"].append(len(xs))
            for c, arr in (("sx", xs), ("sy", ys), ("sxx", xs * xs),
                           ("sxy", xs * ys)):
                hi, lo = _hilo(_chunked_int_sum(arr, chunk=512))
                rows[f"{c}_hi"].append(hi)
                rows[f"{c}_lo"].append(lo)
        return pa.table({c: pa.array(v, pa.int64() if c != "event_type" else None)
                         for c, v in rows.items()})

    aggs = [Sum("n", alias_name="n")]
    for c in moment_cols:
        aggs.append(Sum(f"{c}_hi", alias_name=f"{c}_hi"))
        aggs.append(Sum(f"{c}_lo", alias_name=f"{c}_lo"))
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(*aggs)
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    import math

    res = {"event_type": [], "n": [], "slope_micro": [], "intercept_micro": []}
    for r in out.itertuples(index=False):
        n = int(r.n)
        sx = float(_unhilo(r.sx_hi, r.sx_lo))
        sy = float(_unhilo(r.sy_hi, r.sy_lo))
        sxx = float(_unhilo(r.sxx_hi, r.sxx_lo))
        sxy = float(_unhilo(r.sxy_hi, r.sxy_lo))
        fn = float(n)
        slope = (fn * sxy - sx * sy) / (fn * sxx - sx * sx)
        intercept = sy / fn - slope * (sx / fn)
        res["event_type"].append(r.event_type)
        res["n"].append(n)
        res["slope_micro"].append(int(math.floor(slope * 1e6 + 0.5)))
        res["intercept_micro"].append(int(math.floor(intercept * 1e6 + 0.5)))
    return pa.table(
        {
            "event_type": pa.array(res["event_type"], pa.string()),
            "n": pa.array(res["n"], pa.int64()),
            "slope_micro": pa.array(res["slope_micro"], pa.int64()),
            "intercept_micro": pa.array(res["intercept_micro"], pa.int64()),
        }
    )


def nation_order_rank_dist(sf_dir: str):
    """PERCENT_RANK + CUME_DIST window functions over the per-nation
    order-count aggregate: the distributed part is a custkey join +
    nation-keyed count fold; the rank distribution evaluates on the
    driver over <=|nations| rows with the exact window definitions
    (percent_rank = (rank-1)/(n-1) with RANK ties, cume_dist = peers-at
    -or-below / n), micro-rounded identically to the SQL oracle."""
    from ray.data.aggregate import Sum

    import ray

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {"o_custkey": t["c_custkey"], "c_nationkey": t["c_nationkey"]}
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    oc = orders.join(
        _with_join_sentinels(cust, "o_custkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"),
        on=("o_custkey",),
    )

    def per_batch(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame({"nk": t["c_nationkey"].to_numpy(zero_copy_only=False)})
            .groupby("nk", as_index=False)
            .size()
            .rename(columns={"size": "n_orders"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        oc.map_batches(per_batch, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    cnt = out["n_orders"].to_numpy(np.int64)
    n = len(cnt)
    import math

    # RANK over ascending n_orders: 1 + #rows strictly below
    rank = np.array([1 + int((cnt < c).sum()) for c in cnt], dtype=np.int64)
    at_or_below = np.array([int((cnt <= c).sum()) for c in cnt], dtype=np.int64)
    pr = (rank - 1).astype(np.float64) / float(n - 1) if n > 1 else np.zeros(n)
    cd = at_or_below.astype(np.float64) / float(n)
    res = pd.DataFrame(
        {
            "n_name": [names[int(k)] for k in out["nk"]],
            "n_orders": cnt,
            "pr_micro": np.floor(pr * 1e6 + 0.5).astype(np.int64),
            "cd_micro": np.floor(cd * 1e6 + 0.5).astype(np.int64),
        }
    ).sort_values("n_name", ignore_index=True)
    return pa.Table.from_pandas(res, preserve_index=False)


def cheapest_supplier_per_brand(sf_dir: str):
    """TPC-H Q2 essence over the available tables: per part brand, the
    minimum observed unit price (cent-exact extendedprice/quantity) and
    the supplier achieving it (suppkey-asc tie-break) — correlated-min
    + join-back expressed as the ALGEBRAIC argmin shape: per-batch
    partial argmin per brand -> one brand-keyed groupby -> final argmin
    per group.  Brand attaches via the broadcast-or-join helper."""
    line = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "s_suppkey": t["l_suppkey"],
                "price_c": _cents_col(
                    pcc.divide(
                        pcc.cast(t["l_extendedprice"], pa.float64()),
                        pcc.cast(t["l_quantity"], pa.float64()),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]).map_batches(
        lambda t: pa.table({"l_partkey": t["p_partkey"], "p_brand": t["p_brand"]}),
        batch_format="pyarrow",
    )
    lp = _attach_int_lookup(line, part, sf_dir, "part", "l_partkey", "lineitem")

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "p_brand": t["p_brand"].to_pandas(),
                "price_c": t["price_c"].to_numpy(zero_copy_only=False),
                "s_suppkey": t["s_suppkey"].to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(["p_brand", "price_c", "s_suppkey"]).groupby(
            "p_brand", sort=False).head(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["price_c", "s_suppkey"]).head(1)[
            ["p_brand", "price_c", "s_suppkey"]
        ]

    out = (
        lp.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values("p_brand", ignore_index=True)
    )
    return pa.table(
        {
            "p_brand": pa.array(out["p_brand"], pa.string()),
            "price_c": pa.array(out["price_c"].to_numpy(np.int64)),
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
        }
    )


Q4_FROM = "1996-01-01"
Q4_TO = "1996-07-01"


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape — order-priority checking (adapted: the shipped
    schema has no commit/receipt dates, so "late" = any lineitem shipped
    after the order date): count of orders per priority in a 6-month
    window having at least one late lineitem.

    Distributed plan: the EXISTS needs NO global aggregate — lineitem
    folds MAP-SIDE to per-batch (orderkey -> max shipdate) partials and
    those partials join the windowed orders directly: ANY partial max >
    o_orderdate proves the EXISTS, and because the hash join co-locates
    each orderkey in one output partition, the per-order dedup runs
    partition-locally (batch_size=None).  The only exchange is the join
    itself; priority counts fold to <= 5 rows per partition."""
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp(Q4_FROM), pd.Timestamp(Q4_TO)

    def line_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "ship_us": t["l_shipdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        p = df.groupby("o_orderkey", sort=False)["ship_us"].max().reset_index()
        return pa.Table.from_pandas(p, preserve_index=False)

    last_ship = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(line_partial, batch_format="pyarrow")

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "odate_us": pcc.cast(t["o_orderdate"], pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        ).filter(
            pcc.and_(
                pcc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pcc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    )

    j = orders.join(
        _with_join_sentinels(last_ship, "o_orderkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "lineitem"),
        on=("o_orderkey",),
    )

    def prio_partial(t: pa.Table) -> pa.Table:
        # one batch per join partition: every orderkey's partial maxima
        # are all here, so the per-order distinct is local
        t = t.filter(pcc.greater(t["ship_us"], t["odate_us"]))
        df = pd.DataFrame(
            {
                "ok": t["o_orderkey"].to_numpy(zero_copy_only=False),
                "o_orderpriority": t["o_orderpriority"].to_pandas(),
            }
        ).drop_duplicates("ok")
        df = (
            df["o_orderpriority"]
            .value_counts()
            .rename_axis("o_orderpriority")
            .reset_index(name="order_count")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        j.map_batches(prio_partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_orderpriority")
        .aggregate(Sum("order_count", alias_name="order_count"))
        .to_pandas()
        .sort_values("o_orderpriority", ignore_index=True)
    )
    return pa.table(
        {
            "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
            "order_count": pa.array(out["order_count"].to_numpy(np.int64)),
        }
    )


Q12_FROM = "1997-01-01"
Q12_TO = "1998-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_by_returnflag(sf_dir: str):
    """TPC-H Q12 shape (adapted: no l_shipmode column — l_returnflag
    plays the ship-mode role): per return flag, how many lineitems
    shipped in one year belong to critical-priority orders vs not —
    the classic two-conditional-counter pivot after a fact⋈fact join.

    Distributed plan: lineitem prunes to the ship-year map-side and
    carries only (orderkey, returnflag); orders carries (orderkey,
    is_high 0/1); one orderkey hash join, then per-batch (flag ->
    high, low) partials fold to <= 3 rows each before the final tiny
    groupby."""
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp(Q12_FROM), pd.Timestamp(Q12_TO)

    line = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["l_orderkey"], "l_returnflag": t["l_returnflag"]}
        ).filter(
            pcc.and_(
                pcc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pcc.less(t["l_shipdate"], pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "is_high": pcc.cast(
                    pcc.is_in(t["o_orderpriority"], value_set=pa.array(Q12_HIGH)),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    j = line.join(
        _with_join_sentinels(orders, "o_orderkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "high": t["is_high"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("l_returnflag", sort=False)["high"].agg(["sum", "count"])
        return pa.table(
            {
                "l_returnflag": pa.array(g.index, pa.string()),
                "high_line_count": pa.array(g["sum"].to_numpy(np.int64)),
                "low_line_count": pa.array(
                    (g["count"] - g["sum"]).to_numpy(np.int64)
                ),
            }
        )

    out = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
        )
        .to_pandas()
        .sort_values("l_returnflag", ignore_index=True)
    )
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "high_line_count": pa.array(out["high_line_count"].to_numpy(np.int64)),
            "low_line_count": pa.array(out["low_line_count"].to_numpy(np.int64)),
        }
    )


Q15_FROM = "1997-01-01"
Q15_TO = "1997-04-01"


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — top supplier: the supplier(s) with the maximum
    quarterly revenue (the view + scalar-max-subquery pattern), ties
    kept, enriched with the supplier name.

    Distributed plan: lineitem prunes to the quarter map-side, folds to
    per-batch (suppkey -> cents) partials, ONE suppkey groupby; the max
    and its ties resolve on the <= |suppliers| aggregate; names attach
    via a suppkey-pushdown point read of the supplier parquet."""
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp(Q15_FROM), pd.Timestamp(Q15_TO)

    def partial(t: pa.Table) -> pa.Table:
        m = pcc.and_(
            pcc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pcc.less(t["l_shipdate"], pa.scalar(hi)),
        )
        t = t.filter(m)
        df = pd.DataFrame(
            {
                "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "total_revenue_c": _cents_col(
                    pcc.multiply(
                        t["l_extendedprice"],
                        pcc.subtract(pa.scalar(1.0), t["l_discount"]),
                    )
                ).to_numpy(zero_copy_only=False),
            }
        )
        p = df.groupby("s_suppkey", sort=False)["total_revenue_c"].sum().reset_index()
        return pa.Table.from_pandas(p, preserve_index=False)

    rev = (
        _read(
            sf_dir, "lineitem",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("total_revenue_c", alias_name="total_revenue_c"))
        .to_pandas()
    )
    if len(rev) == 0:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string()),
             "total_revenue_c": pa.array([], pa.int64())}
        )
    best = rev[rev["total_revenue_c"] == rev["total_revenue_c"].max()]
    keys = sorted(int(k) for k in best["s_suppkey"])
    import pyarrow.dataset as pads

    supp = pads.dataset(os.path.join(sf_dir, "supplier.parquet")).to_table(
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(keys),
    ).to_pandas()
    out = best.merge(supp, on="s_suppkey").sort_values("s_suppkey", ignore_index=True)
    return pa.table(
        {
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
            "s_name": pa.array(out["s_name"], pa.string()),
            "total_revenue_c": pa.array(out["total_revenue_c"].to_numpy(np.int64)),
        }
    )


Q19_BRANCHES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)


def q19_discounted_revenue(sf_dir: str):
    """TPC-H Q19 shape — discounted revenue from an OR-disjunction of
    (brand, size-range, quantity-range) branches over part⋈lineitem.

    Distributed plan: part's (brand, size) attach via the
    broadcast-or-join helper; the three branch predicates evaluate as
    ONE vectorized Arrow mask per batch (no row loop, no per-branch
    rescan); per-batch cent partials fold to a single driver scalar."""
    line = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "qty": pcc.cast(t["l_quantity"], pa.float64()),
                "revenue_c": _cents_col(
                    pcc.multiply(
                        t["l_extendedprice"],
                        pcc.subtract(pa.scalar(1.0), t["l_discount"]),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["p_partkey"],
                "p_brand": t["p_brand"],
                "p_size": pcc.cast(t["p_size"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    lp = _attach_int_lookup(line, part, sf_dir, "part", "l_partkey", "lineitem")

    def partial(t: pa.Table) -> pa.Table:
        mask = None
        for brand, s_lo, s_hi, q_lo, q_hi in Q19_BRANCHES:
            m = pcc.and_(
                pcc.and_(
                    pcc.equal(t["p_brand"], brand),
                    pcc.and_(
                        pcc.greater_equal(t["p_size"], pa.scalar(s_lo, pa.int64())),
                        pcc.less_equal(t["p_size"], pa.scalar(s_hi, pa.int64())),
                    ),
                ),
                pcc.and_(
                    pcc.greater_equal(t["qty"], pa.scalar(float(q_lo))),
                    pcc.less_equal(t["qty"], pa.scalar(float(q_hi))),
                ),
            )
            mask = m if mask is None else pcc.or_(mask, m)
        kept = t.filter(mask)
        s = pcc.sum(kept["revenue_c"])
        return pa.table({"revenue_c": pa.array(
            [s.as_py() if s.is_valid else 0], pa.int64())})

    parts = lp.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table(
        {"revenue_c": pa.array([int(parts["revenue_c"].sum())], pa.int64())}
    )


Q20_PREFIX = "large"
Q20_FROM = "1997-01-01"
Q20_TO = "1998-01-01"
Q20_MIN_QTY = 50


def q20_part_promotion(sf_dir: str):
    """TPC-H Q20 shape (adapted: no partsupp/availqty — the nested-IN
    chain keeps its multi-hop semi-join form with a fixed quantity
    threshold): suppliers who shipped more than ``Q20_MIN_QTY`` units
    of name-prefix parts in one year.

    Distributed plan: the part predicate resolves to a (partkey -> 1)
    side attached via the broadcast-or-join helper (inner semantics
    prune non-matching lineitems map-side); quantities fold to
    per-batch suppkey partials, ONE suppkey groupby applies the HAVING;
    supplier names attach via a suppkey-pushdown point read."""
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp(Q20_FROM), pd.Timestamp(Q20_TO)

    line = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "s_suppkey": t["l_suppkey"],
                "qty": pcc.cast(t["l_quantity"], pa.int64()),
            }
        ).filter(
            pcc.and_(
                pcc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pcc.less(t["l_shipdate"], pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"]).map_batches(
        lambda t: pa.table(
            {"l_partkey": t["p_partkey"]}
        ).filter(pcc.starts_with(t["p_name"], Q20_PREFIX)),
        batch_format="pyarrow",
    )
    lp = _attach_int_lookup(line, part, sf_dir, "part", "l_partkey", "lineitem")

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "s_suppkey": t["s_suppkey"].to_numpy(zero_copy_only=False),
                "qty": t["qty"].to_numpy(zero_copy_only=False),
            }
        )
        p = df.groupby("s_suppkey", sort=False)["qty"].sum().reset_index()
        return pa.Table.from_pandas(p, preserve_index=False)

    agg = (
        lp.map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("qty", alias_name="qty"))
        .to_pandas()
    )
    agg = agg[agg["qty"] > Q20_MIN_QTY]
    if len(agg) == 0:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string()),
             "qty": pa.array([], pa.int64())}
        )
    import pyarrow.dataset as pads

    keys = sorted(int(k) for k in agg["s_suppkey"])
    supp = pads.dataset(os.path.join(sf_dir, "supplier.parquet")).to_table(
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(keys),
    ).to_pandas()
    out = agg.merge(supp, on="s_suppkey").sort_values("s_suppkey", ignore_index=True)
    return pa.table(
        {
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
            "s_name": pa.array(out["s_name"], pa.string()),
            "qty": pa.array(out["qty"].to_numpy(np.int64)),
        }
    )


Q21_LATE_DAYS = 60


def q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape (adapted: "kept the order waiting" = shipped
    more than ``Q21_LATE_DAYS`` days after the order date — the shipped
    schema has no commit/receipt dates): suppliers who were the SOLE
    late supplier on a multi-supplier order, ranked by how often.

    Distributed plan: lineitem joins orders once on orderkey for the
    order date, folds map-side to distinct (orderkey, suppkey,
    late-any) partials, ONE (orderkey, suppkey) groupby finishes the
    OR, then an orderkey-keyed ``map_groups`` applies the exists /
    not-exists pair (n_supp > 1, n_late == 1) inside each order group —
    order groups are tiny (bounded fan-out per order) so the group UDF
    is O(order size), never corpus-wide; a final suppkey count fold
    ranks the top 10."""
    from ray.data.aggregate import Max, Sum

    us_per_day = 86_400_000_000

    line = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "s_suppkey": t["l_suppkey"],
                "ship_us": pcc.cast(t["l_shipdate"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "odate_us": pcc.cast(t["o_orderdate"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j = line.join(
        _with_join_sentinels(orders, "o_orderkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("o_orderkey",),
    )

    # The hash join already co-locates every orderkey's rows in ONE
    # output partition, and Ray's hash-shuffle reducer finalizes each
    # partition as exactly one block (hash_shuffle.py finalize yields a
    # single block; verified on ray 2.49), so with batch_size=None the
    # whole exists/not-exists pair folds PARTITION-LOCALLY per batch:
    # distinct-(order,supp) late OR, then per-order n_supp / n_late /
    # sole-late-suppkey (sum(late*suppkey) IS the key when n_late==1) —
    # no second shuffle.  This replaced a per-order-group Python UDF +
    # two global groupbys that cost 172 s at sf0.1; only the tiny
    # supplier-keyed count fold exchanges data after the join.
    def per_partition(t: pa.Table) -> pa.Table:
        late = pcc.cast(
            pcc.greater(
                t["ship_us"],
                pcc.add(t["odate_us"], pa.scalar(Q21_LATE_DAYS * us_per_day)),
            ),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "ok": t["o_orderkey"].to_numpy(zero_copy_only=False),
                "sk": t["s_suppkey"].to_numpy(zero_copy_only=False),
                "late": late.to_numpy(zero_copy_only=False),
            }
        )
        per_os = (
            df.groupby(["ok", "sk"], sort=False)["late"].max().reset_index()
        )
        # sole-late suppkey: sum(late * sk) per order (exact when n_late==1)
        per_os["ls"] = per_os["late"].to_numpy() * per_os["sk"].to_numpy()
        g = per_os.groupby("ok", sort=False).agg(
            n_supp=("late", "size"),
            n_late=("late", "sum"),
            late_supp=("ls", "sum"),
        )
        keep = g[(g["n_supp"] > 1) & (g["n_late"] == 1)]
        uniq, cnt = np.unique(keep["late_supp"].to_numpy(np.int64),
                              return_counts=True)
        return pa.table(
            {
                "s_suppkey": pa.array(uniq.astype(np.int64)),
                "numwait": pa.array(cnt.astype(np.int64)),
            }
        )

    waits = (
        j.map_batches(per_partition, batch_format="pyarrow", batch_size=None)
        .groupby("s_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
        .to_pandas()
    )
    if len(waits) == 0:
        return pa.table(
            {"s_name": pa.array([], pa.string()),
             "numwait": pa.array([], pa.int64())}
        )
    import pyarrow.dataset as pads

    keys = sorted(int(k) for k in waits["s_suppkey"])
    supp = pads.dataset(os.path.join(sf_dir, "supplier.parquet")).to_table(
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(keys),
    ).to_pandas()
    out = (
        waits.merge(supp, on="s_suppkey")
        .sort_values(["numwait", "s_name"], ascending=[False, True],
                     kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "s_name": pa.array(out["s_name"], pa.string()),
            "numwait": pa.array(out["numwait"].to_numpy(np.int64)),
        }
    )


Q9_TOKEN = "widget"
Q9_COST_FACTOR = 0.5


def q9_product_profit(sf_dir: str):
    """TPC-H Q9 shape (adapted: no partsupp — unit cost is
    ``Q9_COST_FACTOR * p_retailprice``): profit on name-matching parts
    per (supplier nation, order year).

    Distributed plan: part's retail price (pre-filtered to matching
    names) and supplier's nation both attach via the broadcast-or-join
    helper; the order year arrives through ONE orderkey hash join; the
    per-row profit expression rounds to cents per element
    (float-expression-identical to the oracle) and folds map-side to
    (nation, year) partials before a tiny final groupby."""
    from ray.data.aggregate import Sum

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    line = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"]).map_batches(
        lambda t: pa.table(
            {"l_partkey": t["p_partkey"], "p_retailprice": t["p_retailprice"]}
        ).filter(pcc.match_substring(t["p_name"], Q9_TOKEN)),
        batch_format="pyarrow",
    )
    lp = _attach_int_lookup(line, part, sf_dir, "part", "l_partkey", "lineitem")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {"l_suppkey": t["s_suppkey"],
             "s_nationkey": pcc.cast(t["s_nationkey"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    lps = _attach_int_lookup(lp, supp, sf_dir, "supplier", "l_suppkey", "lineitem")

    def proj(t: pa.Table) -> pa.Table:
        profit = pcc.subtract(
            pcc.multiply(
                t["l_extendedprice"], pcc.subtract(pa.scalar(1.0), t["l_discount"])
            ),
            pcc.multiply(
                pcc.multiply(
                    pcc.cast(t["l_quantity"], pa.float64()),
                    pa.scalar(Q9_COST_FACTOR),
                ),
                t["p_retailprice"],
            ),
        )
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "s_nationkey": t["s_nationkey"],
                "profit_c": _cents_col(profit),
            }
        )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_year": pcc.cast(pcc.year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j = lps.map_batches(proj, batch_format="pyarrow").join(
        _with_join_sentinels(orders, "o_orderkey"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "s_nationkey": t["s_nationkey"].to_numpy(zero_copy_only=False),
                "o_year": t["o_year"].to_numpy(zero_copy_only=False),
                "profit_c": t["profit_c"].to_numpy(zero_copy_only=False),
            }
        )
        p = df.groupby(["s_nationkey", "o_year"], sort=False)["profit_c"].sum().reset_index()
        return pa.Table.from_pandas(p, preserve_index=False)

    out = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby(["s_nationkey", "o_year"])
        .aggregate(Sum("profit_c", alias_name="profit_c"))
        .to_pandas()
    )
    out["n_name"] = out["s_nationkey"].map(lambda k: names[int(k)])
    out = out.sort_values(
        ["n_name", "o_year"], ascending=[True, False], ignore_index=True
    )
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "o_year": pa.array(out["o_year"].to_numpy(np.int64)),
            "profit_c": pa.array(out["profit_c"].to_numpy(np.int64)),
        }
    )


MATRIX_FIELDS = ("l_quantity", "l_extendedprice", "l_discount")


def lineitem_matrix_stats(sf_dir: str):
    """ES matrix_stats over (quantity, extendedprice, discount): the
    population covariance and Pearson correlation for every field pair.

    Distributed plan: fields integerize per element (units / cents /
    basis points), ONE pass emits per-batch exact moment partials
    (n, S_i, S_ij) as hi/lo int64 halves, a single global fold (no
    grouping key: partials concatenate to a tiny table summed on the
    driver) recombines arbitrary-precision moments, and the closed
    forms evaluate with the SAME double expression tree as the oracle's
    HUGEINT sums."""
    import math

    ds = _read(sf_dir, "lineitem", columns=list(MATRIX_FIELDS))
    pairs = [(i, j) for i in range(3) for j in range(i + 1, 3)]

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = _micro(t["l_extendedprice"].to_numpy(zero_copy_only=False), 100.0)
        d = _micro(t["l_discount"].to_numpy(zero_copy_only=False), 10000.0)
        cols = [q, p, d]
        row = {"n": [len(q)]}
        for i, x in enumerate(cols):
            hi, lo = _hilo(_chunked_int_sum(x))
            row[f"s{i}_hi"], row[f"s{i}_lo"] = [hi], [lo]
            hi, lo = _hilo(_chunked_int_sum(x * x))
            row[f"s{i}{i}_hi"], row[f"s{i}{i}_lo"] = [hi], [lo]
        for i, j in pairs:
            hi, lo = _hilo(_chunked_int_sum(cols[i] * cols[j]))
            row[f"s{i}{j}_hi"], row[f"s{i}{j}_lo"] = [hi], [lo]
        return pa.table({k: pa.array(v, pa.int64()) for k, v in row.items()})

    agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = int(agg["n"])
    fn = float(n)
    s = {i: float(_unhilo(agg[f"s{i}_hi"], agg[f"s{i}_lo"])) for i in range(3)}
    ss = {
        (i, j): float(_unhilo(agg[f"s{i}{j}_hi"], agg[f"s{i}{j}_lo"]))
        for i in range(3)
        for j in range(i, 3)
    }
    rows = {"field_x": [], "field_y": [], "cov_micro": [], "corr_micro": []}
    for i, j in pairs:
        cov = ss[(i, j)] / fn - (s[i] / fn) * (s[j] / fn)
        var_i = ss[(i, i)] / fn - (s[i] / fn) * (s[i] / fn)
        var_j = ss[(j, j)] / fn - (s[j] / fn) * (s[j] / fn)
        corr = cov / math.sqrt(var_i * var_j)
        rows["field_x"].append(MATRIX_FIELDS[i])
        rows["field_y"].append(MATRIX_FIELDS[j])
        rows["cov_micro"].append(int(math.floor(cov * 1e6 + 0.5)))
        rows["corr_micro"].append(int(math.floor(corr * 1e6 + 0.5)))
    return pa.table(
        {
            "field_x": pa.array(rows["field_x"], pa.string()),
            "field_y": pa.array(rows["field_y"], pa.string()),
            "cov_micro": pa.array(rows["cov_micro"], pa.int64()),
            "corr_micro": pa.array(rows["corr_micro"], pa.int64()),
        }
    )


def weighted_avg_price(sf_dir: str):
    """ES weighted_avg: quantity-weighted average extended price (in
    cents, milli-rounded) per return flag — exact integer numerator
    (sum of qty x cents rides as hi/lo halves) and denominator, one
    double division per group identical to the oracle's."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = _micro(t["l_extendedprice"].to_numpy(zero_copy_only=False), 100.0)
        df = pd.DataFrame(
            {"l_returnflag": t["l_returnflag"].to_pandas(), "w": q, "wx": q * p}
        )
        rows = {"l_returnflag": [], "w": [], "num_hi": [], "num_lo": []}
        for k, grp in df.groupby("l_returnflag", sort=False):
            hi, lo = _hilo(_chunked_int_sum(grp["wx"].to_numpy(np.int64)))
            rows["l_returnflag"].append(k)
            rows["w"].append(int(grp["w"].sum()))
            rows["num_hi"].append(hi)
            rows["num_lo"].append(lo)
        return pa.table(
            {
                "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
                "w": pa.array(rows["w"], pa.int64()),
                "num_hi": pa.array(rows["num_hi"], pa.int64()),
                "num_lo": pa.array(rows["num_lo"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("w", alias_name="w"),
            Sum("num_hi", alias_name="num_hi"),
            Sum("num_lo", alias_name="num_lo"),
        )
        .to_pandas()
        .sort_values("l_returnflag", ignore_index=True)
    )
    wavg = [
        int(
            math.floor(
                float(_unhilo(r.num_hi, r.num_lo)) / float(r.w) * 1000.0 + 0.5
            )
        )
        for r in out.itertuples(index=False)
    ]
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "sum_qty": pa.array(out["w"].to_numpy(np.int64)),
            "wavg_milli": pa.array(wavg, pa.int64()),
        }
    )


RATIO_MIN_MICRO = 1_000_000


def daily_purchase_ratio(sf_dir: str):
    """ES pipeline aggregations in one shape — date_histogram (day) +
    bucket_script (purchase/view ratio) + derivative (day-over-day
    total delta, 0 for the first bucket) + bucket_selector (keep ratio
    >= 1.0 buckets).

    Distributed plan: one pass of per-batch (day -> n_total,
    n_purchase, n_view) partials, one day-keyed groupby (the day axis
    is bounded — years of days, never corpus-sized), then the pipeline
    stages (script, derivative, selector) run on the driver over that
    bounded bucket table in exact integer arithmetic."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        et = t["event_type"].to_pandas()
        df = pd.DataFrame({"day": day, "p": (et == "purchase"), "v": (et == "view")})
        g = df.groupby("day", sort=False).agg(
            n_total=("p", "size"), n_purchase=("p", "sum"), n_view=("v", "sum")
        ).reset_index()
        return pa.table(
            {
                "day": pa.array(g["day"].to_numpy(np.int64)),
                "n_total": pa.array(g["n_total"].to_numpy(np.int64)),
                "n_purchase": pa.array(g["n_purchase"].to_numpy(np.int64)),
                "n_view": pa.array(g["n_view"].to_numpy(np.int64)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_purchase", alias_name="n_purchase"),
            Sum("n_view", alias_name="n_view"),
        )
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    tot = out["n_total"].to_numpy(np.int64)
    deriv = np.concatenate([[0], tot[1:] - tot[:-1]])
    nv = out["n_view"].to_numpy(np.int64)
    npu = out["n_purchase"].to_numpy(np.int64)
    ratio = np.where(nv == 0, -1, (npu * 1_000_000 + nv // 2) // np.maximum(nv, 1))
    keep = ratio >= RATIO_MIN_MICRO
    return pa.table(
        {
            "day": pa.array(out["day"].to_numpy(np.int64)[keep]),
            "n_total": pa.array(tot[keep]),
            "n_purchase": pa.array(npu[keep]),
            "n_view": pa.array(nv[keep]),
            "ratio_micro": pa.array(ratio[keep].astype(np.int64)),
            "deriv": pa.array(deriv[keep].astype(np.int64)),
        }
    )


AUC_POS_LANG = "en"


def auc_length_en(sf_dir: str):
    """Classifier-evaluation ROC-AUC, distributed: how well document
    length (n_chars) predicts lang == 'en' — the Mann-Whitney U rank
    statistic with tie correction, computed EXACTLY from one
    bounded-integer-domain histogram (score -> positive/negative
    counts), never a global sort: per-batch (n_chars, label) count
    partials -> one score-keyed groupby (domain-sized, corpus-free) ->
    driver integer fold ``2U = sum_s np(s) * (2*cum_nn(<s) + nn(s))``
    and integer-exact basis points."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["n_chars", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        s = t["n_chars"].to_numpy(zero_copy_only=False)
        pos = (
            pcc.equal(t["lang"], AUC_POS_LANG)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        df = pd.DataFrame({"s": s, "np_": pos, "nn_": 1 - pos})
        g = df.groupby("s", sort=False).sum().reset_index()
        return pa.table(
            {
                "s": pa.array(g["s"].to_numpy(np.int64)),
                "np_": pa.array(g["np_"].to_numpy(np.int64)),
                "nn_": pa.array(g["nn_"].to_numpy(np.int64)),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Sum("np_", alias_name="np_"), Sum("nn_", alias_name="nn_"))
        .to_pandas()
        .sort_values("s", ignore_index=True)
    )
    np_ = h["np_"].to_numpy(np.int64)
    nn_ = h["nn_"].to_numpy(np.int64)
    cum_nn = np.concatenate([[0], np.cumsum(nn_)[:-1]])
    u2 = int((np_ * (2 * cum_nn + nn_)).sum())
    tp, tn = int(np_.sum()), int(nn_.sum())
    auc_bps = (u2 * 10000 + tp * tn) // (2 * tp * tn)
    return pa.table(
        {
            "n_pos": pa.array([tp], pa.int64()),
            "n_neg": pa.array([tn], pa.int64()),
            "auc_bps": pa.array([auc_bps], pa.int64()),
        }
    )


KAPPA_CHARS_MIN = 300
KAPPA_TOKENS_MIN = 55


def kappa_quality_gates(sf_dir: str):
    """Inter-rater Cohen's kappa between two quality gates (rater A:
    n_chars >= 300; rater B: whitespace tokens >= 55): four contingency
    counters fold map-side to one row per batch, the driver evaluates
    po/pe/kappa with the oracle-identical double expression tree."""
    import math

    ds = _read(sf_dir, "documents", columns=["text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        from ..stages.text_stats import token_counts

        a = (
            t["n_chars"].to_numpy(zero_copy_only=False) >= KAPPA_CHARS_MIN
        )
        b = (
            token_counts(t)["ws_tokens"].to_numpy(zero_copy_only=False)
            >= KAPPA_TOKENS_MIN
        )
        return pa.table(
            {
                "n11": pa.array([int((a & b).sum())], pa.int64()),
                "n10": pa.array([int((a & ~b).sum())], pa.int64()),
                "n01": pa.array([int((~a & b).sum())], pa.int64()),
                "n00": pa.array([int((~a & ~b).sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n11, n10, n01, n00 = (int(agg[k]) for k in ("n11", "n10", "n01", "n00"))
    fn = float(n11 + n10 + n01 + n00)
    po = (float(n11) + float(n00)) / fn
    pe = (
        (float(n11 + n10) / fn) * (float(n11 + n01) / fn)
        + (float(n01 + n00) / fn) * (float(n10 + n00) / fn)
    )
    kappa = (po - pe) / (1.0 - pe)
    import math as _m

    return pa.table(
        {
            "n11": pa.array([n11], pa.int64()),
            "n10": pa.array([n10], pa.int64()),
            "n01": pa.array([n01], pa.int64()),
            "n00": pa.array([n00], pa.int64()),
            "kappa_micro": pa.array(
                [int(_m.floor(kappa * 1e6 + 0.5))], pa.int64()
            ),
        }
    )


def chi2_lang_source(sf_dir: str):
    """Pearson chi-square test of independence between ``lang`` and
    ``source``: one (lang, source) count fold (map-side partials, the
    contingency table is alphabet-bounded so the exchange is corpus-
    free), then the statistic over the FULL marginal cross product —
    zero cells included via their expected counts.  Integer-exact on
    both sides: each cell's term ``(N*O - r*c)^2 / (N*r*c)`` keeps the
    numerator difference in int64 (exact), squares/divides in double
    (IEEE-deterministic), and rounds to micro BEFORE the summation, so
    the fold is immune to float ordering."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": t["lang"].to_pandas(), "source": t["source"].to_pandas()}
        )
        g = df.groupby(["lang", "source"], sort=False, as_index=False).size()
        return pa.table(
            {
                "lang": pa.array(g["lang"].tolist(), pa.string()),
                "source": pa.array(g["source"].tolist(), pa.string()),
                "o": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    obs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("o", alias_name="o"))
        .to_pandas()
    )
    pivot = obs.pivot_table(
        index="lang", columns="source", values="o", fill_value=0
    ).astype(np.int64)
    O = pivot.to_numpy(np.int64)
    r = O.sum(axis=1)
    c = O.sum(axis=0)
    n = int(O.sum())
    diff = n * O - np.outer(r, c)  # exact in int64
    terms = diff.astype(np.float64) ** 2 / (
        float(n) * np.outer(r, c).astype(np.float64)
    )
    chi2_micro = int(np.floor(terms * 1e6 + 0.5).astype(np.int64).sum())
    dof = (len(r) - 1) * (len(c) - 1)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "chi2_micro": pa.array([chi2_micro], pa.int64()),
        }
    )


def hhi_supplier_revenue(sf_dir: str):
    """Herfindahl–Hirschman concentration index of lineitem revenue by
    supplier, in basis points: HHI = sum_i (s_i/T)^2 * 10000.  The only
    corpus-scale work is the suppkey-keyed cents fold (map-side
    partials); the squares/division run on the driver with
    arbitrary-precision integers — ``(sum s_i^2 * 10000 * 2 + T^2) //
    (2*T^2)`` — so no float ever appears (HUGEINT on the oracle side).
    The market-concentration audit shape (antitrust, vendor risk)."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pcc.multiply(
            t["l_extendedprice"], pcc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        g = (
            pd.DataFrame(
                {"l_suppkey": t["l_suppkey"].to_pandas(),
                 "rev_c": _cents_col(rev).to_pandas()}
            )
            .groupby("l_suppkey", as_index=False)["rev_c"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_supp = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
        .to_pandas()
    )
    shares = [int(x) for x in per_supp["rev_c"].tolist()]
    total = sum(shares)
    sq = sum(s * s for s in shares)
    hhi_bps = (sq * 10_000 * 2 + total * total) // (2 * total * total) if total else 0
    return pa.table(
        {
            "n_suppliers": pa.array([len(shares)], pa.int64()),
            "total_c": pa.array([total], pa.int64()),
            "hhi_bps": pa.array([hhi_bps], pa.int64()),
        }
    )


TOPM_CHAR_BITS = 22  # n_chars must fit below 2^22 for the packed argmax
TOPM_ID_BITS = 40


def top_metrics_by_lang(sf_dir: str):
    """ES top_metrics aggregation: per lang bucket, the metrics of the
    TOP document by (n_chars desc, doc_id asc).  The argmax is fully
    algebraic — the sort key packs into ONE int64
    ``((2^22 - n_chars) << 40) | doc_id`` so a plain Min fold yields the
    winner (no row shuffles, no map_groups); the driver unpacks.  Bounds
    are asserted, not assumed."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nc):
            assert nc.max() < (1 << TOPM_CHAR_BITS), "n_chars exceeds pack bound"
            assert ids.max() < (1 << TOPM_ID_BITS), "doc_id exceeds pack bound"
        packed = (((1 << TOPM_CHAR_BITS) - nc) << TOPM_ID_BITS) | ids
        g = (
            pd.DataFrame({"lang": t["lang"].to_pandas(), "packed": packed})
            .groupby("lang", as_index=False)["packed"]
            .min()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Min("packed", alias_name="packed"))
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    packed = out["packed"].to_numpy(np.int64)
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "doc_id": pa.array(packed & ((1 << TOPM_ID_BITS) - 1), pa.int64()),
            "n_chars": pa.array(
                (1 << TOPM_CHAR_BITS) - (packed >> TOPM_ID_BITS), pa.int64()
            ),
        }
    )


def mann_kendall_daily_revenue(sf_dir: str):
    """Mann-Kendall trend test over the daily order-revenue series:
    ``S = sum_{i<j} sign(x_j - x_i)`` with the tie-corrected variance
    ``var = (n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18`` and the
    continuity-corrected z.  The distributed part is the bounded
    day-axis cents fold; the O(n^2) pair scan runs on the driver over
    the <=few-thousand-day axis (numpy outer sign).  S and the variance
    NUMERATOR stay exact integers on both sides; z is one shared double
    expression ``(S -/+ 1) / sqrt(var18 / 18)``."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pcc.strftime(t["o_orderdate"], format="%Y-%m-%d")
        g = (
            pd.DataFrame(
                {"day": day.to_pandas(),
                 "rev_c": _cents_col(t["o_totalprice"]).to_pandas()}
            )
            .groupby("day", as_index=False)["rev_c"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    days = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    x = days["rev_c"].to_numpy(np.int64)
    n = len(x)
    diff_sign = np.sign(np.subtract.outer(x, x))  # [i, j] = sign(x_i - x_j)
    s = -int(np.triu(diff_sign, k=1).sum())  # sum over i<j of sign(x_j - x_i)
    _, tie_counts = np.unique(x, return_counts=True)
    ties = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in tie_counts if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - ties
    if s > 0:
        z = (s - 1) / math.sqrt(var18 / 18.0)
    elif s < 0:
        z = (s + 1) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "s": pa.array([s], pa.int64()),
            "var18": pa.array([var18], pa.int64()),
            "z_micro": pa.array([int(math.floor(z * 1e6 + 0.5))], pa.int64()),
        }
    )


ZORDER_BITS = 16


def zorder_events(sf_dir: str):
    """Z-order (Morton) clustering keys over events: the 2-D key
    interleaves ``user_id % 2^16`` and the clipped value cents bit by
    bit, so sorting by it co-locates rows close in BOTH dimensions — the
    lakehouse data-layout primitive behind multi-column range pruning
    (write the table ordered by ``zval`` and min/max footer stats prune
    on either column).  Pure map-side numpy bit arithmetic; the oracle
    evaluates the identical 32-term shift/mask expression."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def fn(t: pa.Table) -> pa.Table:
        a = (
            t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            % (1 << ZORDER_BITS)
        )
        b = np.minimum(
            _cents_col(t["value"]).to_numpy(zero_copy_only=False),
            (1 << ZORDER_BITS) - 1,
        )
        z = np.zeros(len(a), np.int64)
        for i in range(ZORDER_BITS):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return pa.table({"event_id": t["event_id"], "zval": pa.array(z)})

    return ds.map_batches(fn, batch_format="pyarrow")


def value_quantile_normalize(sf_dir: str):
    """Quantile normalization of the events ``value`` column: each row
    maps to its empirical-CDF position in basis points — ``q_bps =
    round(count(v' <= v) / n * 10000)`` — the rank-based feature
    transform (ties share a value, hence a rank).  One bounded
    cent-histogram fold builds the CDF; the driver broadcasts the sorted
    (value, cumulative-count) arrays via ``ray.put`` and a map-side
    ``searchsorted`` transforms every row — raw rows never shuffle.
    Integer-only rounding on both sides."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def hist(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame({"v": _cents_col(t["value"]).to_pandas()})
            .groupby("v", as_index=False)
            .size()
        )
        return pa.table(
            {"v": pa.array(g["v"].to_numpy(np.int64)),
             "n": pa.array(g["size"].to_numpy(np.int64))}
        )

    cdf = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("v", ignore_index=True)
    )
    vals = cdf["v"].to_numpy(np.int64)
    cum = cdf["n"].to_numpy(np.int64).cumsum()
    n_total = int(cum[-1]) if len(cum) else 0
    cdf_ref = ray.put((vals, cum, n_total))

    class Normalize:
        def __init__(self):
            self.vals, self.cum, self.n = ray.get(cdf_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = _cents_col(t["value"]).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.vals, v, side="right") - 1
            le = self.cum[idx]
            q = (le * 10_000 * 2 + self.n) // (2 * self.n)
            return pa.table(
                {"event_id": t["event_id"], "q_bps": pa.array(q.astype(np.int64))}
            )

    return ds.map_batches(Normalize, batch_format="pyarrow", concurrency=(1, 2))


SCD2_OPEN_US = 1 << 62  # open-interval sentinel (epoch micros)


def scd2_intervals(sf_dir: str):
    """SCD type-2 dimension reconstruction from a change stream: each
    user's time-ordered events are an attribute history (``event_type``
    plays the tracked attribute), and CONSECUTIVE equal values collapse
    into one version row with half-open ``[valid_from, valid_to)``
    validity — ``valid_to`` is the next version's start, the open
    current version gets a fixed sentinel — plus a per-user version
    number.  This is the warehouse dimension-history shape (MERGE +
    effective-dating).  One user-keyed exchange; the run collapse and
    LEAD inside each group are vectorized numpy over epoch-microsecond
    int64s, so both sides compare integer-exact."""
    ds = _read(
        sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def pergroup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        et = df["event_type"].to_numpy()
        if len(et) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "version": pd.Series([], dtype=np.int64),
                    "attr": pd.Series([], dtype=str),
                    "valid_from_us": pd.Series([], dtype=np.int64),
                    "valid_to_us": pd.Series([], dtype=np.int64),
                }
            )
        tus = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        change = np.ones(len(et), bool)
        change[1:] = et[1:] != et[:-1]
        idx = np.flatnonzero(change)
        vfrom = tus[idx]
        vto = np.empty(len(idx), np.int64)
        vto[:-1] = vfrom[1:]
        vto[-1] = SCD2_OPEN_US
        return pd.DataFrame(
            {
                "user_id": np.full(len(idx), int(df["user_id"].iloc[0]), np.int64),
                "version": np.arange(len(idx), dtype=np.int64),
                "attr": et[idx],
                "valid_from_us": vfrom,
                "valid_to_us": vto,
            }
        )

    return ds.groupby("user_id").map_groups(pergroup, batch_format="pandas")


def daily_revenue_normalize(sf_dir: str):
    """ES ``normalize`` pipeline aggregation over the daily-revenue
    bucket axis: ``percent_of_sum`` and ``rescale_0_1`` per day —
    distributed part is the bounded day-axis cents fold (map-side
    partials, one tiny groupby); the driver derives both normalizations
    from the SAME integer cents (rev/total and (rev-mn)/(mx-mn) as
    double divisions of exact ints), so the micro-rounded doubles match
    the SQL window oracle bit for bit."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pcc.strftime(t["o_orderdate"], format="%Y-%m-%d")
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"day": day.to_pandas(), "rev": cents})
            .groupby("day", as_index=False)["rev"].sum()
        )
        g["rev"] = g["rev"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    days = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    rev = days["rev"].to_numpy(np.int64)
    total = int(rev.sum())
    mn, mx = int(rev.min()), int(rev.max())
    pct = rev.astype(np.float64) / np.float64(total)
    if mx == mn:
        resc = np.ones(len(rev), np.float64)
    else:
        resc = (rev - mn).astype(np.float64) / np.float64(mx - mn)
    return pa.table(
        {
            "day": pa.array(days["day"].tolist(), pa.string()),
            "rev": pa.array(rev),
            "pct_micro": pa.array(
                [int(math.floor(v * 1e6 + 0.5)) for v in pct], pa.int64()
            ),
            "rescale_micro": pa.array(
                [int(math.floor(v * 1e6 + 0.5)) for v in resc], pa.int64()
            ),
        }
    )


HOLT_ALPHA = 0.5  # dyadic literals: both sides' doubles match bit for bit
HOLT_BETA = 0.25


def holt_daily_revenue(sf_dir: str):
    """Holt DOUBLE-exponential smoothing (ES ``moving_fn: holt``'s
    level+trend recursion, alpha=0.5 beta=0.25) of the daily revenue
    series — the trend-aware forecasting primitive single EWMA lacks.
    Distributed part: the bounded day-axis cents fold (map-side
    partials, one tiny groupby); the driver replays the recursion
    ``s_t = a*x_t + (1-a)*(s_{t-1}+b_{t-1})``,
    ``b_t = B*(s_t - s_{t-1}) + (1-B)*b_{t-1}`` with
    ``s_1 = x_1, b_1 = x_2 - x_1``; dyadic coefficients keep the
    doubles identical to the oracle's recursive CTE."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pcc.strftime(t["o_orderdate"], format="%Y-%m-%d")
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"day": day.to_pandas(), "rev": cents})
            .groupby("day", as_index=False)["rev"].sum()
        )
        g["rev"] = g["rev"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    days = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    xs = [float(x) for x in days["rev"].tolist()]
    levels, trends = [], []
    s = b = 0.0
    for i, x in enumerate(xs):
        if i == 0:
            s = x
            b = (xs[1] - x) if len(xs) > 1 else 0.0
        else:
            s_new = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (s + b)
            b = HOLT_BETA * (s_new - s) + (1.0 - HOLT_BETA) * b
            s = s_new
        levels.append(s)
        trends.append(b)
    return pa.table(
        {
            "day": pa.array(days["day"].tolist(), pa.string()),
            "rev": pa.array(days["rev"].to_numpy(np.int64)),
            "level_micro": pa.array(
                [int(math.floor(v * 1e6 + 0.5)) for v in levels], pa.int64()
            ),
            "trend_micro": pa.array(
                [int(math.floor(v * 1e6 + 0.5)) for v in trends], pa.int64()
            ),
        }
    )


def ewma_daily_orders(sf_dir: str):
    """Exponential smoothing (EWMA, alpha=0.5) of the daily order-count
    series — ES ``moving_fn: ewma``'s recursive form, the forecasting
    primitive trailing averages can't express.  The distributed part is
    the bounded day-axis count fold; the driver replays the recursion
    ``z_t = 0.5*x_t + 0.5*z_{t-1}`` (alpha dyadic, both sides evaluate
    the identical sequential expression so the doubles match bit for
    bit); the oracle replays it with a recursive CTE."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = pcc.strftime(t["o_orderdate"], format="%Y-%m-%d")
        g = (
            pd.DataFrame({"day": day.to_pandas()})
            .groupby("day", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    days = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    xs = [float(x) for x in days["n"].tolist()]
    z = 0.0
    zs = []
    for i, x in enumerate(xs):
        z = x if i == 0 else 0.5 * x + 0.5 * z
        zs.append(z)
    return pa.table(
        {
            "day": pa.array(days["day"].tolist(), pa.string()),
            "n": pa.array(days["n"].to_numpy(np.int64)),
            "ewma_micro": pa.array(
                [int(math.floor(v * 1e6 + 0.5)) for v in zs], pa.int64()
            ),
        }
    )


CUSUM_SLACK_DIV = 20  # slack k = target // 20 (cents)


def cusum_daily_revenue(sf_dir: str):
    """CUSUM change-point monitoring over the daily order-revenue
    series: ``S+_t = max(0, S+_{t-1} + x_t - (target + k))`` and
    ``S-_t = max(0, S-_{t-1} + (target - k) - x_t)`` with the target
    the integer-rounded mean daily revenue and slack ``k = target//20``.
    The distributed part is a per-day cents fold (map-side partials +
    one bounded-day-axis groupby — the exchange never scales with the
    corpus); the sequential walk runs on the driver over the bounded
    day axis with Python ints (the oracle replays it with a recursive
    CTE over HUGEINTs).  Everything is integer cents — no float
    anywhere, so both sides are bit-stable."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pcc.strftime(t["o_orderdate"], format="%Y-%m-%d")
        g = (
            pd.DataFrame(
                {"day": day.to_pandas(),
                 "rev_c": _cents_col(t["o_totalprice"]).to_pandas()}
            )
            .groupby("day", as_index=False)["rev_c"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    days = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    revs = [int(x) for x in days["rev_c"].tolist()]
    nd = len(revs)
    tot = sum(revs)
    target = (tot + nd // 2) // nd if nd else 0
    slack = target // CUSUM_SLACK_DIV
    sp = sn = 0
    sps, sns = [], []
    for x in revs:
        sp = max(0, sp + x - (target + slack))
        sn = max(0, sn + (target - slack) - x)
        sps.append(sp)
        sns.append(sn)
    return pa.table(
        {
            "day": pa.array(days["day"].tolist(), pa.string()),
            "rev_c": pa.array(revs, pa.int64()),
            "s_pos_c": pa.array(sps, pa.int64()),
            "s_neg_c": pa.array(sns, pa.int64()),
        }
    )


FILTERS_AGG_HIGH_CENTS = 10_000  # "high_value" bucket: value >= $100


def filters_agg_events(sf_dir: str):
    """ES ``filters`` aggregation with ``other_bucket``: three NAMED
    predicate buckets over events — an event can land in SEVERAL
    buckets at once (unlike ``terms``/``multi_terms``, membership is
    per-filter, not partitioning) — plus ``_other_`` for events that
    match none.  One vectorized map-side fold emits per-bucket count +
    cents partials; the exchange is bounded by the bucket alphabet."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = _cents_col(t["value"]).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        masks = {
            "high_value": v >= FILTERS_AGG_HIGH_CENTS,
            "clicks": et == "click",
            "errors_or_signups": (et == "error") | (et == "signup"),
        }
        other = ~np.logical_or.reduce(list(masks.values()))
        masks["_other_"] = other
        return pa.table(
            {
                "bucket": pa.array(list(masks), pa.string()),
                "n_events": pa.array(
                    [int(m.sum()) for m in masks.values()], pa.int64()
                ),
                "value_c": pa.array(
                    [int(v[m].sum()) for m in masks.values()], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_c", alias_name="value_c"),
        )
    )


def snapshot_diff(sf_dir: str):
    """Table-version reconciliation (snapshot diff): compare the base
    ``documents`` table against its CDC-applied successor (the same
    deterministic change stream ``cdc_upsert`` uses) and count
    added / removed / changed / unchanged rows per lang — the
    data-versioning audit behind incremental publishing.  One
    doc_id-keyed tag-union groupby classifies every key algebraically
    (ver-split n_chars sentinels, no row iteration); per-lang counts
    fold map-side.  Oracle: FULL OUTER JOIN with the same CASE."""
    from ray.data.aggregate import Max, Sum

    cols = ["doc_id", "lang", "n_chars"]

    def base_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "doc_id": pcc.cast(t["doc_id"], pa.int64()),
                "lang": t["lang"],
                "in_a": pa.array(np.ones(n, np.int64)),
                "in_b": pa.array(np.zeros(n, np.int64)),
                "nch_a": pcc.cast(t["n_chars"], pa.int64()),
                "nch_b": pa.array(np.full(n, -1, np.int64)),
            }
        )

    def next_rows(t: pa.Table) -> pa.Table:
        # the CDC-applied successor: %10==0 deleted, 1/2 updated (+delta),
        # 3 inserted at +offset, everything else carried unchanged
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = t["lang"].to_pandas().to_numpy()
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        mod = ids % 10
        keep = mod != 0
        upd = (mod == 1) | (mod == 2)
        out_ids = [ids[keep]]
        out_lang = [lang[keep]]
        out_nch = [np.where(upd[keep], nch[keep] + CDC_UPDATE_DELTA, nch[keep])]
        ins = mod == 3
        out_ids.append(ids[ins] + CDC_INSERT_OFFSET)
        out_lang.append(lang[ins])
        out_nch.append(nch[ins])
        oi = np.concatenate(out_ids)
        n = oi.size
        return pa.table(
            {
                "doc_id": pa.array(oi),
                "lang": pa.array(np.concatenate(out_lang), pa.string()),
                "in_a": pa.array(np.zeros(n, np.int64)),
                "in_b": pa.array(np.ones(n, np.int64)),
                "nch_a": pa.array(np.full(n, -1, np.int64)),
                "nch_b": pa.array(np.concatenate(out_nch)),
            }
        )

    ds = _read(sf_dir, "documents", columns=cols)
    tagged = ds.map_batches(base_rows, batch_format="pyarrow").union(
        ds.map_batches(next_rows, batch_format="pyarrow")
    )
    per_key = tagged.groupby(["doc_id", "lang"]).aggregate(
        Sum("in_a", alias_name="in_a"),
        Sum("in_b", alias_name="in_b"),
        Max("nch_a", alias_name="nch_a"),
        Max("nch_b", alias_name="nch_b"),
    )

    def classify(t: pa.Table) -> pa.Table:
        ina = t["in_a"].to_numpy(zero_copy_only=False)
        inb = t["in_b"].to_numpy(zero_copy_only=False)
        na = t["nch_a"].to_numpy(zero_copy_only=False)
        nb = t["nch_b"].to_numpy(zero_copy_only=False)
        status = np.where(
            ina == 0, "added",
            np.where(inb == 0, "removed",
                     np.where(na != nb, "changed", "unchanged")),
        )
        g = (
            pd.DataFrame({"lang": t["lang"].to_pandas(), "status": status})
            .groupby(["lang", "status"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        per_key.map_batches(classify, batch_format="pyarrow")
        .groupby(["lang", "status"])
        .aggregate(Sum("n", alias_name="n"))
    )


def source_share_within_lang(sf_dir: str):
    """ES ``normalize`` pipeline agg (percent_of_parent): each (lang,
    source) bucket's share of its PARENT lang bucket, in integer basis
    points.  One alphabet-bounded count fold; shares computed from the
    exact integer counts with integer rounding on both sides."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {"lang": t["lang"].to_pandas(), "source": t["source"].to_pandas()}
            )
            .groupby(["lang", "source"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    cells = cells.sort_values(["lang", "source"], ignore_index=True)
    p = cells.groupby("lang")["n"].transform("sum").to_numpy(np.int64)
    n = cells["n"].to_numpy(np.int64)
    share = (n * 10_000 * 2 + p) // (2 * p)
    return pa.table(
        {
            "lang": pa.array(cells["lang"], pa.string()),
            "source": pa.array(cells["source"], pa.string()),
            "n": pa.array(n),
            "share_bps": pa.array(share.astype(np.int64)),
        }
    )


LOGREG_ITERS = 3
LOGREG_LR = 0.5  # short binary mantissa: exact on both engines


def _logreg_features(t: pa.Table):
    """Shared feature projection: y = 1[lang=='en'], x1 = n_chars/1000,
    x2 = space-count/100 — every expression has an identical SQL twin."""
    y = (t["lang"].to_pandas().to_numpy() == "en").astype(np.float64)
    x1 = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64) / 1000.0
    spaces = pcc.subtract(
        pcc.utf8_length(t["text"]),
        pcc.utf8_length(pcc.replace_substring(t["text"], pattern=" ", replacement="")),
    )
    x2 = spaces.to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
    return y, x1, x2


def logreg_lang_en(sf_dir: str):
    """Distributed LOGISTIC REGRESSION (full-batch gradient descent,
    ``LOGREG_ITERS`` fixed iterations from w=0, lr=0.5): predict
    ``lang == 'en'`` from (bias, n_chars/1000, space-count/100).  The
    iterative-ML shape beyond KMeans: each iteration is ONE streaming
    pass — per-row gradient terms ``(sigmoid(w.x) - y) * x_j`` are
    rounded to MICRO INTEGERS PER ROW before the fold, so the gradient
    sums are exact integers independent of batching/partitioning, and
    the weight update is one shared double expression.  The oracle
    unrolls all iterations in SQL CTEs, re-deriving the same weights
    from the same integer gradient sums (kmeans_clusters' pattern).
    Emits the final weights (micro) and the training accuracy count
    (``z >= 0`` vs label — a float-threshold-free integer check)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars", "text"])
    w = (0.0, 0.0, 0.0)
    n_total = None
    for _ in range(LOGREG_ITERS):
        w0, w1, w2 = w

        def grad_pass(t: pa.Table, _w0=w0, _w1=w1, _w2=w2) -> pa.Table:
            y, x1, x2 = _logreg_features(t)
            z = _w0 + _w1 * x1 + _w2 * x2
            s = 1.0 / (1.0 + np.exp(-z))
            r = s - y
            return pa.table(
                {
                    "g0": pa.array(
                        [int(np.floor(r * 1e6 + 0.5).astype(np.int64).sum())]
                    ),
                    "g1": pa.array(
                        [int(np.floor(r * x1 * 1e6 + 0.5).astype(np.int64).sum())]
                    ),
                    "g2": pa.array(
                        [int(np.floor(r * x2 * 1e6 + 0.5).astype(np.int64).sum())]
                    ),
                    "n": pa.array([len(t)]),
                }
            )

        agg = (
            ds.map_batches(grad_pass, batch_format="pyarrow")
            .aggregate(
                Sum("g0", alias_name="g0"), Sum("g1", alias_name="g1"),
                Sum("g2", alias_name="g2"), Sum("n", alias_name="n"),
            )
        )
        n_total = int(agg["n"])
        nd = float(n_total)
        w = tuple(
            wj - LOGREG_LR * (float(int(agg[gk])) / 1000000.0) / nd
            for wj, gk in zip((w0, w1, w2), ("g0", "g1", "g2"))
        )

    w0, w1, w2 = w

    def acc_pass(t: pa.Table) -> pa.Table:
        y, x1, x2 = _logreg_features(t)
        z = w0 + w1 * x1 + w2 * x2
        correct = int(((z >= 0.0) == (y == 1.0)).sum())
        return pa.table({"correct": pa.array([correct])})

    from ray.data.aggregate import Sum as _Sum

    correct = int(
        ds.map_batches(acc_pass, batch_format="pyarrow").aggregate(
            _Sum("correct", alias_name="correct")
        )["correct"]
    )
    import math

    return pa.table(
        {
            "n": pa.array([n_total], pa.int64()),
            "w0_micro": pa.array([int(math.floor(w0 * 1e6 + 0.5))], pa.int64()),
            "w1_micro": pa.array([int(math.floor(w1 * 1e6 + 0.5))], pa.int64()),
            "w2_micro": pa.array([int(math.floor(w2 * 1e6 + 0.5))], pa.int64()),
            "correct": pa.array([correct], pa.int64()),
        }
    )


def _logreg_sql() -> str:
    """Unrolled-GD oracle twin of ``logreg_lang_en``: identical feature
    expressions, per-row micro-rounded gradient terms, identical weight
    update tree, accuracy by the same z>=0 integer check."""
    # Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and the
    # w{k} -> g{k} -> w{k-1} reference chain fans out ~9x per iteration —
    # the inlined plan re-scans the documents parquet thousands of times
    # and exhausts the process fd limit ("Too many open files").
    feats = """f AS MATERIALIZED (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                  CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
                  CAST(length(text) - length(replace(text, ' ', ''))
                       AS DOUBLE) / 100.0 AS x2
           FROM documents)"""
    parts = [feats,
             "nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,"
             " CAST(count(*) AS DOUBLE) AS nd FROM f)",
             "w0 AS MATERIALIZED (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c)"]
    for k in range(1, LOGREG_ITERS + 1):
        prev = f"w{k - 1}"
        sig = (
            f"1.0 / (1.0 + exp(-((SELECT a FROM {prev})"
            f" + (SELECT b FROM {prev}) * x1"
            f" + (SELECT c FROM {prev}) * x2)))"
        )
        parts.append(
            f"""g{k} AS MATERIALIZED (SELECT
              sum(CAST(floor(({sig} - y) * 1000000 + 0.5) AS BIGINT)) AS ga,
              sum(CAST(floor(({sig} - y) * x1 * 1000000 + 0.5) AS BIGINT)) AS gb,
              sum(CAST(floor(({sig} - y) * x2 * 1000000 + 0.5) AS BIGINT)) AS gc
            FROM f)"""
        )
        parts.append(
            f"""w{k} AS MATERIALIZED (SELECT
              (SELECT a FROM {prev}) - {LOGREG_LR} * (CAST((SELECT ga FROM g{k})
                 AS DOUBLE) / 1000000.0) / (SELECT nd FROM nn) AS a,
              (SELECT b FROM {prev}) - {LOGREG_LR} * (CAST((SELECT gb FROM g{k})
                 AS DOUBLE) / 1000000.0) / (SELECT nd FROM nn) AS b,
              (SELECT c FROM {prev}) - {LOGREG_LR} * (CAST((SELECT gc FROM g{k})
                 AS DOUBLE) / 1000000.0) / (SELECT nd FROM nn) AS c)"""
        )
    last = f"w{LOGREG_ITERS}"
    zfin = (
        f"(SELECT a FROM {last}) + (SELECT b FROM {last}) * x1"
        f" + (SELECT c FROM {last}) * x2"
    )
    return f"""
        WITH {", ".join(parts)}
        SELECT (SELECT n FROM nn) AS n,
               CAST(floor((SELECT a FROM {last}) * 1000000 + 0.5) AS BIGINT)
                 AS w0_micro,
               CAST(floor((SELECT b FROM {last}) * 1000000 + 0.5) AS BIGINT)
                 AS w1_micro,
               CAST(floor((SELECT c FROM {last}) * 1000000 + 0.5) AS BIGINT)
                 AS w2_micro,
               (SELECT CAST(sum(CASE WHEN ({zfin} >= 0.0) = (y = 1.0)
                                THEN 1 ELSE 0 END) AS BIGINT) FROM f) AS correct
    """


ZIPF_TOP = 100


def zipf_fit_terms(sf_dir: str):
    """Zipf power-law fit of the term-frequency distribution: OLS slope
    of ln(df) on ln(rank) over the top-``ZIPF_TOP`` vocabulary terms
    (rank by df desc, term asc) — the corpus-health audit (natural text
    fits slope ~ -1; synthetic/templated corpora deviate).  The
    distributed part is the standard df fold; the fit quantizes each
    ln() to MICRO-NAT INTEGERS FIRST, so all OLS moments are exact
    integer sums on both sides and only the final slope/intercept
    division is float (identical expression trees)."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        flat = pcc.list_flatten(toks)
        parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        df_ = pd.DataFrame({"term": flat.to_pandas(), "d": parents}).drop_duplicates()
        partial = df_.groupby("term", sort=False).size().reset_index(name="df")
        return pa.table(
            {"term": pa.array(partial["term"], pa.string()),
             "df": pa.array(partial["df"].to_numpy(), pa.int64())}
        )

    top = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True], ignore_index=True)
        .head(ZIPF_TOP)
    )
    n = len(top)
    xs = [int(math.floor(math.log(r + 1) * 1e6 + 0.5)) for r in range(n)]
    ys = [
        int(math.floor(math.log(int(d)) * 1e6 + 0.5)) for d in top["df"].tolist()
    ]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = float(num) / float(den) if den else 0.0
    intercept = (sy - slope * sx) / n  # micro-nat units
    return pa.table(
        {
            "n_terms": pa.array([n], pa.int64()),
            "slope_micro": pa.array(
                [int(math.floor(slope * 1e6 + 0.5))], pa.int64()
            ),
            "intercept_micronat": pa.array(
                [int(math.floor(intercept + 0.5))], pa.int64()
            ),
        }
    )


FUNNEL_FROM = "view"
FUNNEL_TO = "purchase"


def funnel_time_to_convert(sf_dir: str):
    """Time-to-convert: per user, the seconds from their FIRST
    ``view`` to the first ``purchase`` AT OR AFTER it (the funnel-latency
    distribution behind conversion SLAs).  One user-keyed exchange of
    pre-filtered (ts, type) pairs; inside each group two vectorized mins
    — no per-row loop; non-converting users drop out.  Integer epoch
    seconds on both sides."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    ds = ds.filter(
        expr=f"event_type == '{FUNNEL_FROM}' or event_type == '{FUNNEL_TO}'"
    )

    def pergroup(df: pd.DataFrame) -> pd.DataFrame:
        tus = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        views = tus[et == FUNNEL_FROM]
        if len(views) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "convert_sec": pd.Series([], dtype=np.int64)}
            )
        t0 = views.min()
        buys = tus[(et == FUNNEL_TO) & (tus >= t0)]
        if len(buys) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "convert_sec": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "convert_sec": [int((buys.min() - t0) // 1_000_000)],
            }
        )

    return ds.groupby("user_id").map_groups(pergroup, batch_format="pandas")


AB_SALT = "exp42"


def ab_test_conversion(sf_dir: str):
    """A/B experiment readout: users hash-split into two arms
    (``md5(salt:user_id)`` parity — deterministic, reproducible), a user
    CONVERTS if any ``purchase`` follows their first ``view``; emits per-
    arm user/conversion counts and the two-proportion pooled z in micro.
    One user-keyed exchange; the z expression tree matches the oracle's
    exactly (integer counts in, one double expression out)."""
    import math

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    ds = ds.filter(
        expr=f"event_type == '{FUNNEL_FROM}' or event_type == '{FUNNEL_TO}'"
    )

    def pergroup(df: pd.DataFrame) -> pd.DataFrame:
        uid = int(df["user_id"].iloc[0])
        tus = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        views = tus[et == FUNNEL_FROM]
        if len(views) == 0:
            return pd.DataFrame(
                {"arm": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64),
                 "k": pd.Series([], dtype=np.int64)}
            )
        t0 = views.min()
        conv = int(((et == FUNNEL_TO) & (tus >= t0)).any())
        arm = int(
            hashlib.md5(f"{AB_SALT}:{uid}".encode()).hexdigest()[-1], 16
        ) % 2
        return pd.DataFrame({"arm": [arm], "n": [1], "k": [conv]})

    from ray.data.aggregate import Sum

    arms = (
        ds.groupby("user_id")
        .map_groups(pergroup, batch_format="pandas")
        .groupby("arm")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
        .to_pandas()
        .sort_values("arm", ignore_index=True)
    )
    vals = {int(r["arm"]): (int(r["n"]), int(r["k"])) for _, r in arms.iterrows()}
    n1, k1 = vals.get(0, (0, 0))
    n2, k2 = vals.get(1, (0, 0))
    if n1 and n2 and 0 < k1 + k2 < n1 + n2:
        p = (k1 + k2) / (n1 + n2)
        z = (k1 / n1 - k2 / n2) / math.sqrt(p * (1.0 - p) * (1.0 / n1 + 1.0 / n2))
    else:
        z = 0.0
    return pa.table(
        {
            "n_a": pa.array([n1], pa.int64()),
            "k_a": pa.array([k1], pa.int64()),
            "n_b": pa.array([n2], pa.int64()),
            "k_b": pa.array([k2], pa.int64()),
            "z_micro": pa.array([int(math.floor(z * 1e6 + 0.5))], pa.int64()),
        }
    )


def mutual_info_lang_source(sf_dir: str):
    """Mutual information I(lang; source) in micro-nats, plus the
    marginal entropies H(lang) / H(source) (normalized-MI comes free on
    the client).  Same alphabet-bounded (lang, source) count fold as
    ``chi2_lang_source`` — the contingency table never scales with the
    corpus — then I = sum over OBSERVED cells of (o/n)*ln(o*n/(r*c))
    (zero cells contribute 0 in the limit).  The products ``o*n`` and
    ``r*c`` stay exact in int64; each cell's double term is rounded to
    micro BEFORE the summation, so the statistic is immune to float
    ordering, and the oracle uses the identical expression tree."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": t["lang"].to_pandas(), "source": t["source"].to_pandas()}
        )
        g = df.groupby(["lang", "source"], sort=False, as_index=False).size()
        return pa.table(
            {
                "lang": pa.array(g["lang"].tolist(), pa.string()),
                "source": pa.array(g["source"].tolist(), pa.string()),
                "o": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    obs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("o", alias_name="o"))
        .to_pandas()
    )
    pivot = obs.pivot_table(
        index="lang", columns="source", values="o", fill_value=0
    ).astype(np.int64)
    O = pivot.to_numpy(np.int64)
    r = O.sum(axis=1)
    c = O.sum(axis=0)
    n = int(O.sum())
    rc = np.outer(r, c)
    pos = O > 0
    terms = (O[pos].astype(np.float64) / float(n)) * np.log(
        (O[pos] * n).astype(np.float64) / rc[pos].astype(np.float64)
    )
    mi_micro = int(np.floor(terms * 1e6 + 0.5).astype(np.int64).sum())

    def _h_micro(m: np.ndarray) -> int:
        m = m[m > 0]
        t = -(m.astype(np.float64) / float(n)) * np.log(
            m.astype(np.float64) / float(n)
        )
        return int(np.floor(t * 1e6 + 0.5).astype(np.int64).sum())

    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "mi_micro": pa.array([mi_micro], pa.int64()),
            "h_lang_micro": pa.array([_h_micro(r)], pa.int64()),
            "h_source_micro": pa.array([_h_micro(c)], pa.int64()),
        }
    )


KS_TYPE_A = "click"
KS_TYPE_B = "view"


def ks_test_value(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov test between the ``value``
    distributions of two event types.  Distributed: one map-side
    (value-cent, type) count fold over events — the cent domain is
    bounded, so the exchange is corpus-free — then the D statistic from
    the merged CDFs on the driver with ARBITRARY-PRECISION integers:
    ``D = max_v |c1(v)*n2 - c2(v)*n1| / (n1*n2)`` (Python ints, so the
    cross-multiplied gap never overflows at any corpus size; the oracle
    uses HUGEINT).  ``ks_micro`` rounds by pure integer arithmetic
    ``(2*num*1e6 + den) // (2*den)`` — no float anywhere — and
    ``at_cent`` is the smallest value cent achieving the max gap."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = _cents_col(t["value"]).to_numpy(zero_copy_only=False)
        sel = (et == KS_TYPE_A) | (et == KS_TYPE_B)
        df = pd.DataFrame(
            {"v_cent": v[sel], "a": (et[sel] == KS_TYPE_A).astype(np.int64)}
        )
        g = df.groupby("v_cent", sort=False, as_index=False).agg(
            a=("a", "sum"), n=("a", "size")
        )
        return pa.table(
            {
                "v_cent": pa.array(g["v_cent"].to_numpy(np.int64)),
                "a": pa.array(g["a"].to_numpy(np.int64)),
                "b": pa.array((g["n"] - g["a"]).to_numpy(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v_cent")
        .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
        .to_pandas()
        .sort_values("v_cent", ignore_index=True)
    )
    n1 = int(agg["a"].sum())
    n2 = int(agg["b"].sum())
    den = n1 * n2
    ca = cb = 0
    best_gap = -1
    at_cent = 0
    for v, a, b in zip(
        agg["v_cent"].tolist(), agg["a"].tolist(), agg["b"].tolist()
    ):
        ca += int(a)
        cb += int(b)
        gap = abs(ca * n2 - cb * n1)
        if gap > best_gap:
            best_gap, at_cent = gap, int(v)
    ks_micro = (2 * best_gap * 1_000_000 + den) // (2 * den) if den else 0
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "at_cent": pa.array([at_cent], pa.int64()),
            "ks_micro": pa.array([ks_micro], pa.int64()),
        }
    )


def spearman_qty_discount(sf_dir: str):
    """Spearman rank correlation between ``l_quantity`` and
    ``l_discount``.  Both domains are tiny and bounded (50 x 11 cents
    values), so ONE joint-count fold produces the full contingency
    table corpus-free; exact average-tie ranks come from the marginal
    counts as integers — ``r2 = 2*cum_before + cnt + 1`` is twice the
    average rank, and Pearson-over-ranks is invariant under that
    scaling (both sides use the same scaled ints anyway).  All moments
    are arbitrary-precision integers on the driver (HUGEINT in the
    oracle); the ONLY doubles are the final ``num / sqrt(d1*d2)``,
    an identical expression tree on both sides."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        qv = _cents_col(t["l_quantity"]).to_numpy(zero_copy_only=False)
        dv = _cents_col(t["l_discount"]).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"qv": qv, "dv": dv})
            .groupby(["qv", "dv"], sort=False, as_index=False)
            .size()
        )
        return pa.table(
            {
                "qv": pa.array(g["qv"].to_numpy(np.int64)),
                "dv": pa.array(g["dv"].to_numpy(np.int64)),
                "c": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    j = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["qv", "dv"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )

    def _ranks2(col: str) -> Dict[int, int]:
        m = j.groupby(col)["c"].sum().sort_index()
        out: Dict[int, int] = {}
        cum = 0
        for v, cnt in m.items():
            out[int(v)] = 2 * cum + int(cnt) + 1
            cum += int(cnt)
        return out

    rx, ry = _ranks2("qv"), _ranks2("dv")
    n = sx = sxx = sy = syy = sxy = 0
    for qv, dv, c in zip(j["qv"].tolist(), j["dv"].tolist(), j["c"].tolist()):
        c = int(c)
        a, b = rx[int(qv)], ry[int(dv)]
        n += c
        sx += c * a
        sxx += c * a * a
        sy += c * b
        syy += c * b * b
        sxy += c * a * b
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    rho = float(num) / math.sqrt(float(d1) * float(d2)) if d1 and d2 else 0.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "rho_micro": pa.array(
                [int(math.floor(rho * 1e6 + 0.5))], pa.int64()
            ),
        }
    )


COMPLETION_PREFIX = "s"
COMPLETION_K = 10


def completion_suggest(sf_dir: str):
    """ES completion suggester (search-as-you-type): vocabulary terms
    with the given prefix ranked by (df desc, term asc), capped.  Pure
    lexicon work — the prefix becomes a parquet RANGE predicate on the
    term-sorted shards (LexiconReader.expand), cost scales with
    vocabulary, never corpus."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.lexicon.expand(
            COMPLETION_PREFIX + "*", max_expand=COMPLETION_K
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "term": pa.array([t for t, _ in rows], pa.string()),
            "df": pa.array([d for _, d in rows], pa.int64()),
        }
    )


MBP_QUERY = "window s"


def bm25_match_bool_prefix(sf_dir: str):
    """ES match_bool_prefix: every whitespace chunk scores as a regular
    OR'd BM25 term except the LAST, which expands as a prefix against
    the vocabulary (df desc, term asc, capped) — the type-ahead variant
    of match.  Routed through the engine's wildcard tokenizer by
    appending ``*`` to the final chunk, so expansion + scoring reuse the
    standard lexicon/shard paths unchanged."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        rows = engine.search(MBP_QUERY + "*", limit=20)
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score_micro": pa.array(_micro([r["score"] for r in rows]), pa.int64()),
        }
    )


PSUGGEST_QUERY = "sow oin"
PSUGGEST_DIST = 2
PSUGGEST_PER_TOKEN = 5
PSUGGEST_K = 5


def phrase_suggest(sf_dir: str):
    """ES phrase suggester ("did you mean"): each query token expands to
    its vocabulary candidates within ``PSUGGEST_DIST`` edits (dist asc,
    df desc, term asc, capped — the direct generator), and the candidate
    PHRASES are ranked by a corpus bigram language model: score = sum of
    the corpus occurrence counts of each adjacent candidate pair.  The
    bigram counting is one streaming ``map_batches`` pass — candidate
    sets are tiny and shipped in the closure, per-batch work is a
    vectorized token-stream adjacency count (never a corpus-wide bigram
    table) — followed by a candidate-sized groupby.  Cost scales with
    corpus for the one scan, candidates^2 for everything else."""
    from itertools import product

    from ray.data.aggregate import Sum

    from ..functions.tokenizer import tokenize, tokenize_array
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        cands = [
            [
                t
                for t, _, _ in engine.lexicon.suggest(
                    tok, max_dist=PSUGGEST_DIST, limit=PSUGGEST_PER_TOKEN
                )
            ]
            for tok in tokenize(PSUGGEST_QUERY)
        ]
    finally:
        engine.close()
    if not cands or any(not c for c in cands):
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "suggestion": pa.array([], pa.string()),
                "score": pa.array([], pa.int64()),
            }
        )
    sets = [np.array(sorted(c), dtype=object) for c in cands]
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        lists = tokenize_array(t["text"])
        flat = np.asarray(lists.values.to_pylist(), dtype=object)
        par = np.repeat(
            np.arange(len(lists), dtype=np.int64),
            np.diff(lists.offsets.to_numpy(zero_copy_only=False)),
        )
        rows = {"pos": [], "a": [], "b": [], "n": []}
        if len(flat) >= 2:
            adj = par[:-1] == par[1:]
            for p in range(len(sets) - 1):
                A, B = sets[p], sets[p + 1]
                ia = pd.Index(A).get_indexer(flat[:-1])
                ib = pd.Index(B).get_indexer(flat[1:])
                mask = adj & (ia >= 0) & (ib >= 0)
                if not mask.any():
                    continue
                codes = ia[mask] * len(B) + ib[mask]
                cnt = np.bincount(codes, minlength=len(A) * len(B))
                nz = np.flatnonzero(cnt)
                rows["pos"].extend([p] * len(nz))
                rows["a"].extend(A[nz // len(B)].tolist())
                rows["b"].extend(B[nz % len(B)].tolist())
                rows["n"].extend(cnt[nz].tolist())
        return pa.table(
            {
                "pos": pa.array(rows["pos"], pa.int64()),
                "a": pa.array(rows["a"], pa.string()),
                "b": pa.array(rows["b"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
            }
        )

    bc = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pos", "a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts: Dict[Tuple[int, str, str], int] = {
        (int(r.pos), r.a, r.b): int(r.n) for r in bc.itertuples()
    }
    scored = []
    for combo in product(*cands):
        s = sum(
            counts.get((p, combo[p], combo[p + 1]), 0)
            for p in range(len(combo) - 1)
        )
        scored.append((" ".join(combo), s))
    scored.sort(key=lambda r: (-r[1], r[0]))
    top = scored[:PSUGGEST_K]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(top)), pa.int64()),
            "suggestion": pa.array([s for s, _ in top], pa.string()),
            "score": pa.array([n for _, n in top], pa.int64()),
        }
    )


def _phrase_suggest_sql() -> str:
    """SQL twin of ``phrase_suggest``: per-token Levenshtein candidates
    (dist asc, df desc, term asc, capped — mirroring LexiconReader.
    suggest) cross-joined into phrases, scored by the sum of corpus
    bigram counts of adjacent candidate pairs."""
    from ..functions.tokenizer import tokenize

    toks = tokenize(PSUGGEST_QUERY)
    tok = _tok_sql("text")
    cand_ctes = ",\n".join(
        f"""cand{i} AS (
  SELECT term FROM dfv WHERE levenshtein(term, '{t}') <= {PSUGGEST_DIST}
  QUALIFY row_number() OVER (
    ORDER BY levenshtein(term, '{t}') ASC, df DESC, term ASC
  ) <= {PSUGGEST_PER_TOKEN})"""
        for i, t in enumerate(toks)
    )
    froms = " CROSS JOIN ".join(f"cand{i} c{i}" for i in range(len(toks)))
    score = " + ".join(
        f"""coalesce((SELECT n FROM bc
             WHERE bc.t1 = c{p}.term AND bc.t2 = c{p + 1}.term), 0)"""
        for p in range(len(toks) - 1)
    )
    phrase = " || ' ' || ".join(f"c{i}.term" for i in range(len(toks)))
    return f"""
        WITH tok AS (SELECT doc_id, {tok} AS l FROM documents),
        dfv AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                FROM (SELECT DISTINCT doc_id, unnest(l) AS term FROM tok)
                GROUP BY term),
        idxs AS (SELECT l, unnest(range(1, len(l))) AS i FROM tok),
        bc AS (SELECT l[CAST(i AS INT)] AS t1, l[CAST(i AS INT) + 1] AS t2,
                      CAST(count(*) AS BIGINT) AS n
               FROM idxs GROUP BY 1, 2),
        {cand_ctes},
        combos AS (SELECT {phrase} AS suggestion,
                          CAST({score} AS BIGINT) AS score
                   FROM {froms})
        SELECT row_number() OVER (ORDER BY score DESC, suggestion ASC) - 1
                 AS rank,
               suggestion, score
        FROM combos ORDER BY score DESC, suggestion ASC LIMIT {PSUGGEST_K}
    """


DIVSAMPLE_PER_LANG = 3
DIVSAMPLE_N = 12


def diversified_sample(sf_dir: str):
    """ES diversified_sampler: the global top ``DIVSAMPLE_N`` docs by
    (n_chars desc, doc_id asc) with at most ``DIVSAMPLE_PER_LANG`` docs
    per language (max_docs_per_value de-biasing).  Every final winner is
    inside its language's global top-K, so per-block per-lang top-K
    partials are a lossless reduction: wire cost blocks x langs x K,
    the driver merges per-lang then cuts globally — never a sort of the
    corpus."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    k = DIVSAMPLE_PER_LANG

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "lang": t["lang"].to_pandas(),
                "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], ignore_index=True
        )
        df = df.groupby("lang", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True], ignore_index=True
    )
    top = cand.groupby("lang", sort=False).head(k).head(DIVSAMPLE_N)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(top)), pa.int64()),
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
            "lang": pa.array(top["lang"].tolist(), pa.string()),
            "n_chars": pa.array(top["n_chars"].to_numpy(np.int64)),
        }
    )


ZTEST_CHARS_MIN = 300
ZTEST_LANG = "en"


def ztest_quality_en(sf_dir: str):
    """Two-proportion z-test: does lang='en' pass the n_chars >= 300
    quality gate at a different rate than the rest of the corpus?
    Four counters fold map-side; the driver evaluates the pooled-
    variance z with the oracle-identical expression tree (sqrt is
    IEEE-correctly-rounded, so both sides stay bit-identical)."""
    import math

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        en = pcc.equal(t["lang"], ZTEST_LANG).to_numpy(zero_copy_only=False)
        hi = (
            t["n_chars"].to_numpy(zero_copy_only=False) >= ZTEST_CHARS_MIN
        )
        return pa.table(
            {
                "n1": pa.array([int(en.sum())], pa.int64()),
                "k1": pa.array([int((en & hi).sum())], pa.int64()),
                "n2": pa.array([int((~en).sum())], pa.int64()),
                "k2": pa.array([int((~en & hi).sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n1, k1, n2, k2 = (int(agg[k]) for k in ("n1", "k1", "n2", "k2"))
    p1 = float(k1) / float(n1)
    p2 = float(k2) / float(n2)
    pp = float(k1 + k2) / float(n1 + n2)
    z = (p1 - p2) / math.sqrt(
        pp * (1.0 - pp) * (1.0 / float(n1) + 1.0 / float(n2))
    )
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "k1": pa.array([k1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "k2": pa.array([k2], pa.int64()),
            "z_micro": pa.array([int(math.floor(z * 1e6 + 0.5))], pa.int64()),
        }
    )


TERMS_SET_DL = 55
TERMS_SET_LOW = 2
TERMS_SET_HIGH = 3


def bm25_terms_set(sf_dir: str, query: str = BM25_QUERY, limit: int = 20):
    """ES terms_set query (minimum_should_match_field): BM25 ranking
    restricted to docs containing a PER-DOC required number of distinct
    query terms — 2 for docs shorter than ``TERMS_SET_DL`` tokens, 3
    otherwise (``QueryEngine.search_terms_set``; membership masks from
    the scorer's own decoded postings, threshold max unmasked)."""
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        hits = engine.search_terms_set(
            query, TERMS_SET_DL, TERMS_SET_LOW, TERMS_SET_HIGH, limit=limit
        )
    finally:
        engine.close()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(hits)), pa.int64()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.int64()),
            "score_micro": pa.array(_micro([h["score"] for h in hits]), pa.int64()),
        }
    )


def string_stats_by_lang(sf_dir: str):
    """ES string_stats aggregation per language: doc count, min/max/avg
    character length, and the Shannon entropy of the CHARACTER
    distribution.  Distributed as two streaming folds over one
    column-pruned read each: (lang, codepoint) count partials -> one
    domain-sized groupby (the char alphabet is bounded, so the exchange
    is corpus-free), and (lang) min/max/sum length partials.  Entropy is
    integer-exact on both sides: per-char terms round to micro-nats
    BEFORE summation (``floor(n*ln(n)*1e6+0.5)`` summed as int64), then
    ``H_micro = floor(ln(N)*1e6+0.5) - sum // N`` — immune to float
    summation order, with only scalar libm ``ln`` calls shared with the
    SQL oracle."""
    import math

    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def char_partial(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pandas()
        texts = t["text"].to_pandas()
        rows = {"lang": [], "ch": [], "n": []}
        for lg, grp in texts.groupby(langs, sort=False):
            joined = "".join(grp.tolist())
            codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
            uniq, cnt = np.unique(codes, return_counts=True)
            rows["lang"].extend([lg] * len(uniq))
            rows["ch"].extend(uniq.astype(np.int64).tolist())
            rows["n"].extend(cnt.astype(np.int64).tolist())
        return pa.table(
            {
                "lang": pa.array(rows["lang"], pa.string()),
                "ch": pa.array(rows["ch"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
            }
        )

    hist = (
        ds.map_batches(char_partial, batch_format="pyarrow")
        .groupby(["lang", "ch"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )

    def len_partial(t: pa.Table) -> pa.Table:
        ln = pcc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": t["lang"].to_pandas(), "ln": ln})
        g = df.groupby("lang", sort=False)["ln"].agg(["count", "min", "max", "sum"])
        g = g.reset_index()
        return pa.table(
            {
                "lang": pa.array(g["lang"].tolist(), pa.string()),
                "n_docs": pa.array(g["count"].to_numpy(np.int64)),
                "mn": pa.array(g["min"].to_numpy(np.int64), pa.int64()),
                "mx": pa.array(g["max"].to_numpy(np.int64), pa.int64()),
                "sl": pa.array(g["sum"].to_numpy(np.int64), pa.int64()),
            }
        )

    lens = (
        ds.map_batches(len_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
            Sum("sl", alias_name="sl"),
        )
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    out = {
        "lang": [], "n_docs": [], "min_len": [], "max_len": [],
        "avg_len_micro": [], "n_chars_total": [], "distinct_chars": [],
        "entropy_micro": [],
    }
    for lg, grp in hist.groupby("lang", sort=True):
        n = grp["n"].to_numpy(np.int64)
        nt = int(n.sum())
        # per-element micro-nat rounding, then an integer sum: scalar
        # math.log == DuckDB ln (both libm on this box)
        s = sum(int(math.floor(float(c) * math.log(float(c)) * 1e6 + 0.5))
                for c in n)
        r = lens.loc[lg]
        out["lang"].append(lg)
        out["n_docs"].append(int(r["n_docs"]))
        out["min_len"].append(int(r["mn"]))
        out["max_len"].append(int(r["mx"]))
        out["avg_len_micro"].append(int(r["sl"]) * 1_000_000 // int(r["n_docs"]))
        out["n_chars_total"].append(nt)
        out["distinct_chars"].append(len(n))
        out["entropy_micro"].append(
            int(math.floor(math.log(float(nt)) * 1e6 + 0.5)) - s // nt
        )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            **{k: pa.array(v, pa.int64()) for k, v in out.items() if k != "lang"},
        }
    )


MOVING_WINDOW = 7


def daily_order_moving_stats(sf_dir: str):
    """ES moving_fn + serial_diff pipeline aggregations over a zero-
    filled daily date_histogram of orders: the trailing 7-day moving
    average (integer micro, full windows only) and the lag-7 serial
    difference of the daily order count.  The day-keyed count fold is
    distributed (map-side partials, bounded day axis); the window pass
    runs on the driver over the dense axis in exact integer arithmetic."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[s]").astype(np.int64) // 86400
        )
        uniq, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {"day": pa.array(uniq), "cnt": pa.array(cnt.astype(np.int64))}
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    axis = np.arange(lo, hi + 1, dtype=np.int64)
    dense = np.zeros(len(axis), dtype=np.int64)
    dense[daily["day"].to_numpy(np.int64) - lo] = daily["cnt"].to_numpy(np.int64)
    csum = np.concatenate([[0], np.cumsum(dense)])
    w = MOVING_WINDOW
    idx = np.arange(w, len(axis))
    wsum = csum[idx + 1] - csum[idx + 1 - w]
    return pa.table(
        {
            "day": pa.array(axis[idx]),
            "cnt": pa.array(dense[idx]),
            "ma7_micro": pa.array(wsum * 1_000_000 // w),
            "diff7": pa.array(dense[idx] - dense[idx - w]),
        }
    )


ADH_TARGET = 30
ADH_LADDER = (1, 7, 30, 90, 365)  # fixed-width day intervals (documented
# deviation from ES's calendar rounding: epoch-anchored buckets)


def auto_date_histogram(sf_dir: str):
    """ES auto_date_histogram: the SMALLEST interval from a fixed ladder
    whose bucket count fits the target (<= 30) wins, then orders bucket
    into epoch-anchored fixed-width windows of that interval.  The
    distributed pass is one day-grain count fold (bounded axis — never
    corpus-sized); ladder selection and re-bucketing run on the driver
    over that tiny table, in pure integers on both sides."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[s]").astype(np.int64) // 86400
        )
        uniq, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {"day": pa.array(uniq), "cnt": pa.array(cnt.astype(np.int64))}
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    days = daily["day"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    iv = ADH_LADDER[-1]
    for cand in ADH_LADDER:
        if hi // cand - lo // cand + 1 <= ADH_TARGET:
            iv = cand
            break
    bucket = (days // iv) * iv
    g = (
        pd.DataFrame({"bucket_day": bucket, "n": daily["cnt"].to_numpy(np.int64)})
        .groupby("bucket_day", as_index=False)["n"].sum()
        .sort_values("bucket_day", ignore_index=True)
    )
    return pa.table(
        {
            "bucket_day": pa.array(g["bucket_day"].to_numpy(np.int64)),
            "interval_days": pa.array([iv] * len(g), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
        }
    )


PB_PCTS = (25, 50, 75, 90, 99)


def daily_bucket_stats(sf_dir: str):
    """ES stats_bucket + percentiles_bucket pipeline aggregations over
    the daily order date_histogram: min/max/sum/avg of the per-day
    counts plus exact NEAREST-RANK percentiles (value at 1-based
    position ceil(p*n/100) of the sorted counts — no interpolation, so
    both sides are integer-identical).  The distributed part is the one
    bounded day-grain count fold; the bucket-value pass is driver-side
    over that tiny axis."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[s]").astype(np.int64) // 86400
        )
        uniq, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {"day": pa.array(uniq), "cnt": pa.array(cnt.astype(np.int64))}
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    c = np.sort(daily["cnt"].to_numpy(np.int64))
    n = len(c)
    pct_vals = [int(c[min(n - 1, max(0, -(-p * n // 100) - 1))]) for p in PB_PCTS]
    return pa.table(
        {
            "n_buckets": pa.array([n], pa.int64()),
            "min_cnt": pa.array([int(c[0])], pa.int64()),
            "max_cnt": pa.array([int(c[-1])], pa.int64()),
            "sum_cnt": pa.array([int(c.sum())], pa.int64()),
            "avg_cnt_micro": pa.array([int(c.sum()) * 1_000_000 // n], pa.int64()),
            **{
                f"p{p}": pa.array([v], pa.int64())
                for p, v in zip(PB_PCTS, pct_vals)
            },
        }
    )


BSORT_FROM = 2
BSORT_SIZE = 5


def bucket_sort_daily(sf_dir: str):
    """ES bucket_sort pipeline aggregation: the daily date_histogram's
    buckets re-ordered by (count desc, day asc), then truncated with
    from=2 / size=5 — the busiest days 3 through 7.  One bounded
    day-grain fold; ordering/truncation on the driver."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[s]").astype(np.int64) // 86400
        )
        uniq, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {"day": pa.array(uniq), "cnt": pa.array(cnt.astype(np.int64))}
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values(["cnt", "day"], ascending=[False, True], ignore_index=True)
        .iloc[BSORT_FROM : BSORT_FROM + BSORT_SIZE]
    )
    return pa.table(
        {
            "rank": pa.array(
                np.arange(BSORT_FROM, BSORT_FROM + len(daily)), pa.int64()
            ),
            "day": pa.array(daily["day"].to_numpy(np.int64)),
            "cnt": pa.array(daily["cnt"].to_numpy(np.int64)),
        }
    )


RSCORE_SEED = "rs1"
RSCORE_LANG = "en"


def docs_random_score(sf_dir: str, limit: int = 20):
    """ES function_score random_score with a seed: a deterministic,
    partitioning-independent pseudo-random ranking of the docs matching
    a filter (lang), keyed by ``md5(seed:doc_id)``.  Per-block top-k
    partials keep the wire cost at blocks*k; the driver merges k rows.
    Oracle: ``ORDER BY md5(...) LIMIT k``."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pcc.equal(t["lang"], RSCORE_LANG))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keys = [
            _hl.md5(f"{RSCORE_SEED}:{i}".encode()).hexdigest() for i in ids
        ]
        order = np.lexsort((ids, np.asarray(keys)))[:limit]
        return pa.table(
            {
                "key": pa.array([keys[i] for i in order], pa.string()),
                "doc_id": pa.array(ids[order], pa.int64()),
            }
        )

    top = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["key", "doc_id"], ignore_index=True)
        .head(limit)
    )
    return pa.table(
        {
            "rank": pa.array(np.arange(len(top)), pa.int64()),
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
        }
    )


MULTI_TERMS_K = 10


def multi_terms_counts(sf_dir: str):
    """ES multi_terms aggregation: buckets keyed by the COMPOUND
    (lang, source) term pair, doc count and total chars per bucket,
    ordered count desc then key asc, top 10.  Map-side pair partials ->
    one bucket-keyed groupby (bucket table is small) -> driver cut."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pandas(),
                "source": t["source"].to_pandas(),
                "nc": t["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["lang", "source"], sort=False, as_index=False).agg(
            n=("nc", "size"), sum_chars=("nc", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    buckets = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_chars", alias_name="sum_chars"))
        .to_pandas()
        .sort_values(
            ["n", "lang", "source"], ascending=[False, True, True],
            ignore_index=True,
        )
        .head(MULTI_TERMS_K)
    )
    return pa.table(
        {
            "lang": pa.array(buckets["lang"], pa.string()),
            "source": pa.array(buckets["source"], pa.string()),
            "n": pa.array(buckets["n"].to_numpy(np.int64)),
            "sum_chars": pa.array(buckets["sum_chars"].to_numpy(np.int64)),
        }
    )


def _percentile_ranks_sql() -> str:
    """UNION-ALL unpivot of per-threshold counters, mirroring
    ``value_percentile_ranks``' integer bps arithmetic."""
    les = ",\n                   ".join(
        f"CAST(count(*) FILTER (WHERE x <= {th}) AS BIGINT) AS le{i}"
        for i, th in enumerate(PCT_RANK_THRESHOLDS_C)
    )
    arms = "\n            UNION ALL ".join(
        f"SELECT event_type, CAST({th} AS BIGINT) AS threshold_c, le{i} AS n_le,"
        f" n, CAST((le{i} * 10000 + n // 2) // n AS BIGINT) AS pct_bps FROM s"
        for i, th in enumerate(PCT_RANK_THRESHOLDS_C)
    )
    return f"""
            WITH b AS (SELECT event_type,
                              CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x
                       FROM events),
            s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   {les}
                  FROM b GROUP BY 1)
            {arms}
        """


def _qtok(q: str) -> List[str]:
    from ..functions.tokenizer import tokenize

    return tokenize(q)


DATE_RANGE_EDGES = ("1997-01-01", "1999-01-01")  # half-open buckets


def orders_date_range_agg(sf_dir: str):
    """ES ``date_range`` aggregation: orders bucketed into half-open
    date ranges (-inf, e1), [e1, e2), [e2, +inf) with count and revenue
    cents per bucket.  Map-side searchsorted bucket partials (3 rows per
    block) -> tiny groupby."""
    from ray.data.aggregate import Sum

    edges_us = (
        pd.to_datetime(list(DATE_RANGE_EDGES)).values.astype("datetime64[us]")
        .astype(np.int64)
    )
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def fn(t: pa.Table) -> pa.Table:
        d = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        b = np.searchsorted(edges_us, d, side="right")
        cents = _cents_col(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"bucket": b, "cents": cents})
            .groupby("bucket", as_index=False)
            .agg(n=("cents", "size"), rev_cents=("cents", "sum"))
        )
        return pa.table(
            {
                "bucket": pa.array(g["bucket"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "rev_cents": pa.array(g["rev_cents"].to_numpy(np.int64)),
            }
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"), Sum("rev_cents", alias_name="rev_cents"))
        .to_pandas()
        .sort_values("bucket", ignore_index=True)
    )
    return pa.table(
        {
            "bucket": pa.array(out["bucket"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "rev_cents": pa.array(out["rev_cents"].to_numpy(np.int64)),
        }
    )


# ES `filters` aggregation: named (possibly overlapping) predicate buckets
FILTERS_AGG = ("urgent", "high", "low_value", "_other_")


def filters_agg_orders(sf_dir: str):
    """ES ``filters`` aggregation with ``other_bucket``: named predicate
    buckets — urgent priority, high priority, total price < 1000 — each
    with count and revenue cents, plus ``_other_`` for rows matching no
    filter.  Buckets may OVERLAP (a doc counts in every filter it
    matches, the ES semantics); one streaming pass, map-side partials of
    <= 4 rows per block."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def fn(t: pa.Table) -> pa.Table:
        prio = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = _cents_col(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        masks = (
            prio == "1-URGENT",
            prio == "2-HIGH",
            cents < 100_000,
        )
        other = ~(masks[0] | masks[1] | masks[2])
        rows = []
        for name, m in zip(FILTERS_AGG, (*masks, other)):
            rows.append((name, int(m.sum()), int(cents[m].sum())))
        return pa.table(
            {
                "bucket": pa.array([r[0] for r in rows], pa.string()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "rev_cents": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"), Sum("rev_cents", alias_name="rev_cents"))
        .to_pandas()
        .sort_values("bucket", ignore_index=True)
    )
    return pa.table(
        {
            "bucket": pa.array(out["bucket"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "rev_cents": pa.array(out["rev_cents"].to_numpy(np.int64)),
        }
    )


def top_metrics_by_type(sf_dir: str):
    """ES ``top_metrics`` aggregation: per event_type, the metric value
    (cents) of the row ranked first by (ts desc, event_id asc) — "the
    value at the latest event".  Map-side per-block argmax partials
    (<= one row per type per block) -> driver merge over blocks x types
    rows; event rows never shuffle."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type", "value"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["event_type", "ts", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
            ignore_index=True,
        )
        top = df.groupby("event_type", as_index=False, sort=True).head(1)
        return pd.DataFrame(
            {
                "event_type": top["event_type"],
                "ts": top["ts"],
                "event_id": top["event_id"].astype(np.int64),
                "value_cents": np.floor(
                    top["value"].to_numpy(np.float64) * 100 + 0.5
                ).astype(np.int64),
            }
        )

    cand = ds.map_batches(fn, batch_format="pandas").to_pandas()
    out = (
        cand.sort_values(
            ["event_type", "ts", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
            ignore_index=True,
        )
        .groupby("event_type", as_index=False, sort=True)
        .head(1)
        .sort_values("event_type", ignore_index=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "event_id": pa.array(out["event_id"].to_numpy(np.int64)),
            "value_cents": pa.array(out["value_cents"].to_numpy(np.int64)),
        }
    )


def weekly_event_rate(sf_dir: str):
    """ES ``rate`` aggregation (unit=day) inside a weekly
    date_histogram: per Monday-aligned calendar week, the event count
    and the per-day rate in milli (``n * 1000 // 7`` — integer on both
    sides).  One bounded week-keyed count fold; week truncation is the
    same epoch-day integer arithmetic cohort_retention uses."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts"])

    def fn(t: pa.Table) -> pa.Table:
        d = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        monday = d - (d + 3) % 7  # 1970-01-01 was a Thursday
        uniq, cnt = np.unique(monday, return_counts=True)
        return pa.table(
            {"wk": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))}
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("wk")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("wk", ignore_index=True)
    )
    wks = out["wk"].to_numpy(np.int64)
    n = out["n"].to_numpy(np.int64)
    return pa.table(
        {
            "week_start": pa.array(
                [str(x) for x in wks.astype("datetime64[D]")], pa.string()
            ),
            "n": pa.array(n),
            "rate_milli": pa.array((n * 1000 // 7).astype(np.int64)),
        }
    )


TOP_TIES_K = 10


def orders_top_with_ties(sf_dir: str):
    """Top-K rows WITH TIES (ANSI ``FETCH FIRST k ROWS WITH TIES`` /
    ``rank() <= k``): the highest-value orders by total price where
    every row tying the K-th value is included.  Distributed as the
    threshold pattern a global sort would waste: per-block top-K cents
    partials -> the driver reads the K-th value off the merged
    candidates -> one streaming filter pass keeps ``cents >= v_k``.
    Two passes, no all-to-all.  Integer cents on both sides."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def partial_topk(t: pa.Table) -> pa.Table:
        c = _cents_col(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        k = min(TOP_TIES_K, len(c))
        if k == 0:
            return pa.table({"cents": pa.array([], pa.int64())})
        top = np.partition(c, len(c) - k)[len(c) - k:]
        return pa.table({"cents": pa.array(np.sort(top)[::-1])})

    cand = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()["cents"]
        .sort_values(ascending=False, ignore_index=True)
    )
    if len(cand) == 0:
        return pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "cents": pa.array([], pa.int64())}
        )
    v_k = int(cand.iloc[min(TOP_TIES_K, len(cand)) - 1])

    def keep(t: pa.Table) -> pa.Table:
        c = _cents_col(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        m = c >= v_k
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].filter(pa.array(m)),
                "cents": pa.array(c[m]),
            }
        )

    out = (
        ds.map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["cents", "o_orderkey"], ascending=[False, True],
                     ignore_index=True)
    )
    return pa.table(
        {
            "o_orderkey": pa.array(out["o_orderkey"].to_numpy(np.int64)),
            "cents": pa.array(out["cents"].to_numpy(np.int64)),
        }
    )


CURATION_STAGES = ("all", "dedup", "gopher", "decontam", "budget")
# cutoff-score groups at or below this row count resolve their budget
# prefix on the driver (one vectorized cumsum) instead of paying two Ray
# exchanges; same small-input rule as stages/dedup.py's banding tail
CURATION_DRIVER_CUT_ROWS = 2_000_000
# flag-table spills at or below this ON-DISK size fold their histogram on
# the driver (one pyarrow read + pandas groupby) instead of paying two
# more Ray executions; the distributed path handles the 100-TB case where
# the slim spill is itself TB-scale (same size rule as _attach_int_lookup)
CURATION_DRIVER_FLAGS_BYTES = 256 << 20


def _load_benchmark_table(path: str):
    """Load a user-supplied benchmark file for decontamination as a Ray
    Dataset of (doc_id, text) rows: parquet (any table with a ``text``
    column; a missing ``doc_id`` gets ordinals) or plain text, one
    benchmark entry per line.  Eval sets are small by nature, so the
    text-file branch reads driver-side; parquet streams through
    ``read_parquet`` with column pruning."""
    import ray.data as rd

    if path.endswith(".parquet"):
        import pyarrow.parquet as _pq

        schema_names = _pq.ParquetFile(path).schema_arrow.names
        if "text" not in schema_names:
            raise ValueError(f"benchmark parquet {path} has no 'text' column")
        cols = ["doc_id", "text"] if "doc_id" in schema_names else ["text"]
        ds = rd.read_parquet(path, columns=cols)
        if "doc_id" not in schema_names:
            # the id only names rows inside the gram explode; ordinals per
            # block are fine (grams are deduped into one frozenset anyway)
            ds = ds.map_batches(
                lambda t: t.append_column(
                    "doc_id", pa.array(np.arange(len(t)), pa.int64())
                ),
                batch_format="pyarrow",
            )
        return ds
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(lines)), pa.int64()),
                "text": pa.array(lines, pa.string()),
            }
        )
    )


def curation_funnel(
    sf_dir: str,
    flags_path: str | None = None,
    benchmark_path: str | None = None,
):
    """END-TO-END training-data curation funnel — exact dedup (min-id
    winner per content hash) -> Gopher quality gate -> benchmark
    decontamination (broadcast 5-gram set; the benchmark set is either a
    user-supplied file via ``benchmark_path`` — parquet with a ``text``
    column, or plain text one-entry-per-line — or the synthetic
    ``doc_id % 19 == 0`` half used by the SQL oracle) -> quality-ordered
    30% token-budget selection.
    Emits per-stage surviving (n_docs, n_tokens) — the funnel audit
    every curation run reports.

    Scale shape (one corpus pass, zero corpus-scale materialization —
    the stages are INDEPENDENT per-doc flags, so they compose into one
    map instead of three filtered cuts):

    - ONE streaming pass over the raw text computes every per-doc
      signal (token count, quality score, gopher keep flag,
      contamination flag vs the broadcast gram set, content hash) and
      then DROPS the text — texts never shuffle and never pin;
    - the dedup winner flag is the only exchange, over the slim
      (hash, id, flags) rows bucketed 256 ways;
    - the slim flag table lands in partitioned parquet (``flags_path``;
      a temp dir by default) — the production resume point, ~48 bytes
      per doc.  Every funnel count is then an aggregate over the flag
      table: a map-side partial histogram on the bounded key
      (winner, gopher, contaminated, score<=1000) — <= 8008 rows leave
      any block — and a driver-side cumulative walk reproduces the
      token-budget threshold (stages/selection.py semantics) with only
      the single cutoff-score group ever needing per-doc resolution
      (pack_sequences prefix over that one group, read back from the
      flag parquet with predicate pushdown).

    Oracle: the identical stages chained as SQL CTEs (GROUP BY text
    winners, the gopher flag algebra, the exploded-gram semi-join, the
    SUM() OVER budget prefix)."""
    import shutil
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.decontam import ContaminationFlagger, benchmark_gram_refs
    from ..stages.dedup import _stable_hash
    from ..stages.packing import pack_sequences
    from ..stages.text_stats import gopher_gate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        # ONE tokenization pass: gopher_gate's raw signals feed the
        # quality score too (stopword milli-ratio over the same
        # whitespace tokens)
        gg = gopher_gate(t, return_signals=True)
        n_tokens = gg["n_tokens"].to_numpy(zero_copy_only=False)
        n_stop = gg["n_stop"].to_numpy(zero_copy_only=False)
        score = np.where(
            n_tokens > 0,
            np.floor(1000.0 * n_stop / np.maximum(n_tokens, 1) + 0.5).astype(np.int64),
            0,
        )
        h = _stable_hash(t["text"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pcc.cast(t["doc_id"], pa.int64()),
                "text": t["text"],
                "n_tokens": pcc.cast(gg["n_tokens"], pa.int64()),
                "score": pa.array(score),
                "gopher": gg["keep"],
                "__h": pa.array(h),
                "__b": pa.array((h % 256).astype(np.int64)),
            }
        )

    if benchmark_path is not None:
        bench = _load_benchmark_table(benchmark_path)
    else:

        def is_bench(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % DECONTAM_BENCH_MOD == 0))

        bench = docs.map_batches(is_bench, batch_format="pyarrow")
    gram_ref = benchmark_gram_refs(bench, n=5)

    # the single text-bearing pass: signals + flags, then text is gone
    flagged = docs.map_batches(stats, batch_format="pyarrow").map_batches(
        ContaminationFlagger,
        fn_constructor_kwargs={"gram_set_ref": gram_ref, "n": 5},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def mark_winner(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__h", "doc_id"], kind="mergesort", ignore_index=True)
        df["winner"] = df["__h"].ne(df["__h"].shift()).astype(np.int64)
        return df.drop(columns=["__h", "__b"])

    slim = flagged.groupby("__b").map_groups(mark_winner, batch_format="pandas")

    tmp = flags_path or tempfile.mkdtemp(prefix="curation_flags_", dir="/tmp")
    try:
        slim.write_parquet(tmp)
        cols = ["doc_id", "n_tokens", "score", "gopher", "contaminated", "winner"]
        keys = ["winner", "gopher", "contaminated", "score"]
        spill_bytes = sum(
            os.path.getsize(os.path.join(tmp, f))
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        driver_side = spill_bytes <= CURATION_DRIVER_FLAGS_BYTES
        fdf = None
        if driver_side:
            # small spill: one pyarrow read + pandas groupby instead of
            # two more Ray executions over a tiny table
            import pyarrow.parquet as _pq

            fdf = _pq.read_table(tmp, columns=cols).to_pandas()
            hist = fdf.groupby(keys, as_index=False).agg(
                n=("doc_id", "size"), tok=("n_tokens", "sum")
            )
            for c in ("n", "tok"):
                hist[c] = hist[c].astype(np.int64)
        else:
            flags = rd.read_parquet(tmp, columns=cols)

            def part_hist(df: pd.DataFrame) -> pd.DataFrame:
                g = df.groupby(keys, as_index=False, sort=False).agg(
                    n=("doc_id", "size"), tok=("n_tokens", "sum")
                )
                for c in ("n", "tok"):
                    g[c] = g[c].astype(np.int64)
                return g

            hist = (
                flags.map_batches(part_hist, batch_format="pandas")
                .groupby(keys)
                .aggregate(Sum("n", alias_name="n"), Sum("tok", alias_name="tok"))
                .to_pandas()
            )

        def tot(mask) -> tuple:
            sub = hist[mask]
            return int(sub["n"].sum()), int(sub["tok"].sum())

        all_n, all_tok = tot(np.ones(len(hist), dtype=bool))
        w = hist["winner"].to_numpy() == 1
        g = hist["gopher"].to_numpy() == 1
        c = hist["contaminated"].to_numpy() == 0
        s1_n, s1_tok = tot(w)
        s2_n, s2_tok = tot(w & g)
        s3_n, s3_tok = tot(w & g & c)

        # token-budget stage from the s3 score histogram (same math as
        # stages/selection.py::token_budget_select, driver-side walk)
        h3 = (
            hist[w & g & c]
            .groupby("score", as_index=False)
            .agg(n=("n", "sum"), tok=("tok", "sum"))
            .sort_values("score", ascending=False, ignore_index=True)
        )
        toks = h3["tok"].to_numpy(dtype=np.int64)
        ns = h3["n"].to_numpy(dtype=np.int64)
        budget = s3_tok * TOKEN_BUDGET_NUM // TOKEN_BUDGET_DEN
        cum = np.cumsum(toks) if len(toks) else np.empty(0, np.int64)
        over = np.flatnonzero(cum > budget)
        if len(over) == 0:  # everything fits
            s4_n, s4_tok = s3_n, s3_tok
        else:
            cut_i = int(over[0])
            cutoff = int(h3["score"].iloc[cut_i])
            s4_n = int(ns[:cut_i].sum())
            s4_tok = int(cum[cut_i - 1]) if cut_i > 0 else 0
            remaining = budget - s4_tok
            if remaining > 0:
                # only the cutoff-score group needs per-doc resolution
                cut_rows = int(ns[cut_i])  # exact, from the histogram
                if driver_side or cut_rows <= CURATION_DRIVER_CUT_ROWS:
                    # one score group is usually tiny — resolve the
                    # prefix on the driver (same shortcut-size rule as
                    # the dedup banding tail); reuse the in-memory frame
                    # when the whole spill already lives on the driver
                    if fdf is not None:
                        m = (
                            (fdf["winner"] == 1)
                            & (fdf["gopher"] == 1)
                            & (fdf["contaminated"] == 0)
                            & (fdf["score"] == cutoff)
                        )
                        cdf = fdf.loc[m, ["doc_id", "n_tokens"]].sort_values(
                            "doc_id", ignore_index=True
                        )
                    else:
                        cdf = (
                            flags.filter(
                                expr=(
                                    "winner == 1 and gopher == 1 and "
                                    f"contaminated == 0 and score == {cutoff}"
                                )
                            )
                            .select_columns(["doc_id", "n_tokens"])
                            .to_pandas()
                            .sort_values("doc_id", ignore_index=True)
                        )
                    ntok = cdf["n_tokens"].to_numpy(dtype=np.int64)
                    start = np.concatenate([[0], np.cumsum(ntok)[:-1]])
                    keep = start + ntok <= remaining
                    s4_n += int(keep.sum())
                    s4_tok += int(ntok[keep].sum())
                else:  # distributed ordered prefix over just this group
                    cut = flags.filter(
                        expr=(
                            "winner == 1 and gopher == 1 and contaminated == 0 "
                            f"and score == {cutoff}"
                        )
                    ).select_columns(["doc_id", "n_tokens"])
                    packed = pack_sequences(cut, budget=max(remaining, 1))

                    def keep_counts(t: pa.Table) -> pa.Table:
                        start = t["start_tok"].to_numpy(zero_copy_only=False)
                        ntok = t["n_tokens"].to_numpy(zero_copy_only=False)
                        keep = start + ntok <= remaining
                        return pa.table(
                            {
                                "n": pa.array([int(keep.sum())], pa.int64()),
                                "tok": pa.array([int(ntok[keep].sum())], pa.int64()),
                            }
                        )

                    agg = packed.map_batches(
                        keep_counts, batch_format="pyarrow"
                    ).aggregate(Sum("n", alias_name="n"), Sum("tok", alias_name="tok"))
                    s4_n += int(agg["n"] or 0)
                    s4_tok += int(agg["tok"] or 0)
    finally:
        if flags_path is None:
            shutil.rmtree(tmp, ignore_errors=True)

    rows = [
        (all_n, all_tok),
        (s1_n, s1_tok),
        (s2_n, s2_tok),
        (s3_n, s3_tok),
        (s4_n, s4_tok),
    ]
    return pa.table(
        {
            "stage_ord": pa.array(range(len(CURATION_STAGES)), pa.int64()),
            "stage": pa.array(list(CURATION_STAGES), pa.string()),
            "n_docs": pa.array([n for n, _ in rows], pa.int64()),
            "n_tokens": pa.array([t for _, t in rows], pa.int64()),
        }
    )


ATTR_WINDOW_S = 7 * 86400  # attribution lookback
ATTR_TOUCH_TYPES = ("view", "click")


def linear_attribution(sf_dir: str):
    """Multi-touch LINEAR attribution: every ``purchase`` splits 1000
    milli-credits equally over the same user's ``view``/``click``
    touches in the preceding 7 days (inclusive of the purchase instant);
    output = total credit and touch count per touch type.  Purchases
    with no touches contribute nothing.  One user-keyed exchange of
    pre-filtered (ts, type) triples; per-user work is two sorted
    searchsorteds (window edges) + a type cumsum — no pairwise join
    materializes.  Credit is ``1000 // n`` per touch (integer floor on
    both sides), so sums are exact."""
    from ray.data.aggregate import Sum

    types = (ATTR_TOUCH_TYPES[0], ATTR_TOUCH_TYPES[1], FUNNEL_TO)
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    ds = ds.filter(expr=" or ".join(f"event_type == '{t}'" for t in types))

    def pergroup(df: pd.DataFrame) -> pd.DataFrame:
        tus = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        order = np.argsort(tus, kind="mergesort")
        tus, et = tus[order], et[order]
        is_touch = et != FUNNEL_TO
        t_ts = tus[is_touch]
        t_ty = et[is_touch]
        p_ts = tus[~is_touch]
        if len(p_ts) == 0 or len(t_ts) == 0:
            return pd.DataFrame(
                {"touch_type": pd.Series([], dtype=object),
                 "credit_milli": pd.Series([], dtype=np.int64),
                 "n_touches": pd.Series([], dtype=np.int64)}
            )
        # per-type cumulative touch counts along the sorted touch axis
        cums = {
            ty: np.concatenate([[0], np.cumsum(t_ty == ty)]) for ty in ATTR_TOUCH_TYPES
        }
        lo = np.searchsorted(t_ts, p_ts - ATTR_WINDOW_S * 1_000_000, side="left")
        hi = np.searchsorted(t_ts, p_ts, side="right")
        out_ty, out_cr, out_n = [], [], []
        counts = {ty: cums[ty][hi] - cums[ty][lo] for ty in ATTR_TOUCH_TYPES}
        total = sum(counts.values())
        ok = total > 0
        per = np.zeros(len(p_ts), dtype=np.int64)
        per[ok] = 1000 // total[ok]
        for ty in ATTR_TOUCH_TYPES:
            out_ty.append(ty)
            out_cr.append(int((per * counts[ty]).sum()))
            out_n.append(int(counts[ty].sum()))
        return pd.DataFrame(
            {"touch_type": out_ty,
             "credit_milli": np.asarray(out_cr, np.int64),
             "n_touches": np.asarray(out_n, np.int64)}
        )

    out = (
        ds.groupby("user_id")
        .map_groups(pergroup, batch_format="pandas")
        .groupby("touch_type")
        .aggregate(
            Sum("credit_milli", alias_name="credit_milli"),
            Sum("n_touches", alias_name="n_touches"),
        )
        .to_pandas()
        .sort_values("touch_type", ignore_index=True)
    )
    return pa.table(
        {
            "touch_type": pa.array(out["touch_type"], pa.string()),
            "credit_milli": pa.array(out["credit_milli"].to_numpy(np.int64)),
            "n_touches": pa.array(out["n_touches"].to_numpy(np.int64)),
        }
    )


CATEGORIZE_TOP = 20
CATEGORIZE_TOKENS = 5


def categorize_text_docs(sf_dir: str):
    """ES ``categorize_text`` aggregation (log-template clustering, the
    drain-style shape): every document collapses to a template — its
    first ``CATEGORIZE_TOKENS`` whitespace tokens with digit runs
    masked to ``#`` — then templates count-fold to the
    top-``CATEGORIZE_TOP`` buckets (count desc, template asc).  Two
    vectorized RE2 kernels per batch + map-side pre-aggregation —
    raw texts never shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        masked = pcc.replace_substring_regex(
            pcc.fill_null(t["text"], ""), r"\d+", "#"
        )
        toks = pcc.split_pattern_regex(masked, r"\s+")
        tpl = pcc.binary_join(
            pcc.list_slice(toks, 0, CATEGORIZE_TOKENS), " "
        )
        g = (
            pd.DataFrame({"template": tpl.to_pandas()})
            .groupby("template", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.table(
            {"template": pa.array(g["template"], pa.string()),
             "n": pa.array(g["n"].to_numpy(np.int64))}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("template")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "template"], ascending=[False, True], ignore_index=True)
        .head(CATEGORIZE_TOP)
    )
    return pa.table(
        {
            "template": pa.array(out["template"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


MOVING_PCT_QS = (0.5, 0.9)


def moving_percentiles_daily(sf_dir: str):
    """ES ``moving_percentiles`` pipeline aggregation: trailing-7-day
    p50/p90 of DAILY ORDER REVENUE (cents) over the zero-filled daily
    date_histogram — full windows only.  The distributed pass is the
    bounded day-keyed cents fold; the driver computes each window's
    nearest-rank percentile (``max(1, ceil(q*N))``, DuckDB
    ``quantile_disc`` semantics — integer cents, so both sides are
    exact) with one vectorized sliding-window sort."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[s]").astype(np.int64) // 86400
        )
        cents = _cents_col(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"day": day, "rev": cents})
            .groupby("day", as_index=False)["rev"].sum()
        )
        return pa.table(
            {"day": pa.array(g["day"].to_numpy(np.int64)),
             "rev": pa.array(g["rev"].to_numpy(np.int64))}
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    axis = np.arange(lo, hi + 1, dtype=np.int64)
    dense = np.zeros(len(axis), dtype=np.int64)
    dense[daily["day"].to_numpy(np.int64) - lo] = daily["rev"].to_numpy(np.int64)
    w = MOVING_WINDOW
    idx = np.arange(w, len(axis))
    win = np.sort(np.lib.stride_tricks.sliding_window_view(dense, w), axis=1)[1:]
    cols = {"day": pa.array(axis[idx]), "rev": pa.array(dense[idx])}
    for q in MOVING_PCT_QS:
        rank = max(1, int(np.ceil(q * w)))  # 1-indexed nearest rank
        cols[f"p{int(q * 100)}_cents"] = pa.array(win[:, rank - 1])
    return pa.table(cols)


# ---------------------------------------------------------------- geo
# Deterministic synthetic coordinates derived from c_custkey with two
# Knuth/xxhash odd-multiplier mixes — both engines evaluate the SAME
# integer expressions, so the coordinates agree exactly and no external
# geo data is needed.  The distance/geohash math then uses identical
# double expression trees (libm sin/cos/asin on both sides).
GEO_MIX_LAT = 2654435761  # Knuth multiplicative hash constant
GEO_MIX_LON = 2246822519  # xxhash PRIME32_2
GEO_MOD = 1 << 32
GEO_ORIGIN = (48.8566, 2.3522)  # fixed query origin (Paris)
GEO_RINGS_KM = (2000, 5000, 10000)  # ring edges; last ring is open
GEO_EARTH_R_KM = 6371.0
GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_PRECISION = 5  # 25 bits: 13 lon + 12 lat
GEOHASH_TOP = 20


def _geo_latlon(custkey: np.ndarray) -> tuple:
    """(lat, lon) doubles from the integer mixes (same exprs as SQL)."""
    k = custkey.astype(np.int64)
    h1 = (k * GEO_MIX_LAT) % GEO_MOD
    h2 = (k * GEO_MIX_LON) % GEO_MOD
    lat = -90.0 + 180.0 * (h1.astype(np.float64) / float(GEO_MOD))
    lon = -180.0 + 360.0 * (h2.astype(np.float64) / float(GEO_MOD))
    return lat, lon


def geo_distance_rings(sf_dir: str):
    """ES ``geo_distance`` aggregation: customers bucketed by haversine
    distance from a fixed origin into concentric rings, with count and
    account-balance cents per ring.  Coordinates are derived from
    ``c_custkey`` by two integer hash mixes (exact on both sides); the
    haversine tree is one shared double expression, and the ring
    classification compares MICRO-ROUNDED distance integers, so the
    bucket decision is identical on both engines.  Map-side ring
    partials (<= 4 rows/block) -> tiny groupby — customer rows never
    shuffle."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    lat0, lon0 = GEO_ORIGIN
    cos_phi0 = math.cos(lat0 * (math.pi / 180.0))  # scalar, same on both sides

    def fn(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        lat, lon = _geo_latlon(k)
        phi = lat * (math.pi / 180.0)
        dphi = (lat - lat0) * (math.pi / 180.0)
        dlmb = (lon - lon0) * (math.pi / 180.0)
        a = (
            np.sin(dphi / 2.0) ** 2
            + cos_phi0 * np.cos(phi) * np.sin(dlmb / 2.0) ** 2
        )
        d_km = 2.0 * GEO_EARTH_R_KM * np.arcsin(np.sqrt(a))
        d_micro = _micro(d_km)
        ring = np.searchsorted(
            np.asarray([e * 1_000_000 for e in GEO_RINGS_KM], np.int64),
            d_micro,
            side="right",
        )
        cents = _cents_col(t["c_acctbal"]).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"ring": ring, "cents": cents})
            .groupby("ring", as_index=False)
            .agg(n=("cents", "size"), bal_cents=("cents", "sum"))
        )
        return pa.table(
            {
                "ring": pa.array(g["ring"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "bal_cents": pa.array(g["bal_cents"].to_numpy(np.int64)),
            }
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("ring")
        .aggregate(Sum("n", alias_name="n"), Sum("bal_cents", alias_name="bal_cents"))
        .to_pandas()
        .sort_values("ring", ignore_index=True)
    )
    return pa.table(
        {
            "ring": pa.array(out["ring"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "bal_cents": pa.array(out["bal_cents"].to_numpy(np.int64)),
        }
    )


def geohash_cells(sf_dir: str):
    """ES ``geohash_grid`` aggregation: precision-5 geohash cell per
    customer (true base-32 geohash bit interleave — 13 lon bits even
    positions, 12 lat bits odd, exactly the public algorithm), top
    cells by (count desc, cell asc).  The quantization and interleave
    are pure integer expressions mirrored in SQL; the float
    ``floor((lon+180)/360 * 2^13)`` quantizer is one shared double
    expression."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "customer", columns=["c_custkey"])

    def fn(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        lat, lon = _geo_latlon(k)
        qlon = np.minimum(
            np.floor((lon + 180.0) / 360.0 * (1 << 13)).astype(np.int64),
            (1 << 13) - 1,
        )
        qlat = np.minimum(
            np.floor((lat + 90.0) / 180.0 * (1 << 12)).astype(np.int64),
            (1 << 12) - 1,
        )
        # geohash bit order: msb first, lon first (even global positions)
        z = np.zeros(len(k), np.int64)
        for i in range(13):  # lon bit i (from msb) -> global bit 2i
            z |= ((qlon >> (12 - i)) & 1) << (24 - 2 * i)
        for i in range(12):  # lat bit i (from msb) -> global bit 2i+1
            z |= ((qlat >> (11 - i)) & 1) << (23 - 2 * i)
        alphabet = np.array(list(GEOHASH_BASE32))
        cells = np.full(len(k), "", dtype=f"<U{GEOHASH_PRECISION}")
        for c in range(GEOHASH_PRECISION):  # 5 vectorized char picks
            idx = (z >> (5 * (GEOHASH_PRECISION - 1 - c))) & 31
            cells = np.char.add(cells, alphabet[idx])
        g = (
            pd.DataFrame({"cell": cells})
            .groupby("cell", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.table(
            {
                "cell": pa.array(g["cell"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "cell"], ascending=[False, True], ignore_index=True)
        .head(GEOHASH_TOP)
    )
    return pa.table(
        {
            "cell": pa.array(out["cell"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


GEOTILE_ZOOM = 6  # 64x64 web-mercator tile grid
GEOTILE_LAT_MAX = 85.05112878  # ES geotile_grid's mercator latitude clamp


def geotile_cells(sf_dir: str):
    """ES ``geotile_grid`` aggregation: customers bucketed into web-
    mercator ``z/x/y`` map tiles at zoom 6, top tiles by (count desc,
    key asc).  The x tile is the same linear lon quantizer geohash
    uses; the y tile is the true mercator projection ``(1 -
    ln(tan(phi) + 1/cos(phi)) / pi) / 2 * 2^z`` with ES's +-85.05112878
    latitude clamp — written as ONE shared double expression tree on
    both sides (tan/cos/ln resolve to the same libm on this box, the
    geo_distance_rings precedent).  Map-side partials over a <= 4096-
    cell domain; customer rows never shuffle."""
    from ray.data.aggregate import Sum

    n_tiles = 1 << GEOTILE_ZOOM
    ds = _read(sf_dir, "customer", columns=["c_custkey"])

    def fn(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        lat, lon = _geo_latlon(k)
        latc = np.maximum(np.minimum(lat, GEOTILE_LAT_MAX), -GEOTILE_LAT_MAX)
        x = np.minimum(
            np.floor((lon + 180.0) / 360.0 * n_tiles).astype(np.int64),
            n_tiles - 1,
        )
        phi = latc * np.pi / 180.0
        y = (1.0 - np.log(np.tan(phi) + 1.0 / np.cos(phi)) / np.pi) / 2.0 * n_tiles
        y = np.maximum(
            np.minimum(np.floor(y).astype(np.int64), n_tiles - 1), 0
        )
        cells = np.char.add(
            np.char.add(f"{GEOTILE_ZOOM}/", x.astype(str)),
            np.char.add("/", y.astype(str)),
        )
        g = (
            pd.DataFrame({"cell": cells})
            .groupby("cell", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.table(
            {
                "cell": pa.array(g["cell"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "cell"], ascending=[False, True], ignore_index=True)
        .head(GEOHASH_TOP)
    )
    return pa.table(
        {
            "cell": pa.array(out["cell"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


def geo_bounds_centroid(sf_dir: str):
    """ES ``geo_bounds`` + ``geo_centroid`` aggregations per market
    segment: the bounding box (min/max lat/lon, micro-degrees) and the
    arithmetic centroid (sum of micro-degree ints // count — integer
    exact, no float summation order) of each segment's customers, over
    the same hash-derived deterministic coordinates the other geo
    operators use.  Map-side per-segment partials (6 ints each) -> tiny
    groupby."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def fn(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        lat, lon = _geo_latlon(k)
        lat_u, lon_u = _micro(lat), _micro(lon)
        df_ = pd.DataFrame(
            {"seg": t["c_mktsegment"].to_pandas(), "lat": lat_u, "lon": lon_u}
        )
        g = df_.groupby("seg", as_index=False).agg(
            n=("lat", "size"),
            lat_min=("lat", "min"), lat_max=("lat", "max"),
            lon_min=("lon", "min"), lon_max=("lon", "max"),
            lat_sum=("lat", "sum"), lon_sum=("lon", "sum"),
        )
        return pa.table(
            {
                "seg": pa.array(g["seg"], pa.string()),
                **{
                    c: pa.array(g[c].to_numpy(np.int64))
                    for c in ("n", "lat_min", "lat_max", "lon_min",
                              "lon_max", "lat_sum", "lon_sum")
                },
            }
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("seg")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("lat_min", alias_name="lat_min"),
            Max("lat_max", alias_name="lat_max"),
            Min("lon_min", alias_name="lon_min"),
            Max("lon_max", alias_name="lon_max"),
            Sum("lat_sum", alias_name="lat_sum"),
            Sum("lon_sum", alias_name="lon_sum"),
        )
        .to_pandas()
        .sort_values("seg", ignore_index=True)
    )
    n = out["n"].to_numpy(np.int64)

    # DuckDB's BIGINT // TRUNCATES toward zero on negatives (-7 // 2 = -3)
    # while numpy floor_divide floors — and micro-lat/lon sums go negative,
    # so mirror the truncating semantics exactly
    def trunc_div(s: np.ndarray, d: np.ndarray) -> np.ndarray:
        return np.sign(s) * (np.abs(s) // d)

    cen_lat = trunc_div(out["lat_sum"].to_numpy(np.int64), n)
    cen_lon = trunc_div(out["lon_sum"].to_numpy(np.int64), n)
    return pa.table(
        {
            "seg": pa.array(out["seg"], pa.string()),
            "n": pa.array(n),
            "lat_min": pa.array(out["lat_min"].to_numpy(np.int64)),
            "lat_max": pa.array(out["lat_max"].to_numpy(np.int64)),
            "lon_min": pa.array(out["lon_min"].to_numpy(np.int64)),
            "lon_max": pa.array(out["lon_max"].to_numpy(np.int64)),
            "cen_lat": pa.array(cen_lat.astype(np.int64)),
            "cen_lon": pa.array(cen_lon.astype(np.int64)),
        }
    )


# rank_eval (ES Ranking Evaluation API): precision@k / recall@k per query
# against a DERIVABLE judgment set — a doc is relevant iff its token set
# contains EVERY query token (boolean-AND qrels both engines can
# recompute; no external judgment file).
RANK_EVAL_K = 10


def rank_eval_pr(sf_dir: str):
    """ES rank_eval: P@10 and R@10 of the distributed BM25 run per
    query, qrels = docs containing all query tokens.  One corpus pass
    computes per-doc qrel membership for ALL queries at once (per-batch
    token-set masks -> tiny per-query partials); hits come from the
    already-rank-identity-proven engine top-k.  All ratios integer
    (milli = hits*1000 // denom)."""
    from ray.data.aggregate import Sum

    from ..functions.tokenizer import tokenize
    from .query import QueryEngine

    idx = _documents_index(sf_dir)
    engine = QueryEngine(idx, num_actors=2, pool=True)
    try:
        topk = {
            q: [h["doc_id"] for h in engine.search(q, limit=RANK_EVAL_K)]
            for q in NDCG_QUERIES
        }
    finally:
        engine.close()

    q_toks = {q: sorted(set(tokenize(q))) for q in NDCG_QUERIES}
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def qrel_pass(t: pa.Table) -> pa.Table:
        toks = tokenize_array(t["text"])
        flat = pcc.list_flatten(toks)
        parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        need = sorted({tm for ts in q_toks.values() for tm in ts})
        dfp = pd.DataFrame({"term": flat.to_pandas(), "d": parents})
        dfp = dfp[dfp["term"].isin(need)].drop_duplicates()
        n = len(t)
        has = {tm: np.zeros(n, dtype=bool) for tm in need}
        for tm, grp in dfp.groupby("term", sort=False):
            has[tm][grp["d"].to_numpy()] = True
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        rows_q, rows_rel, rows_hit = [], [], []
        for q, terms in q_toks.items():
            mask = np.ones(n, dtype=bool)
            for tm in terms:
                mask &= has[tm]
            rel_ids = doc_ids[mask]
            rows_q.append(q)
            rows_rel.append(int(mask.sum()))
            rows_hit.append(int(np.isin(rel_ids, topk[q]).sum()))
        return pa.table(
            {
                "query": pa.array(rows_q, pa.string()),
                "n_rel": pa.array(rows_rel, pa.int64()),
                "n_hit": pa.array(rows_hit, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(qrel_pass, batch_format="pyarrow")
        .groupby("query")
        .aggregate(Sum("n_rel", alias_name="n_rel"), Sum("n_hit", alias_name="n_hit"))
        .to_pandas()
        .sort_values("query", ignore_index=True)
    )
    n_rel = agg["n_rel"].to_numpy(np.int64)
    n_hit = agg["n_hit"].to_numpy(np.int64)
    p_milli = n_hit * 1000 // RANK_EVAL_K
    r_milli = np.where(n_rel > 0, n_hit * 1000 // np.maximum(n_rel, 1), 0)
    return pa.table(
        {
            "query": pa.array(agg["query"], pa.string()),
            "n_rel": pa.array(n_rel),
            "p_milli": pa.array(p_milli.astype(np.int64)),
            "r_milli": pa.array(r_milli.astype(np.int64)),
        }
    )


# has_child (ES join-field): rank PARENT orders by their matching
# lineitem children — score_mode=max over child revenue cents, child
# filter on quantity.
HAS_CHILD_MIN_QTY = 45
HAS_CHILD_TOP = 20


def has_child_orders(sf_dir: str):
    """ES ``has_child`` query (join field, ``score_mode=max``): parents
    (orders) ranked by the MAX matching child score — child = lineitem
    with ``l_quantity >= 45``, child score = revenue cents — plus the
    matching-children count, top 20 by (score desc, orderkey asc),
    enriched with the parent's priority via a point pushdown read (the
    J4 lookup shape).  Children pre-aggregate map-side per orderkey, so
    the exchange carries one row per (block, parent), never raw
    lineitems."""
    from ray.data.aggregate import Max, Sum

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def child_partials(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = qty >= HAS_CHILD_MIN_QTY
        if not keep.any():
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "score_cents": pa.array([], pa.int64()),
                    "n_children": pa.array([], pa.int64()),
                }
            )
        ep = _cents_col(t["l_extendedprice"]).to_numpy(zero_copy_only=False)[keep]
        dc = _cents_col(t["l_discount"]).to_numpy(zero_copy_only=False)[keep]
        # child score: revenue cents = floor(ep_cents*(100-disc_cents)/100)
        score = ep * (100 - dc) // 100
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        g = (
            pd.DataFrame({"k": ok, "s": score})
            .groupby("k", as_index=False)
            .agg(score_cents=("s", "max"), n_children=("s", "size"))
        )
        return pa.table(
            {
                "o_orderkey": pa.array(g["k"].to_numpy(np.int64)),
                "score_cents": pa.array(g["score_cents"].to_numpy(np.int64)),
                "n_children": pa.array(g["n_children"].to_numpy(np.int64)),
            }
        )

    def block_topk(t: pa.Table) -> pa.Table:
        sc = t["score_cents"].to_numpy(zero_copy_only=False)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -sc))[:HAS_CHILD_TOP]
        return t.take(pa.array(order))

    # per-block top-k partials after the aggregate: the driver merges
    # blocks x k candidate rows, never the full sf-proportional parent
    # table (orders_top_with_ties threshold pattern)
    parents = (
        li.map_batches(child_partials, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(
            Max("score_cents", alias_name="score_cents"),
            Sum("n_children", alias_name="n_children"),
        )
        .map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(
            ["score_cents", "o_orderkey"], ascending=[False, True], ignore_index=True
        )
        .head(HAS_CHILD_TOP)
    )
    keys = parents["o_orderkey"].tolist()
    prio = (
        pads.dataset(os.path.join(sf_dir, "orders.parquet"), format="parquet")
        .to_table(
            columns=["o_orderkey", "o_orderpriority"],
            filter=pads.field("o_orderkey").isin(keys),
        )
        .to_pandas()
        .set_index("o_orderkey")["o_orderpriority"]
    )
    return pa.table(
        {
            "o_orderkey": pa.array(parents["o_orderkey"].to_numpy(np.int64)),
            "score_cents": pa.array(parents["score_cents"].to_numpy(np.int64)),
            "n_children": pa.array(parents["n_children"].to_numpy(np.int64)),
            "o_orderpriority": pa.array(
                [prio.get(k) for k in keys], pa.string()
            ),
        }
    )


def _curation_sql() -> str:
    stop_list = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    gram5 = "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]"
    return f"""
        WITH bstat AS (
          SELECT doc_id, text, toks,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CASE WHEN len(toks) > 0
                      THEN CAST(floor(1000.0 *
                             len(list_filter(toks, x -> lower(x) IN ({stop_list})))
                             / len(toks) + 0.5) AS BIGINT)
                      ELSE 0 END AS score
          FROM (SELECT doc_id, text,
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> length(x) > 0) AS toks
                FROM documents)),
        win AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
        s1 AS (SELECT b.* FROM bstat b JOIN win USING (doc_id)),
        tstats AS (
          SELECT doc_id, n_tokens,
                 CAST(length(array_to_string(toks, '')) AS BIGINT) AS tok_len_sum,
                 CAST(len(list_filter(toks, x -> lower(x) IN ({stop_list})))
                      AS BIGINT) AS n_stop
          FROM s1),
        lc AS (
          SELECT doc_id, line, count(*) AS cnt, length(line) AS len
          FROM (SELECT doc_id, unnest(str_split(text, chr(10))) AS line FROM s1)
          GROUP BY doc_id, line),
        lagg AS (
          SELECT doc_id, CAST(sum((cnt-1)*len) AS BIGINT) AS dup_line_chars,
                 CAST(sum(cnt*len) AS BIGINT) AS line_chars
          FROM lc GROUP BY doc_id),
        bagg AS (
          SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
                 CAST(max(cnt) AS BIGINT) AS top_bigram_n
          FROM (SELECT doc_id, bigram, count(*) AS cnt
                FROM (SELECT s.doc_id, s.toks[i] || ' ' || s.toks[i+1] AS bigram
                      FROM s1 s, unnest(generate_series(1, len(s.toks)-1)) AS g(i)
                      WHERE len(s.toks) >= 2)
                GROUP BY doc_id, bigram)
          GROUP BY doc_id),
        keepers AS (
          SELECT t.doc_id FROM tstats t
          JOIN lagg l ON l.doc_id = t.doc_id
          LEFT JOIN bagg b ON b.doc_id = t.doc_id
          WHERE t.n_tokens BETWEEN 20 AND 5000
            AND 4 * t.n_tokens <= t.tok_len_sum
            AND t.tok_len_sum <= 12 * t.n_tokens
            AND t.n_stop >= 2
            AND 100 * l.dup_line_chars <= 30 * l.line_chars
            AND (COALESCE(b.n_bigrams, 0) = 0
                 OR 100 * b.top_bigram_n <= 18 * b.n_bigrams)),
        s2 AS (SELECT s1.* FROM s1 JOIN keepers USING (doc_id)),
        bgrams AS (
          SELECT DISTINCT {gram5} AS gram
          FROM (SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> length(x) > 0) AS t
                FROM documents
                WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
               UNNEST(range(1, len(t) - 3)) AS u(i)
          WHERE len(t) >= 5),
        dirty AS (
          SELECT DISTINCT doc_id
          FROM (SELECT doc_id, {gram5} AS gram
                FROM (SELECT doc_id,
                             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                         x -> length(x) > 0) AS t
                      FROM s2),
                     UNNEST(range(1, len(t) - 3)) AS u(i)
                WHERE len(t) >= 5)
          WHERE gram IN (SELECT gram FROM bgrams)),
        s3 AS (SELECT s2.* FROM s2 LEFT JOIN dirty USING (doc_id)
               WHERE dirty.doc_id IS NULL),
        bgt AS (SELECT CAST(sum(n_tokens) AS BIGINT) * {TOKEN_BUDGET_NUM}
                  // {TOKEN_BUDGET_DEN} AS budget FROM s3),
        cum AS (SELECT doc_id, n_tokens,
                       sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                                           ROWS UNBOUNDED PRECEDING) AS c
                FROM s3),
        s4 AS (SELECT doc_id, n_tokens FROM cum, bgt WHERE c <= budget)
        SELECT CAST(0 AS BIGINT) AS stage_ord, 'all' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM bstat
        UNION ALL SELECT 1, 'dedup', CAST(count(*) AS BIGINT),
               CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) FROM s1
        UNION ALL SELECT 2, 'gopher', CAST(count(*) AS BIGINT),
               CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) FROM s2
        UNION ALL SELECT 3, 'decontam', CAST(count(*) AS BIGINT),
               CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) FROM s3
        UNION ALL SELECT 4, 'budget', CAST(count(*) AS BIGINT),
               CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) FROM s4
        ORDER BY stage_ord
    """


def _geo_latlon_sql() -> str:
    """SQL twin of ``_geo_latlon`` (same integer mixes, same doubles)."""
    return f"""
      SELECT c_custkey,
             -90.0 + 180.0 * (CAST((c_custkey * {GEO_MIX_LAT}) % {GEO_MOD}
                 AS DOUBLE) / {float(GEO_MOD)!r}) AS lat,
             -180.0 + 360.0 * (CAST((c_custkey * {GEO_MIX_LON}) % {GEO_MOD}
                 AS DOUBLE) / {float(GEO_MOD)!r}) AS lon,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer"""


def _geo_rings_sql() -> str:
    import math

    lat0, lon0 = GEO_ORIGIN
    phi0 = lat0 * (math.pi / 180.0)
    cos_phi0 = math.cos(phi0)  # scalar precomputed on BOTH sides
    deg = math.pi / 180.0
    cases = " ".join(
        f"WHEN d_micro < {e * 1_000_000} THEN {i}"
        for i, e in enumerate(GEO_RINGS_KM)
    )
    return f"""
        WITH c AS ({_geo_latlon_sql()}),
        d AS (
          SELECT cents,
                 CAST(floor(2.0 * {GEO_EARTH_R_KM!r} * asin(sqrt(
                   pow(sin(((lat - {lat0!r}) * {deg!r}) / 2.0), 2)
                   + {cos_phi0!r} * cos(lat * {deg!r})
                     * pow(sin(((lon - {lon0!r}) * {deg!r}) / 2.0), 2)
                 )) * 1000000 + 0.5) AS BIGINT) AS d_micro
          FROM c)
        SELECT CAST(ring AS BIGINT) AS ring, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS bal_cents
        FROM (SELECT cents, CASE {cases} ELSE {len(GEO_RINGS_KM)} END AS ring
              FROM d)
        GROUP BY ring ORDER BY ring
    """


def _geohash_sql() -> str:
    interleave = " + ".join(
        [f"(((qlon >> {12 - i}) & 1) << {24 - 2 * i})" for i in range(13)]
        + [f"(((qlat >> {11 - i}) & 1) << {23 - 2 * i})" for i in range(12)]
    )
    chars = " || ".join(
        f"substr('{GEOHASH_BASE32}', CAST(((z >> {5 * (GEOHASH_PRECISION - 1 - c)}) & 31) AS INTEGER) + 1, 1)"
        for c in range(GEOHASH_PRECISION)
    )
    return f"""
        WITH c AS ({_geo_latlon_sql()}),
        q AS (
          SELECT least(CAST(floor((lon + 180.0) / 360.0 * {float(1 << 13)!r})
                       AS BIGINT), {(1 << 13) - 1}) AS qlon,
                 least(CAST(floor((lat + 90.0) / 180.0 * {float(1 << 12)!r})
                       AS BIGINT), {(1 << 12) - 1}) AS qlat
          FROM c),
        zc AS (SELECT CAST({interleave} AS BIGINT) AS z FROM q)
        SELECT cell, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT {chars} AS cell FROM zc)
        GROUP BY cell ORDER BY n DESC, cell ASC LIMIT {GEOHASH_TOP}
    """


def _geotile_sql() -> str:
    n = 1 << GEOTILE_ZOOM
    return f"""
        WITH c AS ({_geo_latlon_sql()}),
        m AS (SELECT greatest(least(lat, {GEOTILE_LAT_MAX!r}),
                              {-GEOTILE_LAT_MAX!r}) AS latc, lon FROM c),
        t AS (
          SELECT least(CAST(floor((lon + 180.0) / 360.0 * {float(n)!r})
                       AS BIGINT), {n - 1}) AS x,
                 greatest(least(CAST(floor(
                   (1.0 - ln(tan(latc * pi() / 180.0)
                             + 1.0 / cos(latc * pi() / 180.0)) / pi())
                   / 2.0 * {float(n)!r}) AS BIGINT), {n - 1}), 0) AS y
          FROM m)
        SELECT '{GEOTILE_ZOOM}/' || x || '/' || y AS cell,
               CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY cell ORDER BY n DESC, cell ASC LIMIT {GEOHASH_TOP}
    """


def _alpha_mix_sql() -> str:
    from ..stages.sampling import hash_u32_sql

    n, d = ALPHA_MIX_NUM, ALPHA_MIX_DEN
    return f"""
        WITH l AS (SELECT lang, doc_id,
                          {hash_u32_sql('doc_id')} AS h FROM documents),
        cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM l GROUP BY lang),
        w AS (SELECT lang, n,
                     CAST(floor(sqrt(n) * 1000000 + 0.5) AS BIGINT) AS wgt
              FROM cnt),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                       CAST(sum(wgt) AS BIGINT) AS ww FROM w),
        tgt AS (SELECT lang, n, wgt,
                       least(n, ((SELECT nn FROM tot) * {n} // {d})
                                * wgt // (SELECT ww FROM tot)) AS target
                FROM w),
        rk AS (SELECT lang, doc_id,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY h, doc_id) AS rn
               FROM l),
        sel AS (SELECT r.lang, r.doc_id
                FROM rk r JOIN tgt t ON t.lang = r.lang
                WHERE r.rn <= t.target),
        agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_sel,
                       CAST(sum(doc_id) AS BIGINT) AS id_sum
                FROM sel GROUP BY lang)
        SELECT t.lang, t.n AS n_in, t.wgt AS weight,
               CAST(t.target AS BIGINT) AS target,
               CAST(COALESCE(a.n_sel, 0) AS BIGINT) AS n_selected,
               CAST(COALESCE(a.id_sum, 0) AS BIGINT) AS sel_id_sum
        FROM tgt t LEFT JOIN agg a ON a.lang = t.lang
        ORDER BY t.lang
    """


def _rank_eval_sql() -> str:
    from ..functions.tokenizer import tokenize

    tok = _tok_sql("text")
    parts = []
    for q in NDCG_QUERIES:
        terms = ", ".join(f"'{t}'" for t in sorted(set(tokenize(q))))
        inner = bm25_sql(q, limit=RANK_EVAL_K)
        parts.append(
            f"""
            SELECT '{q}' AS query, nr.n_rel,
                   CAST(h.hits * 1000 // {RANK_EVAL_K} AS BIGINT) AS p_milli,
                   CAST(CASE WHEN nr.n_rel > 0 THEN h.hits * 1000 // nr.n_rel
                        ELSE 0 END AS BIGINT) AS r_milli
            FROM
              (SELECT CAST(count(*) AS BIGINT) AS n_rel
               FROM (SELECT {tok} AS toks FROM documents)
               WHERE list_has_all(toks, [{terms}])) nr,
              (SELECT CAST(count(*) AS BIGINT) AS hits
               FROM ({inner}) r
               JOIN (SELECT doc_id, {tok} AS toks FROM documents) t
                 ON t.doc_id = r.doc_id
               WHERE list_has_all(t.toks, [{terms}])) h
            """
        )
    return " UNION ALL ".join(parts)


def build_oracle_sql() -> Dict[str, str]:
    tok = _tok_sql("text")
    stop_list = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    # cdc_upsert (generic merge) and cdc_incremental_agg (delta-maintained
    # view) must land on the same final state: one full-recompute oracle
    cdc_final_sql = f"""
            WITH final AS (
              SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 10 NOT IN (0, 1, 2)
              UNION ALL
              SELECT doc_id, lang, n_chars + {CDC_UPDATE_DELTA} FROM documents
              WHERE doc_id % 10 IN (1, 2)
              UNION ALL
              SELECT doc_id + {CDC_INSERT_OFFSET}, lang, n_chars FROM documents
              WHERE doc_id % 10 = 3)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM final GROUP BY lang ORDER BY lang
        """
    return {
        "cdc_incremental_agg": cdc_final_sql,
        "tokenize_counts": f"SELECT doc_id, CAST(len({tok}) AS BIGINT) AS n_tokens FROM documents",
        "term_df_top100": f"""
            WITH tok AS (SELECT doc_id, {tok} AS toks FROM documents),
            pairs AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok)
            SELECT term, count(*) AS df FROM pairs GROUP BY term
            ORDER BY df DESC, term ASC LIMIT 100
        """,
        "significant_terms": f"""
            WITH tok AS (SELECT doc_id, lang, {tok} AS toks FROM documents),
            pairs AS (SELECT DISTINCT doc_id, lang, unnest(toks) AS term FROM tok),
            nn AS (
              SELECT count(*) AS n_docs,
                     count(*) FILTER (WHERE lang = '{SIGTERMS_FG_LANG}') AS n_fg
              FROM documents),
            d AS (
              SELECT term,
                     count(*) AS df_all,
                     count(*) FILTER (WHERE lang = '{SIGTERMS_FG_LANG}') AS df_fg
              FROM pairs GROUP BY term),
            cells AS (
              SELECT term, df_fg, df_all,
                     CAST(df_fg AS DOUBLE) AS a,
                     CAST(df_all - df_fg AS DOUBLE) AS b,
                     CAST(nn.n_fg - df_fg AS DOUBLE) AS c,
                     CAST(nn.n_docs - nn.n_fg - (df_all - df_fg) AS DOUBLE) AS dd,
                     CAST(nn.n_docs AS DOUBLE) AS n
              FROM d, nn
              WHERE df_fg > 0 AND df_fg * nn.n_docs > df_all * nn.n_fg),
            g AS (
              SELECT term,
                     CAST(df_fg AS BIGINT) AS df_fg,
                     CAST(df_all AS BIGINT) AS df_all,
                     CAST(floor(2 * (
                       CASE WHEN a > 0 THEN a * ln(a * n / ((a+b) * (a+c))) ELSE 0 END +
                       CASE WHEN b > 0 THEN b * ln(b * n / ((a+b) * (b+dd))) ELSE 0 END +
                       CASE WHEN c > 0 THEN c * ln(c * n / ((c+dd) * (a+c))) ELSE 0 END +
                       CASE WHEN dd > 0 THEN dd * ln(dd * n / ((c+dd) * (b+dd))) ELSE 0 END
                     ) * 1000 + 0.5) AS BIGINT) AS llr_milli
              FROM cells)
            SELECT term, df_fg, df_all, llr_milli FROM g
            ORDER BY llr_milli DESC, term ASC LIMIT {SIGTERMS_TOP_N}
        """,
        "vocab_set_ops": f"""
            WITH tok AS (SELECT doc_id, lang, {tok} AS toks FROM documents
                         WHERE lang IN ('{VOCABDIFF_FG_LANG}', '{VOCABDIFF_BG_LANG}')),
            pairs AS (SELECT DISTINCT doc_id, lang, unnest(toks) AS term FROM tok),
            d AS (SELECT term,
                         count(*) FILTER (WHERE lang = '{VOCABDIFF_FG_LANG}') AS df_fg,
                         count(*) FILTER (WHERE lang = '{VOCABDIFF_BG_LANG}') AS df_bg
                  FROM pairs GROUP BY 1)
            SELECT 'n_union' AS op, CAST(count(*) AS BIGINT) AS n FROM d
            UNION ALL SELECT 'n_intersect', count(*) FROM d WHERE df_fg > 0 AND df_bg > 0
            UNION ALL SELECT 'n_only_fg', count(*) FROM d WHERE df_fg > 0 AND df_bg = 0
            UNION ALL SELECT 'n_only_bg', count(*) FROM d WHERE df_bg > 0 AND df_fg = 0
            UNION ALL SELECT 'df_fg_shared', CAST(coalesce(sum(df_fg), 0) AS BIGINT)
                      FROM d WHERE df_fg > 0 AND df_bg > 0
            UNION ALL SELECT 'df_bg_shared', CAST(coalesce(sum(df_bg), 0) AS BIGINT)
                      FROM d WHERE df_fg > 0 AND df_bg > 0
        """,
        "wildcard_term_df": f"""
            WITH tok AS (SELECT doc_id, {tok} AS toks FROM documents),
            pairs AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok)
            SELECT term, count(*) AS df FROM pairs
            WHERE term LIKE '{WILDCARD_PATTERN.replace("*", "%").replace("?", "_")}'
            GROUP BY term ORDER BY df DESC, term ASC LIMIT 100
        """,
        "spell_suggest": f"""
            WITH tok AS (SELECT doc_id, {tok} AS toks FROM documents),
            pairs AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
            d AS (SELECT term, count(*) AS df FROM pairs GROUP BY term)
            SELECT term, df, CAST(levenshtein(term, '{SUGGEST_TERM}') AS BIGINT) AS dist
            FROM d WHERE levenshtein(term, '{SUGGEST_TERM}') <= 2
            ORDER BY dist, df DESC, term LIMIT 10
        """,
        "heavy_hitter_tokens": f"""
            WITH tok AS (SELECT {tok} AS toks FROM documents),
            flat AS (SELECT unnest(toks) AS term FROM tok),
            tot AS (SELECT count(*) AS n FROM flat)
            SELECT term, count(*) AS n_occurrences
            FROM flat, tot GROUP BY term, tot.n
            HAVING count(*) * 1000 > tot.n
            ORDER BY n_occurrences DESC, term ASC
        """,
        "bm25_topk": bm25_sql(BM25_QUERY, limit=20),
        # federation is score-identical to one union index by design, so
        # it shares the whole-corpus BM25 oracle
        "federated_search": bm25_sql(BM25_QUERY, limit=20),
        "bm25_explain": bm25_sql(EXPLAIN_QUERY, limit=EXPLAIN_K, explain=True),
        "bm25_boosting": bm25_sql(
            BOOSTING_POS, limit=20, micro_rank=True,
            demote_terms=_qtok(BOOSTING_NEG), demote_boost=BOOSTING_FACTOR,
        ),
        "q6_forecast_revenue": """
            SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * l_discount
                          * 100 + 0.5) AS BIGINT)), 0) AS BIGINT) AS revenue_c,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            WHERE l_shipdate >= DATE '1994-01-01'
              AND l_shipdate < DATE '1995-01-01'
              AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
              AND CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) < 2400
        """,
                        "bm25_common_terms": bm25_sql(
            CTQ_QUERY, limit=20, common_cutoff_milli=CTQ_CUTOFF_MILLI,
        ),
        "span_near": bm25_sql(
            f"{SPAN_NEAR_A} {SPAN_NEAR_B}", limit=20,
            span_near=(SPAN_NEAR_A, SPAN_NEAR_B, SPAN_NEAR_WINDOW),
        ),
        "span_containing": bm25_sql(
            f"{SPAN_CONT_A} {SPAN_CONT_B}", limit=20,
            span_containing=(SPAN_CONT_A, SPAN_CONT_B, SPAN_CONT_C,
                             SPAN_CONT_WIDTH),
        ),
        "span_within": bm25_sql(
            f"{SPAN_CONT_A} {SPAN_CONT_B}", limit=20,
            span_within=(SPAN_CONT_A, SPAN_CONT_B, SPAN_CONT_C,
                         SPAN_WITHIN_D, SPAN_WITHIN_WIDTH),
        ),
        "span_not": bm25_sql(
            SPAN_NOT_INCLUDE, limit=20,
            span_not=(SPAN_NOT_INCLUDE, SPAN_NOT_EXCLUDE, SPAN_NOT_DIST),
        ),
        "span_first": bm25_sql(
            SPAN_FIRST_TERM, limit=20,
            span_first=(SPAN_FIRST_TERM, SPAN_FIRST_N),
        ),
        "bm25_wildcard": bm25_sql(
            "", limit=20, wildcard=WILDCARD_SEARCH_PATTERN,
        ),
        "bm25_regexp": bm25_sql(
            "", limit=20, regexp=REGEXP_PATTERN, wildcard_max=REGEXP_MAX_EXP,
        ),
        "bm25_term_range": bm25_sql(
            "", limit=20, term_range=(TERM_RANGE_LO, TERM_RANGE_HI),
            wildcard_max=TERM_RANGE_MAX,
        ),
        "bm25_match_bool_prefix": bm25_sql(
            "window", limit=20, bool_prefix="s",
        ),
        "completion_suggest": f"""
            WITH tok AS (SELECT doc_id, {{tok}} AS l FROM documents),
            dfv AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                    FROM (SELECT DISTINCT doc_id, unnest(l) AS term FROM tok)
                    GROUP BY term)
            SELECT row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS rank,
                   term, df
            FROM dfv WHERE term LIKE '{COMPLETION_PREFIX}%'
            ORDER BY df DESC, term ASC LIMIT {COMPLETION_K}
        """.replace("{tok}", _tok_sql("text")),
        "bm25_top_hits": bm25_sql(
            EXPLAIN_QUERY, top_hits_k=TOP_HITS_K, top_hits_groups=10,
        ),
        "docs_sorted_top": """
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
            ORDER BY lang ASC, n_chars DESC, doc_id ASC LIMIT 100
        """,
        "bm25_msm": bm25_sql(BM25_QUERY, limit=20, min_match=MSM_K, micro_rank=True),
        "bm25_synonyms": bm25_sql(_expand_synonyms(SYN_QUERY), limit=20),
        "bm25_dismax": dismax_sql(DISMAX_CLAUSES, tie=DISMAX_TIE, limit=20),
        "basket_pairs": f"""
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pp AS (SELECT p1.l_partkey AS a, p2.l_partkey AS b,
                          CAST(count(*) AS BIGINT) AS n
                   FROM op p1 JOIN op p2
                     ON p1.l_orderkey = p2.l_orderkey
                    AND p1.l_partkey < p2.l_partkey
                   GROUP BY 1, 2)
            SELECT a AS part_a, b AS part_b, n FROM pp
            ORDER BY n DESC, a, b LIMIT {BASKET_TOP_N}
        """,
        "frequent_itemsets": f"""
            WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
                              event_type FROM events),
            nb AS (SELECT count(*) AS n FROM
                   (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)),
            s1 AS (SELECT event_type AS items, 1 AS set_size,
                          count(*) AS sup FROM b GROUP BY 1),
            s2 AS (SELECT a.event_type || '+' || c.event_type AS items,
                          2 AS set_size, count(*) AS sup
                   FROM b a JOIN b c ON a.user_id = c.user_id AND a.d = c.d
                                    AND a.event_type < c.event_type
                   GROUP BY 1),
            s3 AS (SELECT a.event_type || '+' || c.event_type || '+'
                          || e.event_type AS items, 3 AS set_size,
                          count(*) AS sup
                   FROM b a JOIN b c ON a.user_id = c.user_id AND a.d = c.d
                                    AND a.event_type < c.event_type
                        JOIN b e ON a.user_id = e.user_id AND a.d = e.d
                                AND c.event_type < e.event_type
                   GROUP BY 1),
            u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
                  UNION ALL SELECT * FROM s3)
            SELECT items, CAST(set_size AS BIGINT) AS set_size,
                   CAST(sup AS BIGINT) AS support
            FROM u, nb
            WHERE sup * {FIS_SUPPORT_DEN} >= {FIS_SUPPORT_NUM} * nb.n
            ORDER BY support DESC, items ASC
        """,
        "lang_id_confusion": f"""
            WITH pred AS ({_lang_id_sql().strip().rstrip()})
            SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY d.lang, p.lang_pred
            ORDER BY d.lang, p.lang_pred
        """,
        "wau_mau": f"""
            WITH p AS (SELECT DISTINCT user_id,
                              CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
                       FROM events),
            wks AS (SELECT DISTINCT wk FROM p),
            wau AS (SELECT wk, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
                    FROM p GROUP BY wk),
            mau AS (SELECT w.wk, CAST(count(DISTINCT p.user_id) AS BIGINT) AS mau
                    FROM wks w JOIN p
                      ON p.wk BETWEEN w.wk - {WAU_WINDOW_WEEKS - 1} AND w.wk
                    GROUP BY w.wk)
            SELECT w.wk AS week, wau.wau, mau.mau,
                   CAST(floor(CAST(wau.wau AS DOUBLE) / CAST(mau.mau AS DOUBLE)
                              * 10000 + 0.5) AS BIGINT) AS stickiness_bps
            FROM wks w JOIN wau USING (wk) JOIN mau ON mau.wk = w.wk
            ORDER BY week
        """,
        "customer_rfm": """
            WITH m AS (SELECT o_custkey AS c_custkey,
                              CAST(max(floor(epoch(o_orderdate) / 86400)) AS BIGINT) AS last_day,
                              CAST(count(*) AS BIGINT) AS frequency,
                              CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                                AS monetary_c
                       FROM orders GROUP BY 1),
            a AS (SELECT max(last_day) AS anchor FROM m)
            SELECT c_custkey, CAST(a.anchor - last_day AS BIGINT) AS recency_days,
                   frequency, monetary_c
            FROM m, a ORDER BY c_custkey
        """,
        "abc_analysis": """
            WITH u AS (SELECT user_id,
                              CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
                       FROM events GROUP BY 1),
            t AS (SELECT CAST(sum(v) AS BIGINT) AS total FROM u),
            c AS (SELECT user_id, v,
                         CAST(sum(v) OVER (ORDER BY v DESC, user_id ASC) AS BIGINT) AS cum
                  FROM u)
            SELECT CASE WHEN 10 * cum <= 8 * t.total THEN 'A'
                        WHEN 20 * cum <= 19 * t.total THEN 'B'
                        ELSE 'C' END AS cls,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(v) AS BIGINT) AS value_c
            FROM c, t GROUP BY 1 ORDER BY 1
        """,
        "bm25_fuzzy": bm25_sql(
            FUZZY_QUERY, limit=20, fuzzy_dist=FUZZY_DIST, fuzzy_max_exp=FUZZY_MAX_EXP
        ),
        "cdc_upsert": cdc_final_sql,
        "bm25_boosted": bm25_sql(_expand_boosts(BOOST_QUERY), limit=20),
        "user_value_twap": """
            WITH s AS (
              SELECT user_id,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS next_sec
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            a AS (
              SELECT user_id,
                     CAST(sum(cents * (next_sec - sec)) AS BIGINT) AS wsum,
                     CAST(max(sec) - min(sec) AS BIGINT) AS horizon_s
              FROM s GROUP BY user_id)
            SELECT user_id, horizon_s,
                   CAST(floor(CAST(wsum AS DOUBLE) / CAST(horizon_s AS DOUBLE)
                              * 10000 + 0.5) AS BIGINT) AS twap_micro
            FROM a WHERE horizon_s > 0 ORDER BY user_id
        """,
        "bm25_topk_wand": bm25_sql(BM25_QUERY, limit=20),
        "bm25_page2": bm25_sql(BM25_QUERY, limit=PAGE_SIZE, offset=PAGE_SIZE),
        "bm25_collapse": bm25_sql(BM25_QUERY, limit=3, collapse=True),
        "qld_topk": qld_sql(BM25_QUERY, limit=20),
        "bm25_topk_lang": bm25_sql(BM25_QUERY_FILTERED, limit=20, lang_filter="en"),
        "bm25_facets": bm25_sql(BM25_QUERY, facet=True),
        "bm25_count": f"""
            SELECT CAST(COALESCE(sum(n_docs), 0) AS BIGINT) AS n
            FROM ({bm25_sql(BM25_QUERY, facet=True)})
        """,
        "bm25_boolean": bm25_sql(
            BM25_QUERY, limit=20, required=["join"], excluded=["hash"]
        ),
        "more_like_this": bm25_sql("", limit=20, mlt_src=MLT_SRC_DOC),
        "bm25_rm3": bm25_rm3_sql(BM25_QUERY, RM3_FB_K, RM3_N_EXP, limit=20),
        "bm25_rescore": bm25_rescore_sql(
            RESCORE_QUERY, RESCORE_SECONDARY, RESCORE_WINDOW,
            RESCORE_QW, RESCORE_RW, limit=20,
        ),
        "multi_match_bm25f": multi_match_sql(MM_QUERY, limit=20),
        "combined_fields": combined_fields_sql(MM_QUERY, limit=20),
        "significant_text": significant_text_sql(
            SIGTEXT_QUERY, SIGTEXT_FG_K, SIGTEXT_TOP_N
        ),
        "snippet_windows": bm25_sql(BM25_QUERY, limit=20, snippet_window=SNIPPET_WINDOW),
        "phrase_positional": bm25_sql(PHRASE_POS_QUERY, limit=20, phrase_adjacent=True),
        "phrase_proximity": bm25_sql(
            PHRASE_PROX_QUERY, limit=20, phrase_adjacent=True, slop=PHRASE_PROX_SLOP
        ),
        "bm25_tombstone": bm25_sql(
            BM25_QUERY, limit=20, corpus_where=f"lang <> '{TOMBSTONE_LANG}'"
        ),
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "dedup_by_key": """
            SELECT lang, source, min(doc_id) AS doc_id, count(*) AS n
            FROM documents GROUP BY lang, source ORDER BY lang, source
        """,
        "lang_histogram": "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
        "doc_deciles": f"""
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(ntile({NTILE_TILES}) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
            FROM documents ORDER BY doc_id
        """,
        "length_histogram": f"""
            SELECT CAST(n_chars // {HIST_BUCKET_WIDTH} AS BIGINT) AS bucket,
                   count(*) AS n,
                   CAST(min(n_chars) AS BIGINT) AS lo,
                   CAST(max(n_chars) AS BIGINT) AS hi
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "lineitem_profile": " UNION ALL ".join(
            f"""
            SELECT '{c}' AS col_name, count(*) AS n,
                   count(*) - count({c}) AS n_null,
                   count(DISTINCT CAST(floor({c}*1000000 + 0.5) AS BIGINT)) AS n_distinct,
                   min(CAST(floor({c}*1000000 + 0.5) AS BIGINT)) AS min_micro,
                   max(CAST(floor({c}*1000000 + 0.5) AS BIGINT)) AS max_micro
            FROM lineitem
            """
            for c in PROFILE_COLS
        ),
        "nb_classify": r"""
            WITH tok AS (
              SELECT doc_id, source AS cls,
                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0) AS toks
              FROM documents
            ), flat AS (
              SELECT doc_id, cls, unnest(toks) AS term FROM tok
            ), ct AS (
              SELECT cls, term, count(*) AS tf FROM flat GROUP BY cls, term
            ), voc AS (
              SELECT count(DISTINCT term) AS v FROM flat
            ), tot AS (
              SELECT cls, count(*) AS toks FROM flat GROUP BY cls
            ), classes AS (
              SELECT DISTINCT source AS cls FROM documents
            ), prior AS (
              SELECT source AS cls,
                     CAST(floor(ln(count(*) * 1.0 / (SELECT count(*) FROM documents)) * 1000 + 0.5) AS BIGINT) AS prior_milli
              FROM documents GROUP BY source
            ), grid AS (
              SELECT t.term, c.cls,
                     CAST(floor(ln((COALESCE(ct.tf, 0) + 1.0) / (tot.toks + voc.v)) * 1000 + 0.5) AS BIGINT) AS ll_milli
              FROM (SELECT DISTINCT term FROM flat) t
              CROSS JOIN classes c
              JOIN tot ON tot.cls = c.cls
              CROSS JOIN voc
              LEFT JOIN ct ON ct.term = t.term AND ct.cls = c.cls
            ), doc_cls AS (
              SELECT f.doc_id, g.cls, CAST(sum(g.ll_milli) AS BIGINT) AS tok_sum
              FROM flat f JOIN grid g ON g.term = f.term
              GROUP BY f.doc_id, g.cls
            ), scored AS (
              SELECT d.doc_id, c.cls,
                     p.prior_milli + COALESCE(dc.tok_sum, 0) AS score
              FROM documents d
              CROSS JOIN classes c
              JOIN prior p ON p.cls = c.cls
              LEFT JOIN doc_cls dc ON dc.doc_id = d.doc_id AND dc.cls = c.cls
            )
            SELECT doc_id, cls AS pred, CAST(score AS BIGINT) AS score_milli FROM (
              SELECT doc_id, cls, score,
                     row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rn
              FROM scored) WHERE rn = 1 ORDER BY doc_id
        """,
        "lm_perplexity": r"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0) AS toks
              FROM documents
            ), pairs AS (
              SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
              FROM tok, unnest(generate_series(1, len(toks)-1)) AS g(i)
              WHERE len(toks) >= 2
            ), bgc AS (
              SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2
            ), lc AS (
              SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1
            ), voc AS (
              SELECT count(DISTINCT tok) AS v
              FROM (SELECT unnest(toks) AS tok FROM tok)
            ), scored AS (
              SELECT p.doc_id,
                     CAST(floor(ln((COALESCE(b.c2, 0) + 1.0) / (COALESCE(l.c1, 0) + voc.v)) * 1000 + 0.5) AS BIGINT) AS ll
              FROM pairs p
              LEFT JOIN bgc b ON p.w1 = b.w1 AND p.w2 = b.w2
              LEFT JOIN lc l ON p.w1 = l.w1
              CROSS JOIN voc
            ), agg AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
                     CAST(sum(ll) AS BIGINT) AS ll_milli
              FROM scored GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_pairs, 0) AS n_pairs,
                   COALESCE(a.ll_milli, 0) AS ll_milli
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
            ORDER BY d.doc_id
        """,
        "repetition_stats": r"""
            WITH lines AS (
              SELECT doc_id, unnest(str_split(text, chr(10))) AS line FROM documents
            ), lc AS (
              SELECT doc_id, line, count(*) AS cnt, length(line) AS len
              FROM lines GROUP BY doc_id, line
            ), lagg AS (
              SELECT doc_id,
                     CAST(sum(cnt) AS BIGINT) AS n_lines,
                     CAST(count(*) AS BIGINT) AS n_uniq_lines,
                     CAST(sum((cnt-1)*len) AS BIGINT) AS dup_line_chars,
                     CAST(sum(cnt*len) AS BIGINT) AS line_chars
              FROM lc GROUP BY doc_id
            ), tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS toks
              FROM documents
            ), bg AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
              FROM tok, unnest(generate_series(1, len(toks)-1)) AS g(i)
              WHERE len(toks) >= 2
            ), bgc AS (
              SELECT doc_id, bigram, count(*) AS cnt, length(bigram) AS len
              FROM bg GROUP BY doc_id, bigram
            ), bagg AS (
              SELECT doc_id,
                     CAST(sum(cnt) AS BIGINT) AS n_bigrams,
                     CAST(count(*) AS BIGINT) AS n_uniq_bigrams,
                     CAST(max(cnt) AS BIGINT) AS top_bigram_n
              FROM bgc GROUP BY doc_id
            ), btop AS (
              SELECT bgc.doc_id, CAST(max(bgc.len) AS BIGINT) AS top_bigram_len
              FROM bgc JOIN bagg ON bgc.doc_id = bagg.doc_id AND bgc.cnt = bagg.top_bigram_n
              GROUP BY bgc.doc_id
            )
            SELECT l.doc_id, l.n_lines, l.n_uniq_lines, l.dup_line_chars, l.line_chars,
                   COALESCE(b.n_bigrams, 0) AS n_bigrams,
                   COALESCE(b.n_uniq_bigrams, 0) AS n_uniq_bigrams,
                   COALESCE(b.top_bigram_n, 0) AS top_bigram_n,
                   COALESCE(t.top_bigram_len, 0) AS top_bigram_len
            FROM lagg l LEFT JOIN bagg b ON l.doc_id = b.doc_id
            LEFT JOIN btop t ON l.doc_id = t.doc_id
            ORDER BY l.doc_id
        """,
        "token_budget_select": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> length(x) > 0) AS toks
              FROM documents
            ), sc AS (
              SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     CASE WHEN len(toks) > 0
                          THEN CAST(floor(1000.0 *
                                 len(list_filter(toks, x -> lower(x) IN ({stop_list})))
                                 / len(toks) + 0.5) AS BIGINT)
                          ELSE 0 END AS score
              FROM tok
            ), b AS (
              SELECT CAST(sum(n_tokens) AS BIGINT) * {TOKEN_BUDGET_NUM}
                       // {TOKEN_BUDGET_DEN} AS budget
              FROM sc
            ), c AS (
              SELECT doc_id, score, n_tokens,
                     sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM sc
            )
            SELECT doc_id, score, n_tokens
            FROM c, b WHERE cum <= budget ORDER BY doc_id
        """,
        "gopher_gate": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> length(x) > 0) AS toks
              FROM documents
            ), tstats AS (
              SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     CAST(length(array_to_string(toks, '')) AS BIGINT) AS tok_len_sum,
                     CAST(len(list_filter(toks, x -> lower(x) IN ({stop_list})))
                          AS BIGINT) AS n_stop
              FROM tok
            ), lines AS (
              SELECT doc_id, unnest(str_split(text, chr(10))) AS line FROM documents
            ), lc AS (
              SELECT doc_id, line, count(*) AS cnt, length(line) AS len
              FROM lines GROUP BY doc_id, line
            ), lagg AS (
              SELECT doc_id,
                     CAST(sum((cnt-1)*len) AS BIGINT) AS dup_line_chars,
                     CAST(sum(cnt*len) AS BIGINT) AS line_chars
              FROM lc GROUP BY doc_id
            ), bg AS (
              SELECT t.doc_id, t.toks[i] || ' ' || t.toks[i+1] AS bigram
              FROM tok t, unnest(generate_series(1, len(t.toks)-1)) AS g(i)
              WHERE len(t.toks) >= 2
            ), bagg AS (
              SELECT doc_id,
                     CAST(sum(cnt) AS BIGINT) AS n_bigrams,
                     CAST(max(cnt) AS BIGINT) AS top_bigram_n
              FROM (SELECT doc_id, bigram, count(*) AS cnt
                    FROM bg GROUP BY doc_id, bigram) GROUP BY doc_id
            ), flags AS (
              SELECT t.doc_id, t.n_tokens,
                     CASE WHEN t.n_tokens BETWEEN 20 AND 5000 THEN 1 ELSE 0 END AS f_words,
                     CASE WHEN 4 * t.n_tokens <= t.tok_len_sum
                           AND t.tok_len_sum <= 12 * t.n_tokens THEN 1 ELSE 0 END AS f_wordlen,
                     CASE WHEN t.n_stop >= 2 THEN 1 ELSE 0 END AS f_stop,
                     CASE WHEN 100 * l.dup_line_chars <= 30 * l.line_chars
                          THEN 1 ELSE 0 END AS f_dupline,
                     CASE WHEN COALESCE(b.n_bigrams, 0) = 0
                            OR 100 * b.top_bigram_n <= 18 * b.n_bigrams
                          THEN 1 ELSE 0 END AS f_bigram
              FROM tstats t
              JOIN lagg l ON l.doc_id = t.doc_id
              LEFT JOIN bagg b ON b.doc_id = t.doc_id
            )
            SELECT doc_id, n_tokens,
                   CAST(f_words AS BIGINT) AS f_words,
                   CAST(f_wordlen AS BIGINT) AS f_wordlen,
                   CAST(f_stop AS BIGINT) AS f_stop,
                   CAST(f_dupline AS BIGINT) AS f_dupline,
                   CAST(f_bigram AS BIGINT) AS f_bigram,
                   CAST(f_words * f_wordlen * f_stop * f_dupline * f_bigram
                        AS BIGINT) AS keep
            FROM flags ORDER BY doc_id
        """,
        "substring_search": f"""
            SELECT doc_id FROM documents
            WHERE contains(text, '{SUBSTRING_NEEDLE}') ORDER BY doc_id
        """,
        "regex_search": f"""
            SELECT doc_id FROM documents
            WHERE regexp_matches(text, '{REGEX_PATTERN}') ORDER BY doc_id
        """,
        "substring_search_nocase": f"""
            SELECT doc_id FROM documents
            WHERE regexp_matches(text, '{NOCASE_NEEDLE}', 'i') ORDER BY doc_id
        """,
        "grep_lines": f"""
            SELECT doc_id, line_no, line FROM (
              SELECT doc_id,
                     unnest(str_split(text, chr(10))) AS line,
                     generate_subscripts(str_split(text, chr(10)), 1) AS line_no
              FROM documents
            ) WHERE contains(line, '{SUBSTRING_NEEDLE}')
            ORDER BY doc_id, line_no
        """,
        "quality_by_lang": f"""
            WITH tok AS (
              SELECT lang,
                     list_filter(regexp_split_to_array(text, '\\s+'), x -> length(x) > 0) AS toks
              FROM documents)
            SELECT lang, count(*) AS docs,
                   CAST(sum(len(toks)) AS BIGINT) AS tok_sum,
                   CAST(floor(sum(len(list_filter(toks, x -> lower(x) IN ({stop_list})))) * 1000000 + 0.5) AS BIGINT) AS stop_micro
            FROM tok GROUP BY lang ORDER BY lang
        """,
        "quality_filter": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'), x -> length(x) > 0) AS toks
              FROM documents)
            SELECT doc_id FROM tok
            WHERE len(toks) BETWEEN 20 AND 200
              AND len(list_filter(toks, x -> lower(x) IN ({", ".join(f"'{w}'" for w in sorted(STOPWORDS))})))
                  < 0.25 * greatest(len(toks), 1)
            ORDER BY doc_id
        """,
        "token_totals": f"""
            SELECT lang,
                   CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> length(x) > 0))) AS BIGINT) AS ws_tokens,
                   CAST(sum(len(regexp_extract_all(text, '{BPE_ISH_PATTERN.replace("'", "''")}'))) AS BIGINT) AS bpe_tokens
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "pack_sequences": f"""
            WITH t AS (SELECT doc_id, {_WS_TOKENS_SQL} AS n_tokens FROM documents),
            c AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS start_tok
              FROM t)
            SELECT doc_id, n_tokens,
                   CAST(start_tok AS BIGINT) AS start_tok,
                   CAST(start_tok // 2048 AS BIGINT) AS chunk_id,
                   CAST(start_tok % 2048 AS BIGINT) AS chunk_offset
            FROM c ORDER BY doc_id
        """,
        "training_mix": f"""
            WITH tok AS (
              SELECT doc_id, text,
                     list_filter(regexp_split_to_array(text, '\\s+'), x -> length(x) > 0) AS toks
              FROM documents),
            q AS (
              SELECT doc_id, text, len(toks) AS n_tokens FROM tok
              WHERE len(toks) BETWEEN 20 AND 200
                AND len(list_filter(toks, x -> lower(x) IN ({", ".join(f"'{w}'" for w in sorted(STOPWORDS))})))
                    < 0.25 * greatest(len(toks), 1)),
            d AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text),
            s AS (SELECT q.doc_id, q.n_tokens FROM q JOIN d ON q.doc_id = d.doc_id),
            c AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS start_tok
              FROM s)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(start_tok AS BIGINT) AS start_tok,
                   CAST(start_tok // 512 AS BIGINT) AS chunk_id,
                   CAST(start_tok % 512 AS BIGINT) AS chunk_offset
            FROM c ORDER BY doc_id
        """,
        "stratified_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE {_hash_u32_sql('doc_id')} <
                  CASE lang {' '.join(f"WHEN '{k}' THEN {int(np.floor(v * 2**32))}" for k, v in sorted(SAMPLE_RATES.items()))} ELSE 0 END
            ORDER BY doc_id
        """,
        "train_test_split": f"""
            WITH s AS (
              SELECT lang,
                     CASE WHEN {_hash_u32_sql('doc_id')} % 100 < 90 THEN 'train'
                          WHEN {_hash_u32_sql('doc_id')} % 100 < 95 THEN 'val'
                          ELSE 'test' END AS split
              FROM documents)
            SELECT lang, split, count(*) AS n FROM s
            GROUP BY lang, split ORDER BY lang, split
        """,
        "hybrid_rrf": f"""
            WITH bm AS ({bm25_sql(BM25_QUERY, limit=20)}),
            sem0 AS (
              SELECT e.vec_id AS doc_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS score
              FROM embeddings e
              CROSS JOIN (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0) q),
            sem AS (
              SELECT doc_id, score,
                     row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rank
              FROM sem0 ORDER BY score DESC, doc_id ASC LIMIT 20),
            w AS (SELECT CASE WHEN max(score) - min(score) < 0.05 THEN 0.3 ELSE 0.7 END AS sw FROM sem),
            ids AS (SELECT doc_id FROM sem UNION SELECT doc_id FROM bm),
            fused AS (
              SELECT ids.doc_id,
                     COALESCE((1.0 / (60 + sem.rank + 1)) * (SELECT sw FROM w), 0)
                     + COALESCE((1.0 / (60 + bm.rank + 1)) * (1 - (SELECT sw FROM w)), 0) AS f,
                     COALESCE(sem.score, 0) AS sem_raw,
                     COALESCE(bm.score_micro, 0) AS bm_micro
              FROM ids
              LEFT JOIN sem ON sem.doc_id = ids.doc_id
              LEFT JOIN bm ON bm.doc_id = ids.doc_id),
            mxf AS (SELECT max(f) AS m FROM fused)
            SELECT doc_id,
                   CAST(floor(f / (SELECT m FROM mxf) * 1000000 + 0.5) AS BIGINT) AS fused_micro,
                   CAST(floor(sem_raw * 1000000 + 0.5) AS BIGINT) AS sem_micro,
                   bm_micro AS bm25_micro
            FROM fused ORDER BY doc_id
        """,
        "hybrid_linear": f"""
            WITH bm AS ({bm25_sql(BM25_QUERY, limit=20)}),
            sem0 AS (
              SELECT e.vec_id AS doc_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS score
              FROM embeddings e
              CROSS JOIN (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0) q),
            sem AS (
              SELECT doc_id,
                     CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS sem_micro
              FROM sem0 ORDER BY score DESC, doc_id ASC LIMIT 20),
            bstat AS (SELECT min(score_micro) AS mn, max(score_micro) AS mx FROM bm),
            sstat AS (SELECT min(sem_micro) AS mn, max(sem_micro) AS mx FROM sem),
            ids AS (SELECT doc_id FROM bm UNION SELECT doc_id FROM sem),
            f AS (
              SELECT ids.doc_id,
                     {HYBRID_LIN_W_BM} * COALESCE(
                       CASE WHEN (SELECT mx FROM bstat) = (SELECT mn FROM bstat) THEN 1.0
                            ELSE CAST(bm.score_micro - (SELECT mn FROM bstat) AS DOUBLE)
                                 / CAST((SELECT mx FROM bstat) - (SELECT mn FROM bstat) AS DOUBLE)
                       END, 0)
                     + {HYBRID_LIN_W_SEM} * COALESCE(
                       CASE WHEN (SELECT mx FROM sstat) = (SELECT mn FROM sstat) THEN 1.0
                            ELSE CAST(sem.sem_micro - (SELECT mn FROM sstat) AS DOUBLE)
                                 / CAST((SELECT mx FROM sstat) - (SELECT mn FROM sstat) AS DOUBLE)
                       END, 0) AS fscore,
                     CASE WHEN bm.doc_id IS NULL THEN 0 ELSE 1 END AS in_bm25,
                     CASE WHEN sem.doc_id IS NULL THEN 0 ELSE 1 END AS in_knn
              FROM ids
              LEFT JOIN bm ON bm.doc_id = ids.doc_id
              LEFT JOIN sem ON sem.doc_id = ids.doc_id)
            SELECT doc_id,
                   CAST(floor(fscore * 1000000 + 0.5) AS BIGINT) AS fused_micro,
                   CAST(in_bm25 AS BIGINT) AS in_bm25,
                   CAST(in_knn AS BIGINT) AS in_knn
            FROM f ORDER BY doc_id
        """,
        "redact_props": _redact_sql(),
        "props_k_by_type": r"""
            SELECT event_type, count(*) AS n,
                   CAST(sum(COALESCE(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT), 0)) AS BIGINT) AS sum_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "clean_text": f"""
            SELECT doc_id,
                   trim(regexp_replace(
                     regexp_replace(
                       regexp_replace(lower(text), '{_URL_P}', ' ', 'g'),
                       '{_EMAIL_P}', ' ', 'g'),
                     '\\s+', ' ', 'g')) AS clean_text
            FROM documents ORDER BY doc_id
        """,
        "token_quantiles": f"""
            WITH t AS (SELECT {_WS_TOKENS_SQL} AS n_tokens FROM documents),
            ql AS (SELECT quantile_disc(n_tokens, [{', '.join(str(q) for q in QUANTILE_QS)}]) AS v FROM t),
            e AS (SELECT unnest(v) AS value, generate_subscripts(v, 1) AS i FROM ql),
            qq AS (SELECT unnest([{', '.join(str(int(np.floor(q * 1e6 + 0.5))) for q in QUANTILE_QS)}]) AS q_micro,
                          generate_subscripts([{', '.join(str(int(np.floor(q * 1e6 + 0.5))) for q in QUANTILE_QS)}], 1) AS i)
            SELECT qq.q_micro, CAST(e.value AS BIGINT) AS value
            FROM e JOIN qq USING (i) ORDER BY q_micro
        """,
        "ngram_jaccard_dups": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
              FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 3),
            sz AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   CAST(floor(i / (sa.s + sb.s - i) * 1000000 + 0.5) AS BIGINT) AS jaccard_micro
            FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
            WHERE i / (sa.s + sb.s - i) >= 0.5
            ORDER BY id_a, id_b
        """,
        "dup_triangles": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
              FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 3),
            sz AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id_a, id_b
              FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
              WHERE i / (sa.s + sb.s - i) >= 0.5)
            SELECT e1.id_a AS id_a, e1.id_b AS id_b, e2.id_b AS id_c
            FROM pairs e1
            JOIN pairs e2 ON e2.id_a = e1.id_b
            JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
            ORDER BY 1, 2, 3
        """,
        "dedup_clusters": """
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
              FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 3),
            sz AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id_a, id_b
              FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
              WHERE i / (sa.s + sb.s - i) >= 0.5),
            edges AS (SELECT id_a AS eu, id_b AS ev FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            nodes AS (SELECT DISTINCT eu AS v FROM edges),
            reach AS (
              SELECT v, v AS r FROM nodes
              UNION
              SELECT e.ev AS v, reach.r FROM edges e JOIN reach ON reach.v = e.eu)
            SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v
            ORDER BY doc_id
        """,
        "dup_graph_bfs": f"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
              FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 3),
            sz AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id_a, id_b
              FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
              WHERE i / (sa.s + sb.s - i) >= 0.5),
            edges AS (SELECT id_a AS eu, id_b AS ev FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            nodes AS (SELECT DISTINCT eu AS v FROM edges),
            walk AS (
              SELECT v, 0 AS d FROM nodes WHERE v % {BFS_SOURCE_MOD} = 0
              UNION
              SELECT e.ev AS v, walk.d + 1 AS d
              FROM edges e JOIN walk ON walk.v = e.eu
              WHERE walk.d < (SELECT count(*) FROM nodes))
            SELECT n.v AS doc_id,
                   CAST(coalesce(min(w.d), -1) AS BIGINT) AS dist
            FROM nodes n LEFT JOIN walk w ON w.v = n.v
            GROUP BY n.v ORDER BY doc_id
        """,
        "dedup_keep_best": """
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
              FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 3),
            sz AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT id_a, id_b
              FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
              WHERE i / (sa.s + sb.s - i) >= 0.5),
            edges AS (SELECT id_a AS eu, id_b AS ev FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            nodes AS (SELECT DISTINCT eu AS v FROM edges),
            reach AS (
              SELECT v, v AS r FROM nodes
              UNION
              SELECT e.ev AS v, reach.r FROM edges e JOIN reach ON reach.v = e.eu),
            cc AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
            ntok AS (
              SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
            elected AS (
              SELECT cc.doc_id, cc.cluster_id,
                     first_value(cc.doc_id) OVER (
                       PARTITION BY cc.cluster_id
                       ORDER BY n.n_tokens DESC, cc.doc_id ASC) AS keeper_id
              FROM cc JOIN ntok n ON n.doc_id = cc.doc_id)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(cluster_id AS BIGINT) AS cluster_id,
                   CAST(keeper_id AS BIGINT) AS keeper_id,
                   CAST(CASE WHEN doc_id = keeper_id THEN 1 ELSE 0 END AS BIGINT) AS kept
            FROM elected ORDER BY doc_id
        """,
        "embed_cosine_dups": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT id_a, id_b, cos_micro
            FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                         CAST(floor(list_cosine_similarity(a.v, b.v)
                                    * 1000000 + 0.5) AS BIGINT) AS cos_micro
                  FROM e a JOIN e b ON a.vec_id < b.vec_id)
            WHERE cos_micro >= 350000
            ORDER BY id_a, id_b
        """,
        "kmeans_clusters": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            c0 AS (SELECT vec_id AS cl, v FROM e WHERE vec_id < 8),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT e.vec_id, c0.cl,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY list_distance(e.v, c0.v), c0.cl) AS rn
                FROM e CROSS JOIN c0) WHERE rn = 1),
            dims AS (
              SELECT a1.cl, unnest(e.v) AS val, generate_subscripts(e.v, 1) AS dim
              FROM a1 JOIN e USING (vec_id)),
            c1 AS (
              SELECT cl, list(avg_val ORDER BY dim) AS v FROM (
                SELECT cl, dim, avg(val) AS avg_val FROM dims GROUP BY cl, dim)
              GROUP BY cl),
            a2 AS (
              SELECT vec_id, cl FROM (
                SELECT e.vec_id, c1.cl,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY list_distance(e.v, c1.v), c1.cl) AS rn
                FROM e CROSS JOIN c1) WHERE rn = 1)
            SELECT vec_id, cl AS cluster FROM a2 ORDER BY vec_id
        """,
        "semantic_dedup": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            c0 AS (SELECT vec_id AS cl, v FROM e WHERE vec_id < 8),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT e.vec_id, c0.cl,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY list_distance(e.v, c0.v), c0.cl) AS rn
                FROM e CROSS JOIN c0) WHERE rn = 1),
            dims AS (
              SELECT a1.cl, unnest(e.v) AS val, generate_subscripts(e.v, 1) AS dim
              FROM a1 JOIN e USING (vec_id)),
            c1 AS (
              SELECT cl, list(avg_val ORDER BY dim) AS v FROM (
                SELECT cl, dim, avg(val) AS avg_val FROM dims GROUP BY cl, dim)
              GROUP BY cl),
            a2 AS (
              SELECT vec_id, cl FROM (
                SELECT e.vec_id, c1.cl,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY list_distance(e.v, c1.v), c1.cl) AS rn
                FROM e CROSS JOIN c1) WHERE rn = 1),
            dup AS (
              SELECT DISTINCT b.vec_id AS i
              FROM a2 a JOIN a2 b ON a.cl = b.cl AND a.vec_id < b.vec_id
              JOIN e ea ON ea.vec_id = a.vec_id
              JOIN e eb ON eb.vec_id = b.vec_id
              WHERE CAST(floor(list_cosine_similarity(ea.v, eb.v)
                               * 1000000 + 0.5) AS BIGINT) >= 350000)
            SELECT a2.vec_id, a2.cl AS cluster,
                   CASE WHEN dup.i IS NULL THEN 1 ELSE 0 END AS keep
            FROM a2 LEFT JOIN dup ON a2.vec_id = dup.i
            ORDER BY a2.vec_id
        """,
        "knn_radius": f"""
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id < 3),
            sims AS (
              SELECT q.q_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS score
              FROM embeddings e CROSS JOIN q)
            SELECT q_id, vec_id, score_micro
            FROM (SELECT q_id, vec_id,
                         CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
                  FROM sims)
            WHERE score_micro >= {int(round(KNN_RADIUS_TAU * 1_000_000))}
            ORDER BY q_id, score_micro DESC, vec_id
        """,
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 3),
            sims AS (
              SELECT q.q_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS score
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT q_id, vec_id, score,
                     row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) - 1 AS rank
              FROM sims)
            SELECT q_id, rank, vec_id,
                   CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
            FROM ranked WHERE rank < 10 ORDER BY q_id, rank
        """,
        "alpha_mix_sample": _alpha_mix_sql(),
        "hard_negatives": f"""
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id < 3),
            sims AS (
              SELECT q.q_id, e.vec_id,
                     CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[], q.qe)
                                * 1000000 + 0.5) AS BIGINT) AS score_micro
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT q_id, vec_id, score_micro,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY score_micro DESC, vec_id ASC) - 1 AS rank
              FROM sims
              WHERE score_micro <= {int(round(HARDNEG_POS_TAU * 1_000_000))}
                AND vec_id <> q_id)
            SELECT q_id, rank, vec_id, score_micro
            FROM ranked WHERE rank < {HARDNEG_K} ORDER BY q_id, rank
        """,
        # int8-quantized ANN rescores exactly, so its answer IS the
        # brute-force one — same oracle as knn_cosine
        "knn_int8": """
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 3),
            sims AS (
              SELECT q.q_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS score
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT q_id, vec_id, score,
                     row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) - 1 AS rank
              FROM sims)
            SELECT q_id, rank, vec_id,
                   CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
            FROM ranked WHERE rank < 10 ORDER BY q_id, rank
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "user_last_event": """
            SELECT user_id, event_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1 ORDER BY user_id
        """,
        "eql_sequence": f"""
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts FROM events),
            a AS (SELECT user_id, ts AS ta FROM e WHERE event_type = '{EQL_SEQ[0]}'),
            ab AS (
              SELECT a.user_id, a.ta,
                     (SELECT min(b.ts) FROM e b
                      WHERE b.user_id = a.user_id
                        AND b.event_type = '{EQL_SEQ[1]}'
                        AND b.ts > a.ta) AS tb
              FROM a),
            abc AS (
              SELECT user_id, ta,
                     (SELECT min(c.ts) FROM e c
                      WHERE c.user_id = ab.user_id
                        AND c.event_type = '{EQL_SEQ[2]}'
                        AND c.ts > ab.tb) AS tc
              FROM ab WHERE tb IS NOT NULL)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_seq
            FROM abc
            WHERE tc IS NOT NULL AND tc - ta <= {EQL_MAXSPAN_US}
            GROUP BY user_id ORDER BY user_id
        """,
        "funnel_counts": f"""
            WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                        WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY 1),
            s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
                   JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t0
                   WHERE e.event_type = '{FUNNEL_STAGES[1]}' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                   JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
                   WHERE e.event_type = '{FUNNEL_STAGES[2]}' GROUP BY 1)
            SELECT '{FUNNEL_STAGES[0]}' AS stage, count(*) AS n_users FROM s0
            UNION ALL SELECT '{FUNNEL_STAGES[1]}', count(*) FROM s1
            UNION ALL SELECT '{FUNNEL_STAGES[2]}', count(*) FROM s2
        """,
        "cohort_retention": """
            WITH f AS (
              SELECT user_id, date_trunc('week', min(ts)) AS cw
              FROM events GROUP BY user_id),
            a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events)
            SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
                   CAST(datediff('day', f.cw, a.aw) / 7 AS BIGINT) AS week_offset,
                   count(*) AS n_users
            FROM a JOIN f ON a.user_id = f.user_id
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "sessionize": """
            WITH ordered AS (
              SELECT user_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, count(*) AS n_events, CAST(sum(new_sess) AS BIGINT) AS n_sessions
            FROM ordered GROUP BY user_id ORDER BY user_id
        """,
        "clicks_last_purchase": """
            WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
            p AS (SELECT event_id AS pid, user_id, ts, value FROM events
                  WHERE event_type = 'purchase')
            SELECT c.event_id, p.pid AS matched_id,
                   CAST(floor(p.value * 100 + 0.5) AS BIGINT) AS value_c,
                   CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS gap_us
            FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
            ORDER BY c.event_id
        """,
        "purchases_before_click": """
            WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
            p AS (SELECT event_id AS pid, user_id, ts, value FROM events
                  WHERE event_type = 'purchase')
            SELECT c.event_id, p.pid,
                   CAST(floor(p.value * 100 + 0.5) AS BIGINT) AS value_c
            FROM c JOIN p ON c.user_id = p.user_id
                         AND p.ts BETWEEN c.ts - INTERVAL 24 HOUR AND c.ts
            ORDER BY c.event_id, p.pid
        """,
        "q1_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_parts_by_revenue": """
            WITH rev AS (
              SELECT l_partkey AS p_partkey,
                     CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
              FROM lineitem GROUP BY l_partkey)
            SELECT r.p_partkey, p.p_name, r.revenue_c
            FROM rev r JOIN part p ON p.p_partkey = r.p_partkey
            ORDER BY r.revenue_c DESC, r.p_partkey ASC LIMIT 10
        """,
        "revenue_by_part_type": """
            SELECT p.p_type,
                   CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY p.p_type ORDER BY p.p_type
        """,
        "orders_by_nation": """
            SELECT n.n_name, count(*) AS n_orders,
                   CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY n.n_name ORDER BY n.n_name
        """,
        "nation_above_avg_orders": """
            WITH j AS (SELECT c.c_nationkey AS nk,
                              CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS x
                       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
            s AS (SELECT nk, count(*) AS n_orders, sum(x) AS s_c FROM j GROUP BY 1),
            a AS (SELECT j.nk, count(*) AS n_above
                  FROM j JOIN s ON j.nk = s.nk
                  WHERE j.x * s.n_orders > s.s_c GROUP BY 1)
            SELECT n.n_name,
                   CAST(s.n_orders AS BIGINT) AS n_orders,
                   CAST(coalesce(a.n_above, 0) AS BIGINT) AS n_above
            FROM s JOIN nation n ON s.nk = n.n_nationkey
                   LEFT JOIN a ON s.nk = a.nk
            ORDER BY n.n_name
        """,
        "q5_local_supplier_volume": f"""
            SELECT n_name,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                            AS BIGINT)) AS BIGINT) AS revenue_c
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = '{Q5_REGION}'
              AND o_orderdate >= TIMESTAMP '{Q5_FROM}'
              AND o_orderdate <  TIMESTAMP '{Q5_TO}'
            GROUP BY n_name ORDER BY revenue_c DESC, n_name
        """,
        "q3_shipping": """
            SELECT o.o_orderkey, o.o_orderdate,
                   CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01'
              AND l.l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY o.o_orderkey, o.o_orderdate
            ORDER BY revenue_c DESC, o.o_orderkey ASC LIMIT 10
        """,
        "top2_orders_per_nation": """
            WITH ranked AS (
              SELECT n.n_name, o.o_orderkey,
                     CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_c,
                     row_number() OVER (
                       PARTITION BY n.n_name
                       ORDER BY CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) DESC,
                                o.o_orderkey ASC
                     ) AS rnk
              FROM orders o
              JOIN customer c ON c.c_custkey = o.o_custkey
              JOIN nation n ON n.n_nationkey = c.c_nationkey)
            SELECT n_name, rnk, o_orderkey, total_c
            FROM ranked WHERE rnk <= 2 ORDER BY n_name, rnk
        """,
        "supplier_balance_by_region": """
            SELECT r.r_name, count(*) AS n_suppliers,
                   CAST(sum(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_c
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name ORDER BY r.r_name
        """,
        "distinct_users_by_type": """
            SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "decontaminate": f"""
            WITH toks AS (
              SELECT doc_id, lang,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id,
                     t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS gram
              FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i)
              WHERE len(t) >= 5),
            bench AS (SELECT DISTINCT gram FROM grams
                      WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
            dirty AS (SELECT DISTINCT doc_id FROM grams
                      WHERE gram IN (SELECT gram FROM bench))
            SELECT d.doc_id, d.lang,
                   CAST(CASE WHEN dirty.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                     AS contaminated
            FROM documents d LEFT JOIN dirty ON dirty.doc_id = d.doc_id
            WHERE d.doc_id % {DECONTAM_BENCH_MOD} != 0
            ORDER BY d.doc_id
        """,
        "dsir_weights": _DSIR_SQL_CTE + """
            SELECT d.doc_id,
                   CAST(COALESCE(s.n, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(s.w, 0) AS BIGINT) AS dsir_milli
            FROM documents d LEFT JOIN doc_sum s ON s.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "dsir_select": _DSIR_SQL_CTE + f""",
            w AS (
              SELECT d.doc_id,
                     CAST(COALESCE(s.w, 0) AS BIGINT) AS dsir_milli
              FROM documents d LEFT JOIN doc_sum s ON s.doc_id = d.doc_id),
            keyed AS (
              SELECT doc_id, dsir_milli,
                     {_gumbel_sql('doc_id', DSIR_SELECT_SEED)} AS gumbel_milli
              FROM w)
            SELECT CAST(row_number() OVER (
                     ORDER BY dsir_milli + gumbel_milli DESC, doc_id ASC) - 1
                   AS BIGINT) AS rank,
                   doc_id, dsir_milli, gumbel_milli,
                   dsir_milli + gumbel_milli AS key_milli
            FROM keyed
            ORDER BY key_milli DESC, doc_id ASC
            LIMIT {DSIR_SELECT_N}
        """,
        "tfidf_keywords": """
            WITH tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS toks
              FROM documents),
            flat AS (SELECT doc_id, unnest(toks) AS term FROM tok),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM flat GROUP BY 1, 2),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM flat GROUP BY term),
            n AS (SELECT count(*) AS n FROM documents),
            idf AS (
              SELECT term,
                     CAST(floor(ln((n.n + 1.0) / (df + 1.0)) * 1000 + 0.5) AS BIGINT)
                       AS idf_milli
              FROM df, n),
            s AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     tf.tf * idf.idf_milli AS score_milli,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * idf.idf_milli DESC, tf.term ASC) AS r
              FROM tf JOIN idf USING (term))
            SELECT doc_id, CAST(r AS BIGINT) AS kw_rank, term,
                   CAST(tf AS BIGINT) AS tf, CAST(score_milli AS BIGINT) AS score_milli
            FROM s WHERE r <= 3
            ORDER BY doc_id, kw_rank
        """,
        "term_cooccurrence": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS toks
              FROM documents),
            flat AS (SELECT doc_id, unnest(toks) AS term FROM tok),
            dt AS (SELECT DISTINCT doc_id, term FROM flat),
            df AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
            top AS (
              SELECT term, df FROM df
              ORDER BY df DESC, term ASC LIMIT {COOC_VOCAB}),
            n AS (SELECT count(*) AS n FROM documents),
            pairs AS (
              SELECT a.term AS ta, b.term AS tb, count(*) AS n_ab
              FROM dt a
              JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
              WHERE a.term IN (SELECT term FROM top)
                AND b.term IN (SELECT term FROM top)
              GROUP BY 1, 2),
            scored AS (
              SELECT ta, tb, n_ab,
                     CAST(floor(ln((n.n * n_ab * 1.0) / (da.df * db.df)) * 1000 + 0.5)
                          AS BIGINT) AS pmi_milli
              FROM pairs, n
              JOIN top da ON da.term = pairs.ta
              JOIN top db ON db.term = pairs.tb
              WHERE n_ab >= {COOC_MIN_COUNT})
            SELECT ta AS term_a, tb AS term_b,
                   CAST(n_ab AS BIGINT) AS n_ab, pmi_milli
            FROM scored
            ORDER BY pmi_milli DESC, term_a ASC, term_b ASC
            LIMIT {COOC_TOP_N}
        """,
        "doc_pagerank": _pagerank_sql(PAGERANK_ITERS),
        "search_ndcg": _ndcg_sql(),
        "percolate_queries": " UNION ALL ".join(
            f"""
            SELECT '{qid}' AS query_id,
                   count(*) FILTER (WHERE {" AND ".join(
                       [f"list_contains(toks, '{t}')" for t in must]
                       + [f"NOT list_contains(toks, '{t}')" for t in mnot]
                   )}) AS n_docs
            FROM (SELECT {tok} AS toks FROM documents)
            """
            for qid, must, mnot in PERC_QUERIES
        ),
        "dup_degree_hist": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
              FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 3),
            sz AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            prs AS (
              SELECT id_a, id_b
              FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
              WHERE i / (sa.s + sb.s - i) >= 0.5),
            ends AS (SELECT id_a AS v FROM prs UNION ALL SELECT id_b FROM prs),
            deg AS (SELECT v, count(*) AS d FROM ends GROUP BY v),
            alldeg AS (
              SELECT d.doc_id, COALESCE(deg.d, 0) AS degree
              FROM documents d LEFT JOIN deg ON deg.v = d.doc_id)
            SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_nodes
            FROM alldeg GROUP BY degree ORDER BY degree
        """,
        "order_skyline": """
            WITH pts AS (
              SELECT o_orderkey,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
                     epoch_us(o_orderdate) AS date_us
              FROM orders)
            SELECT p.o_orderkey, p.price_c, p.date_us
            FROM pts p
            WHERE NOT EXISTS (
              SELECT 1 FROM pts q
              WHERE q.price_c >= p.price_c AND q.date_us <= p.date_us
                AND (q.price_c > p.price_c OR q.date_us < p.date_us))
            ORDER BY p.o_orderkey
        """,
        "events_time_decay": f"""
            WITH m AS (SELECT max(ts) AS tmax FROM events),
            s AS (
              SELECT user_id,
                     CAST(floor(exp(-((epoch_us(m.tmax) - epoch_us(ts))
                                      / {float(DECAY_TAU_US)})) * 1000 + 0.5)
                          AS BIGINT) AS s
              FROM events, m)
            SELECT user_id, CAST(sum(s) AS BIGINT) AS score_milli
            FROM s GROUP BY user_id
            ORDER BY score_milli DESC, user_id ASC LIMIT {DECAY_TOP_N}
        """,
        "dup_spans": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> length(x) > 0) AS toks
              FROM documents
            ), spans AS (
              SELECT doc_id,
                     array_to_string(
                       toks[CAST(i AS BIGINT):CAST(i + {DUP_SPAN_WIDTH} - 1 AS BIGINT)],
                       ' ') AS span
              FROM tok, unnest(generate_series(1, len(toks) - {DUP_SPAN_WIDTH} + 1)) AS g(i)
              WHERE len(toks) >= {DUP_SPAN_WIDTH}
            ), cnt AS (SELECT span, count(*) AS c FROM spans GROUP BY span),
            per_doc AS (
              SELECT s.doc_id,
                     CAST(count(*) AS BIGINT) AS n_spans,
                     CAST(count(*) FILTER (WHERE cnt.c >= 2) AS BIGINT) AS n_dup_spans
              FROM spans s JOIN cnt ON cnt.span = s.span GROUP BY s.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(p.n_spans, 0) AS n_spans,
                   COALESCE(p.n_dup_spans, 0) AS n_dup_spans
            FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "doc_chunks": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ), starts AS (
              SELECT doc_id, t, len(t) AS n, CAST(g.s AS BIGINT) AS s
              FROM toks,
                   unnest(generate_series(0, CAST(len(t) - 1 AS BIGINT),
                                          {CHUNK_STRIDE})) AS g(s)
              WHERE len(t) > 0
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   s // {CHUNK_STRIDE} AS chunk_idx,
                   s AS start_tok,
                   CAST(LEAST({CHUNK_WINDOW}, n - s) AS BIGINT) AS n_tok,
                   array_to_string(
                     t[(s + 1):(s + LEAST({CHUNK_WINDOW}, n - s))], ' ')
                     AS chunk_text
            FROM starts
            ORDER BY doc_id, chunk_idx
        """,
        "line_dedup": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> length(x) > 0) AS t
              FROM documents),
            chunks AS (
              SELECT doc_id, c AS line_idx,
                     array_to_string(t[(c*{LINE_CHUNK}+1):(c*{LINE_CHUNK}+{LINE_CHUNK})], ' ') AS line
              FROM toks,
                   UNNEST(range(0, CAST(ceil(len(t)/{LINE_CHUNK}.0) AS BIGINT))) AS u(c)),
            winners AS (
              SELECT doc_id, line_idx, line FROM (
                SELECT doc_id, line_idx, line,
                       row_number() OVER (PARTITION BY line
                                          ORDER BY doc_id, line_idx) AS rn
                FROM chunks) w WHERE rn = 1)
            SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS text
            FROM winners GROUP BY doc_id ORDER BY doc_id
        """,
        "global_shuffle": f"""
            SELECT doc_id,
                   CAST(row_number() OVER
                        (ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)))
                        - 1 AS BIGINT) AS pos
            FROM documents ORDER BY doc_id
        """,
        "orders_with_returns": """
            SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n
            FROM orders o
            WHERE EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
            GROUP BY o_orderpriority ORDER BY priority
        """,
        "ttr_by_lang": f"""
            WITH tok AS (SELECT lang, {tok} AS toks FROM documents),
            flat AS (SELECT lang, unnest(toks) AS term FROM tok),
            t AS (SELECT lang, count(*) AS n_tokens,
                         count(DISTINCT term) AS n_types
                  FROM flat GROUP BY lang)
            SELECT lang,
                   CAST(n_types AS BIGINT) AS n_types,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(floor(1000000.0 * n_types / n_tokens + 0.5) AS BIGINT) AS ttr_micro
            FROM t ORDER BY lang
        """,
        "customers_no_urgent": """
            SELECT n_name, CAST(count(*) AS BIGINT) AS n
            FROM customer c JOIN nation ON n_nationkey = c_nationkey
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
            GROUP BY n_name ORDER BY n_name
        """,
        "events_rollup": """
            WITH e AS (
              SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
              FROM events)
            SELECT COALESCE(event_type, 'ALL') AS event_type,
                   COALESCE(day, 'ALL') AS day,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(value_c) AS BIGINT) AS value_c
            FROM e GROUP BY ROLLUP(event_type, day)
            ORDER BY event_type, day
        """,
        "user_running_value": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_value_c
            FROM events ORDER BY event_id
        """,
        "events_cube": """
            WITH e AS (
              SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
              FROM events)
            SELECT COALESCE(event_type, 'ALL') AS event_type,
                   COALESCE(day, 'ALL') AS day,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(value_c) AS BIGINT) AS value_c
            FROM e GROUP BY CUBE(event_type, day)
            ORDER BY event_type, day
        """,
        "user_moving_sum": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS win_value_c
            FROM events ORDER BY event_id
        """,
        "user_event_gaps": """
            WITH d AS (
              SELECT user_id,
                     (epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
                     AS gap_s
              FROM events)
            SELECT user_id,
                   CAST(count(gap_s) AS BIGINT) AS n_gaps,
                   CAST(COALESCE(sum(gap_s), 0) AS BIGINT) AS gap_total_s
            FROM d GROUP BY user_id ORDER BY user_id
        """,
        "length_outliers": f"""
            WITH t AS (SELECT doc_id, lang, {_WS_TOKENS_SQL} AS x FROM documents),
            s AS (SELECT lang, count(*) AS n, sum(x) AS sx, sum(x*x) AS qx
                  FROM t GROUP BY 1)
            SELECT t.doc_id, t.lang, CAST(t.x AS BIGINT) AS n_tokens
            FROM t JOIN s ON t.lang = s.lang
            WHERE 4 * (s.n * t.x - s.sx) * (s.n * t.x - s.sx) > 9 * (s.n * s.qx - s.sx * s.sx)
            ORDER BY t.doc_id
        """,
        "token_quantiles_by_lang": f"""
            WITH t AS (SELECT lang, {_WS_TOKENS_SQL} AS n_tokens FROM documents),
            ql AS (SELECT lang,
                          quantile_disc(n_tokens, [{', '.join(str(q) for q in QUANTILE_QS_GROUPED)}]) AS v
                   FROM t GROUP BY lang),
            e AS (SELECT lang, unnest(v) AS value, generate_subscripts(v, 1) AS i FROM ql),
            qq AS (SELECT unnest([{', '.join(str(int(np.floor(q * 1e6 + 0.5))) for q in QUANTILE_QS_GROUPED)}]) AS q_micro,
                          generate_subscripts([{', '.join(str(int(np.floor(q * 1e6 + 0.5))) for q in QUANTILE_QS_GROUPED)}], 1) AS i)
            SELECT e.lang, qq.q_micro, CAST(e.value AS BIGINT) AS value
            FROM e JOIN qq USING (i) ORDER BY lang, q_micro
        """,
        "user_set_ops": f"""
            WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = '{SETOP_TYPE_A}'),
            b AS (SELECT DISTINCT user_id FROM events WHERE event_type = '{SETOP_TYPE_B}')
            SELECT * FROM (
              SELECT 'except_ab' AS op, CAST((SELECT count(*) FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)) AS BIGINT) AS n_users
              UNION ALL
              SELECT 'intersect', CAST((SELECT count(*) FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)) AS BIGINT)
              UNION ALL
              SELECT 'union', CAST((SELECT count(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS BIGINT)
            ) ORDER BY op
        """,
        "event_type_sample": f"""
            WITH r AS (
              SELECT event_type, event_id,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY md5('{SAMPLE_SEED}:' || CAST(event_id AS VARCHAR))) AS rn
              FROM events)
            SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id
            FROM r WHERE rn <= {SAMPLE_PER_GROUP} ORDER BY event_type, rn
        """,
        "lang_id_profile": _lang_id_sql(),
        "knn_cosine_filtered": """
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 3),
            sims AS (
              SELECT q.q_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS score
              FROM embeddings e CROSS JOIN q WHERE e.label = 3),
            ranked AS (
              SELECT q_id, vec_id, score,
                     row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) - 1 AS rank
              FROM sims)
            SELECT q_id, rank, vec_id,
                   CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
            FROM ranked WHERE rank < 10 ORDER BY q_id, rank
        """,
        "label_centroids": """
            WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
            x AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) - 1 AS dim_idx FROM e)
            SELECT CAST(label AS BIGINT) AS label, CAST(dim_idx AS BIGINT) AS dim_idx,
                   CAST(floor(avg(val) * 1000000 + 0.5) AS BIGINT) AS mean_micro
            FROM x GROUP BY label, dim_idx ORDER BY label, dim_idx
        """,
        "events_sliding": """
            WITH w AS (
              SELECT event_type,
                     time_bucket(INTERVAL 15 MINUTE, ts) - to_minutes(CAST(j.j * 15 AS BIGINT)) AS window_start,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
              FROM events, range(4) j(j))
            SELECT event_type, window_start, count(*) AS n,
                   CAST(sum(vc) AS BIGINT) AS value_c
            FROM w GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "custdist": f"""
            WITH oc AS (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '{SEMI_PRIORITY}'
              GROUP BY c_custkey)
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS custdist
            FROM oc GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "small_qty_revenue": f"""
            WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}'),
            li AS (
              SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
                     CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
              FROM lineitem JOIN pk ON l_partkey = p_partkey),
            ag AS (SELECT l_partkey, sum(q) AS sumq, count(*) AS cnt
                   FROM li GROUP BY 1)
            SELECT CAST(coalesce(sum(price_c), 0) AS BIGINT) AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM li JOIN ag USING (l_partkey)
            WHERE q * 5 * cnt < sumq
        """,
        "large_volume_orders": f"""
            WITH big AS (
              SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
              FROM lineitem GROUP BY 1
              HAVING sum(CAST(l_quantity AS BIGINT)) > {Q18_MIN_QTY})
            SELECT c_name, o_orderkey, o_orderdate,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
                   total_qty
            FROM big JOIN orders ON o_orderkey = l_orderkey
                     JOIN customer ON c_custkey = o_custkey
            ORDER BY totalprice_cents DESC, o_orderkey
            LIMIT {Q18_LIMIT}
        """,
        "value_percentiles": """
            SELECT 'p25' AS pct, CAST(floor(quantile_cont(CAST(floor(value*100+0.5) AS BIGINT), 0.25) * 1000 + 0.5) AS BIGINT) AS q_milli_cents FROM events
            UNION ALL
            SELECT 'p50', CAST(floor(quantile_cont(CAST(floor(value*100+0.5) AS BIGINT), 0.50) * 1000 + 0.5) AS BIGINT) FROM events
            UNION ALL
            SELECT 'p75', CAST(floor(quantile_cont(CAST(floor(value*100+0.5) AS BIGINT), 0.75) * 1000 + 0.5) AS BIGINT) FROM events
        """,
        "entropy_by_lang": """
            WITH pos AS (
              SELECT doc_id, unnest(range(1, length(text)+1)) AS i, text
              FROM documents),
            cc AS (
              SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS c, count(*) AS cnt
              FROM pos GROUP BY 1, 2),
            sd AS (
              SELECT doc_id,
                     CAST(sum(CAST(floor(cnt * ln(cnt) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS s
              FROM cc GROUP BY 1)
            SELECT d.lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(d.text)) AS BIGINT) AS sum_chars,
                   CAST(coalesce(sum(sd.s), 0) AS BIGINT) AS sum_nlogn_milli
            FROM documents d LEFT JOIN sd USING (doc_id)
            GROUP BY d.lang ORDER BY d.lang
        """,
        "urgent_lineitems_semi": f"""
            SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            WHERE EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_orderkey = l_orderkey
                AND o.o_orderpriority = '{SEMI_PRIORITY}')
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "value_mad_by_type": """
            WITH c AS (SELECT event_type,
                              CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
                       FROM events),
            m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         quantile_cont(CAST(cents AS DOUBLE), 0.5) AS med
                  FROM c GROUP BY event_type),
            d AS (SELECT c.event_type, abs(CAST(c.cents AS DOUBLE) - m.med) AS dev
                  FROM c JOIN m USING (event_type)),
            md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
                   FROM d GROUP BY event_type)
            SELECT m.event_type, m.n,
                   CAST(floor(m.med * 1000 + 0.5) AS BIGINT) AS med_milli,
                   CAST(floor(md.mad * 1000 + 0.5) AS BIGINT) AS mad_milli
            FROM m JOIN md USING (event_type)
            ORDER BY m.event_type
        """,
        "rolling_distinct_users": f"""
            WITH p AS (SELECT DISTINCT user_id,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour
                       FROM events),
            hrs AS (SELECT DISTINCT hour FROM p)
            SELECT h.hour, CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users
            FROM hrs h JOIN p
              ON p.hour BETWEEN h.hour - {ROLLING_WINDOW_HOURS - 1} AND h.hour
            GROUP BY h.hour ORDER BY h.hour
        """,
        "top_user_by_type": """
            WITH c AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY event_type, user_id)
            SELECT event_type, user_id, n FROM c
            QUALIFY row_number() OVER (
              PARTITION BY event_type ORDER BY n DESC, user_id ASC) = 1
            ORDER BY event_type
        """,
        "hour_dow_pivot": """
            WITH b AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hod,
                              CAST(dayofweek(ts) AS BIGINT) AS dow
                       FROM events),
            h AS (SELECT CAST(range AS BIGINT) AS hod FROM range(24))
            SELECT h.hod,
                   CAST(count(*) FILTER (WHERE dow = 0) AS BIGINT) AS n_d0,
                   CAST(count(*) FILTER (WHERE dow = 1) AS BIGINT) AS n_d1,
                   CAST(count(*) FILTER (WHERE dow = 2) AS BIGINT) AS n_d2,
                   CAST(count(*) FILTER (WHERE dow = 3) AS BIGINT) AS n_d3,
                   CAST(count(*) FILTER (WHERE dow = 4) AS BIGINT) AS n_d4,
                   CAST(count(*) FILTER (WHERE dow = 5) AS BIGINT) AS n_d5,
                   CAST(count(*) FILTER (WHERE dow = 6) AS BIGINT) AS n_d6
            FROM h LEFT JOIN b USING (hod)
            GROUP BY h.hod ORDER BY h.hod
        """,
        "event_transitions": """
            WITH s AS (SELECT user_id, event_type,
                              lag(event_type) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT prev AS src, event_type AS dst, CAST(count(*) AS BIGINT) AS n
            FROM s WHERE prev IS NOT NULL
            GROUP BY prev, event_type ORDER BY src, dst
        """,
        "priority_share": """
            WITH a AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                                AS rev_c
                       FROM orders GROUP BY 1),
            t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total FROM a)
            SELECT o_orderpriority, n, rev_c,
                   CAST(floor(CAST(rev_c AS DOUBLE) / CAST(t.total AS DOUBLE)
                              * 10000 + 0.5) AS BIGINT) AS share_bps
            FROM a, t ORDER BY o_orderpriority
        """,
        "weighted_median_price": """
            WITH h AS (SELECT l_returnflag,
                              CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
                              CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) / 100)
                                   AS BIGINT) AS w
                       FROM lineitem GROUP BY 1, 2),
            c AS (SELECT l_returnflag, cents, w,
                         sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cum,
                         sum(w) OVER (PARTITION BY l_returnflag) AS total
                  FROM h)
            SELECT l_returnflag, CAST(max(total) AS BIGINT) AS total_qty,
                   CAST(min(cents) FILTER (WHERE 2 * cum >= total) AS BIGINT) AS wmedian_cents
            FROM c GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "supplier_coverage": f"""
            WITH pairs AS (SELECT DISTINCT l_suppkey, p_brand
                           FROM lineitem JOIN part ON p_partkey = l_partkey
                           WHERE l_shipdate >= TIMESTAMP '{COVERAGE_CUTOFF}'),
            tot AS (SELECT count(DISTINCT p_brand) AS n FROM part),
            c AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_brands
                  FROM pairs GROUP BY l_suppkey)
            SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey, n_brands
            FROM c, tot WHERE n_brands = tot.n
            ORDER BY s_suppkey
        """,
        "user_day_streak": """
            WITH d AS (SELECT DISTINCT user_id,
                              CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
                       FROM events),
            i AS (SELECT user_id, day,
                         day - row_number() OVER (
                           PARTITION BY user_id ORDER BY day) AS grp
                  FROM d),
            s AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY user_id, grp)
            SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days,
                   CAST(max(len) AS BIGINT) AS longest_streak
            FROM s GROUP BY user_id ORDER BY user_id
        """,
        "region_nation_rollup": """
            WITH j AS (SELECT r.r_name, n.n_name,
                              CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_c
                       FROM customer c
                       JOIN nation n ON n.n_nationkey = c.c_nationkey
                       JOIN region r ON r.r_regionkey = n.n_regionkey)
            SELECT coalesce(r_name, '') AS r_name, coalesce(n_name, '') AS n_name,
                   CAST(count(*) AS BIGINT) AS n_cust, CAST(sum(bal_c) AS BIGINT) AS bal_c
            FROM j GROUP BY ROLLUP (r_name, n_name)
            ORDER BY 1, 2
        """,
        "events_debounce": f"""
            WITH s AS (SELECT user_id, event_type,
                              CAST(epoch_us(ts) AS BIGINT) AS us,
                              lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                                PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT event_type,
                   CAST(count(*) FILTER (
                     WHERE prev IS NULL OR us - prev > {DEBOUNCE_MINUTES * 60 * 1_000_000}
                   ) AS BIGINT) AS n_kept,
                   CAST(count(*) FILTER (
                     WHERE prev IS NOT NULL AND us - prev <= {DEBOUNCE_MINUTES * 60 * 1_000_000}
                   ) AS BIGINT) AS n_dropped
            FROM s GROUP BY event_type ORDER BY event_type
        """,
        "orders_yoy": """
            WITH y AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
                              CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                                AS rev_c
                       FROM orders GROUP BY 1),
            w AS (SELECT year, n, rev_c, lag(rev_c) OVER (ORDER BY year) AS prev FROM y)
            SELECT year, n, rev_c,
                   CAST(CASE WHEN prev IS NULL THEN 0 ELSE rev_c - prev END AS BIGINT)
                     AS delta_c,
                   CAST(CASE WHEN prev IS NULL OR prev <= 0 THEN 0
                        ELSE floor(CAST(rev_c - prev AS DOUBLE) / CAST(prev AS DOUBLE)
                                   * 10000 + 0.5) END AS BIGINT) AS growth_bps
            FROM w ORDER BY year
        """,
        "length_gini": """
            WITH d AS (SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents),
            r AS (SELECT lang, x,
                         row_number() OVER (PARTITION BY lang ORDER BY x) AS i,
                         count(*) OVER (PARTITION BY lang) AS n
                  FROM d),
            a AS (SELECT lang, CAST(max(n) AS BIGINT) AS n,
                         CAST(sum(x * (2 * i - n - 1)) AS BIGINT) AS num,
                         CAST(sum(x) AS BIGINT) AS sx
                  FROM r GROUP BY lang)
            SELECT lang, n,
                   CAST(floor(CAST(num AS DOUBLE)
                              / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                              * 1000000 + 0.5) AS BIGINT) AS gini_micro
            FROM a ORDER BY lang
        """,
        "query_term_stats": f"""
            WITH tok AS (SELECT doc_id, {tok} AS toks FROM documents),
            stats AS (SELECT count(*) AS n FROM tok),
            tfp AS (SELECT doc_id, t AS term, count(*) AS tf
                    FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
                    GROUP BY doc_id, t),
            dfq AS (SELECT term, count(*) AS df FROM tfp GROUP BY term),
            idf0 AS (SELECT term,
                            ln((SELECT n FROM stats) - df + 0.5) - ln(df + 0.5) AS idf_raw
                     FROM dfq),
            eps AS (SELECT 0.25 * avg(idf_raw) AS e FROM idf0),
            idf AS (SELECT term,
                           CASE WHEN idf_raw < 0 THEN (SELECT e FROM eps)
                                ELSE idf_raw END AS idf
                    FROM idf0),
            cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tfp GROUP BY term)
            SELECT d.term, CAST(d.df AS BIGINT) AS df, cf.cf,
                   CAST(floor(idf.idf * 1000000 + 0.5) AS BIGINT) AS idf_micro
            FROM dfq d JOIN cf USING (term) JOIN idf USING (term)
            WHERE d.term IN ({", ".join(f"'{t}'" for t in sorted(set(_qtok(BM25_QUERY))))})
            ORDER BY d.term
        """,
        "top_terms_concat": f"""
            WITH tok AS (SELECT doc_id, lang, {tok} AS toks FROM documents),
            pairs AS (SELECT DISTINCT doc_id, lang, unnest(toks) AS term FROM tok),
            d AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS df
                  FROM pairs GROUP BY lang, term),
            t3 AS (SELECT lang, term, df FROM d
                   QUALIFY row_number() OVER (
                     PARTITION BY lang ORDER BY df DESC, term) <= {TOPTERMS_K})
            SELECT lang, string_agg(term, ',' ORDER BY df DESC, term) AS top_terms
            FROM t3 GROUP BY lang ORDER BY lang
        """,
        "hourly_anomalies": f"""
            WITH c AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
                              event_type, CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            rng AS (SELECT min(hour) AS lo, max(hour) AS hi FROM c),
            types AS (SELECT DISTINCT event_type FROM c),
            grid AS (SELECT t.event_type,
                            unnest(generate_series(rng.lo, rng.hi)) AS hour
                     FROM types t, rng),
            d AS (SELECT grid.event_type, grid.hour, coalesce(c.n, 0) AS n
                  FROM grid LEFT JOIN c USING (event_type, hour)),
            w AS (SELECT event_type, hour, n,
                         CAST(coalesce(sum(n) OVER win, 0) AS BIGINT) AS ws,
                         CAST(coalesce(sum(n * n) OVER win, 0) AS BIGINT) AS ws2,
                         CAST(count(*) OVER win AS BIGINT) AS w
                  FROM d
                  WINDOW win AS (PARTITION BY event_type ORDER BY hour
                                 ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING)),
            z AS (SELECT event_type, hour, n,
                         CAST(ws AS DOUBLE) / CAST(w AS DOUBLE) AS mean,
                         sqrt(greatest(
                           (CAST(ws2 AS DOUBLE)
                              - CAST(ws AS DOUBLE) * CAST(ws AS DOUBLE) / CAST(w AS DOUBLE))
                           / CAST(w - 1 AS DOUBLE), 0.0)) AS sigma
                  FROM w WHERE w >= 2)
            SELECT event_type, hour, n,
                   CAST(floor(mean * 1000000 + 0.5) AS BIGINT) AS mean_micro,
                   CAST(floor(sigma * 1000000 + 0.5) AS BIGINT) AS sigma_micro
            FROM z
            WHERE CAST(n AS DOUBLE) > mean + {ANOM_SIGMA} * sigma
            ORDER BY event_type, hour
        """,
        "full_outer_balance": """
            WITH cb AS (SELECT c_nationkey AS nationkey,
                               CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                                 AS cust_bal_c
                        FROM customer GROUP BY 1),
            sb AS (SELECT s_nationkey AS nationkey,
                          CAST(sum(CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                            AS supp_bal_c
                   FROM supplier GROUP BY 1),
            f AS (SELECT coalesce(cb.nationkey, sb.nationkey) AS nationkey,
                         coalesce(cust_bal_c, 0) AS cust_bal_c,
                         coalesce(supp_bal_c, 0) AS supp_bal_c,
                         CAST(cb.nationkey IS NOT NULL AS BIGINT) AS has_cust,
                         CAST(sb.nationkey IS NOT NULL AS BIGINT) AS has_supp
                  FROM cb FULL OUTER JOIN sb ON cb.nationkey = sb.nationkey)
            SELECT n.n_name, CAST(f.cust_bal_c AS BIGINT) AS cust_bal_c,
                   CAST(f.supp_bal_c AS BIGINT) AS supp_bal_c, f.has_cust, f.has_supp
            FROM f JOIN nation n ON n.n_nationkey = f.nationkey
            ORDER BY n.n_name
        """,
        "lineitem_unpivot": """
            WITH m AS (
              SELECT l_returnflag, 'quantity' AS metric,
                     CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_c
              FROM lineitem GROUP BY 1
              UNION ALL
              SELECT l_returnflag, 'extendedprice',
                     CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
              FROM lineitem GROUP BY 1
              UNION ALL
              SELECT l_returnflag, 'discount',
                     CAST(sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
              FROM lineitem GROUP BY 1
              UNION ALL
              SELECT l_returnflag, 'tax',
                     CAST(sum(CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
              FROM lineitem GROUP BY 1)
            SELECT * FROM m ORDER BY l_returnflag, metric
        """,
        "supplier_cnt_by_parttype": f"""
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> '{Q16_EXCL_BRAND}'
              AND p_size IN {Q16_SIZES}
              AND l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0.0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "idle_customers": f"""
            WITH pos AS (
              SELECT CAST(CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS DOUBLE) AS thresh
              FROM customer WHERE c_acctbal > 0.0)
            SELECT c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_cust,
                   CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                     AS total_bal_c
            FROM customer, pos
            WHERE CAST(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS DOUBLE) > pos.thresh
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}')
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "spend_rank_in_nation": """
            WITH s AS (
              SELECT o_custkey AS c_custkey,
                     CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS spend_c
              FROM orders GROUP BY o_custkey),
            j AS (
              SELECT n.n_name, c.c_custkey, s.spend_c
              FROM s JOIN customer c USING (c_custkey)
              JOIN nation n ON n.n_nationkey = c.c_nationkey)
            SELECT n_name,
                   CAST(dense_rank() OVER (
                     PARTITION BY n_name ORDER BY spend_c DESC) AS BIGINT) AS rnk,
                   c_custkey, spend_c
            FROM j QUALIFY rnk <= 3
            ORDER BY n_name, rnk, c_custkey
        """,
        "value_corr_by_type": """
            WITH b AS (SELECT event_type,
                              CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS y
                       FROM events),
            s AS (SELECT event_type,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(y) AS BIGINT) AS sy,
                         CAST(sum(x * x) AS BIGINT) AS sxx,
                         CAST(sum(y * y) AS BIGINT) AS syy,
                         CAST(sum(x * y) AS BIGINT) AS sxy
                  FROM b GROUP BY event_type)
            SELECT event_type, n,
                   CAST(floor(
                     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     * 1000000 + 0.5) AS BIGINT) AS r_micro
            FROM s ORDER BY event_type
        """,
        "q7_volume_shipping": f"""
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS year,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                            AS BIGINT)) AS BIGINT) AS revenue_c
            FROM lineitem
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c_nationkey
            WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
                OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
              AND l_shipdate >= TIMESTAMP '{Q7_FROM}'
              AND l_shipdate <  TIMESTAMP '{Q7_TO}'
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "q8_market_share": f"""
            WITH m AS (
              SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
                     CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                          AS BIGINT) AS rev_c,
                     ns.n_name AS supp_nation
              FROM lineitem
              JOIN part     ON p_partkey = l_partkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation nc ON nc.n_nationkey = c_nationkey
              JOIN region   ON r_regionkey = nc.n_regionkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation ns ON ns.n_nationkey = s_nationkey
              WHERE r_name = '{Q8_REGION}'
                AND p_type LIKE '{Q8_TYPE_PREFIX}%'
                AND o_orderdate >= TIMESTAMP '{Q8_FROM}'
                AND o_orderdate <  TIMESTAMP '{Q8_TO}'),
            a AS (
              SELECT year,
                     CAST(sum(CASE WHEN supp_nation = '{Q8_NATION}'
                                   THEN rev_c ELSE 0 END) AS BIGINT) AS nation_rev_c,
                     CAST(sum(rev_c) AS BIGINT) AS total_rev_c
              FROM m GROUP BY year)
            SELECT year, nation_rev_c, total_rev_c,
                   CAST((nation_rev_c * 10000 + total_rev_c // 2) // total_rev_c
                        AS BIGINT) AS share_bps
            FROM a ORDER BY year
        """,
        "q10_returned_items": f"""
            SELECT c.c_custkey, c.c_name, n.n_name,
                   CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                            AS BIGINT)) AS BIGINT) AS revenue_c
            FROM lineitem
            JOIN orders     ON o_orderkey = l_orderkey
            JOIN customer c ON c.c_custkey = o_custkey
            JOIN nation n   ON n.n_nationkey = c.c_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '{Q10_FROM}'
              AND o_orderdate <  TIMESTAMP '{Q10_TO}'
            GROUP BY 1, 2, 3, c.c_acctbal
            ORDER BY revenue_c DESC, c.c_custkey ASC LIMIT {Q10_TOP_N}
        """,
        "q14_promo_revenue": f"""
            WITH m AS (
              SELECT CASE WHEN p_type LIKE '{Q14_TYPE_PREFIX}%'
                          THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                          + 0.5) AS BIGINT) ELSE 0 END AS promo_c,
                     CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                          AS BIGINT) AS rev_c
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE l_shipdate >= TIMESTAMP '{Q14_FROM}'
                AND l_shipdate <  TIMESTAMP '{Q14_TO}')
            SELECT CAST(sum(promo_c) AS BIGINT) AS promo_rev_c,
                   CAST(sum(rev_c) AS BIGINT) AS total_rev_c,
                   CAST((sum(promo_c) * 10000 + sum(rev_c) // 2) // sum(rev_c)
                        AS BIGINT) AS promo_share_bps
            FROM m
        """,
        "extended_stats_by_type": """
            WITH b AS (SELECT event_type,
                              CAST(floor(value * 10.0 + 0.5) AS HUGEINT) AS x
                       FROM events),
            s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         sum(x) AS s1, sum(x*x) AS s2,
                         sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
                  FROM b GROUP BY 1),
            f AS (SELECT event_type, n, s1,
                         CAST(n AS DOUBLE) AS fn, CAST(s1 AS DOUBLE) AS f1,
                         CAST(s2 AS DOUBLE) AS f2, CAST(s3 AS DOUBLE) AS f3,
                         CAST(s4 AS DOUBLE) AS f4
                  FROM s),
            g AS (SELECT event_type, n, s1,
                         f1/fn AS mean,
                         f2/fn - (f1/fn)*(f1/fn) AS m2,
                         f3/fn - 3.0*(f1/fn)*(f2/fn)
                           + 2.0*(f1/fn)*(f1/fn)*(f1/fn) AS m3,
                         f4/fn - 4.0*(f1/fn)*(f3/fn)
                           + 6.0*(f1/fn)*(f1/fn)*(f2/fn)
                           - 3.0*(f1/fn)*(f1/fn)*(f1/fn)*(f1/fn) AS m4
                  FROM f)
            SELECT event_type, n, CAST(s1 AS BIGINT) AS sum_deci,
                   CAST(floor(mean*1000000 + 0.5) AS BIGINT) AS mean_micro,
                   CAST(floor(sqrt(m2)*1000000 + 0.5) AS BIGINT) AS std_micro,
                   CAST(floor(m3/(sqrt(m2)*sqrt(m2)*sqrt(m2))*1000000 + 0.5)
                        AS BIGINT) AS skew_micro,
                   CAST(floor((m4/(m2*m2) - 3.0)*1000000 + 0.5) AS BIGINT)
                     AS kurt_micro
            FROM g ORDER BY event_type
        """,
        "value_boxplot_by_type": """
            WITH b AS (SELECT event_type,
                              CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x
                       FROM events),
            q AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         quantile_disc(x, 0.25) AS q1_c,
                         quantile_disc(x, 0.5) AS median_c,
                         quantile_disc(x, 0.75) AS q3_c
                  FROM b GROUP BY 1)
            SELECT q.event_type, q.n, q1_c, median_c, q3_c,
                   CAST(q3_c - q1_c AS BIGINT) AS iqr_c,
                   (SELECT CAST(count(*) AS BIGINT) FROM b
                    WHERE b.event_type = q.event_type
                      AND (2*b.x < 2*q1_c - 3*(q3_c - q1_c)
                        OR 2*b.x > 2*q3_c + 3*(q3_c - q1_c))) AS n_outliers
            FROM q ORDER BY event_type
        """,
        "value_ttest": f"""
            WITH b AS (SELECT event_type,
                              CAST(floor(value * 10.0 + 0.5) AS HUGEINT) AS x
                       FROM events
                       WHERE event_type IN ('{TTEST_TYPE_A}', '{TTEST_TYPE_B}')),
            s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         sum(x) AS s1, sum(x*x) AS s2 FROM b GROUP BY 1),
            v AS (SELECT event_type, n, CAST(n AS DOUBLE) AS fn,
                         CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) AS mean,
                         (CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))
                           / (CAST(n AS DOUBLE) - 1.0) AS var
                  FROM s),
            a AS (SELECT * FROM v WHERE event_type = '{TTEST_TYPE_A}'),
            bb AS (SELECT * FROM v WHERE event_type = '{TTEST_TYPE_B}')
            SELECT a.n AS n_a, bb.n AS n_b,
                   CAST(floor((a.mean - bb.mean)
                        / sqrt(a.var/a.fn + bb.var/bb.fn) * 1000000 + 0.5)
                        AS BIGINT) AS t_micro,
                   CAST(floor((a.var/a.fn + bb.var/bb.fn)
                              * (a.var/a.fn + bb.var/bb.fn)
                        / (a.var/a.fn * (a.var/a.fn) / (a.fn - 1.0)
                           + bb.var/bb.fn * (bb.var/bb.fn) / (bb.fn - 1.0))
                        * 1000000 + 0.5) AS BIGINT) AS df_micro
            FROM a, bb
        """,
        "value_autocorr": """
            WITH h AS (SELECT event_type,
                              CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr,
                              CAST(sum(CAST(floor(value*100.0+0.5) AS BIGINT))
                                   AS BIGINT) AS v
                       FROM events GROUP BY 1, 2),
            p AS (SELECT a.event_type,
                         CAST(a.v AS HUGEINT) AS x, CAST(b.v AS HUGEINT) AS y
                  FROM h a JOIN h b
                    ON b.event_type = a.event_type AND b.hr = a.hr + 1),
            s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         sum(x) AS sx, sum(y) AS sy,
                         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
                  FROM p GROUP BY 1 HAVING count(*) >= 2)
            SELECT event_type, n,
                   CAST(floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                                 - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
                     * 1000000 + 0.5) AS BIGINT) AS r1_micro
            FROM s ORDER BY event_type
        """,
        "composite_buckets_page": f"""
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY 1, 2
            HAVING (lang > '{COMPOSITE_AFTER[0]}')
                OR (lang = '{COMPOSITE_AFTER[0]}' AND source > '{COMPOSITE_AFTER[1]}')
            ORDER BY lang, source LIMIT {COMPOSITE_PAGE}
        """,
        "hapax_by_lang": f"""
            WITH tok AS (SELECT doc_id, lang, {tok} AS toks FROM documents),
            pairs AS (SELECT DISTINCT doc_id, lang, unnest(toks) AS term FROM tok),
            d AS (SELECT lang, term, count(*) AS df FROM pairs GROUP BY 1, 2)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
                   CAST(count(*) FILTER (WHERE df = 1) AS BIGINT) AS n_hapax,
                   CAST((count(*) FILTER (WHERE df = 1) * 10000 + count(*) // 2)
                        // count(*) AS BIGINT) AS hapax_bps
            FROM d GROUP BY lang ORDER BY lang
        """,
        "events_hourly_dense": """
            WITH h AS (SELECT event_type,
                              CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr,
                              CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(CAST(floor(value*100.0+0.5) AS BIGINT))
                                   AS BIGINT) AS value_c
                       FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM h GROUP BY 1),
            g AS (SELECT r.event_type, unnest(generate_series(r.lo, r.hi)) AS hr
                  FROM r)
            SELECT g.event_type, CAST(g.hr AS BIGINT) AS hr,
                   CAST(coalesce(h.n, 0) AS BIGINT) AS n,
                   CAST(coalesce(h.value_c, 0) AS BIGINT) AS value_c
            FROM g LEFT JOIN h ON h.event_type = g.event_type AND h.hr = g.hr
            ORDER BY 1, 2
        """,
        "user_type_adjacency": """
            WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM p a JOIN p b
              ON a.user_id = b.user_id AND a.event_type <= b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "value_percentile_ranks": _percentile_ranks_sql(),
        "value_trend_by_type": """
            WITH b AS (SELECT event_type,
                              CAST(floor(epoch(ts)/3600) AS HUGEINT) AS x,
                              CAST(floor(value*100.0+0.5) AS HUGEINT) AS y
                       FROM events),
            s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         sum(x) AS sx, sum(y) AS sy,
                         sum(x*x) AS sxx, sum(x*y) AS sxy
                  FROM b GROUP BY 1)
            SELECT event_type, n,
                   CAST(floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                                 - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT) AS slope_micro,
                   CAST(floor((CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)
                        - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                                 - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                          * (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)))
                        * 1000000 + 0.5) AS BIGINT) AS intercept_micro
            FROM s ORDER BY event_type
        """,
        "nation_order_rank_dist": """
            WITH c AS (SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders
                       FROM orders o
                       JOIN customer cu ON cu.c_custkey = o.o_custkey
                       JOIN nation n ON n.n_nationkey = cu.c_nationkey
                       GROUP BY 1)
            SELECT n_name, n_orders,
                   CAST(floor(percent_rank() OVER (ORDER BY n_orders)
                        * 1000000 + 0.5) AS BIGINT) AS pr_micro,
                   CAST(floor(cume_dist() OVER (ORDER BY n_orders)
                        * 1000000 + 0.5) AS BIGINT) AS cd_micro
            FROM c ORDER BY n_name
        """,
        "cheapest_supplier_per_brand": """
            WITH u AS (SELECT p.p_brand,
                              CAST(floor(l_extendedprice / l_quantity * 100 + 0.5)
                                   AS BIGINT) AS price_c,
                              l_suppkey AS s_suppkey
                       FROM lineitem JOIN part p ON p.p_partkey = l_partkey)
            SELECT p_brand, price_c, s_suppkey
            FROM (SELECT p_brand, price_c, s_suppkey,
                         row_number() OVER (PARTITION BY p_brand
                                            ORDER BY price_c, s_suppkey) AS rn
                  FROM u)
            WHERE rn = 1 ORDER BY p_brand
        """,
        "bm25_function_score": bm25_sql(BM25_QUERY, limit=20, boost_sqrt_dl=True),
        "bm25_rank_feature": bm25_sql(
            BM25_QUERY, limit=20, rank_feature=(RF_WEIGHT, RF_PIVOT),
        ),
        "bm25_distance_feature": bm25_sql(
            BM25_QUERY, limit=20, distance_feature=(DF_WEIGHT, DF_PIVOT),
        ),
        "auc_length_en": f"""
            WITH h AS (SELECT CAST(n_chars AS BIGINT) AS s,
                              CAST(count(*) FILTER (WHERE lang = '{AUC_POS_LANG}')
                                   AS BIGINT) AS np_,
                              CAST(count(*) FILTER (WHERE lang <> '{AUC_POS_LANG}')
                                   AS BIGINT) AS nn_
                       FROM documents GROUP BY 1),
            c AS (SELECT s, np_, nn_,
                         CAST(coalesce(sum(nn_) OVER (ORDER BY s
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                              0) AS BIGINT) AS cum_nn
                  FROM h),
            t AS (SELECT sum(np_) AS tp, sum(nn_) AS tn,
                         sum(np_ * (2 * cum_nn + nn_)) AS u2
                  FROM c)
            SELECT CAST(tp AS BIGINT) AS n_pos, CAST(tn AS BIGINT) AS n_neg,
                   CAST((u2 * 10000 + tp * tn) // (2 * tp * tn) AS BIGINT)
                     AS auc_bps
            FROM t
        """,
        "kappa_quality_gates": f"""
            WITH f AS (SELECT (n_chars >= {KAPPA_CHARS_MIN}) AS a,
                              ({_WS_TOKENS_SQL} >= {KAPPA_TOKENS_MIN}) AS b
                       FROM documents),
            c AS (SELECT CAST(count(*) FILTER (WHERE a AND b) AS BIGINT) AS n11,
                         CAST(count(*) FILTER (WHERE a AND NOT b) AS BIGINT) AS n10,
                         CAST(count(*) FILTER (WHERE NOT a AND b) AS BIGINT) AS n01,
                         CAST(count(*) FILTER (WHERE NOT a AND NOT b) AS BIGINT) AS n00
                  FROM f)
            SELECT n11, n10, n01, n00,
                   CAST(floor((
                     ((CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE))
                        / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                      - (CAST(n11 + n10 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                           * (CAST(n11 + n01 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
                         + CAST(n01 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                           * (CAST(n10 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))))
                     / (1.0 - (CAST(n11 + n10 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                           * (CAST(n11 + n01 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
                         + CAST(n01 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                           * (CAST(n10 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))))
                   ) * 1000000 + 0.5) AS BIGINT) AS kappa_micro
            FROM c
        """,
        "bm25_terms_set": bm25_sql(
            BM25_QUERY,
            limit=20,
            terms_set_dl=(TERMS_SET_DL, TERMS_SET_LOW, TERMS_SET_HIGH),
            micro_rank=True,
        ),
        "phrase_suggest": _phrase_suggest_sql(),
        "diversified_sample": f"""
            WITH s AS (SELECT doc_id, lang, n_chars FROM documents
                       QUALIFY row_number() OVER (PARTITION BY lang
                                 ORDER BY n_chars DESC, doc_id)
                               <= {DIVSAMPLE_PER_LANG})
            SELECT row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1
                     AS rank,
                   doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
            FROM s ORDER BY n_chars DESC, doc_id LIMIT {DIVSAMPLE_N}
        """,
        "chi2_lang_source": """
            WITH o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                       FROM documents GROUP BY 1, 2),
            r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
            c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
            tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
            cells AS (SELECT r.r, c.c, coalesce(o.o, 0) AS o
                      FROM r CROSS JOIN c
                      LEFT JOIN o ON o.lang = r.lang AND o.source = c.source),
            t AS (SELECT CAST(floor(
                    CAST((SELECT n FROM tot) * o - r * c AS DOUBLE)
                    * CAST((SELECT n FROM tot) * o - r * c AS DOUBLE)
                    / (CAST((SELECT n FROM tot) AS DOUBLE)
                       * CAST(r * c AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS m
                  FROM cells)
            SELECT (SELECT n FROM tot) AS n,
                   CAST(((SELECT count(*) FROM r) - 1)
                        * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof,
                   CAST(sum(m) AS BIGINT) AS chi2_micro
            FROM t
        """,
        "logreg_lang_en": _logreg_sql(),
        "snapshot_diff": f"""
            WITH b AS (SELECT doc_id, lang, n_chars FROM documents),
            nxt AS (
              SELECT doc_id, lang,
                     CASE WHEN doc_id % 10 IN (1, 2)
                          THEN n_chars + {CDC_UPDATE_DELTA}
                          ELSE n_chars END AS n_chars
              FROM documents WHERE doc_id % 10 <> 0
              UNION ALL
              SELECT doc_id + {CDC_INSERT_OFFSET}, lang, n_chars
              FROM documents WHERE doc_id % 10 = 3),
            j AS (SELECT coalesce(b.lang, nxt.lang) AS lang,
                         CASE WHEN b.doc_id IS NULL THEN 'added'
                              WHEN nxt.doc_id IS NULL THEN 'removed'
                              WHEN b.n_chars <> nxt.n_chars THEN 'changed'
                              ELSE 'unchanged' END AS status
                  FROM b FULL OUTER JOIN nxt USING (doc_id))
            SELECT lang, status, CAST(count(*) AS BIGINT) AS n
            FROM j GROUP BY 1, 2
        """,
        "source_share_within_lang": """
            WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1, 2),
            p AS (SELECT lang, CAST(sum(n) AS BIGINT) AS p FROM c GROUP BY 1)
            SELECT c.lang, c.source, c.n,
                   CAST((c.n * 10000 * 2 + p.p) // (2 * p.p) AS BIGINT)
                     AS share_bps
            FROM c JOIN p ON p.lang = c.lang
            ORDER BY c.lang, c.source
        """,
        "zipf_fit_terms": f"""
            WITH tok AS (SELECT doc_id, {tok} AS toks FROM documents),
            pairs AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
            d AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                  FROM pairs GROUP BY term),
            top AS (SELECT df,
                           row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS r
                    FROM d ORDER BY df DESC, term ASC LIMIT {ZIPF_TOP}),
            q AS (SELECT CAST(floor(ln(CAST(r + 1 AS DOUBLE)) * 1000000 + 0.5)
                              AS HUGEINT) AS x,
                         CAST(floor(ln(CAST(df AS DOUBLE)) * 1000000 + 0.5)
                              AS HUGEINT) AS y
                  FROM top),
            s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
                  FROM q)
            SELECT CAST(n AS BIGINT) AS n_terms,
                   CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS slope_micro,
                   CAST(floor((CAST(sy AS DOUBLE)
                        - CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(sx AS DOUBLE))
                        / CAST(n AS DOUBLE) + 0.5) AS BIGINT)
                     AS intercept_micronat
            FROM s
        """,
        "funnel_time_to_convert": f"""
            WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t0
                       FROM events WHERE event_type = '{FUNNEL_FROM}'
                       GROUP BY 1),
            p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS tp
                  FROM events e JOIN v ON v.user_id = e.user_id
                  WHERE e.event_type = '{FUNNEL_TO}'
                    AND epoch_us(e.ts) >= v.t0
                  GROUP BY 1)
            SELECT p.user_id,
                   CAST((p.tp - v.t0) // 1000000 AS BIGINT) AS convert_sec
            FROM p JOIN v USING (user_id)
        """,
        "ab_test_conversion": f"""
            WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t0
                       FROM events WHERE event_type = '{FUNNEL_FROM}'
                       GROUP BY 1),
            conv AS (SELECT v.user_id,
                            CAST(max(CASE WHEN e.event_type = '{FUNNEL_TO}'
                                     AND epoch_us(e.ts) >= v.t0
                                     THEN 1 ELSE 0 END) AS BIGINT) AS k
                     FROM v JOIN events e ON e.user_id = v.user_id
                     GROUP BY 1),
            armed AS (SELECT CASE WHEN right(md5('{AB_SALT}:'
                               || CAST(user_id AS VARCHAR)), 1)
                               IN ('1','3','5','7','9','b','d','f')
                             THEN 1 ELSE 0 END AS arm, k
                      FROM conv),
            s AS (SELECT
                    CAST(coalesce(sum(CASE WHEN arm = 0 THEN 1 END), 0) AS BIGINT) AS n1,
                    CAST(coalesce(sum(CASE WHEN arm = 0 THEN k END), 0) AS BIGINT) AS k1,
                    CAST(coalesce(sum(CASE WHEN arm = 1 THEN 1 END), 0) AS BIGINT) AS n2,
                    CAST(coalesce(sum(CASE WHEN arm = 1 THEN k END), 0) AS BIGINT) AS k2
                  FROM armed)
            SELECT n1 AS n_a, k1 AS k_a, n2 AS n_b, k2 AS k_b,
                   CAST(floor(CASE WHEN n1 > 0 AND n2 > 0
                        AND k1 + k2 > 0 AND k1 + k2 < n1 + n2 THEN
                     (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                     / sqrt((CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                            * (1.0 - CAST(k1 + k2 AS DOUBLE)
                                     / CAST(n1 + n2 AS DOUBLE))
                            * (1.0 / CAST(n1 AS DOUBLE)
                               + 1.0 / CAST(n2 AS DOUBLE)))
                     ELSE 0.0 END * 1000000 + 0.5) AS BIGINT) AS z_micro
            FROM s
        """,
        "mann_kendall_daily_revenue": """
            WITH days AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS rev
                   FROM orders GROUP BY 1),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM days),
            ss AS (SELECT CAST(coalesce(sum(CASE WHEN b.rev > a.rev THEN 1
                                               WHEN b.rev < a.rev THEN -1
                                               ELSE 0 END), 0) AS BIGINT) AS s
                   FROM days a JOIN days b ON a.day < b.day),
            ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                                 AS BIGINT) AS tt
                     FROM (SELECT CAST(count(*) AS BIGINT) AS t
                           FROM days GROUP BY rev) WHERE t > 1),
            v AS (SELECT (SELECT n FROM nn) AS n, (SELECT s FROM ss) AS s,
                         (SELECT n FROM nn) * ((SELECT n FROM nn) - 1)
                           * (2 * (SELECT n FROM nn) + 5)
                           - (SELECT tt FROM ties) AS var18)
            SELECT n AS n_days, s, CAST(var18 AS BIGINT) AS var18,
                   CAST(floor(CASE
                     WHEN s > 0 THEN (s - 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                     WHEN s < 0 THEN (s + 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                     ELSE 0.0 END * 1000000 + 0.5) AS BIGINT) AS z_micro
            FROM v
        """,
        "zorder_events": f"""
            WITH e AS (SELECT event_id,
                              user_id % {1 << ZORDER_BITS} AS a,
                              least(CAST(floor(value * 100 + 0.5) AS BIGINT),
                                    {(1 << ZORDER_BITS) - 1}) AS b
                       FROM events)
            SELECT event_id,
                   CAST({" + ".join(
                       f"(((a >> {i}) & 1) << {2 * i + 1})"
                       f" + (((b >> {i}) & 1) << {2 * i})"
                       for i in range(ZORDER_BITS)
                   )} AS BIGINT) AS zval
            FROM e
        """,
        "value_quantile_normalize": """
            WITH e AS (SELECT event_id,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                       FROM events),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
            r AS (SELECT event_id,
                         CAST(count(*) OVER (ORDER BY v RANGE BETWEEN
                              UNBOUNDED PRECEDING AND CURRENT ROW)
                              AS BIGINT) AS le
                  FROM e)
            SELECT event_id,
                   CAST((le * 10000 * 2 + (SELECT n FROM nn))
                        // (2 * (SELECT n FROM nn)) AS BIGINT) AS q_bps
            FROM r
        """,
        "bm25_decay_gauss": bm25_sql(
            BM25_QUERY, limit=20,
            decay_gauss=(DECAY_ORIGIN, float(2 * DECAY_SCALE * DECAY_SCALE)),
        ),
        "bm25_pinned": bm25_sql(BM25_QUERY, limit=20, pinned_ids=PINNED_IDS),
        "hhi_supplier_revenue": """
            WITH s AS (SELECT l_suppkey,
                              CAST(sum(CAST(floor(l_extendedprice
                                   * (1.0 - l_discount) * 100 + 0.5) AS BIGINT))
                                   AS HUGEINT) AS rev
                       FROM lineitem GROUP BY 1),
            t AS (SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
                         sum(rev) AS total,
                         sum(rev * rev) AS sq FROM s)
            SELECT n_suppliers,
                   CAST(total AS BIGINT) AS total_c,
                   CAST((sq * 10000 * 2 + total * total)
                        // (2 * total * total) AS BIGINT) AS hhi_bps
            FROM t
        """,
        "top_metrics_by_lang": """
            SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
            FROM (SELECT lang, doc_id, n_chars,
                         row_number() OVER (PARTITION BY lang
                             ORDER BY n_chars DESC, doc_id ASC) AS rn
                  FROM documents)
            WHERE rn = 1 ORDER BY lang
        """,
        "scd2_intervals": f"""
            WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
                              event_type FROM events),
            o AS (SELECT user_id, t, event_id, event_type,
                         lag(event_type) OVER
                           (PARTITION BY user_id ORDER BY t, event_id) AS prev
                  FROM e),
            starts AS (SELECT user_id, t, event_id, event_type,
                              row_number() OVER
                                (PARTITION BY user_id ORDER BY t, event_id)
                                - 1 AS version
                       FROM o WHERE prev IS NULL OR prev <> event_type)
            SELECT user_id, CAST(version AS BIGINT) AS version,
                   event_type AS attr,
                   CAST(t AS BIGINT) AS valid_from_us,
                   CAST(coalesce(lead(t) OVER
                          (PARTITION BY user_id ORDER BY t, event_id),
                        {SCD2_OPEN_US}) AS BIGINT) AS valid_to_us
            FROM starts ORDER BY user_id, version
        """,
        "knn_l2": """
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id < 3),
            sims AS (
              SELECT q.q_id, e.vec_id,
                     list_distance(e.embedding::DOUBLE[], q.qe) AS dist
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT q_id, vec_id, dist,
                     row_number() OVER (PARTITION BY q_id
                         ORDER BY dist ASC, vec_id ASC) - 1 AS rank
              FROM sims)
            SELECT q_id, rank, vec_id,
                   CAST(floor(dist * 1000000 + 0.5) AS BIGINT) AS dist_micro
            FROM ranked WHERE rank < 10 ORDER BY q_id, rank
        """,
        "daily_revenue_normalize": """
            WITH days AS (
              SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            st AS (SELECT CAST(sum(rev) AS BIGINT) AS total,
                          min(rev) AS mn, max(rev) AS mx FROM days)
            SELECT day, rev,
                   CAST(floor(CAST(rev AS DOUBLE)
                              / CAST((SELECT total FROM st) AS DOUBLE)
                              * 1000000 + 0.5) AS BIGINT) AS pct_micro,
                   CAST(floor(CASE WHEN (SELECT mx FROM st) = (SELECT mn FROM st)
                                   THEN 1.0
                                   ELSE CAST(rev - (SELECT mn FROM st) AS DOUBLE)
                                        / CAST((SELECT mx FROM st)
                                               - (SELECT mn FROM st) AS DOUBLE)
                              END * 1000000 + 0.5) AS BIGINT) AS rescale_micro
            FROM days ORDER BY day
        """,
        "holt_daily_revenue": f"""
            WITH RECURSIVE days AS (
              SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            ord AS (SELECT day, rev,
                           row_number() OVER (ORDER BY day) AS i FROM days),
            walk AS (
              SELECT i, day, rev,
                     CAST(rev AS DOUBLE) AS s,
                     COALESCE((SELECT CAST(o2.rev AS DOUBLE) FROM ord o2
                               WHERE o2.i = 2), CAST(rev AS DOUBLE))
                       - CAST(rev AS DOUBLE) AS b
              FROM ord WHERE i = 1
              UNION ALL
              SELECT o.i, o.day, o.rev,
                     {HOLT_ALPHA} * CAST(o.rev AS DOUBLE)
                       + {1.0 - HOLT_ALPHA} * (w.s + w.b),
                     {HOLT_BETA} * (({HOLT_ALPHA} * CAST(o.rev AS DOUBLE)
                       + {1.0 - HOLT_ALPHA} * (w.s + w.b)) - w.s)
                       + {1.0 - HOLT_BETA} * w.b
              FROM walk w JOIN ord o ON o.i = w.i + 1)
            SELECT day, rev,
                   CAST(floor(s * 1000000 + 0.5) AS BIGINT) AS level_micro,
                   CAST(floor(b * 1000000 + 0.5) AS BIGINT) AS trend_micro
            FROM walk ORDER BY day
        """,
        "ewma_daily_orders": """
            WITH RECURSIVE days AS (
              SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM orders GROUP BY 1),
            ord AS (SELECT day, n,
                           row_number() OVER (ORDER BY day) AS i FROM days),
            walk AS (
              SELECT i, day, n, CAST(n AS DOUBLE) AS z FROM ord WHERE i = 1
              UNION ALL
              SELECT o.i, o.day, o.n, 0.5 * CAST(o.n AS DOUBLE) + 0.5 * w.z
              FROM walk w JOIN ord o ON o.i = w.i + 1)
            SELECT day, n,
                   CAST(floor(z * 1000000 + 0.5) AS BIGINT) AS ewma_micro
            FROM walk ORDER BY day
        """,
        "cusum_daily_revenue": f"""
            WITH RECURSIVE days AS (
              SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS HUGEINT) AS rev
              FROM orders GROUP BY 1),
            ord AS (SELECT day, rev,
                           row_number() OVER (ORDER BY day) AS i FROM days),
            p AS (SELECT CAST(count(*) AS HUGEINT) AS nd,
                         CAST(sum(rev) AS HUGEINT) AS tot FROM ord),
            t AS (SELECT (tot + nd // 2) // nd AS target,
                         ((tot + nd // 2) // nd) // {CUSUM_SLACK_DIV} AS k
                  FROM p),
            walk AS (
              SELECT o.i, o.day, o.rev,
                     greatest(CAST(0 AS HUGEINT),
                              o.rev - ((SELECT target FROM t) + (SELECT k FROM t))) AS sp,
                     greatest(CAST(0 AS HUGEINT),
                              ((SELECT target FROM t) - (SELECT k FROM t)) - o.rev) AS sn
              FROM ord o WHERE o.i = 1
              UNION ALL
              SELECT o.i, o.day, o.rev,
                     greatest(CAST(0 AS HUGEINT),
                              w.sp + o.rev - ((SELECT target FROM t) + (SELECT k FROM t))),
                     greatest(CAST(0 AS HUGEINT),
                              w.sn + ((SELECT target FROM t) - (SELECT k FROM t)) - o.rev)
              FROM walk w JOIN ord o ON o.i = w.i + 1)
            SELECT day, CAST(rev AS BIGINT) AS rev_c,
                   CAST(sp AS BIGINT) AS s_pos_c,
                   CAST(sn AS BIGINT) AS s_neg_c
            FROM walk ORDER BY day
        """,
        "filters_agg_events": f"""
            WITH e AS (SELECT event_type,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
                       FROM events)
            SELECT 'high_value' AS bucket, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(coalesce(sum(c), 0) AS BIGINT) AS value_c
            FROM e WHERE c >= {FILTERS_AGG_HIGH_CENTS}
            UNION ALL
            SELECT 'clicks', count(*), CAST(coalesce(sum(c), 0) AS BIGINT)
            FROM e WHERE event_type = 'click'
            UNION ALL
            SELECT 'errors_or_signups', count(*), CAST(coalesce(sum(c), 0) AS BIGINT)
            FROM e WHERE event_type IN ('error', 'signup')
            UNION ALL
            SELECT '_other_', count(*), CAST(coalesce(sum(c), 0) AS BIGINT)
            FROM e WHERE c < {FILTERS_AGG_HIGH_CENTS}
              AND event_type NOT IN ('click', 'error', 'signup')
        """,
        "mutual_info_lang_source": """
            WITH o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                       FROM documents GROUP BY 1, 2),
            r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
            c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
            tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
            mi AS (SELECT CAST(floor(
                     (CAST(o.o AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE))
                     * ln(CAST(o.o * (SELECT n FROM tot) AS DOUBLE)
                          / CAST(r.r * c.c AS DOUBLE))
                     * 1000000 + 0.5) AS BIGINT) AS m
                   FROM o JOIN r ON r.lang = o.lang
                          JOIN c ON c.source = o.source
                   WHERE o.o > 0),
            hl AS (SELECT CAST(floor(
                     -(CAST(r AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE))
                     * ln(CAST(r AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE))
                     * 1000000 + 0.5) AS BIGINT) AS m FROM r WHERE r > 0),
            hs AS (SELECT CAST(floor(
                     -(CAST(c AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE))
                     * ln(CAST(c AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE))
                     * 1000000 + 0.5) AS BIGINT) AS m FROM c WHERE c > 0)
            SELECT (SELECT n FROM tot) AS n,
                   (SELECT CAST(sum(m) AS BIGINT) FROM mi) AS mi_micro,
                   (SELECT CAST(sum(m) AS BIGINT) FROM hl) AS h_lang_micro,
                   (SELECT CAST(sum(m) AS BIGINT) FROM hs) AS h_source_micro
        """,
        "ks_test_value": f"""
            WITH e AS (SELECT event_type,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                       FROM events
                       WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')),
            g AS (SELECT v,
                    CAST(count(*) FILTER (WHERE event_type = '{KS_TYPE_A}')
                         AS HUGEINT) AS a,
                    CAST(count(*) FILTER (WHERE event_type = '{KS_TYPE_B}')
                         AS HUGEINT) AS b
                  FROM e GROUP BY v),
            n AS (SELECT sum(a) AS n1, sum(b) AS n2 FROM g),
            cum AS (SELECT v,
                      sum(a) OVER (ORDER BY v) AS ca,
                      sum(b) OVER (ORDER BY v) AS cb
                    FROM g),
            d AS (SELECT v, abs(ca * (SELECT n2 FROM n)
                                - cb * (SELECT n1 FROM n)) AS gap FROM cum),
            m AS (SELECT max(gap) AS g FROM d)
            SELECT CAST((SELECT n1 FROM n) AS BIGINT) AS n1,
                   CAST((SELECT n2 FROM n) AS BIGINT) AS n2,
                   CAST((SELECT min(v) FROM d
                         WHERE gap = (SELECT g FROM m)) AS BIGINT) AS at_cent,
                   CAST((2 * (SELECT g FROM m) * 1000000
                         + (SELECT n1 * n2 FROM n))
                        // (2 * (SELECT n1 * n2 FROM n)) AS BIGINT) AS ks_micro
        """,
        "spearman_qty_discount": """
            WITH j AS (SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qv,
                              CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dv,
                              CAST(count(*) AS HUGEINT) AS c
                       FROM lineitem GROUP BY 1, 2),
            mq AS (SELECT qv, sum(c) AS cq FROM j GROUP BY 1),
            mq2 AS (SELECT qv, cq,
                      2 * (sum(cq) OVER (ORDER BY qv) - cq) + cq + 1 AS r2
                    FROM mq),
            md AS (SELECT dv, sum(c) AS cd FROM j GROUP BY 1),
            md2 AS (SELECT dv, cd,
                      2 * (sum(cd) OVER (ORDER BY dv) - cd) + cd + 1 AS r2
                    FROM md),
            s AS (SELECT (SELECT sum(c) FROM j) AS n,
                         (SELECT sum(cq * r2) FROM mq2) AS sx,
                         (SELECT sum(cq * r2 * r2) FROM mq2) AS sxx,
                         (SELECT sum(cd * r2) FROM md2) AS sy,
                         (SELECT sum(cd * r2 * r2) FROM md2) AS syy,
                         (SELECT sum(j.c * a.r2 * b.r2)
                          FROM j JOIN mq2 a USING (qv)
                                 JOIN md2 b USING (dv)) AS sxy)
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT) AS rho_micro
            FROM s
        """,
        "ztest_quality_en": f"""
            WITH cnt AS (SELECT
                CAST(count(*) FILTER (WHERE lang = '{ZTEST_LANG}')
                     AS BIGINT) AS n1,
                CAST(count(*) FILTER (WHERE lang = '{ZTEST_LANG}'
                     AND n_chars >= {ZTEST_CHARS_MIN}) AS BIGINT) AS k1,
                CAST(count(*) FILTER (WHERE lang <> '{ZTEST_LANG}')
                     AS BIGINT) AS n2,
                CAST(count(*) FILTER (WHERE lang <> '{ZTEST_LANG}'
                     AND n_chars >= {ZTEST_CHARS_MIN}) AS BIGINT) AS k2
                FROM documents)
            SELECT n1, k1, n2, k2,
                   CAST(floor(
                     (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                     / sqrt((CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                            * (1.0 - CAST(k1 + k2 AS DOUBLE)
                                     / CAST(n1 + n2 AS DOUBLE))
                            * (1.0 / CAST(n1 AS DOUBLE)
                               + 1.0 / CAST(n2 AS DOUBLE)))
                     * 1000000 + 0.5) AS BIGINT) AS z_micro
            FROM cnt
        """,
        "string_stats_by_lang": """
            WITH c AS (SELECT lang, unnest(string_split(text, '')) AS ch
                       FROM documents),
            h AS (SELECT lang, ch, CAST(count(*) AS BIGINT) AS n
                  FROM c GROUP BY 1, 2),
            e AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nt,
                         CAST(count(*) AS BIGINT) AS dc,
                         CAST(sum(CAST(floor(CAST(n AS DOUBLE)
                              * ln(CAST(n AS DOUBLE)) * 1000000 + 0.5)
                              AS BIGINT)) AS BIGINT) AS s
                  FROM h GROUP BY 1),
            d AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(min(length(text)) AS BIGINT) AS min_len,
                         CAST(max(length(text)) AS BIGINT) AS max_len,
                         CAST(sum(length(text)) AS BIGINT) AS sum_len
                  FROM documents GROUP BY 1)
            SELECT d.lang, n_docs, min_len, max_len,
                   sum_len * 1000000 // n_docs AS avg_len_micro,
                   nt AS n_chars_total, dc AS distinct_chars,
                   CAST(floor(ln(CAST(nt AS DOUBLE)) * 1000000 + 0.5)
                        AS BIGINT) - s // nt AS entropy_micro
            FROM d JOIN e USING (lang) ORDER BY d.lang
        """,
        "daily_order_moving_stats": f"""
            WITH daily AS (SELECT CAST(epoch(o_orderdate) // 86400 AS BIGINT)
                                    AS day,
                                  CAST(count(*) AS BIGINT) AS cnt
                           FROM orders GROUP BY 1),
            axis AS (SELECT unnest(range((SELECT min(day) FROM daily),
                                         (SELECT max(day) FROM daily) + 1))
                       AS day),
            dense AS (SELECT a.day, coalesce(d.cnt, 0) AS cnt,
                             row_number() OVER (ORDER BY a.day) - 1 AS idx
                      FROM axis a LEFT JOIN daily d USING (day)),
            w AS (SELECT day, cnt, idx,
                         sum(cnt) OVER (ORDER BY day
                           ROWS BETWEEN {MOVING_WINDOW - 1} PRECEDING
                           AND CURRENT ROW) AS wsum,
                         lag(cnt, {MOVING_WINDOW}) OVER (ORDER BY day) AS lag7
                  FROM dense)
            SELECT day, cnt,
                   CAST(wsum * 1000000 // {MOVING_WINDOW} AS BIGINT)
                     AS ma7_micro,
                   CAST(cnt - lag7 AS BIGINT) AS diff7
            FROM w WHERE idx >= {MOVING_WINDOW} ORDER BY day
        """,
        "daily_bucket_stats": f"""
            WITH daily AS (SELECT CAST(epoch(o_orderdate) // 86400 AS BIGINT)
                             AS day, CAST(count(*) AS BIGINT) AS cnt
                           FROM orders GROUP BY 1),
            r AS (SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn
                  FROM daily),
            t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(min(cnt) AS BIGINT) AS mn,
                         CAST(max(cnt) AS BIGINT) AS mx,
                         CAST(sum(cnt) AS BIGINT) AS s
                  FROM daily)
            SELECT n AS n_buckets, mn AS min_cnt, mx AS max_cnt, s AS sum_cnt,
                   s * 1000000 // n AS avg_cnt_micro,
                   {", ".join(
                       f"(SELECT cnt FROM r WHERE rn = greatest(1, ({p} * (SELECT n FROM t) + 99) // 100)) AS p{p}"
                       for p in PB_PCTS
                   )}
            FROM t
        """,
        "bucket_sort_daily": f"""
            WITH daily AS (SELECT CAST(epoch(o_orderdate) // 86400 AS BIGINT)
                             AS day, CAST(count(*) AS BIGINT) AS cnt
                           FROM orders GROUP BY 1),
            r AS (SELECT day, cnt,
                         row_number() OVER (ORDER BY cnt DESC, day) - 1 AS rank
                  FROM daily)
            SELECT rank, day, cnt FROM r
            WHERE rank >= {BSORT_FROM} AND rank < {BSORT_FROM + BSORT_SIZE}
            ORDER BY rank
        """,
        "auto_date_histogram": f"""
            WITH d AS (SELECT CAST(epoch(o_orderdate) // 86400 AS BIGINT)
                         AS day FROM orders),
            mm AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
            iv AS (SELECT CASE
                {" ".join(f"WHEN hi // {c} - lo // {c} + 1 <= {ADH_TARGET} THEN {c}" for c in ADH_LADDER[:-1])}
                ELSE {ADH_LADDER[-1]} END AS iv FROM mm)
            SELECT (day // (SELECT iv FROM iv)) * (SELECT iv FROM iv)
                     AS bucket_day,
                   CAST((SELECT iv FROM iv) AS BIGINT) AS interval_days,
                   CAST(count(*) AS BIGINT) AS n
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "docs_random_score": f"""
            SELECT row_number() OVER (
                     ORDER BY md5('{RSCORE_SEED}:' || CAST(doc_id AS VARCHAR)),
                              doc_id) - 1 AS rank,
                   doc_id
            FROM documents WHERE lang = '{RSCORE_LANG}'
            ORDER BY md5('{RSCORE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
            LIMIT 20
        """,
        "multi_terms_counts": f"""
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang, source
            ORDER BY n DESC, lang, source LIMIT {MULTI_TERMS_K}
        """,
        "match_phrase_prefix": bm25_sql(
            MPP_FIXED, limit=20, phrase_adjacent=True, phrase_prefix=MPP_PREFIX
        ),
        "lineitem_matrix_stats": """
            WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x0,
                              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x1,
                              CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x2
                       FROM lineitem),
            m AS (SELECT CAST(count(*) AS DOUBLE) AS fn,
                         CAST(sum(CAST(x0 AS HUGEINT)) AS DOUBLE) AS s0,
                         CAST(sum(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
                         CAST(sum(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
                         CAST(sum(CAST(x0 AS HUGEINT) * x0) AS DOUBLE) AS s00,
                         CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
                         CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
                         CAST(sum(CAST(x0 AS HUGEINT) * x1) AS DOUBLE) AS s01,
                         CAST(sum(CAST(x0 AS HUGEINT) * x2) AS DOUBLE) AS s02,
                         CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12
                  FROM b)
            SELECT 'l_quantity' AS field_x, 'l_extendedprice' AS field_y,
                   CAST(floor((s01/fn - (s0/fn)*(s1/fn)) * 1000000 + 0.5) AS BIGINT) AS cov_micro,
                   CAST(floor((s01/fn - (s0/fn)*(s1/fn))
                        / sqrt((s00/fn - (s0/fn)*(s0/fn)) * (s11/fn - (s1/fn)*(s1/fn)))
                        * 1000000 + 0.5) AS BIGINT) AS corr_micro FROM m
            UNION ALL
            SELECT 'l_quantity', 'l_discount',
                   CAST(floor((s02/fn - (s0/fn)*(s2/fn)) * 1000000 + 0.5) AS BIGINT),
                   CAST(floor((s02/fn - (s0/fn)*(s2/fn))
                        / sqrt((s00/fn - (s0/fn)*(s0/fn)) * (s22/fn - (s2/fn)*(s2/fn)))
                        * 1000000 + 0.5) AS BIGINT) FROM m
            UNION ALL
            SELECT 'l_extendedprice', 'l_discount',
                   CAST(floor((s12/fn - (s1/fn)*(s2/fn)) * 1000000 + 0.5) AS BIGINT),
                   CAST(floor((s12/fn - (s1/fn)*(s2/fn))
                        / sqrt((s11/fn - (s1/fn)*(s1/fn)) * (s22/fn - (s2/fn)*(s2/fn)))
                        * 1000000 + 0.5) AS BIGINT) FROM m
        """,
        "weighted_avg_price": """
            SELECT l_returnflag,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(floor(
                     CAST(sum(CAST(CAST(l_quantity AS BIGINT)
                          * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          AS HUGEINT)) AS DOUBLE)
                     / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                     * 1000.0 + 0.5) AS BIGINT) AS wavg_milli
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "daily_purchase_ratio": f"""
            WITH d AS (
              SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                     CAST(count(*) AS BIGINT) AS n_total,
                     CAST(count(*) FILTER (WHERE event_type = 'purchase')
                          AS BIGINT) AS n_purchase,
                     CAST(count(*) FILTER (WHERE event_type = 'view')
                          AS BIGINT) AS n_view
              FROM events GROUP BY 1),
            w AS (SELECT day, n_total, n_purchase, n_view,
                         CAST(coalesce(n_total - lag(n_total) OVER (ORDER BY day), 0)
                              AS BIGINT) AS deriv,
                         CAST(CASE WHEN n_view = 0 THEN -1
                              ELSE (n_purchase * 1000000 + n_view // 2) // n_view
                              END AS BIGINT) AS ratio_micro
                  FROM d)
            SELECT day, n_total, n_purchase, n_view, ratio_micro, deriv
            FROM w WHERE ratio_micro >= {RATIO_MIN_MICRO} ORDER BY day
        """,
        "q4_order_priority": f"""
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '{Q4_FROM}'
              AND o_orderdate <  TIMESTAMP '{Q4_TO}'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q12_priority_by_returnflag": f"""
            SELECT l_returnflag,
                   CAST(count(*) FILTER (WHERE o_orderpriority IN
                        ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}')) AS BIGINT)
                     AS high_line_count,
                   CAST(count(*) FILTER (WHERE o_orderpriority NOT IN
                        ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}')) AS BIGINT)
                     AS low_line_count
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '{Q12_FROM}'
              AND l_shipdate <  TIMESTAMP '{Q12_TO}'
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q15_top_supplier": f"""
            WITH rev AS (
              SELECT l_suppkey AS s_suppkey,
                     CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                         * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS total_revenue_c
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
                AND l_shipdate <  TIMESTAMP '{Q15_TO}'
              GROUP BY 1)
            SELECT s_suppkey, s_name, total_revenue_c
            FROM supplier JOIN rev USING (s_suppkey)
            WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM rev)
            ORDER BY s_suppkey
        """,
        "q19_discounted_revenue": f"""
            SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice
                        * (1 - l_discount) * 100 + 0.5) AS BIGINT)), 0)
                   AS BIGINT) AS revenue_c
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE {" OR ".join(
                f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
                f" AND l_quantity BETWEEN {qlo} AND {qhi})"
                for b, slo, shi, qlo, qhi in Q19_BRANCHES)}
        """,
        "q20_part_promotion": f"""
            SELECT s_suppkey, s_name, qty FROM supplier JOIN (
              SELECT l_suppkey AS s_suppkey,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE '{Q20_PREFIX}%')
                AND l_shipdate >= TIMESTAMP '{Q20_FROM}'
                AND l_shipdate <  TIMESTAMP '{Q20_TO}'
              GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > {Q20_MIN_QTY}
            ) USING (s_suppkey) ORDER BY s_suppkey
        """,
        "q21_waiting_suppliers": f"""
            WITH ls AS (
              SELECT l_orderkey AS ok, l_suppkey AS sk,
                     max(CASE WHEN l_shipdate > o_orderdate
                              + INTERVAL {Q21_LATE_DAYS} DAY
                              THEN 1 ELSE 0 END) AS late
              FROM lineitem JOIN orders ON o_orderkey = l_orderkey
              GROUP BY 1, 2),
            g AS (SELECT ok, sk, late,
                         count(*) OVER (PARTITION BY ok) AS n_supp,
                         sum(late) OVER (PARTITION BY ok) AS n_late
                  FROM ls)
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM g JOIN supplier ON s_suppkey = sk
            WHERE late = 1 AND n_supp > 1 AND n_late = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name LIMIT 10
        """,
        "q9_product_profit": f"""
            SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                        - l_quantity * {Q9_COST_FACTOR} * p_retailprice)
                        * 100 + 0.5) AS BIGINT)) AS BIGINT) AS profit_c
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%{Q9_TOKEN}%'
            GROUP BY 1, 2 ORDER BY n_name, o_year DESC
        """,
        "cumulative_users": """
            WITH f AS (SELECT user_id,
                              CAST(min(floor(epoch(ts) / 86400)) AS BIGINT) AS day
                       FROM events GROUP BY 1),
            d AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
                  FROM f GROUP BY 1)
            SELECT day, new_users,
                   CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
            FROM d ORDER BY day
        """,
        "ccnet_buckets": r"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0) AS toks
              FROM documents
            ), pairs AS (
              SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
              FROM tok, unnest(generate_series(1, len(toks)-1)) AS g(i)
              WHERE len(toks) >= 2
            ), bgc AS (
              SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2
            ), lc AS (
              SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1
            ), voc AS (
              SELECT count(DISTINCT tok) AS v
              FROM (SELECT unnest(toks) AS tok FROM tok)
            ), scored AS (
              SELECT p.doc_id,
                     CAST(floor(ln((COALESCE(b.c2, 0) + 1.0) / (COALESCE(l.c1, 0) + voc.v)) * 1000 + 0.5) AS BIGINT) AS ll
              FROM pairs p
              LEFT JOIN bgc b ON p.w1 = b.w1 AND p.w2 = b.w2
              LEFT JOIN lc l ON p.w1 = l.w1
              CROSS JOIN voc
            ), agg AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
                     CAST(sum(ll) AS BIGINT) AS ll_milli
              FROM scored GROUP BY doc_id
            ), p2 AS (
              SELECT d.lang,
                     CAST((-a.ll_milli) // (a.n_pairs * 10) AS BIGINT) AS nll_centi
              FROM documents d JOIN agg a ON d.doc_id = a.doc_id
              WHERE a.n_pairs >= 1
            ), q AS (
              SELECT lang,
                     quantile_disc(nll_centi, 0.3333333333333333) AS q1,
                     quantile_disc(nll_centi, 0.6666666666666666) AS q2
              FROM p2 GROUP BY lang
            ), b2 AS (
              SELECT p2.lang,
                     CASE WHEN nll_centi <= q.q1 THEN 'head'
                          WHEN nll_centi <= q.q2 THEN 'middle'
                          ELSE 'tail' END AS bucket
              FROM p2 JOIN q USING (lang)
            )
            SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs
            FROM b2 GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "linear_attribution": f"""
            WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events
                       WHERE event_type IN ('view', 'click', 'purchase')),
            p AS (SELECT user_id, t FROM e WHERE event_type = 'purchase'),
            tch AS (SELECT user_id, t, event_type FROM e
                    WHERE event_type <> 'purchase'),
            pairs AS (
              SELECT p.user_id, p.t AS pt, tch.event_type AS touch_type
              FROM p JOIN tch ON tch.user_id = p.user_id
               AND tch.t >= p.t - {ATTR_WINDOW_S * 1_000_000}
               AND tch.t <= p.t),
            pn AS (SELECT user_id, pt, CAST(count(*) AS BIGINT) AS n
                   FROM pairs GROUP BY 1, 2),
            agg AS (
              SELECT touch_type,
                     CAST(sum(1000 // pn.n) AS BIGINT) AS credit_milli,
                     CAST(count(*) AS BIGINT) AS n_touches
              FROM pairs JOIN pn USING (user_id, pt)
              GROUP BY touch_type)
            SELECT ty.touch_type,
                   coalesce(agg.credit_milli, 0) AS credit_milli,
                   coalesce(agg.n_touches, 0) AS n_touches
            FROM (VALUES ('view'), ('click')) AS ty(touch_type)
            LEFT JOIN agg USING (touch_type)
            ORDER BY ty.touch_type
        """,
        "categorize_text_docs": f"""
            SELECT array_to_string(
                     list_slice(regexp_split_to_array(
                       regexp_replace(coalesce(text, ''), '\\d+', '#', 'g'),
                       '\\s+'), 1, {CATEGORIZE_TOKENS}), ' ') AS template,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
            ORDER BY n DESC, template ASC LIMIT {CATEGORIZE_TOP}
        """,
        "moving_percentiles_daily": f"""
            WITH daily AS (SELECT CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day,
                                  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                       AS BIGINT)) AS BIGINT) AS rev
                           FROM orders GROUP BY 1),
            axis AS (SELECT unnest(range((SELECT min(day) FROM daily),
                                         (SELECT max(day) FROM daily) + 1)) AS day),
            dense AS (SELECT a.day, coalesce(d.rev, 0) AS rev,
                             row_number() OVER (ORDER BY a.day) - 1 AS idx
                      FROM axis a LEFT JOIN daily d USING (day)),
            w AS (SELECT day, rev, idx,
                         {", ".join(
                             f"quantile_disc(rev, {q}) OVER (ORDER BY day "
                             f"ROWS BETWEEN {MOVING_WINDOW - 1} PRECEDING "
                             f"AND CURRENT ROW) AS p{int(q * 100)}_cents"
                             for q in MOVING_PCT_QS
                         )}
                  FROM dense)
            SELECT day, rev, {", ".join(
                f"CAST(p{int(q * 100)}_cents AS BIGINT) AS p{int(q * 100)}_cents"
                for q in MOVING_PCT_QS
            )}
            FROM w WHERE idx >= {MOVING_WINDOW} ORDER BY day
        """,
        "orders_date_range_agg": f"""
            WITH b AS (
              SELECT CASE WHEN o_orderdate < DATE '{DATE_RANGE_EDGES[0]}' THEN 0
                          WHEN o_orderdate < DATE '{DATE_RANGE_EDGES[1]}' THEN 1
                          ELSE 2 END AS bucket,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM orders)
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS rev_cents
            FROM b GROUP BY bucket ORDER BY bucket
        """,
        "weekly_event_rate": """
            WITH w AS (SELECT date_trunc('week', ts) AS ws FROM events),
            g AS (SELECT ws, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY ws)
            SELECT strftime(ws, '%Y-%m-%d') AS week_start, n,
                   CAST(n * 1000 // 7 AS BIGINT) AS rate_milli
            FROM g ORDER BY ws
        """,
        "filters_agg_orders": """
            WITH o AS (SELECT o_orderpriority AS prio,
                              CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                       FROM orders),
            b AS (
              SELECT 'urgent' AS bucket, count(*) AS n,
                     COALESCE(sum(cents), 0) AS rev FROM o WHERE prio = '1-URGENT'
              UNION ALL
              SELECT 'high', count(*), COALESCE(sum(cents), 0)
              FROM o WHERE prio = '2-HIGH'
              UNION ALL
              SELECT 'low_value', count(*), COALESCE(sum(cents), 0)
              FROM o WHERE cents < 100000
              UNION ALL
              SELECT '_other_', count(*), COALESCE(sum(cents), 0)
              FROM o WHERE prio <> '1-URGENT' AND prio <> '2-HIGH'
                      AND cents >= 100000)
            SELECT bucket, CAST(n AS BIGINT) AS n, CAST(rev AS BIGINT) AS rev_cents
            FROM b ORDER BY bucket
        """,
        "top_metrics_by_type": """
            WITH r AS (
              SELECT event_type, event_id,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY ts DESC, event_id ASC) AS rn
              FROM events)
            SELECT event_type, CAST(event_id AS BIGINT) AS event_id, value_cents
            FROM r WHERE rn = 1 ORDER BY event_type
        """,
        "orders_top_with_ties": f"""
            WITH c AS (SELECT o_orderkey,
                              CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                                AS cents
                       FROM orders),
            r AS (SELECT o_orderkey, cents,
                         rank() OVER (ORDER BY cents DESC) AS rk FROM c)
            SELECT o_orderkey, cents FROM r WHERE rk <= {TOP_TIES_K}
            ORDER BY cents DESC, o_orderkey ASC
        """,
        "curation_funnel": _curation_sql(),
        "geo_bounds_centroid": f"""
            WITH c AS ({_geo_latlon_sql()}),
            m AS (SELECT cu.c_mktsegment AS seg,
                         CAST(floor(c.lat * 1000000 + 0.5) AS BIGINT) AS lat_u,
                         CAST(floor(c.lon * 1000000 + 0.5) AS BIGINT) AS lon_u
                  FROM c JOIN customer cu USING (c_custkey))
            SELECT seg, CAST(count(*) AS BIGINT) AS n,
                   CAST(min(lat_u) AS BIGINT) AS lat_min,
                   CAST(max(lat_u) AS BIGINT) AS lat_max,
                   CAST(min(lon_u) AS BIGINT) AS lon_min,
                   CAST(max(lon_u) AS BIGINT) AS lon_max,
                   CAST(CAST(sum(lat_u) AS BIGINT) // count(*) AS BIGINT) AS cen_lat,
                   CAST(CAST(sum(lon_u) AS BIGINT) // count(*) AS BIGINT) AS cen_lon
            FROM m GROUP BY seg ORDER BY seg
        """,
        "geo_distance_rings": _geo_rings_sql(),
        "geohash_cells": _geohash_sql(),
        "geotile_cells": _geotile_sql(),
        "rank_eval_pr": _rank_eval_sql(),
        "has_child_orders": f"""
            WITH ch AS (
              SELECT l_orderkey AS o_orderkey,
                     CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                       // 100 AS score
              FROM lineitem WHERE l_quantity >= {HAS_CHILD_MIN_QTY}),
            p AS (
              SELECT o_orderkey, CAST(max(score) AS BIGINT) AS score_cents,
                     CAST(count(*) AS BIGINT) AS n_children
              FROM ch GROUP BY o_orderkey
              ORDER BY score_cents DESC, o_orderkey ASC LIMIT {HAS_CHILD_TOP})
            SELECT p.o_orderkey, p.score_cents, p.n_children, o.o_orderpriority
            FROM p JOIN orders o USING (o_orderkey)
            ORDER BY p.score_cents DESC, p.o_orderkey ASC
        """,
    }

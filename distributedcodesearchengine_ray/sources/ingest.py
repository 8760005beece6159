"""Local-directory -> corpus-parquet ingestion connector (S1/S4 stand-in).

The reference clones git repos and walks their trees
(/root/reference/codesearch/indexer/repo_indexer.py:279-471).  This engine
ingests a ``(repo, path, commit, lang, content)`` parquet corpus instead,
and this module produces that corpus from checked-out directories — the
piece that makes the engine usable end-to-end on a real repo list without
the external git/GitHub connectors (declared out of scope):

    from distributedcodesearchengine_ray.sources.ingest import ingest_repos
    corpus = ingest_repos([("myrepo", "/path/to/checkout")], "/tmp/corpus")
    build_index(corpus, index_dir, mode="entity")

or via the CLI::

    python -m distributedcodesearchengine_ray.cli ingest /path/to/checkout \
        --out /tmp/corpus --repo myrepo

Filtering (skip dirs, supported extensions) mirrors the reference's walk
(repo_indexer.py:331-342) and is also re-applied by the build's F1/F2
predicates, so pre-filtering here is an I/O optimization, not a correctness
requirement.  ``commit`` comes from ``.git/HEAD`` (plain file read — no git
binary) when present, else ``0``*40.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from .corpus import SKIP_DIRS, SUPPORTED_EXTENSIONS

_MAX_FILE_BYTES = 2 << 20  # skip pathological single files (same spirit as
# the reference's large-file guard)


def _git_head(repo_dir: str) -> str:
    """Resolve HEAD from .git files only (no subprocess)."""
    head_path = os.path.join(repo_dir, ".git", "HEAD")
    try:
        head = open(head_path).read().strip()
        if head.startswith("ref:"):
            ref = head.split(None, 1)[1]
            ref_path = os.path.join(repo_dir, ".git", ref)
            if os.path.exists(ref_path):
                return open(ref_path).read().strip()[:40]
            packed = os.path.join(repo_dir, ".git", "packed-refs")
            if os.path.exists(packed):
                for line in open(packed):
                    if line.strip().endswith(ref):
                        return line.split()[0][:40]
            return "0" * 40
        return head[:40]
    except OSError:
        return "0" * 40


def iter_repo_files(repo_dir: str) -> Iterable[Tuple[str, str]]:
    """Yield (relative_path, content) for indexable files under a tree."""
    skip = set(SKIP_DIRS)
    for root, dirs, files in os.walk(repo_dir):
        dirs[:] = sorted(d for d in dirs if d not in skip)
        for f in sorted(files):
            ext = "." + f.rsplit(".", 1)[-1].lower() if "." in f else ""
            if ext not in SUPPORTED_EXTENSIONS:
                continue
            full = os.path.join(root, f)
            try:
                if os.path.getsize(full) > _MAX_FILE_BYTES:
                    continue
                content = open(full, "rb").read().decode("utf-8", "replace")
            except OSError:
                continue
            yield os.path.relpath(full, repo_dir).replace(os.sep, "/"), content


def ingest_repos(
    repos: List[Tuple[str, str]],
    out_dir: str,
    *,
    rows_per_shard: int = 20_000,
    commit: Optional[str] = None,
) -> str:
    """Walk (repo_name, checkout_dir) pairs -> sharded corpus parquet.

    Returns ``out_dir``.  Shards are written incrementally
    (``rows_per_shard`` per file) so arbitrarily large checkouts never
    materialize in memory; output is directly consumable by
    ``build_index`` / ``read_corpus``.
    """
    os.makedirs(out_dir, exist_ok=True)
    buf = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    shard = 0

    def flush():
        nonlocal shard
        if not buf["repo"]:
            return
        tbl = pa.table(
            {
                "repo": pa.array(buf["repo"], pa.string()),
                "path": pa.array(buf["path"], pa.string()),
                "commit": pa.array(buf["commit"], pa.string()),
                "lang": pa.array(buf["lang"], pa.string()),
                "content": pa.array(buf["content"], pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(out_dir, f"ingest-{shard:05d}.parquet"))
        shard += 1
        for k in buf:
            buf[k].clear()

    for repo_name, repo_dir in repos:
        rev = commit if commit is not None else _git_head(repo_dir)
        for rel, content in iter_repo_files(repo_dir):
            ext = "." + rel.rsplit(".", 1)[-1].lower()
            buf["repo"].append(repo_name)
            buf["path"].append(rel)
            buf["commit"].append(rev)
            buf["lang"].append(SUPPORTED_EXTENSIONS[ext])
            buf["content"].append(content)
            if len(buf["repo"]) >= rows_per_shard:
                flush()
    flush()
    if shard == 0:
        raise ValueError(f"no indexable files found under {[d for _, d in repos]}")
    return out_dir


def ingest_directory(
    repo_dir: str, out_dir: str, repo_name: Optional[str] = None, **kwargs
) -> str:
    """Single-checkout convenience wrapper around :func:`ingest_repos`."""
    name = repo_name or os.path.basename(os.path.abspath(repo_dir))
    return ingest_repos([(name, repo_dir)], out_dir, **kwargs)

"""Deterministic synthetic source-code corpus (the `input_hint` table).

Schema: ``repo:string, path:string, commit:string, lang:string,
content:string`` — the Parquet shape the engine ingests
(``BASELINE.json input_hint``).  Everything is seeded (seed=42 convention)
so tests, the oracle, and both bench parallelism levels see byte-identical
input; ``commit`` is ``sha256(f"{repo}:{path}")[:40]`` per FIXTURES.md §1.

Content exercises every tokenizer rule (camelCase, ACRONYMNames,
snake_case, 1-char tokens, punctuation runs), carries docstring phrases the
reference query set targets, and Zipf-skews a few hot terms (``import``,
``return``, ``self``, ``func``) so skew handling is observable.  ~5% of rows
live under skip-dirs and ~3% use unsupported extensions to exercise the
F1/F2 predicates (/root/reference/codesearch/indexer/repo_indexer.py:331-342,
parser/factory.py:56-64).
"""

from __future__ import annotations

import hashlib
import os
import random
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SKIP_DIRS = [
    "node_modules", "venv", ".venv", "__pycache__", ".git", "dist", "build",
    "target", ".tox", ".pytest_cache", "vendor", "third_party", "external",
]

# single source of truth: the parser registry's extension map (keeps the F2
# path filter and parser dispatch from diverging)
from ..stages.parse import EXTENSION_LANG as SUPPORTED_EXTENSIONS  # noqa: E402

_IDENTS = [
    "parseJSONData", "serialize_json", "HTTPClientFactory", "fetchData",
    "validate_email", "sendHTTPRequest", "parse_json", "encodeURL",
    "DataLoader", "readFileSync", "writeBuffer", "AuthToken", "login_user",
    "download_file", "save_to_disk", "XMLHttpRequest", "handle_response",
    "retryPolicy", "computeHash", "MergeSortedLists", "a", "x", "db",
    "cfg_v2", "HTMLParser", "get", "post", "request", "urlJoin",
]
_PHRASES = [
    "Parse a JSON string into a dictionary",
    "Convert object to JSON string",
    "Validate an email address",
    "send HTTP request to the remote server",
    "download a file and save it to disk",
    "authenticate the user and return a token",
    "compute the cyclomatic complexity of a function",
    "merge two sorted lists into one",
    "retry the request with exponential backoff",
    "load configuration values from the environment",
]
_HOT = ["import", "return", "self", "func"]


def _ident(rng: random.Random) -> str:
    """Identifier with a Zipf-ish head (the fixed vocabulary) and a long
    tail of numbered/composed variants — gives the index a realistic
    vocabulary size so the lexicon groupby is actually exercised."""
    base = rng.choice(_IDENTS)
    r = rng.random()
    if r < 0.5:
        return base
    if r < 0.8:
        return f"{base}{rng.randrange(1, 10000)}"
    return f"{base}_{rng.choice(_IDENTS)}{rng.randrange(1, 100)}"


def _py_file(rng: random.Random, richness: int = 1) -> str:
    lines = ["import os", "import json", ""]
    n_items = rng.randint(1, 4 * richness)
    for _ in range(n_items):
        name = _ident(rng)
        phrase = rng.choice(_PHRASES)
        hot = " ".join(rng.choices(_HOT, k=rng.randint(1, 6)))
        if rng.random() < 0.3:
            cls = _ident(rng)
            lines += [
                f"class {cls}:",
                f'    """{phrase} {hot}"""',
                f"    def {name}(self, data, timeout=30):",
                f'        """{rng.choice(_PHRASES)}"""',
                "        return self.run(data)",
                "",
            ]
        else:
            deco = "@app.route('/api')\n" if rng.random() < 0.2 else ""
            lines += [
                f"{deco}def {name}(payload, *args, **kwargs):",
                f'    """{phrase} {hot}"""',
                "    if payload:",
                "        return json.dumps(payload)",
                "    return None",
                "",
            ]
    return "\n".join(lines)


def _js_file(rng: random.Random, ts: bool, richness: int = 1) -> str:
    lines = ["import fs from 'fs';", ""]
    for _ in range(rng.randint(1, 4 * richness)):
        name = _ident(rng)
        phrase = rng.choice(_PHRASES)
        hot = " ".join(rng.choices(_HOT, k=rng.randint(1, 4)))
        kind = rng.random()
        if kind < 0.3:
            cls = _ident(rng)
            lines += [
                f"/** {phrase} {hot} */",
                f"class {cls} extends Base {{",
                f"  {name}(req, res) {{ return res.send(req); }}",
                "}",
                "",
            ]
        elif kind < 0.6:
            lines += [
                f"/** {phrase} {hot} */",
                f"const {name} = async (url) => fetch(url);",
                "",
            ]
        else:
            anno = ": Promise<void>" if ts else ""
            lines += [
                f"/** {phrase} {hot} */",
                f"export async function {name}(url, opts){anno} {{",
                "  return fetch(url).then(r => r.json());",
                "}",
                "",
            ]
    return "\n".join(lines)


def _go_file(rng: random.Random, richness: int = 1) -> str:
    lines = ["package main", "", 'import "fmt"', ""]
    for _ in range(rng.randint(1, 4 * richness)):
        name = _ident(rng).replace("_", "")
        phrase = rng.choice(_PHRASES)
        hot = " ".join(rng.choices(_HOT, k=rng.randint(1, 4)))
        kind = rng.random()
        if kind < 0.25:
            lines += [f"// {phrase} {hot}", f"type {name} struct {{", "\tName string", "}", ""]
        elif kind < 0.4:
            lines += [f"// {phrase}", f"type {name} interface {{", "\tRun() error", "}", ""]
        elif kind < 0.7:
            recv = rng.choice(["s", "c", "h"])
            lines += [
                f"// {phrase} {hot}",
                f"func ({recv} *Server) {name}(w io.Writer, r *Request) {{",
                "\tfmt.Println(r)",
                "}",
                "",
            ]
        else:
            lines += [
                f"// {phrase} {hot}",
                f"func {name}(ctx context.Context) error {{",
                "\treturn nil",
                "}",
                "",
            ]
    return "\n".join(lines)


def _rs_file(rng: random.Random, richness: int = 1) -> str:
    lines = ["use std::io;", ""]
    for _ in range(rng.randint(1, 4 * richness)):
        name = _ident(rng).lower()
        phrase = rng.choice(_PHRASES)
        hot = " ".join(rng.choices(_HOT, k=rng.randint(1, 4)))
        kind = rng.random()
        if kind < 0.25:
            s = _ident(rng)
            lines += [f"/// {phrase} {hot}", f"pub struct {s} {{", "    name: String,", "}", ""]
        elif kind < 0.4:
            t = _ident(rng)
            lines += [f"/// {phrase}", f"pub trait {t} {{", "    fn run(&self);", "}", ""]
        elif kind < 0.6:
            imp = _ident(rng)
            lines += [
                f"impl {imp} {{",
                f"    /// {phrase} {hot}",
                f"    pub fn {name}(&self, data: &str) -> String {{",
                "        data.to_string()",
                "    }",
                "}",
                "",
            ]
        else:
            lines += [
                f"/// {phrase} {hot}",
                f"pub async fn {name}(url: &str) -> Result<(), io::Error> {{",
                "    Ok(())",
                "}",
                "",
            ]
    return "\n".join(lines)


_EXT_BY_LANG = {
    "python": [".py", ".pyw"],
    "javascript": [".js", ".jsx", ".mjs", ".cjs"],
    "typescript": [".ts", ".tsx"],
    "go": [".go"],
    "rust": [".rs"],
}
_LANGS = ["python", "javascript", "typescript", "go", "rust"]


def gen_corpus_row(i: int, seed: int = 42, richness: int = 1) -> dict:
    """One deterministic (repo, path, commit, lang, content) row.

    Seeded per row (not per stream) so shard generation parallelizes while
    staying byte-identical at every parallelism level.  ``richness`` scales
    entities-per-file (bench corpora use >1 for realistic file sizes)."""
    rng = random.Random((seed << 24) ^ i)
    repo = f"org{i % 7}/repo{i % 13}"
    lang = _LANGS[rng.randrange(len(_LANGS))]
    ext = rng.choice(_EXT_BY_LANG[lang])
    r = rng.random()
    if r < 0.05:
        subdir = rng.choice(SKIP_DIRS)
        path = f"{subdir}/pkg{i % 11}/file_{i}{ext}"
    elif r < 0.08:
        ext = rng.choice([".md", ".txt"])
        path = f"docs/file_{i}{ext}"
        lang = "unknown"
    else:
        path = f"src/mod{i % 19}/file_{i}{ext}"
    if lang == "python":
        content = _py_file(rng, richness)
    elif lang in ("javascript", "typescript"):
        content = _js_file(rng, ts=(lang == "typescript"), richness=richness)
    elif lang == "go":
        content = _go_file(rng, richness)
    elif lang == "rust":
        content = _rs_file(rng, richness)
    else:
        content = f"# notes {i}\n" + rng.choice(_PHRASES)
    commit = hashlib.sha256(f"{repo}:{path}".encode()).hexdigest()[:40]
    return {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}


def gen_corpus_rows(n_files: int, seed: int = 42, richness: int = 1):
    """Yield deterministic corpus rows."""
    for i in range(n_files):
        yield gen_corpus_row(i, seed, richness)


def _rows_to_table(rows: List[dict]) -> pa.Table:
    return pa.table(
        {
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "commit": pa.array([r["commit"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "content": pa.array([r["content"] for r in rows], pa.string()),
        }
    )


def gen_corpus_table(n_files: int, seed: int = 42) -> pa.Table:
    return _rows_to_table(list(gen_corpus_rows(n_files, seed)))


def write_corpus(
    out_dir: str, n_files: int, seed: int = 42, num_shards: Optional[int] = None,
    richness: int = 1,
) -> str:
    """Write the corpus as sharded Parquet (one file per shard => read
    parallelism; never one giant file).  Idempotent on same params."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_COMPLETE")
    stamp = f"n={n_files} seed={seed} richness={richness}"
    if os.path.exists(marker) and open(marker).read() == stamp:
        return out_dir
    # params changed: clear stale shards (a smaller rewrite would otherwise
    # leave old higher-numbered part files mixed into the corpus)
    for f in os.listdir(out_dir):
        if f.endswith(".parquet") or f == "_COMPLETE":
            os.remove(os.path.join(out_dir, f))
    if num_shards is None:
        num_shards = max(1, min(64, n_files // 2000))
    per = -(-n_files // num_shards)

    def write_shard(s: int) -> None:
        lo, hi = s * per, min((s + 1) * per, n_files)
        if lo >= hi:
            return
        rows = [gen_corpus_row(i, seed, richness) for i in range(lo, hi)]
        pq.write_table(_rows_to_table(rows), os.path.join(out_dir, f"part-{s:05d}.parquet"))

    try:  # parallel generation when a Ray session is live (bench path)
        import ray

        if ray.is_initialized():
            shard_task = ray.remote(write_shard)
            ray.get([shard_task.remote(s) for s in range(num_shards)])
        else:
            raise ImportError
    except ImportError:
        for s in range(num_shards):
            write_shard(s)
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


def read_corpus(
    path: str,
    columns: Optional[List[str]] = None,
    override_num_blocks: Optional[int] = None,
):
    """`ray.data` reader for a corpus directory/file (column-pruned).

    ``override_num_blocks`` sizes the read blocks directly — the build uses
    it to make the extract output land in write-sized blocks WITHOUT a
    repartition exchange (measured 2x faster than extract+repartition)."""
    import ray.data as rd

    from ..state.manifest import normalize_dir

    path = normalize_dir(path)
    paths = path
    if os.path.isdir(path):
        paths = [
            os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")
        ]
    return rd.read_parquet(paths, columns=columns, override_num_blocks=override_num_blocks)

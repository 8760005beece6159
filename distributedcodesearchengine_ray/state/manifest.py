"""Index manifest + per-partition lineage records.

The manifest is the authority for the global scalars that enter every BM25
score (N, avgdl, average_idf, epsilon floor — any drift breaks
score-identity, SURVEY.md §7.4) and for checkpoint-resume: each partition
build writes an atomic lineage JSON (written only after its data files are
renamed into place), so a restarted build skips partitions whose lineage
records match the current ``build_id`` (`north_rule`: "resumable from
checkpoint with per-partition lineage + metrics").

Replaces the reference's whole-index pickle checkpoint
(/root/reference/codesearch/storage/bm25_index.py:204-241) with a sharded,
partition-granular layout:

    index_dir/
      manifest.json            # global stats + params + partition table
      lineage/part-NNNNN.json  # per-partition record incl. metrics
      postings/part-NNNNN.parquet   # term, df, doc_ids/tfs (delta+varint), block-max
      docmeta/part-NNNNN.parquet    # doc_id-ordered metadata (+ doc_len)
      lexicon/*.parquet        # global term -> df, idf (epsilon-floored)
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional


def normalize_dir(path: str) -> str:
    """Accept ``file://`` URIs anywhere a directory path is expected.

    DEPLOYMENT ASSUMPTION (multi-node): ``index_dir`` must be a filesystem
    every Ray node sees at the same path — NFS, a shared mount, or an
    S3/GCS FUSE mount.  Build tasks write partition files and lineage
    records with plain POSIX I/O; query actors read them the same way.
    Native object-store URIs (``s3://``) are rejected here with a pointer
    to the FUSE route rather than failing deep inside a task.  The
    manifest records the assumption (``extra["filesystem"]``).
    """
    if path.startswith("file://"):
        return path[len("file://") :] or "/"
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme:
        raise NotImplementedError(
            f"{scheme}:// index/corpus dirs are not supported natively; "
            "mount the bucket (s3fs/gcsfuse) and pass the mount path or a "
            "file:// URI"
        )
    return path


@dataclass
class PartitionRecord:
    part_id: int
    doc_lo: int
    doc_hi: int  # exclusive
    n_docs: int
    total_tokens: int
    n_terms: int
    postings_bytes: int
    build_sec: float
    build_id: str
    status: str = "complete"

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "PartitionRecord":
        return cls(**{k: d[k] for k in [f.name for f in dataclasses.fields(cls)] if k in d})


@dataclass
class IndexManifest:
    mode: str  # "file" | "entity"
    n_docs: int
    total_tokens: int
    avgdl: float
    vocab_size: int
    average_idf: float
    k1: float
    b: float
    epsilon: float
    num_partitions: int
    build_id: str
    boundaries: List[str] = field(default_factory=list)
    partitions: List[PartitionRecord] = field(default_factory=list)
    extra: Dict = field(default_factory=dict)

    @property
    def eps_floor(self) -> float:
        return self.epsilon * self.average_idf

    def save(self, index_dir: str) -> None:
        payload = dataclasses.asdict(self)
        payload["partitions"] = [p.to_dict() for p in self.partitions]
        tmp = os.path.join(index_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, os.path.join(index_dir, "manifest.json"))

    @classmethod
    def load(cls, index_dir: str) -> "IndexManifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            d = json.load(f)
        parts = [PartitionRecord.from_dict(p) for p in d.pop("partitions", [])]
        m = cls(**{k: d[k] for k in [f.name for f in dataclasses.fields(cls)] if k in d})
        m.partitions = parts
        return m


def compute_build_id(n_docs: int, boundaries: List[str], params: dict) -> str:
    """Deterministic id binding a build to its input + partitioning + params;
    lineage records carrying a different build_id are not resumable."""
    h = hashlib.sha256()
    h.update(str(n_docs).encode())
    for b in boundaries:
        h.update(b"\x00" + b.encode())
    h.update(json.dumps(params, sort_keys=True).encode())
    return h.hexdigest()[:16]


def lineage_path(index_dir: str, part_id: int) -> str:
    return os.path.join(index_dir, "lineage", f"part-{part_id:05d}.json")


def read_lineage(index_dir: str, part_id: int) -> Optional[PartitionRecord]:
    p = lineage_path(index_dir, part_id)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return PartitionRecord.from_dict(json.load(f))
    except (json.JSONDecodeError, KeyError, TypeError):
        return None


def write_lineage(index_dir: str, rec: PartitionRecord) -> None:
    os.makedirs(os.path.join(index_dir, "lineage"), exist_ok=True)
    tmp = lineage_path(index_dir, rec.part_id) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec.to_dict(), f)
    os.replace(tmp, lineage_path(index_dir, rec.part_id))

"""Salted-key skew handling: salted df == unsalted df, exactly."""

import pandas as pd
import pytest


def test_term_df_salted_matches_plain(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.stages.skew import term_df_salted

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    salted = (
        term_df_salted(ds, hot_terms={"the", "data", "join"}, num_salts=4)
        .to_pandas()
        .sort_values("term", ignore_index=True)
    )
    # plain oracle
    docs = ds.to_pandas()
    df = {}
    for _, row in docs.iterrows():
        for t in set(tokenize(row["text"])):
            df[t] = df.get(t, 0) + 1
    exp = pd.DataFrame(sorted(df.items()), columns=["term", "df"])
    assert salted["term"].tolist() == exp["term"].tolist()
    assert salted["df"].tolist() == exp["df"].tolist()


def test_detect_hot_terms(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.skew import detect_hot_terms

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    hot = detect_hot_terms(ds, threshold=0.5, sample_mod=2)
    assert hot  # word-soup corpus: several terms in >50% of docs
    assert all(isinstance(t, str) for t in hot)


def test_build_job_script(ray_session, tmp_path):
    """jobs/build_job.py runs end-to-end (ray job submit entrypoint)."""
    import json
    import subprocess
    import sys

    from distributedcodesearchengine_ray.sources.corpus import write_corpus

    corpus = write_corpus(str(tmp_path / "c"), n_files=100, seed=42, num_shards=2)
    out = subprocess.run(
        [sys.executable, "jobs/build_job.py", "--corpus", corpus,
         "--index-dir", str(tmp_path / "idx"), "--docs-per-partition", "50"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["n_docs"] > 0 and info["build_sec"] > 0

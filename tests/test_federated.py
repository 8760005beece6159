"""Federated scatter-gather search == one index built over the union
corpus: exact global-stat recombination (N, avgdl, df, epsilon floor)
must make the two-sub-index federation score-identical to the single
whole-corpus index (which itself is oracle-checked in the driver
contract)."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "query",
    [
        "merge sort join the data stream",  # incl. "the": exercises the eps floor
        "hash table scan filter",
        "vector window",
        "nosuchterm anywhere",  # absent terms -> max<=0 keep-all branch
    ],
)
def test_federated_matches_single_index(ray_session, query):
    from distributedcodesearchengine_ray.pipelines import queries as Q

    single = Q.bm25_topk(SF, query=query).to_pandas()
    fed = Q.federated_search(SF, query=query).to_pandas()
    pd.testing.assert_frame_equal(fed, single)


def test_federated_global_stats_match_union(ray_session):
    """The recombined scalars equal the union index's manifest values
    BIT-IDENTICALLY: the federation folds per-bucket idf_raw partials
    over the same term-sorted arrays in the same bucket order as the
    union build's _lexicon_pass, so no summation-order ulp drift exists
    and micro-rounded eps-floored scores can never flake at a rounding
    boundary."""
    from distributedcodesearchengine_ray.pipelines.federated import FederatedEngine
    from distributedcodesearchengine_ray.pipelines.queries import (
        _documents_index,
        _documents_subindex,
    )
    from distributedcodesearchengine_ray.state.manifest import IndexManifest

    union = IndexManifest.load(_documents_index(SF))
    eng = FederatedEngine(
        [_documents_subindex(SF, 0), _documents_subindex(SF, 1)],
        [lambda i: 2 * i, lambda i: 2 * i + 1],
        num_actors_each=1,
    )
    try:
        assert eng.N == union.n_docs
        assert eng.avgdl == union.avgdl
        assert eng.eps == union.epsilon * union.average_idf
    finally:
        eng.close()


def test_federated_rejects_parameter_mismatch(ray_session, tmp_path):
    """Sub-indexes built with different BM25 parameters must be refused —
    merging their score spaces silently breaks the advertised score
    identity (same contract merge_indexes enforces)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.federated import FederatedEngine
    from distributedcodesearchengine_ray.pipelines.queries import _documents_subindex

    corpus = tmp_path / "corpus.parquet"
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * 4,
                "path": [f"f{i}.py" for i in range(4)],
                "commit": ["c"] * 4,
                "lang": ["python"] * 4,
                "content": ["def alphaBeta(): pass"] * 4,
            }
        ),
        str(corpus),
    )
    odd = tmp_path / "idx_k1"
    build_index(str(corpus), str(odd), mode="file", k1=1.2)
    with pytest.raises(ValueError, match="parameter mismatch"):
        FederatedEngine(
            [_documents_subindex(SF, 0), str(odd)],
            [lambda i: i, lambda i: i],
            num_actors_each=1,
        )

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
    (avgdl exactly; the eps floor to float tolerance — different
    summation order over the same vocabulary)."""
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
        assert eng.avgdl == pytest.approx(union.avgdl, rel=1e-12)
        assert eng.eps == pytest.approx(0.25 * union.average_idf, rel=1e-9)
    finally:
        eng.close()

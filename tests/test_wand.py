"""WAND scorer must be rank- AND score-identical to the dense scorer."""

import numpy as np
import pytest

from tests.test_rank_identity import QUERIES


@pytest.mark.usefixtures("ray_session")
def test_wand_matches_dense(file_index):
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    idx, _ = file_index
    engine = QueryEngine(idx, num_actors=3)
    try:
        for q in QUERIES:
            dense = engine.search(q, limit=20, method="dense")
            wand = engine.search(q, limit=20, method="wand")
            assert [h["doc_id"] for h in wand] == [h["doc_id"] for h in dense], q
            # bitwise identical: WAND replays the dense per-occurrence
            # float64 addition sequence at each scored doc
            assert [h["score"] for h in wand] == [h["score"] for h in dense], q
        for q, filt in [
            ("parse json", {"language": "python"}),
            ("send HTTP request", {"language": "go"}),
            ("import return", {"repo_name": "org1/repo1"}),
        ]:
            dense = engine.search(q, limit=20, filters=filt, method="dense")
            wand = engine.search(q, limit=20, filters=filt, method="wand")
            assert [h["doc_id"] for h in wand] == [h["doc_id"] for h in dense], (q, filt)
    finally:
        engine.close()


# reuse the built index fixture from test_rank_identity
from tests.test_rank_identity import corpus_dir, file_index, oracle_docs  # noqa: E402,F401

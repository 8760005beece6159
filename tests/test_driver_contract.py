"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.001 and compare row count + sorted-column value equality against the
DuckDB oracle (the driver does the same at sf0.01)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def _compare(name, got: pd.DataFrame, exp: pd.DataFrame):
    assert list(sorted(got.columns)) == list(sorted(exp.columns)), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    for col in g.columns:
        gv, ev = g[col], e[col]
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            pd.testing.assert_series_equal(
                gv.astype(float), ev.astype(float), check_names=False, rtol=1e-9
            )
        else:
            assert gv.astype(str).tolist() == ev.astype(str).tolist(), (
                f"{name}.{col} mismatch: {gv.head().tolist()} vs {ev.head().tolist()}"
            )


def _entries():
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return qs, oracles


def test_all_queries_against_oracle(ray_session, ddb):
    qs, oracles = _entries()
    failures = []
    for name, fn in qs.items():
        got = _to_pandas(fn(SF))
        if name in oracles:
            exp = ddb.execute(oracles[name]).df()
            try:
                _compare(name, got, exp)
            except AssertionError as e:
                failures.append(f"{name}: {e}")
        else:
            assert got is not None  # rows-only contract
    assert not failures, "\n".join(failures)


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    res = _to_pandas(entrymod.entry())
    assert len(res) >= 0
    assert set(res.columns) == {"rank", "doc_id", "score_micro"}

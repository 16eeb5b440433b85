"""Every oracle-checked queries() entry vs its DuckDB SQL at sf0.001 —
the in-suite form of the driver's correctness gate (BASELINE.json: verify
with `python -m pytest -x -q`)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def harness(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return entrymod, con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_df(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _oracle_names():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    return sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(harness, name):
    entrymod, con = harness
    mine = normalize(to_df(entrymod.queries()[name](SF)))
    oracle = normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=True)

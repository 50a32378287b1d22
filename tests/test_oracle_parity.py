"""Mirror of the driver's correctness gate: every ``queries()`` entry with an
``oracle_sql()`` is executed at sf0.001 and compared against DuckDB —
row count, column names, and order-insensitive values."""

import importlib.util
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _entry_module():
    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod():
    return _entry_module()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _oracle_names(entry_mod):
    return sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names(_entry_module()))
def test_query_matches_oracle(entry_mod, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _canon(_to_df(q(SF_DIR)))
    exp = _canon(con.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if np.issubdtype(np.asarray(g).dtype, np.floating):
            np.testing.assert_allclose(g, e.astype(float), rtol=1e-9, err_msg=f"{name}.{c}")
        else:
            assert (pd.Series(g).astype(str) == pd.Series(e).astype(str)).all(), f"{name}.{c}"


def test_rows_only_queries_run(entry_mod):
    qs = entry_mod.queries()
    oracles = set(entry_mod.oracle_sql())
    rows_only = [n for n in qs if n not in oracles and n not in
                 ("dedupe_transcripts", "dedupe_events_flagship")]  # slow ones elsewhere
    for name in rows_only:
        df = _to_df(qs[name](SF_DIR))
        assert df is not None and len(df) >= 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke(entry_mod):
    df = _to_df(entry_mod.entry())
    assert len(df) >= 0
    assert set(df.columns) == {"conv_id", "cluster_id"}

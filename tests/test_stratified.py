"""Scale-shape test for the two-pass stratified sampler (VERDICT r2 #4):
a 2-value stratum key must NOT concentrate a stratum in one task — selection
runs as aggregate passes + a stateless per-block filter, and the result is
exactly the SQL semantics (smallest ceil(frac) of each stratum by row hash).
"""

import inspect
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mediachain_indexer_ray.pipelines import queries as Q


@pytest.fixture(scope="module")
def two_strata_dir(tmp_path_factory):
    """events.parquet as a DIRECTORY of 4 files, 2 stratum values, sized so
    each stratum spans every input block."""
    d = tmp_path_factory.mktemp("strat")
    os.makedirs(d / "events.parquet", exist_ok=True)
    rng = np.random.default_rng(7)
    n = 20_000
    eid = np.arange(1, n + 1, dtype=np.int64)
    rng.shuffle(eid)
    et = np.where(np.arange(n) % 3 == 0, "alpha", "beta")
    uid = rng.integers(0, 500, n).astype(np.int64)
    t = pa.table(
        {"event_id": pa.array(eid), "user_id": pa.array(uid),
         "event_type": pa.array(et.tolist(), pa.string())}
    )
    for i in range(4):
        pq.write_table(t.slice(i * n // 4, n // 4),
                       str(d / "events.parquet" / f"part-{i}.parquet"))
    return str(d)


def test_stratified_two_value_stratum_matches_sql(ray_session, two_strata_dir):
    res = Q.stratified_sample_events(two_strata_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{two_strata_dir}/events.parquet/*.parquet')"
    )
    oracle = con.execute(Q.STRATIFIED_SAMPLE_EVENTS_SQL).df()
    c = lambda df: df[sorted(df.columns)].sort_values(
        sorted(df.columns)).reset_index(drop=True)
    a, b = c(res), c(oracle)
    assert len(a) == len(b) > 0
    assert a.equals(b.astype(a.dtypes.to_dict()))
    # both strata present and each sampled at ~10%
    per = res.groupby("event_type").size()
    assert set(per.index) == {"alpha", "beta"}
    assert per["alpha"] == -(-per_total(two_strata_dir, "alpha") * 100 // 1000)
    assert per["beta"] == -(-per_total(two_strata_dir, "beta") * 100 // 1000)


def per_total(d, s):
    t = pq.read_table(f"{d}/events.parquet")
    import pyarrow.compute as pc

    return pc.sum(pc.equal(t.column("event_type"), s)).as_py()


def test_stratified_sampler_has_no_stratum_shuffle():
    """The selection must not hash-partition on the stratum key (that is the
    single-task-per-stratum failure mode at scale): the implementation is
    aggregate passes + a stateless filter."""
    src = inspect.getsource(Q.stratified_sample_events)
    assert "grouped_partitions" not in src
    assert "AggregateFn" in src

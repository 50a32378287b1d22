"""asof_join (stages/joins.py) vs a brute-force pandas oracle on random data,
including edge cases: keys with no right rows, ties, empty sides."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from mediachain_indexer_ray.stages.joins import asof_join


def _brute(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, e in left.iterrows():
        cand = right[(right.k == e.k) & (right.rts <= e.ts)]
        if len(cand):
            rows.append((e.id, e.k, e.ts, cand.rts.max()))
    return (
        pd.DataFrame(rows, columns=["id", "k", "ts_us", "last_us"])
        .sort_values(["id"])
        .reset_index(drop=True)
    )


def test_asof_join_random(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "id": np.arange(n_l),
            "k": rng.integers(0, 40, n_l),  # keys 30+ have no right rows
            "ts": rng.integers(0, 1000, n_l),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 30, n_r),
            "rts": rng.integers(0, 1000, n_r),  # duplicates/ties likely
        }
    )
    lds = ray.data.from_arrow(pa.Table.from_pandas(left))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right))
    got = (
        asof_join(
            lds, rds, left_on="k", right_on="k", left_ts="ts", right_ts="rts",
            out_col="last_us", num_parts=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = _brute(left, right)
    assert list(got.columns) == ["id", "k", "ts_us", "last_us"]
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )


def test_asof_join_empty_right(ray_session):
    lds = ray.data.from_arrow(
        pa.table({"id": pa.array([1, 2]), "k": pa.array([1, 2]),
                  "ts": pa.array([5, 6])})
    )
    rds = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "rts": pa.array([], pa.int64())})
    )
    out = asof_join(
        lds, rds, left_on="k", right_on="k", left_ts="ts", right_ts="rts",
        num_parts=2,
    )
    assert out.count() == 0

"""Scale-safe exact quantiles: order_price_quantiles_scalable must equal the
distinct-histogram operator AND a local quantile_disc reference on a
high-cardinality continuous column (distinct count ~ row count), where the
O(|distinct|) driver gather of the simple operator would be the bottleneck."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mediachain_indexer_ray.pipelines.queries import (
    QUANTILES_MILLI,
    order_price_quantiles,
    order_price_quantiles_scalable,
)


def _disc_reference(cents: np.ndarray) -> dict[int, int]:
    """DuckDB quantile_disc: value at 1-based rank ceil(q*n) of the sorted
    column."""
    s = np.sort(cents)
    n = len(s)
    return {qm: int(s[max(1, -(-qm * n // 1000)) - 1]) for qm in QUANTILES_MILLI}


def test_scalable_quantiles_high_cardinality(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    # lognormal prices: heavy tail, ~all values distinct at 50k rows
    prices = np.round(np.exp(rng.normal(8, 1.5, 50_000)), 2) + 0.01
    pq.write_table(
        pa.table({"o_totalprice": pa.array(prices, pa.float64())}),
        str(tmp_path / "orders.parquet"),
    )
    cents = np.floor(prices * 100 + 0.5).astype(np.int64)
    assert len(np.unique(cents)) > 40_000  # genuinely high-cardinality

    got = order_price_quantiles_scalable(str(tmp_path)).to_pandas()
    ref = _disc_reference(cents)
    assert dict(zip(got["q_milli"], got["cents"])) == ref

    simple = order_price_quantiles(str(tmp_path)).to_pandas()
    assert simple.equals(got)


def test_scalable_quantiles_degenerate_single_value(ray_session, tmp_path):
    """A bin holding one massively-repeated value contributes ONE row to the
    boundary gather — the degenerate case the docstring bounds."""
    prices = np.full(10_000, 42.42)
    pq.write_table(
        pa.table({"o_totalprice": pa.array(prices, pa.float64())}),
        str(tmp_path / "orders.parquet"),
    )
    got = order_price_quantiles_scalable(str(tmp_path)).to_pandas()
    assert (got["cents"] == 4242).all()
    assert list(got["q_milli"]) == list(QUANTILES_MILLI)

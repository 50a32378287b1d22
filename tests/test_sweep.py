"""Hyperparameter sweep harness (reference mc_eval grid): the shipped default
config (tau=0.62, bands=32) must sit on the sweep's F1-optimal plateau."""

import pandas as pd
import pytest

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.fixtures import FixtureSpec, write_corpus
from mediachain_indexer_ray.pipelines.evaluate import sweep_eval


@pytest.fixture(scope="module")
def sweep_result(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("sweep")
    write_corpus(FixtureSpec(n_base=60, viral_fanout=15), str(d / "c"),
                 shuffle_rows=True)
    labels = pd.read_parquet(str(d / "c" / "labels.parquet"))
    cfg = Config(work_dir=str(d / "w"))
    df = sweep_eval(
        f"{d}/c/transcripts.parquet", labels, cfg, str(d / "w"),
        taus=[0.45, 0.62, 0.8], bands_list=[16, 32],
    )
    return df, cfg


def test_sweep_grid_shape(sweep_result):
    df, _ = sweep_result
    assert len(df) == 6
    assert set(df["num_bands"]) == {16, 32}
    assert (df["num_bands"] * df["band_rows"] == 128).all()
    assert (df["n_eligible"] > 100).all()


def test_default_config_on_f1_plateau(sweep_result):
    df, cfg = sweep_result
    default_row = df[
        (df["num_bands"] == cfg.num_bands)
        & (df["tau_milli"] == int(round(cfg.tau * 1000)))
    ]
    assert len(default_row) == 1
    best = df["f1_milli"].max()
    assert default_row["f1_milli"].iloc[0] >= best - 5  # within 0.005 F1

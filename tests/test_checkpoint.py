"""CheckpointManager failure semantics: a failed background write must be
surfaced by wait()/flush(), never silently swallowed (ADVICE r1)."""

import pyarrow as pa
import pytest
import ray.data

from mediachain_indexer_ray.state.checkpoint import CheckpointManager


def _tiny_ds():
    return ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))


def test_async_write_failure_raises_on_flush(tmp_path, ray_session, monkeypatch):
    cp = CheckpointManager(str(tmp_path / "w"), "cfg0", async_writes=True)

    import mediachain_indexer_ray.state.checkpoint as ckpt_mod

    real_makedirs = ckpt_mod.os.makedirs

    def _boom(path, *a, **kw):
        if ".tmp-" in str(path):
            raise OSError(28, "No space left on device (injected)")
        return real_makedirs(path, *a, **kw)

    monkeypatch.setattr(ckpt_mod.os, "makedirs", _boom)
    cp.run("stage_a", "fp0", _tiny_ds)
    with pytest.raises(RuntimeError, match="stage_a"):
        cp.flush()
    # the failure is recorded in the run log
    assert any(e.get("action") == "write_failed" for e in cp.events)


def test_async_write_success_flushes_clean(tmp_path, ray_session):
    cp = CheckpointManager(str(tmp_path / "w2"), "cfg0", async_writes=True)
    ds = cp.run("stage_a", "fp0", _tiny_ds)
    cp.flush()
    assert ds.count() == 3
    assert cp.manifest("stage_a")["rows"] == 3

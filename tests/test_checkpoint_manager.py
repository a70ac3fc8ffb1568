"""RotatingCheckpointManager: keep-last-N rotation, best-metric, resume."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.checkpoint.manager import RotatingCheckpointManager
from univl_tpu.data import fixtures


@pytest.fixture(scope="module")
def vocab(tmp_path_factory):
    return fixtures.make_vocab(str(tmp_path_factory.mktemp("v") / "vocab.txt"))


def _state(v: float):
    return {"w": jnp.full((4, 4), v), "step": jnp.asarray(int(v))}


def test_save_same_step_overwrites(tmp_path):
    """Saving the SAME step twice overwrites (file-path semantics) rather
    than raising StepAlreadyExistsError — a preemption at an epoch's last
    update-batch saves at the global_step the epoch-end save reuses, and
    the resume would otherwise crash there forever."""
    mgr = RotatingCheckpointManager(str(tmp_path / "ck"), max_to_keep=3)
    assert mgr.save(5, _state(1.0), metrics={"epoch": 0, "preempted": True})
    assert mgr.save(5, _state(2.0), metrics={"epoch": 1, "preempted": False})
    state, meta = mgr.restore(5, _state(0.0))
    np.testing.assert_array_equal(np.asarray(state["w"]), np.full((4, 4), 2.0))
    assert meta["epoch"] == 1 and meta["preempted"] is False
    mgr.close()


def test_async_same_step_collision(tmp_path):
    """Same-step overwrite while the FIRST save is still in flight
    (async): a periodic checkpoint at an epoch's last update-batch
    followed immediately by the epoch-end save hits exactly this. Works
    because orbax's all_steps() includes the in-flight tmp step, so the
    manager's collision check waits + deletes before re-saving; this test
    pins that property against orbax version changes."""
    mgr = RotatingCheckpointManager(
        str(tmp_path / "ck"), max_to_keep=3, async_save=True
    )
    # large enough that the background write is still in flight when the
    # second save runs its collision check (a 4x4 state commits too fast
    # to exercise the race)
    big = lambda v: {"w": jnp.full((4, 4), v), "m": jnp.full((512, 4096), v)}
    assert mgr.save(7, big(1.0), metrics={"epoch": 0, "preempted": False})
    # no wait: the first save may still be writing
    assert mgr.save(7, big(2.0), metrics={"epoch": 0, "preempted": True})
    state, meta = mgr.restore(7, big(0.0))
    np.testing.assert_array_equal(np.asarray(state["w"]), np.full((4, 4), 2.0))
    assert meta["preempted"] is True
    mgr.close()


def test_async_save_restore_roundtrip(tmp_path):
    """async_save=True: saves return without blocking on the disk write;
    restore waits for pending writes and returns exact values; rotation
    policy still applies."""
    mgr = RotatingCheckpointManager(
        str(tmp_path / "ck"), max_to_keep=2, async_save=True
    )
    for s in range(4):
        assert mgr.save(s, _state(float(s)), metrics={"loss": 1.0 / (s + 1)})
    mgr.wait()
    assert mgr.all_steps() == [2, 3]
    state, meta = mgr.restore(3, _state(0.0))
    np.testing.assert_array_equal(np.asarray(state["w"]), np.full((4, 4), 3.0))
    assert meta == {"loss": 0.25}
    # restore_latest immediately after an async save must see that save
    assert mgr.save(4, _state(4.0))
    state, meta, step = mgr.restore_latest(_state(0.0))
    assert step == 4 and float(np.asarray(state["step"])) == 4
    mgr.close()


def test_rotation_keeps_last_n(tmp_path):
    mgr = RotatingCheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    for s in range(5):
        mgr.save(s, _state(float(s)), metrics={"loss": 5.0 - s})
    assert mgr.all_steps() == [3, 4]
    assert mgr.latest_step() == 4
    restored, meta = mgr.restore(4, _state(0.0))
    assert float(np.asarray(restored["w"])[0, 0]) == 4.0
    assert meta["loss"] == 1.0
    mgr.close()


def test_best_metric_survives_rotation(tmp_path):
    mgr = RotatingCheckpointManager(
        str(tmp_path / "ck"), max_to_keep=2, best_metric="r1", best_mode="max"
    )
    # best (r1=0.9) lands early, then worse ones roll in
    for s, r1 in enumerate([0.1, 0.9, 0.3, 0.2, 0.25]):
        mgr.save(s, _state(float(s)), metrics={"r1": r1})
    steps = mgr.all_steps()
    assert 1 in steps, steps  # the best step is retained past rotation
    assert mgr.best_step() == 1
    mgr.close()


def test_restore_latest_empty(tmp_path):
    mgr = RotatingCheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    state, meta, step = mgr.restore_latest(_state(0.0))
    assert state is None and step is None
    mgr.close()


@pytest.mark.parametrize("extra", [[], ["--async_checkpointing"]],
                         ids=["sync", "async"])
def test_pretrain_driver_orbax_resume(tmp_path, vocab, extra):
    from univl_tpu.cli.pretrain import main
    from test_cli import COMMON

    ht = str(tmp_path / "ht")
    csv_path, data_path, feat_dir = fixtures.make_howto100m(
        ht, n_videos=8, clips_per_video=4, video_dim=32, corrupt_last=False,
    )
    out = str(tmp_path / "pre")
    argv = (
        ["--do_pretrain", "--sampled_use_mil", "--n_pair", "2",
         "--vocab_file", vocab, "--train_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_dir,
         "--output_dir", out, "--min_time", "5.0",
         "--checkpoint_backend", "orbax", "--keep_checkpoints", "2"]
        + extra + COMMON
    )
    state = main(argv)
    step_after_1 = int(state.step)
    ckdir = os.path.join(out, "checkpoints")
    assert os.path.isdir(os.path.join(ckdir, str(step_after_1)))

    argv2 = [a for a in argv]
    argv2[argv2.index("--epochs") + 1] = "2"
    state2 = main(argv2 + ["--load_checkpoint"])
    assert int(state2.step) > step_after_1


def test_numpy_scalar_metrics_json_safe(tmp_path):
    """np.float32/np.int32 metrics must coerce to JSON-safe floats —
    plain isinstance(v, (int, float)) misses them (only np.float64
    subclasses float) and ocp.args.JsonSave raised TypeError, killing
    the checkpoint save (round-5 review finding)."""
    mgr = RotatingCheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    assert mgr.save(1, _state(1.0), metrics={
        "r1": np.float32(0.41), "n": np.int32(7),
        "j": jnp.asarray(0.5), "flag": True, "name": "x",
    })
    _, meta = mgr.restore(1, _state(0.0))
    assert abs(meta["r1"] - 0.41) < 1e-6 and meta["n"] == 7.0
    assert abs(meta["j"] - 0.5) < 1e-6
    assert meta["flag"] is True and meta["name"] == "x"
    mgr.close()


def test_best_metric_tolerates_missing_key(tmp_path):
    """A periodic/preemption save without the best metric must rank as
    worst-possible instead of raising KeyError out of the rotation pass
    (round-5 review finding)."""
    mgr = RotatingCheckpointManager(
        str(tmp_path / "ck"), max_to_keep=2, best_metric="R1"
    )
    assert mgr.save(1, _state(1.0), metrics={"R1": 0.9})
    assert mgr.save(2, _state(2.0))          # metrics=None — no R1
    assert mgr.save(3, _state(3.0), metrics={"R1": 0.1})
    assert mgr.save(4, _state(4.0), metrics={"R1": 0.2})
    # the best checkpoint (R1=0.9) survives rotation; metric-less saves
    # never crash it
    assert 1 in mgr.all_steps()
    assert mgr.best_step() == 1
    mgr.close()

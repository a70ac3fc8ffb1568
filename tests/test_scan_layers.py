"""scan_layers=True (nn.scan towers): math + checkpoint-layout equivalence.

The scanned stack stores tower layers as one subtree with a leading
[num_layers] axis instead of layer_0..layer_{N-1}. These tests pin:
  - exact forward equivalence to the unrolled stack after layout conversion
  - layout conversion round-trips bit-exactly
  - checkpoints written in either layout restore into the other
  - training runs on the 8-device mesh with scanned towers
"""

import numpy as np
import jax
import pytest

from univl_tpu.config import UniVLConfig
from univl_tpu.models.univl import UniVL
from univl_tpu.checkpoint.layout import (
    adapt_layout,
    to_loop_layout,
    to_scan_layout,
)

from test_model import make_batch


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(la, lb):
        assert pa == pb
        assert np.array_equal(np.asarray(va), np.asarray(vb)), pa


@pytest.mark.parametrize("mode", ["retrieval", "pretrain2", "ft_align"])
def test_scan_matches_loop_exactly(rng, mode):
    kw = {}
    extra = {}
    if mode == "pretrain2":
        kw = dict(stage_two=True, do_pretrain=True)
        extra = dict(with_caption=True, with_pretrain=True)
    elif mode == "ft_align":
        kw = dict(train_sim_after_cross=True)
    cfg = UniVLConfig.tiny(**kw)
    batch = make_batch(cfg, rng, **extra)
    m_loop = UniVL(cfg)
    m_scan = UniVL(cfg.replace(scan_layers=True))
    p_loop = jax.device_get(
        m_loop.init(jax.random.key(0), batch, deterministic=True)["params"]
    )
    p_scan_init = m_scan.init(jax.random.key(0), batch, deterministic=True)["params"]

    conv = to_scan_layout(p_loop)
    assert jax.tree_util.tree_structure(conv) == jax.tree_util.tree_structure(
        jax.device_get(p_scan_init)
    )
    _trees_equal(to_loop_layout(conv), p_loop)  # bit-exact roundtrip

    out_loop = m_loop.apply({"params": p_loop}, batch, deterministic=True)
    out_scan = m_scan.apply({"params": conv}, batch, deterministic=True)
    for k in out_loop:
        np.testing.assert_allclose(
            np.asarray(out_loop[k]), np.asarray(out_scan[k]), rtol=0, atol=1e-6
        )


def test_adapt_layout_both_directions(rng):
    cfg = UniVLConfig.tiny()
    batch = make_batch(cfg, rng)
    p_loop = jax.device_get(
        UniVL(cfg).init(jax.random.key(0), batch, deterministic=True)["params"]
    )
    p_scan = to_scan_layout(p_loop)
    _trees_equal(adapt_layout(p_loop, p_scan), p_scan)
    _trees_equal(adapt_layout(p_scan, p_loop), p_loop)
    # matching layouts pass through
    _trees_equal(adapt_layout(p_loop, p_loop), p_loop)


def test_checkpoint_restores_across_layouts(rng, tmp_path):
    from univl_tpu.checkpoint.io import restore_checkpoint, save_checkpoint

    cfg = UniVLConfig.tiny()
    batch = make_batch(cfg, rng)
    m_loop = UniVL(cfg)
    m_scan = UniVL(cfg.replace(scan_layers=True))
    p_loop = jax.device_get(
        m_loop.init(jax.random.key(0), batch, deterministic=True)["params"]
    )
    path = str(tmp_path / "model.msgpack")
    save_checkpoint(path, p_loop)

    # restore the loop-layout checkpoint into a scanned template
    p_scan_tmpl = jax.device_get(
        m_scan.init(jax.random.key(1), batch, deterministic=True)["params"]
    )
    restored, _ = restore_checkpoint(path, p_scan_tmpl)
    out_loop = m_loop.apply({"params": p_loop}, batch, deterministic=True)
    out_scan = m_scan.apply({"params": restored}, batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_loop["loss"]), np.asarray(out_scan["loss"]), atol=1e-6
    )

    # and the reverse: scanned checkpoint into a loop template
    path2 = str(tmp_path / "model_scan.msgpack")
    save_checkpoint(path2, to_scan_layout(p_loop))
    restored2, _ = restore_checkpoint(path2, p_loop)
    _trees_equal(restored2, p_loop)


def test_trainstate_resume_across_layouts(rng, tmp_path):
    """Full train-state (params + BertAdam mu/nu) adapts across layouts."""
    from univl_tpu.checkpoint.io import restore_checkpoint, save_checkpoint
    from univl_tpu.parallel.mesh import make_mesh
    from univl_tpu.train.optimization import make_univl_optimizer
    from univl_tpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    cfg = UniVLConfig.tiny()
    mesh = make_mesh()
    tx = make_univl_optimizer(lr=1e-3, t_total=50, warmup_proportion=0.02)

    def gbatch(seed):
        r = np.random.RandomState(seed)
        per = make_batch(cfg, r)
        return {
            k: np.stack([np.concatenate([v] * n_dev, axis=0)], axis=0)
            for k, v in jax.device_get(per).items()
        }

    t_loop = Trainer(UniVL(cfg), tx, mesh, grad_accum_steps=1)
    state = t_loop.init_state(jax.random.key(0), make_batch(cfg, rng))
    state, _ = t_loop.train_step(
        state, t_loop.shard_batch(gbatch(1)), jax.random.key(1)
    )
    path = str(tmp_path / "trainstate.msgpack")
    save_checkpoint(path, state, metadata={"epoch": 0, "global_step": 1})

    t_scan = Trainer(UniVL(cfg.replace(scan_layers=True)), tx, mesh, grad_accum_steps=1)
    tmpl = t_scan.init_state(jax.random.key(2), make_batch(cfg, rng))
    restored, meta = restore_checkpoint(path, jax.device_get(tmpl))
    assert meta["global_step"] == 1
    # the adaptation must be EXACT: params and BOTH BertAdam moment trees
    # equal to_scan_layout of the saved loop-layout state leaf-by-leaf
    # (a permuted/zeroed moment tree would still produce a finite loss).
    saved = jax.device_get(state)
    _trees_equal(restored.params, to_scan_layout(saved.params))
    adam_saved, adam_restored = saved.opt_state[1], restored.opt_state[1]
    _trees_equal(adam_restored.m, to_scan_layout(adam_saved.m))
    _trees_equal(adam_restored.v, to_scan_layout(adam_saved.v))
    assert int(adam_restored.step) == int(adam_saved.step)
    # one more step from the restored state must run and stay finite
    restored = jax.device_put(
        restored, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    restored, metrics = t_scan.train_step(
        restored, t_scan.shard_batch(gbatch(3)), jax.random.key(3)
    )
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_descends_with_scan(rng):
    from univl_tpu.parallel.mesh import make_mesh
    from univl_tpu.train.optimization import make_univl_optimizer
    from univl_tpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    cfg = UniVLConfig.tiny(scan_layers=True)
    model = UniVL(cfg)
    tx = make_univl_optimizer(lr=1e-3, t_total=50, warmup_proportion=0.02)
    trainer = Trainer(model, tx, make_mesh(), grad_accum_steps=1)
    state = trainer.init_state(jax.random.key(0), make_batch(cfg, rng))
    per = jax.device_get(make_batch(cfg, rng))
    batch = trainer.shard_batch(
        {k: np.stack([np.concatenate([v] * n_dev, 0)], 0) for k, v in per.items()}
    )
    losses = []
    for i in range(6):
        state, metrics = trainer.train_step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[1], losses

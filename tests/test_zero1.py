"""ZeRO-1 sharded-optimizer tests on the virtual 8-device CPU mesh.

Pins the contract of train/zero1.py: the reduce-scatter + sharded-BertAdam
+ all-gather path must match the replicated
optax.chain(clip_by_global_norm, bert_adam) trainer step for step, to fp32
reduction-order tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp

from univl_tpu.config import UniVLConfig
from univl_tpu.models.univl import UniVL
from univl_tpu.parallel.mesh import DP_AXIS, make_mesh
from univl_tpu.train.optimization import make_univl_optimizer
from univl_tpu.train.trainer import Trainer
from univl_tpu.train.zero1 import make_univl_zero1_optimizer

from test_model import make_batch
from test_trainer import global_batch


def _trainers(cfg, mesh, accum=1, state_dtype=None, coef_lr=0.1):
    model = UniVL(cfg)
    n_dev = mesh.devices.size
    kw = dict(lr=1e-3, t_total=50, warmup_proportion=0.02, coef_lr=coef_lr,
              state_dtype=state_dtype)
    t_ref = Trainer(model, make_univl_optimizer(**kw), mesh,
                    grad_accum_steps=accum, donate=False)
    t_z = Trainer(model, make_univl_zero1_optimizer(dp=n_dev, **kw), mesh,
                  grad_accum_steps=accum, donate=False, zero1=True)
    return t_ref, t_z


def _assert_params_close(a, b, rtol=1e-5, atol=1e-7):
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree.map(np.asarray, b)))
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            jax.tree.map(np.asarray, a)):
        np.testing.assert_allclose(
            leaf, flat_b[path], rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def test_zero1_matches_replicated_multi_step(rng):
    """4 steps (past warmup ramp-up so lr_t > 0, moments and the per-tensor
    + global clips all live) — params and losses must track the replicated
    optimizer."""
    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    t_ref, t_z = _trainers(cfg, mesh)

    state_r = t_ref.init_state(jax.random.key(0), make_batch(cfg, rng))
    state_z = t_z.init_state(jax.random.key(0), make_batch(cfg, rng))
    _assert_params_close(state_r.params, state_z.params, rtol=0, atol=0)

    for i in range(4):
        batch = t_ref.shard_batch(
            global_batch(cfg, np.random.RandomState(i), n_dev))
        key = jax.random.key(i)
        state_r, m_r = t_ref.train_step(state_r, batch, key)
        state_z, m_z = t_z.train_step(state_z, batch, key)
        np.testing.assert_allclose(
            float(m_z["loss"]), float(m_r["loss"]), rtol=1e-6)

    _assert_params_close(state_r.params, state_z.params)


def test_zero1_state_is_sharded(rng):
    """Optimizer moments live as [T_pad // _CHUNK, _CHUNK] row-chunked
    arrays row-sharded over dp — the per-device slice is 1/dp of the whole
    (the ZeRO memory claim), stored in the 2-D layout the update math uses
    so the step never relayouts them (docs/PERF.md zero1 v2)."""
    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    _, t_z = _trainers(cfg, mesh)
    state = t_z.init_state(jax.random.key(0), make_batch(cfg, rng))

    total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(state.params))
    m = state.opt_state.m
    from univl_tpu.train.zero1 import _CHUNK

    assert m.ndim == 2 and m.shape[1] == _CHUNK
    assert m.size >= total
    # each shard is a whole number of [_CHUNK]-element rows; padding is
    # bounded by one row per device (1.9 MB at dp=8, trivial vs the
    # 2x/dp saving)
    assert m.size < total + n_dev * _CHUNK
    assert m.shape[0] % n_dev == 0
    assert not m.sharding.is_fully_replicated
    shard_shapes = {s.data.shape for s in m.addressable_shards}
    assert shard_shapes == {(m.shape[0] // n_dev, _CHUNK)}

    # v3: the fp32 master params shard like the moments and stay bitwise
    # equal to the replicated param tree (they ARE the authority)
    def check_master(st):
        p = st.opt_state.p
        assert p.shape == st.opt_state.m.shape
        assert not p.sharding.is_fully_replicated
        flat = np.concatenate(
            [np.asarray(l).ravel() for l in jax.tree.leaves(st.params)])
        np.testing.assert_array_equal(
            np.asarray(p).reshape(-1)[: flat.size], flat)

    check_master(state)

    # and stays sharded after a step
    batch = t_z.shard_batch(global_batch(cfg, rng, n_dev))
    state, _ = t_z.train_step(state, batch, jax.random.key(1))
    assert not state.opt_state.m.sharding.is_fully_replicated
    assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated
    check_master(state)


def test_zero1_with_grad_accum(rng):
    """accum=2 under zero1 == accum=2 replicated."""
    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    t_ref, t_z = _trainers(cfg, mesh, accum=2)

    state_r = t_ref.init_state(jax.random.key(0), make_batch(cfg, rng))
    state_z = t_z.init_state(jax.random.key(0), make_batch(cfg, rng))
    for i in range(3):
        batch = t_ref.shard_batch(
            global_batch(cfg, np.random.RandomState(i), n_dev, accum=2))
        key = jax.random.key(i)
        state_r, _ = t_ref.train_step(state_r, batch, key)
        state_z, _ = t_z.train_step(state_z, batch, key)
    _assert_params_close(state_r.params, state_z.params)


def test_zero1_train_steps_scan(rng):
    """The K-steps-per-dispatch scan path carries the sharded state."""
    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    t_ref, t_z = _trainers(cfg, mesh)

    K = 3
    bs = [global_batch(cfg, np.random.RandomState(i), n_dev) for i in range(K)]
    stacked = {k: jnp.stack([bs[i][k] for i in range(K)]) for k in bs[0]}
    stacked = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, None, DP_AXIS))),
        stacked,
    )
    root = jax.random.key(7)

    state_r = t_ref.init_state(jax.random.key(0), make_batch(cfg, rng))
    state_z = t_z.init_state(jax.random.key(0), make_batch(cfg, rng))
    state_r, m_r = t_ref.train_steps(state_r, stacked, root)
    state_z, m_z = t_z.train_steps(state_z, stacked, root)
    np.testing.assert_allclose(
        np.asarray(m_z["loss"]), np.asarray(m_r["loss"]), rtol=1e-6)
    _assert_params_close(state_r.params, state_z.params)


def test_zero1_checkpoint_roundtrip(rng, tmp_path):
    """Save/restore of the sharded Zero1State (msgpack path) resumes the
    exact trajectory: step - save - restore - step == step - step."""
    from univl_tpu.checkpoint.io import restore_checkpoint, save_checkpoint

    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    _, t_z = _trainers(cfg, mesh)

    state = t_z.init_state(jax.random.key(0), make_batch(cfg, rng))
    b0 = t_z.shard_batch(global_batch(cfg, np.random.RandomState(0), n_dev))
    b1 = t_z.shard_batch(global_batch(cfg, np.random.RandomState(1), n_dev))
    state, _ = t_z.train_step(state, b0, jax.random.key(0))

    path = str(tmp_path / "z1.msgpack")
    save_checkpoint(path, state, metadata={"epoch": 0})
    cont, _ = t_z.train_step(state, b1, jax.random.key(1))

    _, t_z2 = _trainers(cfg, mesh)
    template = t_z2.init_state(jax.random.key(2), make_batch(cfg, rng))
    restored, meta = restore_checkpoint(path, template)
    assert meta["epoch"] == 0
    resumed, _ = t_z2.train_step(restored, b1, jax.random.key(1))
    _assert_params_close(cont.params, resumed.params, rtol=1e-6, atol=1e-8)


def test_zero1_state_conversion_roundtrip(rng):
    """A run checkpointed replicated can resume under --zero1 and vice
    versa: 2 replicated steps -> convert -> 2 zero1 steps == 4 replicated
    steps; then the inverse conversion back matches too."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from univl_tpu.train.zero1 import (
        Zero1State,
        replicated_state_from_zero1,
        zero1_state_from_replicated,
    )

    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    t_ref, t_z = _trainers(cfg, mesh)

    def batch(i):
        return t_ref.shard_batch(
            global_batch(cfg, np.random.RandomState(i), n_dev))

    # 4 straight replicated steps = ground truth
    gt = t_ref.init_state(jax.random.key(0), make_batch(cfg, rng))
    for i in range(4):
        gt, _ = t_ref.train_step(gt, batch(i), jax.random.key(i))

    # 2 replicated -> convert -> 2 zero1
    s = t_ref.init_state(jax.random.key(0), make_batch(cfg, rng))
    for i in range(2):
        s, _ = t_ref.train_step(s, batch(i), jax.random.key(i))
    z_opt = zero1_state_from_replicated(s.params, s.opt_state, dp=n_dev)
    repl = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(DP_AXIS))
    z_opt = jax.device_put(z_opt, Zero1State(step=repl, m=shd, v=shd, p=shd))
    sz = s.replace(opt_state=z_opt)
    for i in range(2, 4):
        sz, _ = t_z.train_step(sz, batch(i), jax.random.key(i))
    _assert_params_close(gt.params, sz.params)

    # 2 zero1 -> convert back -> 2 replicated
    s2 = t_z.init_state(jax.random.key(0), make_batch(cfg, rng))
    for i in range(2):
        s2, _ = t_z.train_step(s2, batch(i), jax.random.key(i))
    r_opt = replicated_state_from_zero1(s2.params, s2.opt_state)
    sr = s2.replace(opt_state=jax.device_put(r_opt, repl))
    for i in range(2, 4):
        sr, _ = t_ref.train_step(sr, batch(i), jax.random.key(i))
    _assert_params_close(gt.params, sr.params)


def test_zero1_bf16_state_matches_replicated_bf16():
    """Store-then-update semantics: the replicated bert_adam rounds the
    moments to state_dtype FIRST and computes the update from the STORED
    values (optimization.py update_fn). With identical gradients and the
    clips off, zero1_bert_adam(state_dtype=bfloat16) must therefore match
    bert_adam(state_dtype=bfloat16) bit-for-bit — this pins the rounding
    order (a regression here breaks replicated<->zero1 resume and the
    'numerically equivalent' CLI contract)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from univl_tpu.train.optimization import bert_adam
    from univl_tpu.train.zero1 import zero1_bert_adam, zero1_state_pspecs

    n_dev = len(jax.devices())
    mesh = make_mesh()
    rs = np.random.RandomState(0)
    # leaf sizes deliberately not divisible by n_dev (exercises padding)
    params = {
        "w": jnp.asarray(rs.randn(13, 5), jnp.float32),
        "b": jnp.asarray(rs.randn(7), jnp.float32),
    }
    kw = dict(lr=1e-3, t_total=20, warmup=0.1, weight_decay=0.01,
              max_grad_norm=0.0, state_dtype="bfloat16")
    opt_r = bert_adam(**kw)
    opt_z = zero1_bert_adam(dp=n_dev, global_clip_norm=0.0, **kw)

    from univl_tpu.train.zero1 import Zero1State

    st_r = opt_r.init(params)
    st_z = opt_z.init(params)
    repl = jax.sharding.NamedSharding(mesh, P())
    shd = jax.sharding.NamedSharding(mesh, P(DP_AXIS))
    st_z = jax.device_put(st_z, Zero1State(step=repl, m=shd, v=shd, p=shd))

    @jax.jit
    def z_step(g, st, p):
        f = shard_map(
            opt_z.update,
            mesh=mesh,
            in_specs=(P(), zero1_state_pspecs(), P()),
            out_specs=(P(), zero1_state_pspecs()),
            check_vma=False,
        )
        return f(g, st, p)

    p_r, p_z = params, params
    for i in range(3):
        g = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.RandomState(10 + i).randn(*p.shape), jnp.float32),
            params)
        upd_r, st_r = opt_r.update(g, st_r, p_r)
        # v3 contract: zero1's update_fn returns the NEW params directly
        p_z, st_z = z_step(g, st_z, p_z)
        p_r = jax.tree.map(lambda p, u: p + u, p_r, upd_r)
        # 1e-5 >> fp32 psum reduction-order noise but << the ~2e-3
        # relative error of updating from UNROUNDED bf16 moments (the
        # bug this test pins).
        _assert_params_close(p_r, p_z, rtol=1e-5, atol=1e-9)
    _assert_params_close(p_r, p_z, rtol=1e-5, atol=1e-9)


def test_zero1_bf16_state_close_to_fp32(rng):
    """state_dtype=bfloat16 shards the bf16 moments too; trajectory stays
    near the fp32-moment zero1 run (same bound class as the replicated
    bf16-state knob, tests/test_optimizer.py)."""
    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    _, t_f32 = _trainers(cfg, mesh)
    _, t_bf16 = _trainers(cfg, mesh, state_dtype="bfloat16")

    s32 = t_f32.init_state(jax.random.key(0), make_batch(cfg, rng))
    s16 = t_bf16.init_state(jax.random.key(0), make_batch(cfg, rng))
    assert s16.opt_state.m.dtype == jnp.bfloat16
    for i in range(3):
        batch = t_f32.shard_batch(
            global_batch(cfg, np.random.RandomState(i), n_dev))
        key = jax.random.key(i)
        s32, _ = t_f32.train_step(s32, batch, key)
        s16, _ = t_bf16.train_step(s16, batch, key)
    _assert_params_close(s32.params, s16.params, rtol=5e-2, atol=5e-4)


def test_zero1_tp_matches_dp_tp(rng):
    """Round-4 (VERDICT item 5): zero1 x tp. On a (dp=2, tp=4) mesh the
    zero1_tp optimizer (flat dp-scattered path on tp-replicated leaves,
    per-leaf adam on tp-sharded leaves) must track the replicated
    optimizer on the SAME mesh step for step — completing the parallelism
    matrix (the round-3 trainer raised `zero1 requires tp == 1`)."""
    from univl_tpu.parallel.tp import make_mesh_2d
    from univl_tpu.train.zero1_tp import make_univl_zero1_tp_optimizer

    cfg = UniVLConfig.tiny()
    dp, tp = 2, 4
    mesh = make_mesh_2d(dp, tp)
    model = UniVL(cfg)
    kw = dict(lr=1e-3, t_total=50, warmup_proportion=0.02, coef_lr=0.1)
    t_ref = Trainer(model, make_univl_optimizer(**kw), mesh,
                    grad_accum_steps=1, donate=False)
    t_z = Trainer(model, make_univl_zero1_tp_optimizer(dp=dp, tp=tp, **kw),
                  mesh, grad_accum_steps=1, donate=False, zero1=True)

    state_r = t_ref.init_state(jax.random.key(0), make_batch(cfg, rng))
    state_z = t_z.init_state(jax.random.key(0), make_batch(cfg, rng))
    _assert_params_close(state_r.params, state_z.params, rtol=0, atol=0)

    # the flat moments are dp-sharded; at least one leaf moment must be
    # tp-sharded (the ZeRO-for-free-over-tp claim)
    from jax.sharding import PartitionSpec as P
    assert state_z.opt_state.m.sharding.spec == P(DP_AXIS)
    leaf_specs = [
        x.sharding.spec for x in jax.tree.leaves(state_z.opt_state.leaf_m)
        if x.ndim
    ]
    assert any(any(ax is not None for ax in sp) for sp in leaf_specs), leaf_specs

    for i in range(4):
        batch = t_ref.shard_batch(
            global_batch(cfg, np.random.RandomState(i), dp))
        key = jax.random.key(i)
        state_r, m_r = t_ref.train_step(state_r, batch, key)
        state_z, m_z = t_z.train_step(state_z, batch, key)
        np.testing.assert_allclose(
            float(m_z["loss"]), float(m_r["loss"]), rtol=1e-6)

    _assert_params_close(state_r.params, state_z.params)

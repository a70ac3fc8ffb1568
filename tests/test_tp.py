"""Tensor-parallel trainer tests (2-D dp×tp mesh, virtual 8-device CPU).

The TP contract (parallel/tp.py): a (dp, tp) mesh must produce the SAME
training trajectory as a dp-only mesh with the same dp size — tp only
partitions the math, it never changes it (the per-device-negatives loss
semantics depend on the dp split alone). No reference equivalent (the
reference is NCCL DP-only, main_task_retrieval.py:23,197-198).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from univl_tpu.config import UniVLConfig
from univl_tpu.models.univl import UniVL
from univl_tpu.parallel.mesh import make_mesh
from univl_tpu.parallel.tp import (
    make_mesh_2d,
    mesh_tp_size,
    param_pspecs,
    state_shardings,
)
from univl_tpu.train.optimization import make_univl_optimizer
from univl_tpu.train.trainer import Trainer

from test_model import make_batch
from test_trainer import global_batch


def _run(mesh, cfg, n_steps=2, accum=2):
    model = UniVL(cfg)
    tx = make_univl_optimizer(lr=1e-3, t_total=100, warmup_proportion=0.1,
                              coef_lr=0.1)
    tr = Trainer(model, tx, mesh, grad_accum_steps=accum)
    state = tr.init_state(jax.random.key(0), make_batch(cfg, np.random.RandomState(0)))
    p0 = jax.device_get(state.params)
    n_dp = mesh.devices.shape[0]
    losses = []
    for i in range(n_steps):
        batch = tr.shard_batch(
            global_batch(cfg, np.random.RandomState(10 + i), n_dp, accum=accum)
        )
        state, metrics = tr.train_step(state, batch, jax.random.key(100 + i))
        losses.append(float(metrics["loss"]))
    return losses, jax.device_get(state.params), p0


def _assert_same_trajectory(p0, p_dp, p_other):
    """Per-leaf self-calibrating closeness: each leaf's dp-vs-other diff
    must be < 5% of how far that leaf actually MOVED in the dp baseline
    (floor 1e-7 for unmoved leaves). A flat absolute threshold is blind to
    the coef_lr=0.1 group, whose entire 2-step movement (~3e-5) sits below
    any tolerance loose enough for the fast-moving groups — a tp bug
    zeroing that group's gradients would pass. Movement-relative bounds
    catch a mis-reduced group at ANY update scale (reduction-order noise
    measures ~0.1% of movement; a wrong/zero gradient shows up as ~100%)."""
    bad, text_moved = [], 0.0
    for (path, a), (_, b), (_, i0) in zip(
        jax.tree_util.tree_flatten_with_path(p_dp)[0],
        jax.tree_util.tree_flatten_with_path(p_other)[0],
        jax.tree_util.tree_flatten_with_path(p0)[0],
    ):
        key = jax.tree_util.keystr(path)
        moved = float(np.max(np.abs(np.asarray(a) - np.asarray(i0))))
        diff = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        if diff > max(1e-7, 0.05 * moved):
            bad.append((key, diff, moved))
        if "text" in key:
            text_moved = max(text_moved, moved)
    assert not bad, sorted(bad, key=lambda kv: -kv[1])[:5]
    # signal check: the slow (coef_lr=0.1) text group really moved, so a
    # zeroed/mis-reduced text gradient cannot hide under the floor
    assert text_moved > 1e-6, text_moved


def test_tp_matches_dp():
    """dp=4 × tp=2 reproduces the dp=4 trajectory (losses + params)."""
    cfg = UniVLConfig.tiny()
    l_dp, p_dp, p0 = _run(make_mesh(4), cfg)
    l_tp, p_tp, _ = _run(make_mesh_2d(4, 2), cfg)

    np.testing.assert_allclose(l_dp, l_tp, rtol=1e-5, atol=1e-5)
    _assert_same_trajectory(p0, p_dp, p_tp)


def test_sp_matches_dp():
    """Sequence parallelism on top of tp (dp=4 × tp=2 + SP constraints on
    the residual stream, parallel/sp.py) must also reproduce the dp=4
    trajectory — SP only moves where the tp collectives happen."""
    cfg = UniVLConfig.tiny()
    l_dp, p_dp, p0 = _run(make_mesh(4), cfg)
    l_sp, p_sp, _ = _run(make_mesh_2d(4, 2), cfg.replace(sequence_parallel=True))

    np.testing.assert_allclose(l_dp, l_sp, rtol=1e-5, atol=1e-5)
    _assert_same_trajectory(p0, p_dp, p_sp)


def test_sp_noop_without_tp_axis():
    """The SP constraint self-gates: the same sequence_parallel=True model
    runs unchanged in a plain single-device jit (eval paths, no mesh) and
    produces the identical forward value."""
    cfg = UniVLConfig.tiny()
    batch = make_batch(cfg, np.random.RandomState(0))
    m0 = UniVL(cfg)
    m1 = UniVL(cfg.replace(sequence_parallel=True))
    p = m0.init(jax.random.key(0), batch, deterministic=True)
    out0 = jax.jit(lambda pp: m0.apply(pp, batch, deterministic=True)["loss"])(p)
    out1 = jax.jit(lambda pp: m1.apply(pp, batch, deterministic=True)["loss"])(p)
    np.testing.assert_allclose(float(out0), float(out1), rtol=0, atol=0)


def test_tp_param_shardings():
    """The Megatron split lands on the right leaves: q/k/v + FFN-up
    column-parallel, attn-out + FFN-down row-parallel, vocab table and
    tied-logit biases vocab-parallel, LayerNorms replicated — and the
    BertAdam moments shard exactly like their params."""
    cfg = UniVLConfig.tiny(stage_two=True, do_pretrain=True, use_mil=True)
    model = UniVL(cfg)
    batch = make_batch(cfg, np.random.RandomState(0), with_caption=True,
                       with_pretrain=True)
    params = model.init(jax.random.key(0), batch, deterministic=True)["params"]

    specs = param_pspecs(params, tp=2)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )[0]
    }
    assert flat["text/encoder/layer_0/attention/query/kernel"] == P(None, "tp")
    assert flat["text/encoder/layer_0/attention/query/bias"] == P("tp")
    assert flat["text/encoder/layer_0/attention_output/dense/kernel"] == P("tp", None)
    assert flat["text/encoder/layer_0/attention_output/dense/bias"] == P()
    assert flat["text/encoder/layer_0/intermediate/kernel"] == P(None, "tp")
    assert flat["text/encoder/layer_0/output/dense/kernel"] == P("tp", None)
    assert flat["decoder/layer_0/self_attn/value/kernel"] == P(None, "tp")
    assert flat["decoder/layer_0/enc_attn_output/dense/kernel"] == P("tp", None)
    assert flat["word_embed/embedding"] == P("tp", None)
    assert flat["mlm_head/bias"] == P("tp")
    assert flat["decoder/classifier_bias"] == P("tp")
    # replicated: LayerNorms, pos/type embeddings, pooler, similarity head
    assert flat["text/encoder/layer_0/output/ln/scale"] == P()
    assert flat["text_pos_embed/embedding"] == P()
    assert flat["cross/pooler/dense/kernel"] == P()
    assert flat["similarity_dense/kernel"] == P()

    n_sharded = sum(
        1 for s in jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
        if s != P()
    )
    assert n_sharded >= 90, n_sharded  # every tower layer contributes

    # moments inherit param shardings
    mesh = make_mesh_2d(4, 2)
    tx = make_univl_optimizer(lr=1e-3, t_total=100)
    opt_state = tx.init(params)
    p_sh, o_sh = state_shardings(tx, params, opt_state, mesh)
    adam = o_sh[1]
    got = jax.tree_util.tree_flatten_with_path(adam.m)[0]
    want = {
        "/".join(str(getattr(k, "key", k)) for k in path): sh
        for path, sh in jax.tree_util.tree_flatten_with_path(p_sh)[0]
    }
    for path, sh in got:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        assert sh.spec == want[key].spec, key
    assert adam.step.spec == P()


def test_tp_matches_dp_scan_layers():
    """tp (+ SP) with the scan_layers stacked towers: the Megatron spec
    must skip the leading [num_layers] axis and the trajectory still
    equals dp-only."""
    cfg = UniVLConfig.tiny(scan_layers=True)
    l_dp, p_dp, p0 = _run(make_mesh(4), cfg)
    l_tp, p_tp, _ = _run(make_mesh_2d(4, 2), cfg.replace(sequence_parallel=True))
    np.testing.assert_allclose(l_dp, l_tp, rtol=1e-5, atol=1e-5)
    _assert_same_trajectory(p0, p_dp, p_tp)


def test_tp_param_shardings_scan_layers():
    """Stacked [N, ...] leaves shard behind the layer axis."""
    cfg = UniVLConfig.tiny(scan_layers=True)
    model = UniVL(cfg)
    batch = make_batch(cfg, np.random.RandomState(0))
    params = model.init(jax.random.key(0), batch, deterministic=True)["params"]
    specs = param_pspecs(params, tp=2)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )[0]
    }
    assert flat["text/encoder/layers/attention/query/kernel"] == P(None, None, "tp")
    assert flat["text/encoder/layers/attention/query/bias"] == P(None, "tp")
    assert flat["text/encoder/layers/attention_output/dense/kernel"] == P(None, "tp", None)
    assert flat["text/encoder/layers/output/dense/kernel"] == P(None, "tp", None)
    assert flat["text/encoder/layers/output/ln/scale"] == P()
    assert flat["word_embed/embedding"] == P("tp", None)  # not stacked


def test_tp_indivisible_dim_stays_replicated():
    """A dim not divisible by tp falls back to replication, never errors."""
    cfg = UniVLConfig.tiny()
    model = UniVL(cfg)
    batch = make_batch(cfg, np.random.RandomState(0))
    params = model.init(jax.random.key(0), batch, deterministic=True)["params"]
    specs = param_pspecs(params, tp=7)  # divides nothing in the tiny config
    assert all(
        s == P()
        for s in jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    )


def test_mesh_tp_size():
    assert mesh_tp_size(None) == 1
    assert mesh_tp_size(make_mesh(4)) == 1
    assert mesh_tp_size(make_mesh_2d(2, 4)) == 4

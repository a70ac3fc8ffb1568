"""BertAdam-clone parity vs an independent numpy simulation of the
reference update rule (modules/optimization.py:103-167)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.train.optimization import (
    bert_adam,
    make_univl_optimizer,
    univl_decay_mask,
    univl_lr_scale,
    warmup_linear,
)


def np_bert_adam_steps(p, grads, lr, warmup, t_total, b1=0.9, b2=0.999,
                       eps=1e-6, wd=0.01, max_grad_norm=1.0):
    """Numpy oracle: same math, written independently."""
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    step = 0
    for g in grads:
        norm = np.sqrt((g.astype(np.float64) ** 2).sum())
        if max_grad_norm > 0 and norm > max_grad_norm:
            g = g * (max_grad_norm / (norm + 1e-6))
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        upd = m / (np.sqrt(v) + eps) + wd * p
        x = step / t_total
        sched = x / warmup if x < warmup else max((x - 1.0) / (warmup - 1.0), 0.0)
        p = p - lr * sched * upd
        step += 1
    return p


def test_bert_adam_matches_numpy(rng):
    p0 = rng.randn(16).astype(np.float32)
    grads = [rng.randn(16).astype(np.float32) * 3.0 for _ in range(5)]

    tx = bert_adam(lr=0.01, warmup=0.4, t_total=5, weight_decay=0.01,
                   max_grad_norm=1.0)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda a, b: a + b, params, updates)

    expect = np_bert_adam_steps(p0.astype(np.float64),
                                [g.astype(np.float64) for g in grads],
                                lr=0.01, warmup=0.4, t_total=5)
    np.testing.assert_allclose(np.asarray(params["w"]), expect, rtol=1e-4, atol=1e-6)


def test_first_step_lr_is_zero(rng):
    """Reference quirk: schedule evaluated before step increment, so the
    first update has lr=0 under warmup_linear."""
    p0 = rng.randn(8).astype(np.float32)
    tx = bert_adam(lr=0.1, warmup=0.1, t_total=100)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.ones(8, jnp.float32)}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), np.zeros(8), atol=1e-12)


def test_warmup_linear_shape():
    assert float(warmup_linear(0.0, 0.1)) == 0.0
    assert float(warmup_linear(0.1, 0.1)) == pytest.approx(1.0)
    assert float(warmup_linear(0.55, 0.1)) == pytest.approx(0.5)
    assert float(warmup_linear(1.0, 0.1)) == pytest.approx(0.0)


def test_param_group_policy():
    params = {
        "text": {"layer_0": {"attention": {"query": {"kernel": jnp.ones((2, 2)),
                                                     "bias": jnp.ones(2)}},
                 "ln": {"scale": jnp.ones(2), "bias": jnp.ones(2)}}},
        "visual": {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}},
        "word_embed": {"embedding": jnp.ones((4, 2))},
        "similarity_dense": {"kernel": jnp.ones((2, 1)), "bias": jnp.ones(1)},
    }
    decay = univl_decay_mask(params)
    assert decay["text"]["layer_0"]["attention"]["query"]["kernel"] is True
    assert decay["text"]["layer_0"]["attention"]["query"]["bias"] is False
    assert decay["text"]["layer_0"]["ln"]["scale"] is False
    assert decay["word_embed"]["embedding"] is True
    assert decay["visual"]["dense"]["bias"] is False

    scale = univl_lr_scale(params, 0.1)
    assert scale["text"]["layer_0"]["attention"]["query"]["kernel"] == 0.1
    assert scale["word_embed"]["embedding"] == 0.1
    assert scale["visual"]["dense"]["kernel"] == 1.0
    assert scale["similarity_dense"]["kernel"] == 1.0


def test_global_clip_composes(rng):
    """make_univl_optimizer must clip by global norm BEFORE BertAdam: its
    update on huge grads must equal bert_adam (same param-group policy, no
    outer clip) fed the pre-clipped grads — and differ from bert_adam fed
    the raw grads (i.e. removing the chain's clip stage is detected)."""
    from univl_tpu.train.optimization import (
        bert_adam, univl_decay_mask, univl_lr_scale,
    )

    # Two leaves at very different gradient scales: under the GLOBAL clip
    # both scale by the same 1/||g||; under BertAdam's internal per-TENSOR
    # clip alone the small leaf is untouched — so the small leaf is where
    # a missing global-clip stage shows up.
    p0 = {"text": {"dense": {
        "kernel": jnp.asarray(rng.randn(4, 4), jnp.float32),
        "bias": jnp.asarray(rng.randn(4), jnp.float32),
    }}}
    tx = make_univl_optimizer(lr=0.01, t_total=10, warmup_proportion=0.1,
                              coef_lr=1.0)
    state = tx.init(p0)
    big = {"text": {"dense": {
        "kernel": jnp.full((4, 4), 100.0),
        "bias": jnp.full((4,), 1e-3),
    }}}
    # advance one step so the warmup_linear(0) = 0 schedule can't zero the
    # compared updates
    _, state = tx.update(jax.tree.map(jnp.zeros_like, p0), state, p0)
    updates, _ = tx.update(big, state, p0)

    oracle = bert_adam(
        lr=0.01, warmup=0.1, t_total=10, weight_decay=0.01, max_grad_norm=1.0,
        decay_mask=univl_decay_mask, lr_scale=lambda p: univl_lr_scale(p, 1.0),
    )
    o_state = oracle.init(p0)
    _, o_state = oracle.update(jax.tree.map(jnp.zeros_like, p0), o_state, p0)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(big))))
    clipped = jax.tree.map(lambda g: g * (1.0 / gnorm), big)  # clip norm 1.0
    expected, _ = oracle.update(clipped, o_state, p0)
    for k in ("kernel", "bias"):
        np.testing.assert_allclose(
            np.asarray(updates["text"]["dense"][k]),
            np.asarray(expected["text"]["dense"][k]), rtol=1e-6,
            err_msg=k)

    unclipped, _ = oracle.update(big, o_state, p0)
    assert not np.allclose(
        np.asarray(updates["text"]["dense"]["bias"]),
        np.asarray(unclipped["text"]["dense"]["bias"]))


def test_warmup_constant_and_cosine():
    from univl_tpu.train.optimization import warmup_constant, warmup_cosine

    assert float(warmup_constant(0.05, 0.1)) == pytest.approx(0.5)
    assert float(warmup_constant(0.5, 0.1)) == 1.0
    assert float(warmup_cosine(0.05, 0.1)) == pytest.approx(0.5)
    assert float(warmup_cosine(0.5, 0.1)) == pytest.approx(0.5, abs=1e-6)
    assert float(warmup_cosine(1.0, 0.1)) == pytest.approx(0.0, abs=1e-6)


def test_bert_adam_bf16_state_tracks_fp32():
    """bfloat16 moment storage: same trajectory to loose tolerance, half the
    state bytes; moment math stays fp32."""
    import jax
    import jax.numpy as jnp

    from univl_tpu.train.optimization import bert_adam

    params = {"w": jnp.asarray(np.linspace(-1, 1, 64).reshape(8, 8), jnp.float32)}
    tx32 = bert_adam(lr=1e-2, warmup=0.1, t_total=50)
    tx16 = bert_adam(lr=1e-2, warmup=0.1, t_total=50, state_dtype="bfloat16")
    s32, s16 = tx32.init(params), tx16.init(params)
    assert s16.m["w"].dtype == jnp.bfloat16 and s32.m["w"].dtype == jnp.float32

    p32 = {"w": params["w"]}
    p16 = {"w": params["w"]}
    rng = np.random.RandomState(0)
    for i in range(10):
        g = {"w": jnp.asarray(rng.randn(8, 8) * 0.1, jnp.float32)}
        u32, s32 = tx32.update(g, s32, p32)
        u16, s16 = tx16.update(g, s16, p16)
        p32 = jax.tree.map(lambda p, u: p + u, p32, u32)
        p16 = jax.tree.map(lambda p, u: p + u, p16, u16)
    # bf16 moments carry ~3 significant digits; after 10 steps of ~1e-2
    # updates the trajectories agree to ~1e-3 (and to ~1e-5 in the full
    # model at lr 3e-5, docs/PERF.md)
    np.testing.assert_allclose(
        np.asarray(p16["w"]), np.asarray(p32["w"]), rtol=0, atol=5e-3
    )
    total_move = np.abs(np.asarray(p32["w"]) - np.asarray(params["w"])).mean()
    drift = np.abs(np.asarray(p16["w"]) - np.asarray(p32["w"])).mean()
    assert drift < 0.02 * total_move, (drift, total_move)

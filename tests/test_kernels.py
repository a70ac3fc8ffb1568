"""Pallas kernel correctness vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.nn.layers import additive_mask_bias, sdpa_xla


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    # Pallas TPU kernels run in interpreter mode on CPU.
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


@pytest.mark.parametrize("dtype", [jnp.float32])
@pytest.mark.parametrize("B,H,L,D", [(2, 3, 10, 8), (1, 2, 48, 64)])
def test_fused_attention_matches_xla(rng, dtype, B, H, L, D):
    from univl_tpu.kernels.attention import fused_attention_masked

    q = jnp.asarray(rng.randn(B, H, L, D), dtype)
    k = jnp.asarray(rng.randn(B, H, L, D), dtype)
    v = jnp.asarray(rng.randn(B, H, L, D), dtype)
    mask = (rng.rand(B, L) > 0.3).astype(np.float32)
    bias = additive_mask_bias(jnp.asarray(mask))

    got = fused_attention_masked(q, k, v, jnp.asarray(mask))
    expect = sdpa_xla(q, k, v, bias)
    # only unmasked-query rows are meaningful downstream; compare all anyway
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expect, np.float32),
        rtol=2e-3, atol=2e-3,
    )


def test_fused_attention_causal(rng):
    from univl_tpu.kernels.attention import fused_attention_masked

    B, H, L, D = 1, 2, 12, 8
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    mask = np.ones((B, L), np.float32)

    got = fused_attention_masked(q, k, v, jnp.asarray(mask), causal=True)

    # XLA oracle with explicit causal bias
    causal_bias = jnp.where(
        jnp.triu(jnp.ones((L, L)), k=1)[None, None] > 0, -1e9, 0.0
    )
    expect = sdpa_xla(q, k, v, causal_bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("N", [256, 300])  # 300 exercises row padding
def test_fused_ffn_matches_reference(rng, N):
    from univl_tpu.kernels.ffn import ffn_reference, fused_ffn

    H, F = 256, 512
    x = jnp.asarray(rng.randn(N, H), jnp.float32)
    w1 = jnp.asarray(rng.randn(H, F) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.randn(F) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(F, H) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.randn(H) * 0.01, jnp.float32)

    y = fused_ffn(x, w1, b1, w2, b2)
    y_ref = ffn_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(fused_ffn(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ffn_reference(*a)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gf, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-5, atol=2e-5
        )


@pytest.mark.parametrize("N", [256, 300])  # 300 exercises row padding
def test_fused_ffn_block_matches_reference(rng, N):
    """fused_ffn_block (FFN + dropout + residual + LN in one kernel) at
    rate=0 against the unfused rounding-schedule oracle, fwd + custom VJP
    incl. the LN scale/bias grads (per-tile partial-sum outputs). The
    rate>0 path needs the hardware PRNG (interpret mode returns zero bits)
    and is validated on TPU via tools/tpu_checks.py."""
    from univl_tpu.kernels.ffn import ffn_block_reference, fused_ffn_block

    H, F = 256, 512
    x = jnp.asarray(rng.randn(N, H), jnp.float32)
    w1 = jnp.asarray(rng.randn(H, F) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.randn(F) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(F, H) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.randn(H) * 0.01, jnp.float32)
    scale = jnp.asarray(rng.rand(H) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)

    y = fused_ffn_block(x, w1, b1, w2, b2, scale, bias, jnp.int32(0), 0.0, 1e-12)
    y_ref = ffn_block_reference(x, w1, b1, w2, b2, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    def loss_fused(*a):
        return jnp.sum(
            jnp.sin(fused_ffn_block(*a, jnp.int32(0), 0.0, 1e-12))
        )

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ffn_block_reference(*a)))

    args = (x, w1, b1, w2, b2, scale, bias)
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gr):
        s = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, rtol=2e-5, atol=2e-5
        )


@pytest.mark.parametrize("N", [256, 300])  # 300 exercises row padding
def test_fused_dense_block_matches_reference(rng, N):
    """fused_dense_block (attention-output epilogue: dense + dropout +
    separate-tensor residual + LN) at rate=0, fwd + custom VJP."""
    from univl_tpu.kernels.ffn import dense_block_reference, fused_dense_block

    H = 256
    x = jnp.asarray(rng.randn(N, H), jnp.float32)
    r = jnp.asarray(rng.randn(N, H), jnp.float32)
    w = jnp.asarray(rng.randn(H, H) * 0.02, jnp.float32)
    b = jnp.asarray(rng.randn(H) * 0.01, jnp.float32)
    scale = jnp.asarray(rng.rand(H) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)

    y = fused_dense_block(x, r, w, b, scale, bias, jnp.int32(0), 0.0, 1e-12)
    y_ref = dense_block_reference(x, r, w, b, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    args = (x, r, w, b, scale, bias)
    gf = jax.grad(
        lambda *a: jnp.sum(
            jnp.sin(fused_dense_block(*a, jnp.int32(0), 0.0, 1e-12))
        ),
        argnums=tuple(range(6)),
    )(*args)
    gr = jax.grad(
        lambda *a: jnp.sum(jnp.sin(dense_block_reference(*a))),
        argnums=tuple(range(6)),
    )(*args)
    for a, b_ in zip(gf, gr):
        s = max(1.0, float(jnp.max(jnp.abs(b_))))
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b_) / s, rtol=2e-5, atol=2e-5
        )


def test_fused_ffn_block_layer_param_tree_and_output(rng, monkeypatch):
    """use_fused_ffn='block' keeps the exact param tree of the unfused
    layer (checkpoint contract) and computes the same function at
    deterministic eval (dropout off)."""
    from univl_tpu.nn.layers import TransformerLayer, additive_mask_bias

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    kw = dict(hidden_size=128, num_heads=4, intermediate_size=256,
              dropout_rate=0.0, attn_dropout_rate=0.0)
    x = jnp.asarray(rng.randn(2, 8, 128), jnp.float32)
    bias = additive_mask_bias(jnp.ones((2, 8), jnp.int32))

    unfused = TransformerLayer(use_fused_ffn=False, **kw)
    block = TransformerLayer(use_fused_ffn="block", **kw)
    p0 = unfused.init(jax.random.key(0), x, bias, True)
    p1 = block.init(jax.random.key(0), x, bias, True)
    assert jax.tree.map(jnp.shape, p0) == jax.tree.map(jnp.shape, p1)

    out0 = unfused.apply(p0, x, bias, True)
    out1 = block.apply(p0, x, bias, True)  # unfused params in the block layer
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=2e-5, atol=2e-5)


def test_fused_ffn_layer_param_tree_and_output(rng, monkeypatch):
    """use_fused_ffn=True keeps the exact param tree of the unfused layer
    (checkpoint contract) and computes the same function."""
    from univl_tpu.nn.layers import TransformerLayer, additive_mask_bias

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    kw = dict(hidden_size=128, num_heads=4, intermediate_size=256,
              dropout_rate=0.0, attn_dropout_rate=0.0)
    x = jnp.asarray(rng.randn(2, 8, 128), jnp.float32)
    bias = additive_mask_bias(jnp.ones((2, 8), jnp.int32))

    unfused = TransformerLayer(use_fused_ffn=False, **kw)
    fused = TransformerLayer(use_fused_ffn=True, **kw)
    p0 = unfused.init(jax.random.key(0), x, bias, True)
    p1 = fused.init(jax.random.key(0), x, bias, True)
    assert jax.tree.map(jnp.shape, p0) == jax.tree.map(jnp.shape, p1)

    out0 = unfused.apply(p0, x, bias, True)
    out1 = fused.apply(p0, x, bias, True)  # unfused params in the fused layer
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=2e-5, atol=2e-5)


def test_train_attention_rate0_needs_no_dropout_rng(rng, monkeypatch):
    """With all dropout rates 0 the fused train path must not demand a
    'dropout' rng (regression: unconditional make_rng crashed configs that
    the XLA path accepted)."""
    from univl_tpu.nn.layers import TransformerLayer, additive_mask_bias

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    layer = TransformerLayer(hidden_size=64, num_heads=4, intermediate_size=128,
                             dropout_rate=0.0, attn_dropout_rate=0.0,
                             use_train_pallas=True)
    x = jnp.asarray(rng.randn(2, 8, 64), jnp.float32)
    bias = additive_mask_bias(jnp.ones((2, 8), jnp.int32))
    p = layer.init(jax.random.key(0), x, bias, True)
    out = layer.apply(p, x, bias, False)  # deterministic=False, no rngs
    assert np.isfinite(np.asarray(out)).all()


def test_fused_ffn_auto_threshold(monkeypatch):
    from univl_tpu.nn.layers import TransformerLayer

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    layer = TransformerLayer(
        hidden_size=128, num_heads=4, intermediate_size=256, use_fused_ffn="auto"
    )
    assert not layer._fused_ffn_active(1024)
    assert layer._fused_ffn_active(98304)
    # non-gelu or misaligned dims never fuse
    relu = TransformerLayer(
        hidden_size=128, num_heads=4, intermediate_size=256,
        hidden_act="relu", use_fused_ffn=True,
    )
    assert not relu._fused_ffn_active(98304)


@pytest.mark.parametrize("B", [4, 11])  # 11 exercises batch-block padding
def test_fused_train_attention_rate0_matches_xla(rng, B):
    """rate=0 pins the train-attention kernel (fwd + custom VJP) against the
    XLA path. The kernel takes/returns the DENSE [B, L, H*D] layout; the
    oracle splits heads outside. The dropout path needs the hardware PRNG
    (interpret mode returns zero bits) and is validated on TPU
    (docs/PERF.md)."""
    from univl_tpu.kernels.train_attention import fused_train_attention

    H, L, D = 3, 16, 8
    q = jnp.asarray(rng.randn(B, L, H * D), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, H * D), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, H * D), jnp.float32)
    mask = (rng.rand(B, L) > 0.3).astype(np.int32)
    bias = additive_mask_bias(jnp.asarray(mask))
    seed = jnp.int32(42)

    def split(x):
        return x.reshape(B, L, H, D).transpose(0, 2, 1, 3)

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(B, L, H * D)

    o = fused_train_attention(q, k, v, jnp.asarray(mask), seed, 0.0, H)
    oe = merge(sdpa_xla(split(q), split(k), split(v), bias))
    np.testing.assert_allclose(np.asarray(o), np.asarray(oe), rtol=2e-5, atol=2e-5)

    def lf(q, k, v):
        return jnp.sum(
            jnp.cos(fused_train_attention(q, k, v, jnp.asarray(mask), seed, 0.0, H))
        )

    def le(q, k, v):
        return jnp.sum(jnp.cos(sdpa_xla(split(q), split(k), split(v), bias)))

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(le, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_train_attention_layer_wiring(rng, monkeypatch):
    """use_train_pallas routes training mode through the kernel and keeps
    eval mode on the XLA path; param tree unchanged."""
    from univl_tpu.nn.layers import TransformerLayer, additive_mask_bias

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    kw = dict(hidden_size=64, num_heads=4, intermediate_size=128,
              dropout_rate=0.0, attn_dropout_rate=0.0)
    x = jnp.asarray(rng.randn(2, 8, 64), jnp.float32)
    bias = additive_mask_bias(jnp.ones((2, 8), jnp.int32))

    plain = TransformerLayer(use_train_pallas=False, **kw)
    routed = TransformerLayer(use_train_pallas=True, **kw)
    p = plain.init(jax.random.key(0), x, bias, True)
    assert jax.tree.map(jnp.shape, p) == jax.tree.map(
        jnp.shape, routed.init(jax.random.key(0), x, bias, True)
    )
    # rate 0 + deterministic rngs: kernel path equals XLA path
    out_plain = plain.apply(
        p, x, bias, False, rngs={"dropout": jax.random.key(1)}
    )
    out_routed = routed.apply(
        p, x, bias, False, rngs={"dropout": jax.random.key(1)}
    )
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_routed), rtol=2e-5, atol=2e-5
    )
    # eval mode ignores the knob entirely
    np.testing.assert_allclose(
        np.asarray(plain.apply(p, x, bias, True)),
        np.asarray(routed.apply(p, x, bias, True)),
        rtol=0, atol=0,
    )


def test_beam_reorder_rows(rng):
    """Scalar-prefetch gather kernel: out[j][i] == arrays[j][src[i]],
    duplicates and mixed shapes/dtypes included (the beam-search cache
    reorder, kernels/reorder.py)."""
    from univl_tpu.kernels.reorder import beam_reorder_rows

    a = jnp.asarray(rng.randn(10, 3, 8, 16), jnp.float32)
    b = jnp.asarray(rng.randn(10, 4, 32), jnp.bfloat16)
    src = jnp.asarray([0, 0, 3, 9, 2, 2, 2, 1, 5, 7], jnp.int32)
    oa, ob = beam_reorder_rows([a, b], src)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(a)[np.asarray(src)])
    np.testing.assert_array_equal(
        np.asarray(ob, np.float32), np.asarray(b, np.float32)[np.asarray(src)]
    )


def test_beam_reorder_groups_inplace(rng):
    """Grouped in-place permute (donated buffers): rows move only within
    K-sized groups; out[g*K+k] == in[g*K + prev_k[g*K+k]]."""
    from univl_tpu.kernels.reorder import beam_reorder_groups_inplace

    B, K = 4, 5
    a = jnp.asarray(rng.randn(B * K, 3, 8, 16), jnp.float32)
    b = jnp.asarray(rng.randn(B * K, 4, 32), jnp.bfloat16)
    prev_k = rng.randint(0, K, B * K).astype(np.int32)
    oa, ob = beam_reorder_groups_inplace([a, b], jnp.asarray(prev_k), K)
    src = (np.arange(B * K) // K) * K + prev_k
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(a)[src])
    np.testing.assert_array_equal(
        np.asarray(ob, np.float32), np.asarray(b, np.float32)[src]
    )


@pytest.mark.parametrize("gpb", [2, 4, 3])
def test_beam_reorder_groups_inplace_gpb_bitwise(rng, gpb):
    """groups_per_block batches K-row groups into larger block DMAs with
    bitwise-identical outputs (round 5, mirroring the fused decode
    kernel's gpb). gpb=3 does not divide B=4 and must fall back to 1."""
    from univl_tpu.kernels.reorder import beam_reorder_groups_inplace

    B, K = 4, 5
    a = jnp.asarray(rng.randn(B * K, 3, 8, 16), jnp.float32)
    b = jnp.asarray(rng.randn(B * K, 4, 32), jnp.bfloat16)
    prev_k = rng.randint(0, K, B * K).astype(np.int32)
    ref = beam_reorder_groups_inplace([a, b], jnp.asarray(prev_k), K,
                                      groups_per_block=1)
    got = beam_reorder_groups_inplace([a, b], jnp.asarray(prev_k), K,
                                      groups_per_block=gpb)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r, np.float32),
                                      np.asarray(g, np.float32))


def test_bias_shim_fallback(rng):
    """Non-key-mask biases route to the XLA path."""
    from univl_tpu.kernels.attention import fused_attention

    B, H, L, D = 1, 2, 8, 8
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    bias = jnp.zeros((B, 1, L, L))  # [B,1,Lq,Lk] form -> fallback
    out = fused_attention(q, q, q, bias)
    expect = sdpa_xla(q, q, q, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(4, 48, 64), (256, 128), (3, 7, 64)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_layernorm_grads_match_plain(rng, shape, dtype):
    """custom-VJP LN backward (Pallas, interpret) == jax.grad of the plain
    implementation — dx, dgamma, dbeta. (3,7,64) exercises the odd-row
    jnp fallback path."""
    from univl_tpu.kernels.layernorm import _plain_fwd, fused_layer_norm

    eps = 1e-12
    d = shape[-1]
    x = jnp.asarray(rng.randn(*shape), dtype)
    scale = jnp.asarray(rng.randn(d) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)
    g = jnp.asarray(rng.randn(*shape), dtype)

    def loss_plain(x, s, b):
        return jnp.sum(_plain_fwd(x, s, b, eps).astype(jnp.float32) *
                       g.astype(jnp.float32))

    def loss_fused(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b, eps, True).astype(jnp.float32) *
                       g.astype(jnp.float32))

    y_plain = _plain_fwd(x, scale, bias, eps)
    y_fused = fused_layer_norm(x, scale, bias, eps, True)
    ytol = dict(rtol=1e-5, atol=1e-6) if dtype == jnp.float32 else \
        dict(rtol=1e-2, atol=4e-5)  # one bf16 ulp at the output cast
    np.testing.assert_allclose(  # reduce-order ulp differences only
        np.asarray(y_plain, np.float32), np.asarray(y_fused, np.float32),
        **ytol,
    )

    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(x, scale, bias)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    for a, b_, name in zip(gp, gf, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=tol, atol=tol, err_msg=name,
        )


class TestVocabTopK:
    """kernels/vocab_topk.py — vocab-tiled classifier -> top-k + logsumexp
    (interpret mode: exact f32)."""

    def _oracle(self, h, w, b, k):
        logits = np.asarray(h, np.float32) @ np.asarray(w, np.float32).T + np.asarray(b)
        import jax.nn

        logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        return jax.lax.top_k(logp, k)

    @pytest.mark.parametrize("R,V,k", [(80, 30522, 5), (3, 2048, 5),
                                       (17, 5000, 8), (8, 130, 1)])
    def test_matches_log_softmax_topk(self, rng, R, V, k):
        from univl_tpu.kernels.vocab_topk import classify_topk

        H = 64
        h = jnp.asarray(rng.normal(size=(R, H)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(V, H)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
        ov, oi = self._oracle(h, w, b, k)
        fv, fi = classify_topk(h, w, b, k, interpret=True)
        np.testing.assert_array_equal(np.asarray(oi), np.asarray(fi))
        np.testing.assert_allclose(
            np.asarray(ov), np.asarray(fv), rtol=1e-5, atol=1e-5
        )

    def test_in_kernel_transform_matches_composed(self, rng):
        """``transform=`` (classifier dense -> erf-GELU -> LN at vocab
        tile 0 into scratch, kernels/vocab_topk.py round 5) must equal
        transform-then-classify composed from plain jnp ops: same
        indices, values to f32 tolerance."""
        from univl_tpu.kernels.vocab_topk import classify_topk

        R, H, V, k = 16, 64, 5000, 5
        x = jnp.asarray(rng.normal(size=(R, H)), jnp.float32)
        wt = jnp.asarray(rng.normal(size=(H, H)) * 0.05, jnp.float32)
        bt = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
        g = jnp.asarray(1 + rng.normal(size=(H,)) * 0.1, jnp.float32)
        lb = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
        w = jnp.asarray(rng.normal(size=(V, H)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)

        t = x @ wt + bt
        t = t * 0.5 * (1 + jax.lax.erf(t / jnp.sqrt(2.0)))
        u = t.mean(-1, keepdims=True)
        s = ((t - u) ** 2).mean(-1, keepdims=True)
        t = (t - u) * jax.lax.rsqrt(s + 1e-12) * g + lb
        ov, oi = self._oracle(t, w, b, k)

        fv, fi = classify_topk(
            x, w, b, k, interpret=True, transform=(wt, bt, g, lb, 1e-12)
        )
        np.testing.assert_array_equal(np.asarray(oi), np.asarray(fi))
        np.testing.assert_allclose(
            np.asarray(ov), np.asarray(fv), rtol=1e-5, atol=1e-5
        )

    def test_tie_breaking_matches_lax_top_k(self, rng):
        """Duplicate vocab rows produce exactly-equal logits; both paths
        must prefer the LOWER vocab index (lax.top_k semantics) — including
        ties that span vocab tiles."""
        from univl_tpu.kernels.vocab_topk import classify_topk

        H, k = 32, 4
        base = rng.normal(size=(40, H)).astype(np.float32)
        # tile the same 40 rows across >1 vocab block (block_v=2048 floor:
        # use V > 2048 so duplicates live in different tiles)
        w = np.concatenate([base] * 80, axis=0)  # V = 3200
        b = np.zeros((w.shape[0],), np.float32)
        h = jnp.asarray(rng.normal(size=(6, H)), jnp.float32)
        ov, oi = self._oracle(h, jnp.asarray(w), jnp.asarray(b), k)
        fv, fi = classify_topk(
            h, jnp.asarray(w), jnp.asarray(b), k, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(oi), np.asarray(fi))
        np.testing.assert_allclose(
            np.asarray(ov), np.asarray(fv), rtol=1e-5, atol=1e-5
        )

"""Unit tests for core layers against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.nn.layers import (
    LayerNormTF,
    MultiHeadAttention,
    TransformerLayer,
    additive_mask_bias,
    gelu_erf,
    sdpa_xla,
)


def np_layernorm(x, scale, bias, eps=1e-12):
    u = x.mean(-1, keepdims=True)
    s = ((x - u) ** 2).mean(-1, keepdims=True)
    return (x - u) / np.sqrt(s + eps) * scale + bias


def np_gelu(x):
    from scipy.special import erf  # scipy ships with numpy stack

    return x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


def test_layernorm_matches_numpy(rng):
    x = rng.randn(4, 7, 16).astype(np.float32)
    ln = LayerNormTF()
    params = ln.init(jax.random.key(0), x)
    scale = rng.randn(16).astype(np.float32)
    bias = rng.randn(16).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    out = ln.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np_layernorm(x, scale, bias), rtol=2e-5, atol=2e-5)


def test_gelu_erf(rng):
    pytest.importorskip("scipy")
    x = rng.randn(128).astype(np.float32)
    np.testing.assert_allclose(np.asarray(gelu_erf(jnp.asarray(x))), np_gelu(x), rtol=1e-5, atol=1e-6)


def np_softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def test_sdpa_matches_numpy(rng):
    B, H, L, D = 2, 3, 5, 8
    q = rng.randn(B, H, L, D).astype(np.float32)
    k = rng.randn(B, H, L, D).astype(np.float32)
    v = rng.randn(B, H, L, D).astype(np.float32)
    mask = (rng.rand(B, L) > 0.3).astype(np.float32)
    bias = np.asarray(additive_mask_bias(jnp.asarray(mask)))

    out = sdpa_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias))

    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(D) + bias
    expect = np_softmax(scores) @ v
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_mask_bias_values():
    mask = jnp.asarray([[1, 1, 0]])
    bias = additive_mask_bias(mask)
    assert bias.shape == (1, 1, 1, 3)
    np.testing.assert_array_equal(np.asarray(bias)[0, 0, 0], [0.0, 0.0, -10000.0])


def test_transformer_layer_numpy_oracle(rng):
    """Post-LN block forward vs a from-scratch numpy implementation."""
    pytest.importorskip("scipy")
    H, heads, inter, L, B = 16, 4, 32, 6, 2
    layer = TransformerLayer(
        hidden_size=H, num_heads=heads, intermediate_size=inter,
        dropout_rate=0.0, attn_dropout_rate=0.0,
    )
    x = rng.randn(B, L, H).astype(np.float32)
    mask = np.ones((B, L), np.float32)
    bias = additive_mask_bias(jnp.asarray(mask))
    params = layer.init(jax.random.key(1), jnp.asarray(x), bias, True)
    out = layer.apply(params, jnp.asarray(x), bias, True)

    p = jax.tree.map(np.asarray, params["params"])

    def dense(z, prm):
        return z @ prm["kernel"] + prm["bias"]

    dh = H // heads
    q = dense(x, p["attention"]["query"]).reshape(B, L, heads, dh).transpose(0, 2, 1, 3)
    k = dense(x, p["attention"]["key"]).reshape(B, L, heads, dh).transpose(0, 2, 1, 3)
    v = dense(x, p["attention"]["value"]).reshape(B, L, heads, dh).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
    ctx = np_softmax(scores) @ v
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
    attn_out = np_layernorm(
        dense(ctx, p["attention_output"]["dense"]) + x,
        p["attention_output"]["ln"]["scale"],
        p["attention_output"]["ln"]["bias"],
    )
    inter_out = np_gelu(dense(attn_out, p["intermediate"]))
    expect = np_layernorm(
        dense(inter_out, p["output"]["dense"]) + attn_out,
        p["output"]["ln"]["scale"],
        p["output"]["ln"]["bias"],
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-5)


def test_fused_qkv_matches_separate(rng):
    """fused_qkv concatenates the q/k/v kernels into ONE GEMM at apply
    time; same params, same outputs (CPU f32: exact — columns of a matmul
    are independent dot products). Covers self-attention AND the
    cross-attention (q vs fused k/v) branch."""
    import numpy.testing as npt

    from univl_tpu.nn.layers import MultiHeadAttention, additive_mask_bias

    B, L, Lk, H, nh = 3, 10, 7, 64, 4
    x = jnp.asarray(rng.normal(size=(B, L, H)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(B, Lk, H)), jnp.float32)
    mask = jnp.ones((B, L), jnp.int32)
    kmask = jnp.ones((B, Lk), jnp.int32)

    sep = MultiHeadAttention(num_heads=nh, head_dim=H // nh, fused_qkv=False)
    fus = MultiHeadAttention(num_heads=nh, head_dim=H // nh, fused_qkv=True)

    # self-attention
    bias = additive_mask_bias(mask)
    p = sep.init(jax.random.key(0), x, None, bias)
    pf = fus.init(jax.random.key(0), x, None, bias)
    assert jax.tree.structure(p) == jax.tree.structure(pf)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(pf)):
        npt.assert_array_equal(np.asarray(a), np.asarray(b))  # same init rng
    y0 = sep.apply(p, x, None, bias)
    y1 = fus.apply(p, x, None, bias)
    npt.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-6, atol=2e-6)

    # cross-attention (separate q; fused k/v)
    xbias = additive_mask_bias(kmask)
    p = sep.init(jax.random.key(1), x, kv, xbias)
    y0 = sep.apply(p, x, kv, xbias)
    y1 = fus.apply(p, x, kv, xbias)
    npt.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-6, atol=2e-6)

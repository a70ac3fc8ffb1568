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


def test_bias_shim_fallback(rng):
    """Non-key-mask biases route to the XLA path."""
    from univl_tpu.kernels.attention import fused_attention

    B, H, L, D = 1, 2, 8, 8
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    bias = jnp.zeros((B, 1, L, L))  # [B,1,Lq,Lk] form -> fallback
    out = fused_attention(q, q, q, bias)
    expect = sdpa_xla(q, q, q, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-5)

"""Fused attention for TPU (Pallas).

Fuses QK^T -> +mask-bias -> softmax -> @V in VMEM so the [B, H, L, L] score
tensor never round-trips HBM. UniVL sequences are short and statically padded
(max_words<=128, max_frames<=96, cross<=224), so each (batch, head) tile fits
VMEM whole — no streaming/flash decomposition needed; we pad L/D up to lane
multiples and mask the padding via the additive bias.

Replaces the cuBLAS/cuDNN path of the reference's torch attention
(reference: modules/module_bert.py:171-197).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=())
def _sdpa_reference(q, k, v, bias):
    head_dim = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(head_dim)
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    import jax.numpy as jnp  # noqa: F811

    q = q_ref[0]  # [Lq, D]
    k = k_ref[0]  # [Lk, D]
    v = v_ref[0]  # [Lk, D]
    b = bias_ref[0]  # [Lq, Lk] (or [1, Lk] broadcast)
    scores = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    scores = scores + b.astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = (e / s).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: jax.Array
) -> jax.Array:
    """q,k,v: [B, H, L, D]; bias additive, broadcastable to [B, H, Lq, Lk].

    Returns [B, H, Lq, D] in q.dtype. Inference path only (no prob dropout).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    lane = 128
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    Lq_p = _round_up(Lq, sub)
    Lk_p = _round_up(Lk, lane)
    D_p = _round_up(D, lane)

    # Pad. Key padding must be masked out of the softmax via bias.
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Lq_p - Lq), (0, D_p - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Lk_p - Lk), (0, D_p - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Lk_p - Lk), (0, D_p - D)))
    bias_full = jnp.broadcast_to(bias, (B, H, Lq, Lk)).astype(jnp.float32)
    bp = jnp.pad(
        bias_full,
        ((0, 0), (0, 0), (0, Lq_p - Lq), (0, Lk_p - Lk)),
        constant_values=-1e9,
    )

    def reshape_bh(x):
        return x.reshape(B * H, *x.shape[2:])

    qp, kp, vp, bp = map(reshape_bh, (qp, kp, vp, bp))

    grid = (B * H,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_p, D_p), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Lq_p, D_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_p, D_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_p, D_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq_p, Lk_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Lq_p, D_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (Lq_p * Lk_p * D_p) * 2,
            bytes_accessed=(B * H) * (Lq_p * D_p + 2 * Lk_p * D_p + Lq_p * Lk_p) * 4,
            transcendentals=B * H * Lq_p * Lk_p,
        ),
    )(qp, kp, vp, bp)

    out = out.reshape(B, H, Lq_p, D_p)[:, :, :Lq, :D]
    return out

"""Training-mode fused attention for TPU (Pallas): custom VJP + in-kernel
attention-prob dropout.

The eval-only kernel (kernels/attention.py) cannot be used in training: the
flax path applies dropout to the attention PROBABILITIES (reference:
modules/module_bert.py:180-186), and autodiff through a pallas_call needs an
explicit VJP. In the pair-expanded FT-Align regime (1024 pairs x 12 heads x
96 x 96) the XLA lowering materializes the fp32 score/prob tensors, their
saved-for-backward copies, the u32 dropout bits AND a layout-fixup copy of
them — ~25-30 ms/step of pure HBM traffic for an attention core whose
matmul FLOPs are worth <1 ms (per-op xplane numbers in docs/PERF.md).

Design:
  - forward: grid over batch blocks (all heads per program; UniVL's L<=224
    fits whole in VMEM — no streaming/flash decomposition needed). Computes
    scores -> +key-mask bias -> softmax in fp32, generates the dropout mask
    with the per-core TPU PRNG (pltpu.prng_random_bits), applies
    mask/(1-rate), multiplies into V. Saves only the per-row softmax
    statistics (max m and sum l, [B,H,L] fp32) — the [B,H,L,L] probs never
    exist in HBM.
  - backward: recomputes e = exp(s - m), p = e / l with the same ops on the
    same inputs (bit-identical to the forward probs), reseeds the PRNG with
    the SAME per-program seed to regenerate the identical dropout bits, and
    produces dq/dk/dv in one kernel.
  - dropout determinism: the seed is a traced scalar derived from the flax
    'dropout' rng; the kernel seeds with (seed + program_id). Given the same
    rng key the step is exactly reproducible. The bit pattern differs from
    the XLA path's jax.random stream (different PRNG) — same Bernoulli(rate)
    distribution, documented divergence while the knob is opt-in.

Numerics: softmax and accumulation in fp32 (MXU preferred_element_type),
probs cast to the compute dtype for the @V matmul exactly like
nn/layers.py:sdpa_xla. rate=0 is bit-comparable to sdpa_xla up to fp32
reduction order (tests pin it in interpret mode).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

BATCH_BLOCK = 8
_VMEM_LIMIT = 64 * 1024 * 1024


def _softmax_fwd(scores):
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    return e / l, m, l


def _dropout_bits(shape, rate: float):
    """uint32 keep-mask: keep where bits >= rate * 2^32."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return bits >= threshold


def _scores(q, k, key_mask, scale):
    """q,k: [N, L, D] compute dtype; key_mask [1?, Lk] handled by caller.

    Returns fp32 [N, Lq, Lk].
    """
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return s * scale


# The kernels take the DENSE [bb, L, H*D] projection layout and slice one
# head at a time on the last dim (64-aligned strided slices — plain VMEM
# slicing; Mosaic rejects the reshape+transpose "shape cast" form). The
# HBM arrays never exist in [B,H,L,D] layout, so XLA inserts none of the
# transpose copies that cost ~0.9 ms EACH at FT-Align scale (docs/PERF.md).


def _attn_train_fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref, *,
    scale: float, rate: float, heads: int,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bb, lq, hd = q_ref.shape
    lk = k_ref.shape[1]
    d = hd // heads
    bias = ((1.0 - mask_ref[:]) * -1e9)[:, None, :]  # [bb, 1, lk]

    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    for hh in range(heads):
        q = q_ref[:, :, hh * d:(hh + 1) * d]  # [bb, lq, d]
        k = k_ref[:, :, hh * d:(hh + 1) * d]
        v = v_ref[:, :, hh * d:(hh + 1) * d]
        s = _scores(q, k, None, scale) + bias  # [bb, lq, lk] fp32
        p, m, l = _softmax_fwd(s)
        m_ref[:, hh, :] = m[:, :, 0]
        l_ref[:, hh, :] = l[:, :, 0]
        if rate > 0.0:
            keep = _dropout_bits(p.shape, rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        o_ref[:, :, hh * d:(hh + 1) * d] = o


def _attn_train_bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, mask_ref, m_ref, l_ref, g_ref,
    dq_ref, dk_ref, dv_ref, *, scale: float, rate: float, heads: int,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bb, lq, hd = q_ref.shape
    lk = k_ref.shape[1]
    d = hd // heads
    bias = ((1.0 - mask_ref[:]) * -1e9)[:, None, :]  # [bb, 1, lk]

    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    # IMPORTANT: head order and per-head draw shapes match the forward
    # kernel exactly, so the regenerated dropout bits are bit-identical.
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        g = g_ref[:, :, sl].astype(v.dtype)

        s = _scores(q, k, None, scale) + bias
        m = m_ref[:, hh, :][:, :, None]
        l = l_ref[:, hh, :][:, :, None]
        e = jnp.exp(s - m)
        p = e / l  # [bb, lq, lk] fp32 — bit-identical to forward

        dpd = jax.lax.dot_general(  # dL/d(p_dropped) = g @ v^T
            g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            keep = _dropout_bits(p.shape, rate)
            inv = 1.0 / (1.0 - rate)
            p_dropped = jnp.where(keep, p * inv, 0.0)
            dp = jnp.where(keep, dpd * inv, 0.0)
        else:
            p_dropped = p
            dp = dpd

        dv = jax.lax.dot_general(  # p_dropped^T @ g
            p_dropped.astype(g.dtype), g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale

        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _pad_batch(x, bb):
    pad = (-x.shape[0]) % bb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _specs(bb, h, lq, lk, d, pl, pltpu):
    blk = lambda shape: pl.BlockSpec(
        (bb,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return {
        "q": blk((lq, h * d)),
        "k": blk((lk, h * d)),
        "v": blk((lk, h * d)),
        "mask": blk((lk,)),
        "o": blk((lq, h * d)),
        "stat": blk((h, lq)),
        "seed": pl.BlockSpec(memory_space=pltpu.SMEM),
    }


def _fwd_call(q, k, v, key_mask, seed, rate: float, heads: int,
              save_stats: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lq, hd = q.shape
    h, d = heads, hd // heads
    lk = k.shape[1]
    bb = min(BATCH_BLOCK, b)
    qp, kp, vp = (_pad_batch(x, bb) for x in (q, k, v))
    mp = _pad_batch(key_mask.astype(jnp.float32), bb)
    bp = qp.shape[0]
    sp = _specs(bb, h, lq, lk, d, pl, pltpu)
    scale = 1.0 / math.sqrt(d)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    out_shapes = (
        jax.ShapeDtypeStruct((bp, lq, h * d), q.dtype),
        jax.ShapeDtypeStruct((bp, h, lq), jnp.float32),
        jax.ShapeDtypeStruct((bp, h, lq), jnp.float32),
    )
    o, m, l = pl.pallas_call(
        functools.partial(_attn_train_fwd_kernel, scale=scale, rate=rate,
                          heads=h),
        out_shape=out_shapes,
        grid=(bp // bb,),
        in_specs=[sp["seed"], sp["q"], sp["k"], sp["v"], sp["mask"]],
        out_specs=(sp["o"], sp["stat"], sp["stat"]),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * h * lq * lk * d,
            bytes_accessed=bp * h * (2 * lq * d + 2 * lk * d) * q.dtype.itemsize,
            transcendentals=bp * h * lq * lk,
        ),
    )(seed_arr, qp, kp, vp, mp)
    if save_stats:
        return o[:b], (m, l)
    return o[:b], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_train_attention(q, k, v, key_mask, seed, rate, heads):
    """Attention with in-kernel prob dropout, differentiable.

    q,k,v: [B, L, heads*head_dim] compute dtype — the dense-projection
    layout, so no [B,H,L,D] transpose copies ever hit HBM (the head split
    happens in VMEM); key_mask: [B,Lk] (1 keep / 0 drop); seed: int32
    scalar (traced ok); rate, heads: static. Returns [B, Lq, heads*head_dim].
    """
    o, _ = _fwd_call(q, k, v, key_mask, seed, rate, heads, save_stats=False)
    return o


def _ft_attn_fwd(q, k, v, key_mask, seed, rate, heads):
    o, (m, l) = _fwd_call(q, k, v, key_mask, seed, rate, heads, save_stats=True)
    return o, (q, k, v, key_mask, seed, m, l)


def _ft_attn_bwd(rate, heads, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, k, v, key_mask, seed, m, l = res
    b, lq, hd = q.shape
    h, d = heads, hd // heads
    lk = k.shape[1]
    bb = min(BATCH_BLOCK, b)
    qp, kp, vp, gp = (_pad_batch(x, bb) for x in (q, k, v, g.astype(q.dtype)))
    mp = _pad_batch(key_mask.astype(jnp.float32), bb)
    bp = qp.shape[0]
    sp = _specs(bb, h, lq, lk, d, pl, pltpu)
    scale = 1.0 / math.sqrt(d)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_train_bwd_kernel, scale=scale, rate=rate,
                          heads=h),
        out_shape=(
            jax.ShapeDtypeStruct((bp, lq, h * d), q.dtype),
            jax.ShapeDtypeStruct((bp, lk, h * d), k.dtype),
            jax.ShapeDtypeStruct((bp, lk, h * d), v.dtype),
        ),
        grid=(bp // bb,),
        in_specs=[sp["seed"], sp["q"], sp["k"], sp["v"], sp["mask"],
                  sp["stat"], sp["stat"], sp["o"]],
        out_specs=(sp["o"], sp["k"], sp["k"]),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=10 * bp * h * lq * lk * d,
            bytes_accessed=bp * h * (4 * lq * d + 4 * lk * d) * q.dtype.itemsize,
            transcendentals=bp * h * lq * lk,
        ),
    )(seed_arr, qp, kp, vp, mp, m, l, gp)
    return dq[:b], dk[:b], dv[:b], None, None


fused_train_attention.defvjp(_ft_attn_fwd, _ft_attn_bwd)

"""Fused transformer FFN for TPU (Pallas): dense -> erf-GELU -> dense.

Replaces the XLA lowering of the encoder FFN
(reference: modules/module_bert.py:214-236 BertIntermediate+BertOutput.dense)
for LARGE-row configs. The canonical case is FT-Align training/rescoring:
the cross tower runs on B_text*B_video stacked pairs (reference:
modeling.py:341-375), e.g. 1024 pairs x 96 tokens = 98k rows, where XLA's
forward materializes TWO [98k, 3072] activation copies per layer and runs
the dense1 matmul at ~41% MXU (per-fusion xplane numbers in docs/PERF.md).

Design (measured on v5e, see docs/PERF.md "Fused FFN"):
  - forward: one kernel, grid over row tiles; W1/W2 VMEM-resident across
    grid steps (constant index maps); the [T, F] intermediate lives in VMEM.
    Runs at ~77% MXU vs XLA's ~41% on the same shapes, and writes ~1/3 the
    bytes. Under autodiff the forward additionally saves the (bf16) rounded
    pre-activation — ONE [N, F] residual where XLA keeps two.
  - backward: custom VJP with minimal total FLOPs (same 3-matmul count as
    XLA's saved-activation backward — an earlier all-recompute version cost
    1.5x the FLOPs and LOST end-to-end; these kernels are compute-bound,
    not HBM-bound):
      * Pallas kernel: reads (pre, g, W1, W2) -> dx, plus dpre and
        h = gelu(pre) as bf16 side outputs (elementwise, computed in-VMEM)
      * XLA: dW1 = x^T @ dpre, dW2 = h^T @ g, db1/db2 = column sums — XLA
        runs these tall reductions at ~92% MXU, so there is nothing to win
        by hand-writing them (the first version did, with per-F-chunk
        accumulators, and was 2.5x slower than XLA's matmuls).
  - numerics mirror the unfused flax path (nn.Dense at compute dtype):
    matmuls accumulate fp32 on the MXU, results round to the compute dtype
    (bf16) before bias add, GELU evaluated in fp32 on the ROUNDED
    pre-activation so forward and backward see identical values. erf is a
    polynomial (A&S 7.1.26, |err|<=1.5e-7: Mosaic has no erf primitive).

Row padding to the tile size happens at the jnp level on [N, H] only (zero
rows are exact: they contribute 0 to every gradient and their outputs are
sliced off; cf. the attention-kernel lesson about never padding feature
dims, kernels/attention.py docstring).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)

ROW_TILE = 128  # weights stay resident; tiles sized for the 16 MB VMEM window
_VMEM_LIMIT = 32 * 1024 * 1024  # headroom over the 16 MB default scoped cap


def _erf_f32(x: jax.Array) -> jax.Array:
    """fp32 erf from exp (Mosaic has no erf primitive).

    Abramowitz & Stegun 7.1.26: |error| <= 1.5e-7 absolute — far below the
    bf16 resolution (~4e-3 relative) the surrounding compute rounds to.
    """
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(x: jax.Array) -> jax.Array:
    """erf-GELU in fp32 (reference: modules/until_module.py:28-33)."""
    return x * 0.5 * (1.0 + _erf_f32(x * _INV_SQRT2))


def _gelu_grad_f32(x: jax.Array) -> jax.Array:
    cdf = 0.5 * (1.0 + _erf_f32(x * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI
    return cdf + x * pdf


def _pre_act(x_tile, w1, b1):
    """(x @ W1) -> round to compute dtype -> + b1, like nn.Dense at bf16."""
    pre = jax.lax.dot_general(
        x_tile, w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_tile.dtype) + b1
    return pre


def _ffn_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[:]  # [T, H]
    pre = _pre_act(x, w1_ref[:], b1_ref[0])  # [T, F] compute dtype
    h = _gelu_f32(pre.astype(jnp.float32)).astype(x.dtype)
    y_ref[:] = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b2_ref[0]


def _ffn_fwd_save_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, pre_ref):
    x = x_ref[:]
    pre = _pre_act(x, w1_ref[:], b1_ref[0])
    pre_ref[:] = pre
    h = _gelu_f32(pre.astype(jnp.float32)).astype(x.dtype)
    y_ref[:] = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b2_ref[0]


def _ffn_bwd_kernel(pre_ref, g_ref, w1_ref, w2_ref, dx_ref, dpre_ref, h_ref):
    g = g_ref[:]  # [T, H]
    pre = pre_ref[:].astype(jnp.float32)  # [T, F]
    h_ref[:] = _gelu_f32(pre).astype(g.dtype)
    dh = jax.lax.dot_general(  # g @ W2^T -> [T, F]
        g, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpre = (dh * _gelu_grad_f32(pre)).astype(g.dtype)
    dpre_ref[:] = dpre
    dx_ref[:] = jax.lax.dot_general(  # dpre @ W1^T -> [T, H]
        dpre, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _pad_rows(a: jax.Array, tile: int):
    n = a.shape[0]
    pad = (-n) % tile
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
    return a, n


def _row_spec(h, pl, pltpu):
    return pl.BlockSpec((ROW_TILE, h), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(shape, pl, pltpu):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _ffn_fwd_call(x, w1, b1, w2, b2, save_pre: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, F = w1.shape
    xp, n = _pad_rows(x, ROW_TILE)
    np_ = xp.shape[0]
    out_shape = jax.ShapeDtypeStruct((np_, H), x.dtype)
    kw = dict(
        grid=(np_ // ROW_TILE,),
        in_specs=[
            _row_spec(H, pl, pltpu),
            _const_spec((H, F), pl, pltpu),
            _const_spec((1, F), pl, pltpu),
            _const_spec((F, H), pl, pltpu),
            _const_spec((1, H), pl, pltpu),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * np_ * H * F,
            bytes_accessed=(2 * np_ * H + 2 * H * F) * x.dtype.itemsize,
            transcendentals=np_ * F,
        ),
    )
    args = (xp, w1, b1.reshape(1, F), w2, b2.reshape(1, H))
    if not save_pre:
        y = pl.pallas_call(
            _ffn_fwd_kernel, out_shape=out_shape,
            out_specs=_row_spec(H, pl, pltpu), **kw,
        )(*args)
        return y[:n], None
    y, pre = pl.pallas_call(
        _ffn_fwd_save_kernel,
        out_shape=(out_shape, jax.ShapeDtypeStruct((np_, F), x.dtype)),
        out_specs=(_row_spec(H, pl, pltpu), _row_spec(F, pl, pltpu)),
        **kw,
    )(*args)
    return y[:n], pre  # pre stays row-padded (zero rows are exact in bwd)


@jax.custom_vjp
def fused_ffn(x, w1, b1, w2, b2):
    """y = (erf-GELU(x @ W1 + b1)) @ W2 + b2, intermediate kept in VMEM.

    x: [N, H]; w1: [H, F]; b1: [F]; w2: [F, H]; b2: [H]. All args in the
    compute dtype (cast params before calling, as flax nn.Dense does).
    H, F must be multiples of 128 (lane tiling); N is padded internally.
    """
    y, _ = _ffn_fwd_call(x, w1, b1, w2, b2, save_pre=False)
    return y


def _fused_ffn_fwd(x, w1, b1, w2, b2):
    y, pre = _ffn_fwd_call(x, w1, b1, w2, b2, save_pre=True)
    return y, (x, w1, w2, pre)


def _fused_ffn_bwd(res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x, w1, w2, pre = res
    H, F = w1.shape
    g = g.astype(x.dtype)
    gp, n = _pad_rows(g, ROW_TILE)
    np_ = gp.shape[0]

    dx, dpre, h = pl.pallas_call(
        _ffn_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((np_, H), x.dtype),
            jax.ShapeDtypeStruct((np_, F), x.dtype),
            jax.ShapeDtypeStruct((np_, F), x.dtype),
        ),
        grid=(np_ // ROW_TILE,),
        in_specs=[
            _row_spec(F, pl, pltpu),
            _row_spec(H, pl, pltpu),
            _const_spec((H, F), pl, pltpu),
            _const_spec((F, H), pl, pltpu),
        ],
        out_specs=(
            _row_spec(H, pl, pltpu),
            _row_spec(F, pl, pltpu),
            _row_spec(F, pl, pltpu),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * np_ * H * F,
            bytes_accessed=(3 * np_ * (H + F) + 2 * H * F) * x.dtype.itemsize,
            transcendentals=2 * np_ * F,
        ),
    )(pre, gp, w1, w2)
    dx = dx[:n]

    # dW / db as plain XLA matmuls/reductions over the padded rows (the pad
    # rows of g and x are zero, so they contribute exactly 0). XLA runs
    # these tall reductions at ~92% MXU (docs/PERF.md) — no kernel needed.
    xp, _ = _pad_rows(x, ROW_TILE)
    dw1 = jax.lax.dot_general(
        xp, dpre, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w1.dtype)
    dw2 = jax.lax.dot_general(
        h, gp, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w2.dtype)
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0).astype(w1.dtype)
    db2 = jnp.sum(gp.astype(jnp.float32), axis=0).astype(w2.dtype)
    return dx, dw1, db1, dw2, db2


fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def ffn_reference(x, w1, b1, w2, b2):
    """Unfused oracle with the same rounding schedule (for tests)."""
    pre = jax.lax.dot_general(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype) + b1
    h = _gelu_f32(pre.astype(jnp.float32)).astype(x.dtype)
    return jax.lax.dot_general(
        h, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype) + b2

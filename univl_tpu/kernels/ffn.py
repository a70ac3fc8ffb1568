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

import functools
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


# --------------------------------------------------------------------- #
# Fused FFN BLOCK: FFN -> dropout -> +residual -> LayerNorm in one kernel
# --------------------------------------------------------------------- #
# Folds the whole BertOutput epilogue (module_bert.py:239-250: dense ->
# dropout -> add residual -> TF LayerNorm) into the fused FFN, so the FFN
# output never round-trips HBM and the dropout mask / LN stats are never
# materialized (the round-2 FT-Align profile shows ~12-14 ms of exactly
# these elementwise round-trips per step, docs/PERF.md). Dropout bits come
# from the per-core TPU PRNG seeded with (seed + program_id) and are
# regenerated bit-identically in the backward (same scheme as
# kernels/train_attention.py). LN math mirrors LayerNormTF exactly:
# stats in fp32, eps inside rsqrt, scale/bias in fp32, output cast to the
# compute dtype.


def _dropout_keep(shape, rate: float):
    """uint32 keep-mask: keep where bits >= rate * 2^32 (zero bits in
    interpret mode => rate>0 drops everything there; CI tests use rate=0,
    the rate>0 path is validated on hardware via tools/tpu_checks.py)."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return bits >= threshold


def _ffn_block_core(x, w1, b1, w2, b2, rate, pl, pltpu, seed_ref):
    """Shared fwd math: returns (pre [T,F] bf16, s [T,H] bf16)."""
    pre = _pre_act(x, w1, b1)
    h = _gelu_f32(pre.astype(jnp.float32)).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b2
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(y.shape, rate)
        y = jnp.where(
            keep, (y.astype(jnp.float32) * (1.0 / (1.0 - rate))).astype(y.dtype),
            jnp.zeros_like(y),
        )
    return pre, y + x


def _ln_rows_f32(s):
    """Row stats of LayerNormTF: (s_f32, mean, rstd-less var). Returns
    (sf, u, var) with u/var keepdims [T,1] fp32."""
    sf = s.astype(jnp.float32)
    u = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(sf - u), axis=-1, keepdims=True)
    return sf, u, var


def _ffn_block_fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          g_ref, bt_ref, o_ref, *, rate, eps, save):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    pre, s = _ffn_block_core(
        x, w1_ref[:], b1_ref[0], w2_ref[:], b2_ref[0], rate, pl, pltpu, seed_ref
    )
    sf, u, var = _ln_rows_f32(s)
    rstd = jax.lax.rsqrt(var + eps)
    out = ((sf - u) * rstd) * g_ref[0] + bt_ref[0]
    if save:
        o_ref[0][:] = out.astype(x.dtype)
        o_ref[1][:] = pre
        o_ref[2][:] = s
    else:
        o_ref[0][:] = out.astype(x.dtype)


def _ffn_block_bwd_kernel(seed_ref, s_ref, g_ref, pre_ref, w1_ref, w2_ref,
                          sc_ref, dx_ref, dpre_ref, h_ref, dffn_ref,
                          dsc_ref, dbt_ref, *, rate, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = g_ref[:].astype(jnp.float32)  # [T, H]
    sf, u, var = _ln_rows_f32(s_ref[:])
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (sf - u) * rstd

    # Per-tile partial sums for dscale/dbias. Blocks must satisfy the
    # (8, 128) tiling rule, so each tile writes an [8, H] block with the
    # sum in row 0 and zero rows below; XLA reduces over all rows.
    zeros7 = jnp.zeros((7, g.shape[1]), jnp.float32)
    dbt_ref[:] = jnp.concatenate(
        [jnp.sum(g, axis=0, keepdims=True), zeros7], axis=0
    )
    dsc_ref[:] = jnp.concatenate(
        [jnp.sum(g * xhat, axis=0, keepdims=True), zeros7], axis=0
    )

    gs = g * sc_ref[0]
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    ds = rstd * (gs - m1 - xhat * m2)  # fp32 [T, H], d(LN input)

    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(ds.shape, rate)
        dffn = jnp.where(keep, ds * (1.0 / (1.0 - rate)), jnp.zeros_like(ds))
    else:
        dffn = ds
    dffn = dffn.astype(dx_ref.dtype)
    dffn_ref[:] = dffn

    pre = pre_ref[:].astype(jnp.float32)
    h_ref[:] = _gelu_f32(pre).astype(dx_ref.dtype)
    dh = jax.lax.dot_general(  # dffn @ W2^T -> [T, F]
        dffn, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpre = (dh * _gelu_grad_f32(pre)).astype(dx_ref.dtype)
    dpre_ref[:] = dpre
    dx_ffn = jax.lax.dot_general(  # dpre @ W1^T -> [T, H]
        dpre, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = (ds + dx_ffn).astype(dx_ref.dtype)


def _ffn_block_fwd_call(x, w1, b1, w2, b2, scale, bias, seed, rate, eps,
                        save: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, F = w1.shape
    xp, n = _pad_rows(x, ROW_TILE)
    np_ = xp.shape[0]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    outs = [jax.ShapeDtypeStruct((np_, H), x.dtype)]
    out_specs = [_row_spec(H, pl, pltpu)]
    if save:
        outs += [
            jax.ShapeDtypeStruct((np_, F), x.dtype),  # pre
            jax.ShapeDtypeStruct((np_, H), x.dtype),  # s (LN input)
        ]
        out_specs += [_row_spec(F, pl, pltpu), _row_spec(H, pl, pltpu)]

    def kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref,
               *o_refs):
        _ffn_block_fwd_kernel(
            seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref,
            o_refs, rate=rate, eps=eps, save=save,
        )

    res = pl.pallas_call(
        kernel,
        out_shape=tuple(outs) if save else outs[0],
        out_specs=tuple(out_specs) if save else out_specs[0],
        grid=(np_ // ROW_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row_spec(H, pl, pltpu),
            _const_spec((H, F), pl, pltpu),
            _const_spec((1, F), pl, pltpu),
            _const_spec((F, H), pl, pltpu),
            _const_spec((1, H), pl, pltpu),
            _const_spec((1, H), pl, pltpu),
            _const_spec((1, H), pl, pltpu),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * np_ * H * F,
            bytes_accessed=(3 * np_ * H + 2 * H * F) * x.dtype.itemsize,
            transcendentals=np_ * F,
        ),
    )(seed_arr, xp, w1, b1.reshape(1, F), w2, b2.reshape(1, H),
      scale.astype(jnp.float32).reshape(1, H),
      bias.astype(jnp.float32).reshape(1, H))
    if not save:
        return res[:n], None
    out, pre, s = res
    return out[:n], (pre, s)


def _ffn_block_bwd_call(res, g, rate, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x, w1, w2, scale, seed, pre, s = res
    H, F = w1.shape
    g = g.astype(x.dtype)
    gp, n = _pad_rows(g, ROW_TILE)
    np_ = gp.shape[0]
    sp_, _ = _pad_rows(s, ROW_TILE) if s.shape[0] != np_ else (s, n)
    n_tiles = np_ // ROW_TILE
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    part_spec = pl.BlockSpec((8, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, dpre, h, dffn, dsc_p, dbt_p = pl.pallas_call(
        functools.partial(_ffn_block_bwd_kernel, rate=rate, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((np_, H), x.dtype),   # dx
            jax.ShapeDtypeStruct((np_, F), x.dtype),   # dpre
            jax.ShapeDtypeStruct((np_, F), x.dtype),   # h = gelu(pre)
            jax.ShapeDtypeStruct((np_, H), x.dtype),   # dffn (dense2 out grad)
            jax.ShapeDtypeStruct((n_tiles * 8, H), jnp.float32),  # dscale partials
            jax.ShapeDtypeStruct((n_tiles * 8, H), jnp.float32),  # dbias partials
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row_spec(H, pl, pltpu),   # s
            _row_spec(H, pl, pltpu),   # g
            _row_spec(F, pl, pltpu),   # pre
            _const_spec((H, F), pl, pltpu),
            _const_spec((F, H), pl, pltpu),
            _const_spec((1, H), pl, pltpu),  # scale
        ],
        out_specs=(
            _row_spec(H, pl, pltpu),
            _row_spec(F, pl, pltpu),
            _row_spec(F, pl, pltpu),
            _row_spec(H, pl, pltpu),
            part_spec,
            part_spec,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * np_ * H * F,
            bytes_accessed=(4 * np_ * (H + F) + 2 * H * F) * x.dtype.itemsize,
            transcendentals=2 * np_ * F,
        ),
    )(seed_arr, sp_, gp, pre, w1, w2,
      scale.astype(jnp.float32).reshape(1, H))

    # dW / db / dscale / dbias as XLA tall reductions (~92% MXU / trivial).
    xp, _ = _pad_rows(x, ROW_TILE)
    dw1 = jax.lax.dot_general(
        xp, dpre, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w1.dtype)
    dw2 = jax.lax.dot_general(
        h, dffn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w2.dtype)
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0).astype(w1.dtype)
    db2 = jnp.sum(dffn.astype(jnp.float32), axis=0).astype(w2.dtype)
    dscale = jnp.sum(dsc_p, axis=0)
    dbias = jnp.sum(dbt_p, axis=0)
    return dx[:n], dw1, db1, dw2, db2, dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_ffn_block(x, w1, b1, w2, b2, scale, bias, seed, rate, eps):
    """LayerNormTF(dropout(FFN(x)) + x) in one kernel (BertOutput epilogue
    folded into the fused FFN; reference: module_bert.py:214-250).

    x: [N, H] compute dtype; w1/b1/w2/b2 compute dtype; scale/bias fp32 LN
    params; seed: traced int32 scalar (dropout bits regenerate from
    (seed + row-tile index) — same scheme as fused_train_attention, same
    stream divergence caveat vs the XLA path); rate, eps: static. The FFN
    intermediate, the dropout mask and the pre-LN sum never reach HBM in
    the forward (the pre-activation and LN input are saved only under
    autodiff, for the backward)."""
    out, _ = _ffn_block_fwd_call(
        x, w1, b1, w2, b2, scale, bias, seed, rate, eps, save=False
    )
    return out


def _ffn_block_fwd(x, w1, b1, w2, b2, scale, bias, seed, rate, eps):
    out, (pre, s) = _ffn_block_fwd_call(
        x, w1, b1, w2, b2, scale, bias, seed, rate, eps, save=True
    )
    return out, (x, w1, w2, scale, seed, pre, s)


def _ffn_block_bwd(rate, eps, res, g):
    dx, dw1, db1, dw2, db2, dscale, dbias = _ffn_block_bwd_call(
        res, g, rate, eps
    )
    return dx, dw1, db1, dw2, db2, dscale, dbias, None


fused_ffn_block.defvjp(_ffn_block_fwd, _ffn_block_bwd)


# --------------------------------------------------------------------- #
# Fused DENSE block: dense -> dropout -> +residual -> LayerNorm
# --------------------------------------------------------------------- #
# The attention-output epilogue (BertSelfOutput, module_bert.py:200-211):
# same fold as fused_ffn_block but with a single [H, H] projection and a
# residual that is a SEPARATE tensor (the attention input), not the matmul
# input. Shares the dropout/LN machinery above.


def _dense_block_fwd_kernel(seed_ref, x_ref, r_ref, w_ref, b_ref, g_ref,
                            bt_ref, o_refs, *, rate, eps, save):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    y = jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b_ref[0]
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(y.shape, rate)
        y = jnp.where(
            keep, (y.astype(jnp.float32) * (1.0 / (1.0 - rate))).astype(y.dtype),
            jnp.zeros_like(y),
        )
    s = y + r_ref[:]
    sf, u, var = _ln_rows_f32(s)
    rstd = jax.lax.rsqrt(var + eps)
    out = ((sf - u) * rstd) * g_ref[0] + bt_ref[0]
    o_refs[0][:] = out.astype(x.dtype)
    if save:
        o_refs[1][:] = s


def _dense_block_bwd_kernel(seed_ref, s_ref, g_ref, w_ref, sc_ref,
                            dx_ref, dy_ref, dr_ref, dsc_ref, dbt_ref,
                            *, rate, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = g_ref[:].astype(jnp.float32)
    sf, u, var = _ln_rows_f32(s_ref[:])
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (sf - u) * rstd

    zeros7 = jnp.zeros((7, g.shape[1]), jnp.float32)
    dbt_ref[:] = jnp.concatenate(
        [jnp.sum(g, axis=0, keepdims=True), zeros7], axis=0
    )
    dsc_ref[:] = jnp.concatenate(
        [jnp.sum(g * xhat, axis=0, keepdims=True), zeros7], axis=0
    )

    gs = g * sc_ref[0]
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    ds = rstd * (gs - m1 - xhat * m2)

    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(ds.shape, rate)
        dy = jnp.where(keep, ds * (1.0 / (1.0 - rate)), jnp.zeros_like(ds))
    else:
        dy = ds
    dy = dy.astype(dx_ref.dtype)
    dy_ref[:] = dy
    dr_ref[:] = ds.astype(dx_ref.dtype)
    dx_ref[:] = jax.lax.dot_general(  # dy @ W^T
        dy, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _dense_block_fwd_call(x, r, w, b, scale, bias, seed, rate, eps, save):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = w.shape[0]
    xp, n = _pad_rows(x, ROW_TILE)
    rp, _ = _pad_rows(r, ROW_TILE)
    np_ = xp.shape[0]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    outs = [jax.ShapeDtypeStruct((np_, H), x.dtype)]
    out_specs = [_row_spec(H, pl, pltpu)]
    if save:
        outs.append(jax.ShapeDtypeStruct((np_, H), x.dtype))
        out_specs.append(_row_spec(H, pl, pltpu))

    def kernel(seed_ref, x_ref, r_ref, w_ref, b_ref, g_ref, bt_ref, *o_refs):
        _dense_block_fwd_kernel(
            seed_ref, x_ref, r_ref, w_ref, b_ref, g_ref, bt_ref, o_refs,
            rate=rate, eps=eps, save=save,
        )

    res = pl.pallas_call(
        kernel,
        out_shape=tuple(outs) if save else outs[0],
        out_specs=tuple(out_specs) if save else out_specs[0],
        grid=(np_ // ROW_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row_spec(H, pl, pltpu),
            _row_spec(H, pl, pltpu),
            _const_spec((H, H), pl, pltpu),
            _const_spec((1, H), pl, pltpu),
            _const_spec((1, H), pl, pltpu),
            _const_spec((1, H), pl, pltpu),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * H * H,
            bytes_accessed=(4 * np_ * H + H * H) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(seed_arr, xp, rp, w, b.reshape(1, H),
      scale.astype(jnp.float32).reshape(1, H),
      bias.astype(jnp.float32).reshape(1, H))
    if not save:
        return res[:n], None
    out, s = res
    return out[:n], s


def _dense_block_bwd_call(res, g, rate, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x, w, scale, seed, s = res
    H = w.shape[0]
    g = g.astype(x.dtype)
    gp, n = _pad_rows(g, ROW_TILE)
    np_ = gp.shape[0]
    n_tiles = np_ // ROW_TILE
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    part_spec = pl.BlockSpec((8, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, dy, dr, dsc_p, dbt_p = pl.pallas_call(
        functools.partial(_dense_block_bwd_kernel, rate=rate, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((np_, H), x.dtype),   # dx (matmul input)
            jax.ShapeDtypeStruct((np_, H), x.dtype),   # dy (dense out grad)
            jax.ShapeDtypeStruct((np_, H), x.dtype),   # dr (residual grad)
            jax.ShapeDtypeStruct((n_tiles * 8, H), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, H), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row_spec(H, pl, pltpu),   # s
            _row_spec(H, pl, pltpu),   # g
            _const_spec((H, H), pl, pltpu),
            _const_spec((1, H), pl, pltpu),
        ],
        out_specs=(
            _row_spec(H, pl, pltpu),
            _row_spec(H, pl, pltpu),
            _row_spec(H, pl, pltpu),
            part_spec,
            part_spec,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * H * H,
            bytes_accessed=(5 * np_ * H + H * H) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(seed_arr, s, gp, w, scale.astype(jnp.float32).reshape(1, H))

    xp, _ = _pad_rows(x, ROW_TILE)
    dw = jax.lax.dot_general(
        xp, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    db = jnp.sum(dy.astype(jnp.float32), axis=0).astype(w.dtype)
    dscale = jnp.sum(dsc_p, axis=0)
    dbias = jnp.sum(dbt_p, axis=0)
    return dx[:n], dr[:n], dw, db, dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_dense_block(x, r, w, b, scale, bias, seed, rate, eps):
    """LayerNormTF(dropout(x @ W + b) + r) in one kernel (the BertSelfOutput
    epilogue, module_bert.py:200-211). x: matmul input [N, H]; r: residual
    [N, H] (a different tensor — the attention-block input). Same dropout
    seeding/regeneration scheme as fused_ffn_block."""
    out, _ = _dense_block_fwd_call(x, r, w, b, scale, bias, seed, rate, eps,
                                   save=False)
    return out


def _dense_block_fwd(x, r, w, b, scale, bias, seed, rate, eps):
    out, s = _dense_block_fwd_call(x, r, w, b, scale, bias, seed, rate, eps,
                                   save=True)
    return out, (x, w, scale, seed, s)


def _dense_block_bwd(rate, eps, res, g):
    dx, dr, dw, db, dscale, dbias = _dense_block_bwd_call(res, g, rate, eps)
    return dx, dr, dw, db, dscale, dbias, None


fused_dense_block.defvjp(_dense_block_fwd, _dense_block_bwd)


def dense_block_reference(x, r, w, b, scale, bias, eps=1e-12):
    """Unfused oracle with the same rounding schedule, rate=0 (for tests)."""
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype) + b
    s = y + r
    sf = s.astype(jnp.float32)
    u = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(sf - u), axis=-1, keepdims=True)
    out = ((sf - u) * jax.lax.rsqrt(var + eps)) * scale.astype(jnp.float32)
    out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def ffn_block_reference(x, w1, b1, w2, b2, scale, bias, eps=1e-12):
    """Unfused oracle with the same rounding schedule, rate=0 (for tests)."""
    y = ffn_reference(x, w1, b1, w2, b2)
    s = y + x
    sf = s.astype(jnp.float32)
    u = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(sf - u), axis=-1, keepdims=True)
    out = ((sf - u) * jax.lax.rsqrt(var + eps)) * scale.astype(jnp.float32)
    out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def ffn_reference(x, w1, b1, w2, b2):
    """Unfused oracle with the same rounding schedule (for tests)."""
    pre = jax.lax.dot_general(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype) + b1
    h = _gelu_f32(pre.astype(jnp.float32)).astype(x.dtype)
    return jax.lax.dot_general(
        h, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype) + b2

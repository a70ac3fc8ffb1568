"""Fused TF-style LayerNorm with a custom-VJP Pallas backward.

Round-2 profile of the flagship train step (docs/PERF.md): XLA's LayerNorm
BACKWARD is the largest non-matmul sink — 18+ `convert_reduce_fusion` ops
at ~0.10 ms each, ~7x off the HBM roofline (the [rows, 768] bf16 reduce
passes get awkward layouts), ~2.5 ms of a 17.4 ms device step. Round 1
measured a FORWARD-only Pallas LN as a wash (XLA fuses the fwd into
neighboring elementwise ops) and rejected it; the win is the backward:

  - fwd: plain jnp (unchanged — XLA keeps fusing it into the graph)
  - bwd: ONE Pallas pass per LN: recompute mu/rstd from the saved input
    (x is already resident; the extra VPU reductions are free next to the
    HBM traffic), produce dx + per-block dgamma/dbeta partials

Numerics match jax.grad of the plain implementation: all arithmetic in
f32, dx cast to the input dtype, dgamma/dbeta f32
(tests/test_kernels.py pins interpret-mode exactness).

Reference LN semantics: modules/until_module.py:40-53 (eps INSIDE sqrt,
eps=1e-12, stats in fp32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# rows-per-grid-step for the backward kernel; at D=768 a 2048-row block
# stages ~9 MB (x, dy, dx) through VMEM
_BLOCK_ROWS = 2048
# single-block fallback cap for row counts not divisible by a good block
_MAX_SINGLE_BLOCK = 4096


def _plain_fwd(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    u = jnp.mean(xf, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
    y = (xf - u) * jax.lax.rsqrt(s + eps)
    return (y * scale + bias).astype(x.dtype)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y_ref[...] = (y * g + b).astype(y_ref.dtype)


def _pallas_fwd(x2, scale, bias, eps, block_rows, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d = x2.shape
    nblocks = rows // block_rows
    row_spec = pl.BlockSpec(
        (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(nblocks,),
        in_specs=[row_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, d), x2.dtype),
        interpret=interpret,
    )(
        x2,
        scale.reshape(1, d).astype(jnp.float32),
        bias.reshape(1, d).astype(jnp.float32),
    )


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, st_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)  # [1, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rstd
    dyg = dy * g
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dyg - m1 - xhat * m2)).astype(dx_ref.dtype)
    # per-block partials, packed as an 8-sublane tile (TPU block layout:
    # second-to-last dim must be a multiple of 8): row 0 dgamma, row 1 dbeta
    d = x.shape[-1]
    st_ref[0] = jnp.concatenate(
        [
            jnp.sum(dy * xhat, axis=0, keepdims=True),
            jnp.sum(dy, axis=0, keepdims=True),
            jnp.zeros((6, d), jnp.float32),
        ],
        axis=0,
    )


def _pallas_bwd(x2, scale, dy2, eps, block_rows, interpret=False):
    """x2, dy2: [rows, D]; returns (dx2 [rows, D], dgamma [D], dbeta [D])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d = x2.shape
    assert rows % block_rows == 0, (rows, block_rows)
    nblocks = rows // block_rows

    row_spec = pl.BlockSpec(
        (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    stat_spec = pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    dx2, st = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nblocks,),
        in_specs=[
            row_spec,
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=(row_spec, stat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((nblocks, 8, d), jnp.float32),
        ),
        interpret=interpret,
    )(x2, scale.reshape(1, d).astype(jnp.float32), dy2)
    return dx2, jnp.sum(st[:, 0], axis=0), jnp.sum(st[:, 1], axis=0)


def _pick_block(rows: int):
    """Largest block <= _BLOCK_ROWS dividing rows; None -> use jnp bwd."""
    if rows <= 0:
        return None
    for b in (2048, 1024, 512, 256, 128):
        if rows % b == 0:
            return b
    if rows <= _MAX_SINGLE_BLOCK:
        return rows
    return None


def _kernel_fwd(x, scale, bias, eps, interpret):
    """One-pass Pallas forward when the row count tiles; the round-2
    profile shows XLA's LN stat fusions (`convert_reduce_fusion`) are the
    single largest non-matmul fusion cluster in the train step
    (~1.9 ms/step of 17.4, docs/PERF.md). Plain jnp otherwise."""
    d = x.shape[-1]
    rows = x.size // d
    block = _pick_block(rows)
    if block is None:
        return _plain_fwd(x, scale, bias, eps)
    y2 = _pallas_fwd(x.reshape(rows, d), scale, bias, eps, block, interpret)
    return y2.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, scale, bias, eps: float, interpret: bool = False):
    """LayerNormTF with Pallas forward AND backward (one pass each; the
    backward recomputes mu/rstd in-VMEM instead of saving stats).
    `interpret` runs the kernels in interpret mode (exact f32, CPU tests)."""
    return _kernel_fwd(x, scale, bias, eps, interpret)


def _flf_fwd(x, scale, bias, eps, interpret):
    return _kernel_fwd(x, scale, bias, eps, interpret), (x, scale)


def _flf_bwd(eps, interpret, res, dy):
    x, scale = res
    d = x.shape[-1]
    rows = x.size // d
    x2 = x.reshape(rows, d)
    dy2 = dy.reshape(rows, d)
    block = _pick_block(rows)
    if block is None:  # odd row count: plain-jnp backward, same math
        xf = x2.astype(jnp.float32)
        dyf = dy2.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mu) * rstd
        dyg = dyf * scale.astype(jnp.float32)
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        dx2 = (rstd * (dyg - m1 - xhat * m2)).astype(x.dtype)
        dg = jnp.sum(dyf * xhat, axis=0)
        db = jnp.sum(dyf, axis=0)
    else:
        dx2, dg, db = _pallas_bwd(x2, scale, dy2, eps, block, interpret)
    return dx2.reshape(x.shape), dg.astype(scale.dtype), db.astype(scale.dtype)


fused_layer_norm.defvjp(_flf_fwd, _flf_bwd)

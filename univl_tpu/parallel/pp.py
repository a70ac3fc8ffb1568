"""GPipe pipeline parallelism over a ``pp`` mesh axis.

The reference has no model parallelism of any kind (NCCL DP only,
main_task_retrieval.py:23,197-198); UniVL itself (~180M params) fits one
TPU chip with room to spare, so the flagship trainer deliberately scales
with dp (+ tp/sp/zero1) and does NOT pipeline — at 12/6/2/3-layer towers
the GPipe bubble (S-1)/(M+S-1) costs more than it buys (docs/SCALING.md).

This module provides the pipeline as a LIBRARY PRIMITIVE for deeper
stacks, built the TPU way:

  - the [L, ...] stacked layer parameters (the ``scan_layers`` layout,
    nn/layers.py:TransformerStack) are sharded over ``pp`` on the layer
    axis: stage s holds layers [s*L/S, (s+1)*L/S) — S-fold parameter and
    optimizer-state memory saving, the actual reason pipelining exists;
  - inside a ``shard_map`` manual over ``pp``, a ``lax.scan`` over
    M + S - 1 ticks rotates microbatch activations stage-to-stage with
    ``lax.ppermute`` (nearest-neighbour ICI hops);
  - the schedule is written FORWARD ONLY: ``jax.grad`` through the
    scan + ppermute yields the reverse pipeline automatically (ppermute's
    transpose is the inverse permutation), so one definition serves
    training and inference.

Everything is static-shaped and jit-compiled; the fill/drain ticks run
the stage body on zero buffers (all bodies used here are finite on
zeros), and their outputs are never consumed, so AD sends them zero
cotangents.

Correctness: pipeline == sequential layer loop (fwd + grads), and a
(dp, pp) trainer step == the dp-only trainer, tests/test_pp.py.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from univl_tpu.parallel.mesh import DP_AXIS

PP_AXIS = "pp"


def make_mesh_pp(dp: int, pp: int) -> Mesh:
    """(dp, pp) mesh; pp innermost so stage hops ride neighbouring ICI."""
    devices = jax.devices()
    if dp * pp > len(devices):
        raise ValueError(f"need {dp * pp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * pp]).reshape(dp, pp), (DP_AXIS, PP_AXIS))


def pipeline_apply(
    body: Callable,
    local_params,
    x: jax.Array,
    n_microbatches: int,
    *,
    axis: str = PP_AXIS,
):
    """Run a layer stack as a GPipe pipeline. MUST be called inside a
    shard_map manual over ``axis``.

    body(layer_params, h) -> h          one layer, applied via lax.scan
    local_params: pytree, leaves [L_local, ...]  (this stage's layers)
    x: [B, ...] stage-0 input (every stage receives the same operand;
       only stage 0 reads it). B % n_microbatches == 0.

    Returns [B, ...]: the final-stage output, delivered to ALL stages
    (the last ppermute hop closes the ring, so stage 0 can feed a loss
    without an extra broadcast).
    """
    n_stages = jax.lax.axis_size(axis)
    stage = jax.lax.axis_index(axis)
    M = n_microbatches
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M
    x_mb = x.reshape(M, mb, *x.shape[1:])

    def run_stage(h):
        # this stage's layers, sequentially (scan over the local layer axis)
        def step(carry, lp):
            return body(lp, carry), None

        out, _ = jax.lax.scan(step, h, local_params)
        return out

    def tick(carry, t):
        buf, outs = carry
        # stage 0 ingests microbatch t (zeros once the real ones run out)
        feed = jnp.where(t < M, 1.0, 0.0).astype(x.dtype)
        mb_in = feed * jax.lax.dynamic_index_in_dim(
            x_mb, jnp.minimum(t, M - 1), keepdims=False
        )
        h = jnp.where(stage == 0, mb_in, buf)
        h = run_stage(h)
        # the last stage banks microbatch m = t - (S - 1) when valid
        m_out = t - (n_stages - 1)
        outs = jnp.where(
            jnp.logical_and(stage == n_stages - 1, m_out >= 0),
            jax.lax.dynamic_update_index_in_dim(
                outs, h, jnp.maximum(m_out, 0), axis=0
            ),
            outs,
        )
        # rotate stage s -> s+1 (ring: last -> 0, fill input is overwritten)
        perm = [(s, (s + 1) % n_stages) for s in range(n_stages)]
        buf = jax.lax.ppermute(h, axis, perm)
        return (buf, outs), None

    buf0 = jnp.zeros_like(x_mb[0])
    outs0 = jnp.zeros_like(x_mb)
    (_, outs), _ = jax.lax.scan(
        tick, (buf0, outs0), jnp.arange(M + n_stages - 1)
    )
    # deliver the final-stage outputs to every stage (psum over one-hot:
    # only the last stage holds nonzero outs — cheap and differentiable)
    outs = jax.lax.psum(
        jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), axis
    )
    return outs.reshape(B, *x.shape[1:])


def pipelined_stack_fn(
    body: Callable,
    mesh: Mesh,
    n_microbatches: int,
):
    """jit-ready (params_stacked, x) -> y running ``body`` layers as a
    pipeline over the mesh's pp axis; dp (if present) shards the batch.

    params_stacked leaves are GLOBAL [L, ...] arrays; place them with
    ``NamedSharding(mesh, P('pp'))`` so each stage holds its slice.
    """
    has_dp = DP_AXIS in mesh.axis_names

    def fn(params_stacked, x):
        def mapped(lp, xloc):
            return pipeline_apply(body, lp, xloc, n_microbatches)

        return shard_map(
            mapped,
            mesh=mesh,
            in_specs=(P(PP_AXIS), P(DP_AXIS) if has_dp else P()),
            out_specs=P(DP_AXIS) if has_dp else P(),
            check_vma=False,
        )(params_stacked, x)

    return fn


def place_stacked_params(params_stacked, mesh: Mesh):
    """Shard stacked [L, ...] leaves over the pp axis of ``mesh``."""
    sh = NamedSharding(mesh, P(PP_AXIS))
    return jax.tree.map(lambda l: jax.device_put(l, sh), params_stacked)

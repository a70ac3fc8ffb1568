"""Beam-search cache reorder for TPU (Pallas): batched row gather.

Each beam step must permute every KV-cache array to follow the surviving
beams (reference algorithm: collate_active_info, main_task_caption.py:
400-432; here the permutation folds in done-instance freezing,
evals/beam.py). The XLA one-hot-einsum formulation copies every cache byte
~3x per step: the [B*K, H, L, D] arrays are lane-padded (D=64 -> 128), so
the reshape to [B, K, H*L*D] for the [B,K,K] matmul is a RETILING copy in
each direction plus the matmul's own write — the reshape pairs alone were
~60% of decode-step device time in the hlo_top profile (docs/PERF.md).

This kernel is a one-pass gather: the permutation arrives as a
scalar-prefetch argument, so each grid program's input BlockSpec selects
its SOURCE row directly (index_map reads the prefetched indices) and
copies it to destination row i — every byte moves exactly once, in the
cache's native layout. All (k, v) arrays of all layers share one
pallas_call (same permutation, one grid sweep).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def beam_reorder_rows(arrays: Sequence[jax.Array], src: jax.Array) -> List[jax.Array]:
    """Gather rows: out[j][i] = arrays[j][src[i]] for every array.

    arrays: same leading dim N, arbitrary (equal-rank not required) trailing
    dims; src: [N] int32 source-row indices (duplicates allowed — beam
    search routinely replicates rows).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = src.shape[0]
    k = len(arrays)

    def kern(src_ref, *refs):
        del src_ref
        for i_ref, o_ref in zip(refs[:k], refs[k:]):
            o_ref[:] = i_ref[:]

    def in_spec(a):
        nd = a.ndim - 1
        return pl.BlockSpec(
            (1,) + a.shape[1:],
            lambda i, src_ref, _nd=nd: (src_ref[i],) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    def out_spec(a):
        nd = a.ndim - 1
        return pl.BlockSpec(
            (1,) + a.shape[1:],
            lambda i, src_ref, _nd=nd: (i,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[in_spec(a) for a in arrays],
        out_specs=tuple(out_spec(a) for a in arrays),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * sum(a.size * a.dtype.itemsize for a in arrays),
            transcendentals=0,
        ),
    )(src.astype(jnp.int32), *arrays)
    return list(out)

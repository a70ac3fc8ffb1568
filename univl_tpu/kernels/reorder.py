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


def beam_reorder_groups_inplace(
    arrays: Sequence[jax.Array], prev_k: jax.Array, group: int,
    groups_per_block: int | None = None,
) -> List[jax.Array]:
    """In-place grouped permutation: rows permute only WITHIN consecutive
    groups of ``group`` rows (beam search: group = beam width K, rows
    [b*K, (b+1)*K) belong to instance b). Each grid program stages its
    whole group through VMEM before writing, so the outputs can be DONATED
    from the inputs (input_output_aliases) — inside a lax.while_loop the
    carry keeps one stable buffer per cache array and XLA inserts no
    round-trip copies (the non-aliased gather variant below cost ~30 ms of
    while-carry copies per 128-step decode, docs/PERF.md).

    prev_k: [N] int32, LOCAL source index within each row's group
    (out[g*K + k] = in[g*K + prev_k[g*K + k]]).

    ``groups_per_block`` (None -> $UNIVL_TPU_REORDER_GPB): beam groups
    per grid program — fewer, larger block DMAs amortize per-program
    transfer latency exactly like the fused decode kernel's gpb
    (kernels/decode_attention.py; bitwise-identical outputs, the
    grouping changes only the block partitioning). Clamped like
    effective_gpb: 0-means-off, non-dividing batches fall back to 1,
    and a scoped-VMEM estimate (~8x the lane-padded block bytes across
    ALL arrays, in+out double-buffered) halves it under a 48 MB cap.
    """
    import os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = prev_k.shape[0]
    assert n % group == 0, (n, group)
    k_arr = len(arrays)

    if groups_per_block is None:
        # default 1: unlike the fused decode kernel (whose gpb=4 measured
        # 1.29x), this kernel already stages ALL cache arrays per grid
        # program (6 blocks at the production config), so its per-program
        # DMA is 6x larger to begin with — gpb=4 measured a wash/slightly
        # worse (two A/B pairs, docs/PERF.md round-5). Opt-in via env.
        groups_per_block = int(os.environ.get("UNIVL_TPU_REORDER_GPB", "1") or "1")
    per_row = 0
    for a in arrays:
        mid = 1
        for s in a.shape[1:-1]:
            mid *= s
        per_row += mid * max(a.shape[-1], 128) * a.dtype.itemsize
    gpb = max(1, groups_per_block)
    if n % (group * gpb) != 0:
        gpb = 1
    while gpb > 1 and 8 * group * gpb * per_row > 48 * 1024 * 1024:
        gpb //= 2
    rows_b = group * gpb

    def kern(idx_ref, *refs):
        g = pl.program_id(0)
        for a in range(k_arr):
            i_ref, o_ref = refs[a], refs[k_arr + a]
            # With donation the input and output blocks share one VMEM
            # buffer: load EVERY source row into values before the first
            # store, or later iterations read already-overwritten rows.
            # Source rows are group-local: block row j*group + idx[...].
            rows = []
            for j in range(gpb):
                for kk in range(group):
                    src = j * group + idx_ref[(g * gpb + j) * group + kk]
                    rows.append(i_ref[pl.ds(src, 1)])
            for r in range(rows_b):
                o_ref[pl.ds(r, 1)] = rows[r]

    def spec(a):
        nd = a.ndim - 1
        return pl.BlockSpec(
            (rows_b,) + a.shape[1:],
            lambda i, idx_ref, _nd=nd: (i,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // rows_b,),
        in_specs=[spec(a) for a in arrays],
        out_specs=tuple(spec(a) for a in arrays),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays),
        # operand i+1 (after the scalar-prefetch arg) donates to output i
        input_output_aliases={i + 1: i for i in range(k_arr)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * sum(a.size * a.dtype.itemsize for a in arrays),
            transcendentals=0,
        ),
    )(prev_k.astype(jnp.int32), *arrays)
    return list(out)


def beam_reorder_rows(arrays: Sequence[jax.Array], src: jax.Array) -> List[jax.Array]:
    """Gather rows: out[j][i] = arrays[j][src[i]] for every array.

    Kept deliberately as the measured baseline variant (and for arbitrary
    cross-group gathers): the beam decoder itself uses
    beam_reorder_groups_inplace, whose donated buffers avoid ~30 ms of
    while-carry copies per 128-step decode (docs/PERF.md).

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

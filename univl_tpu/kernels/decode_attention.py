"""Fused beam-decode self-attention for TPU (Pallas).

One kernel per decoder layer per beam step that does, in a SINGLE pass
over the KV cache:

  1. the pending beam permutation (rows permute within their instance's
     K-row group, exactly like kernels/reorder.py),
  2. the position-``t`` cache update with the step's new K/V rows,
  3. the attention read: QK^T, masked softmax, AV.

The unfused decode step (evals/fast_decoder.py:step + the grouped reorder
kernel) moves each cache byte ~3x per step: the reorder reads + writes the
whole cache and the attention einsums read it again (docs/PERF.md decode
profile: reorder 48.7 ms + attention reads ~35 ms + cache updates 12.4 ms
of a 163 ms full-length batch-16 decode). Fusing all three makes it
exactly one read + one write per byte.

The permutation is DEFERRED by one step to make the fusion possible: the
beam driver (evals/beam.py) computes the step-t permutation from step-t
logits, but instead of permuting the cache immediately it carries the
permutation and this kernel applies it during step t+1's attention read.
The cache in HBM is therefore always one permutation behind; logical row
``r`` lives at physical row ``perm[r]`` (within its group) until the next
step rewrites it. Reference behavior being fused: collate_active_info
(main_task_caption.py:400-432) + Transformer-decoder self-attention over
the running prefix (modules/module_decoder.py:284-340).

Numerics match evals/fast_decoder.py:step: scores and softmax in f32,
-1e9 additive mask on positions > t (exact zeros after softmax), probs
cast to the cache dtype before the AV contraction with f32 accumulation.
The reduction ORDER differs from the XLA einsums (split q-dot / AV
element-wise reductions), so the fused path is opt-in
(UNIVL_TPU_FUSED_DECODE) and parity is pinned to tolerance, not bitwise
(tests/test_fast_decoder.py, tools/tpu_checks.py on-chip).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def effective_gpb(requested: int, n: int, group: int, h: int, l_max: int,
                  d: int, itemsize: int) -> int:
    """The groups_per_block the kernel will actually run.

    Clamps ``requested`` (0 or negative -> 1, matching the repo's
    UNIVL_TPU_*=0-means-off env convention), falls back to 1 when the
    beam batch does not divide, and applies the scoped-VMEM guard:
    Mosaic's scoped stack holds the K+V block windows at their TILED
    sizes (last dim padded to the 128-lane width — 2x for D=64) for both
    in and out (donate aliasing does not collapse them), each
    double-buffered across grid steps: ~8x rows_b*h*l*128*itemsize.
    gpb=4 at L=128 (estimate 62.9M + small windows) failed AOT compile
    at "scoped allocation 75.25M, limit 64.00M" inside the full decode,
    so gpb halves until the estimate fits 48 MB: the L=32 floor and
    L=64 buckets keep gpb=4; the L=128 ceiling degrades to gpb=2, where
    the (pre-guard) sweep measured parity with gpb=1 anyway
    (tools/bench_decode_gpb.py — which labels its rows with THIS
    function so post-guard runs cannot report duplicate configs under
    distinct requested values).
    """
    gpb = max(1, requested)
    if n % (group * gpb) != 0:
        gpb = 1
    lanes = max(d, 128)
    while gpb > 1:
        scoped_est = 8 * (group * gpb) * h * l_max * lanes * itemsize
        if scoped_est <= 48 * 1024 * 1024 and n % (group * gpb) == 0:
            break
        gpb //= 2
    return gpb


def beam_decode_self_attention(
    q: jax.Array,        # [N, H, D] step queries (new beam order)
    k_new: jax.Array,    # [N, H, D] step keys (new beam order)
    v_new: jax.Array,    # [N, H, D] step values (new beam order)
    k_cache: jax.Array,  # [N, H, L, D] physical rows in PREVIOUS beam order
    v_cache: jax.Array,  # [N, H, L, D]
    prev_k: jax.Array,   # [N] int32 LOCAL source row within each K-group
    t: jax.Array,        # scalar int32: position being decoded
    group: int,          # beam width K (rows [g*K, (g+1)*K) share a group)
    *,
    scale: float,
    interpret: bool = False,
    donate: bool = True,
    groups_per_block: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (ctx [N, H, D], new_k_cache, new_v_cache).

    The returned caches are in the NEW beam order with position ``t``
    written, i.e. reorder-then-update-then-attend exactly like the unfused
    step. With ``donate=True`` the cache buffers are donated
    (input_output_aliases) so the while-loop carry keeps one stable buffer
    per array — but the aliased in/out blocks share VMEM, which forces the
    snapshot-then-store order below AND stops Mosaic from double-buffering
    the block DMAs across groups. ``donate=False`` writes fresh output
    buffers: Mosaic overlaps group g+1's loads with group g's stores
    (measured A/B in docs/PERF.md), at the cost of XLA ping-ponging two
    cache allocations in the decode while-loop.

    Positions > t of every source row are zero by construction (caches
    init to zero, each position is written exactly once, bucket growth
    pads with zeros); the -1e9 mask makes their probs exactly 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, l_max, d = k_cache.shape
    assert n % group == 0, (n, group)
    assert q.shape == (n, h, d), (q.shape, (n, h, d))
    dtype = k_cache.dtype
    # groups_per_block > 1 processes several K-row groups per grid program
    # (block rows = gpb*group): fewer, larger block DMAs amortize the
    # per-program transfer latency the floor profile attributes ~2/3 of
    # this kernel's time to (raw cache bytes ~19 us/call vs ~53 us
    # measured at L=32; docs/PERF.md round-4 floor). Beam groups stay
    # independent — the permutation is still applied within each group.
    gpb = effective_gpb(
        groups_per_block, n, group, h, l_max, d, k_cache.dtype.itemsize
    )
    rows_b = group * gpb

    def kern(idx_ref, t_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
             ctx_ref, ko_ref, vo_ref):
        g = pl.program_id(0)
        tt = t_ref[0]
        # Mosaic layout rules: no rank-changing reshapes on non-32-bit
        # vectors, so every value stays rank-4 ([1, H, L|1, D]) and the
        # masks are built by iotas at their TARGET ranks. The only minor-
        # dim insertion below is on f32 probs, which IS supported.
        at_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, l_max, 1), 2) == tt
        le_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, l_max), 2) <= tt

        # Donated buffers: the in/out cache blocks share VMEM, so EVERY
        # source row must be loaded into values before the first store
        # (same hazard + discipline as kernels/reorder.py; guarded on-chip
        # by tools/tpu_checks.py). Source rows are group-local: block row
        # j*group + idx_ref[global_row].
        ks, vs = [], []
        for j in range(gpb):
            for kk in range(group):
                src = j * group + idx_ref[(g * gpb + j) * group + kk]
                ks.append(kc_ref[pl.ds(src, 1)])
                vs.append(vc_ref[pl.ds(src, 1)])

        for r in range(rows_b):
            # fold the step-t K/V rows ([1, H, 1, D]) into the slabs
            k_slab = jnp.where(at_t, kn_ref[pl.ds(r, 1)], ks[r])
            v_slab = jnp.where(at_t, vn_ref[pl.ds(r, 1)], vs[r])

            qf = q_ref[pl.ds(r, 1)].astype(jnp.float32)    # [1, H, 1, D]
            scores = jnp.sum(
                qf * k_slab.astype(jnp.float32), axis=-1
            ) * scale                                      # [1, H, L] f32
            scores = jnp.where(le_t, scores, -1e9)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = probs.astype(dtype).astype(jnp.float32)
            ctx = jnp.sum(
                probs[:, :, :, None] * v_slab.astype(jnp.float32),
                axis=2,
            )                                              # [1, H, D] f32
            ctx_ref[pl.ds(r, 1)] = ctx.astype(dtype)
            ko_ref[pl.ds(r, 1)] = k_slab.astype(dtype)
            vo_ref[pl.ds(r, 1)] = v_slab.astype(dtype)

    def row_spec(last_dims):
        nd = len(last_dims)
        return pl.BlockSpec(
            (rows_b,) + last_dims,
            lambda i, idx_ref, t_ref, _nd=nd: (i,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // rows_b,),
        in_specs=[
            row_spec((h, 1, d)),       # q
            row_spec((h, 1, d)),       # k_new
            row_spec((h, 1, d)),       # v_new
            row_spec((h, l_max, d)),   # k_cache
            row_spec((h, l_max, d)),   # v_cache
        ],
        out_specs=(
            row_spec((h, d)),          # ctx
            row_spec((h, l_max, d)),   # new k_cache
            row_spec((h, l_max, d)),   # new v_cache
        ),
    )
    cache_bytes = k_cache.size * k_cache.dtype.itemsize
    ctx, ko, vo = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, h, d), dtype),
            jax.ShapeDtypeStruct(k_cache.shape, dtype),
            jax.ShapeDtypeStruct(v_cache.shape, dtype),
        ),
        # operands (after the 2 scalar-prefetch args): q=2 kn=3 vn=4
        # kc=5 vc=6; donate the caches into outputs 1 and 2.
        input_output_aliases={5: 1, 6: 2} if donate else {},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * l_max * d,
            bytes_accessed=4 * cache_bytes,
            transcendentals=n * h * l_max,
        ),
    )(
        prev_k.astype(jnp.int32),
        jnp.asarray(t, jnp.int32).reshape(1),
        q.astype(dtype).reshape(n, h, 1, d),
        k_new.astype(dtype).reshape(n, h, 1, d),
        v_new.astype(dtype).reshape(n, h, 1, d),
        k_cache,
        v_cache,
    )
    return ctx, ko, vo

"""Fused tied-classifier -> top-k decode kernel (Pallas).

The beam-decode FLOOR (the production regime: real captions exit inside
the bucket-32 phase) is dominated by per-step vocab work that is
independent of prefix length: the 30,522-vocab tied-classifier GEMM, the
f32 [B*K, V] logits materialization + log-softmax, and lax.top_k over
[B, K*V] (docs/PERF.md round-2 decode profile; reference behavior being
accelerated: main_task_caption.py:446-455 predict_word ->
modeling.py:393-407).

This kernel streams the vocabulary in VMEM-resident tiles and never
materializes the f32 logits in HBM:

  for each vocab tile j (grid axis):
      L = h @ W_j^T + b_j          # [R, Vt] f32, MXU with f32 accumulation
      emit per-tile max / sumexp   # online-softmax partials
      emit per-tile top-k          # k iterations of (max, first-argmax, mask)

A tiny XLA epilogue merges the Nt partials: logsumexp across tiles and a
top-k over the [R, Nt*k] tile winners. Per-row top-k of ``score + logp``
is monotone in the row's logits (the log-softmax normalizer is a per-row
constant), so the merged per-row top-k + normalizer reproduce the exact
candidate set of the unfused full-vocab log_softmax + lax.top_k path.

Correctness vs lax.top_k: values match to f32 tolerance (the GEMM tiling
and the exp/sum orders differ from XLA's); index ties within equal values
break low-index-first in both. Opt-in (--fused_vocab /
UNIVL_TPU_FUSED_VOCAB), parity-gated like --fused_decode.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -1e30


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_vocab_inputs(w: jax.Array, bias: jax.Array, block_v: int = 2048):
    """Pad (w [V, H], bias [V]) to a block_v multiple ONCE, outside the
    decode loop. XLA does not hoist the pad out of the beam while-loop on
    its own — profiled at 1.94 ms/decode of repeated [30522,768]->[30720,
    768] HBM copies at the bucket-32 floor (docs/PERF.md round 4). Padded
    vocab columns get bias -1e30: exp -> 0, never in the top-k; with
    pre-padded inputs vocab_topk_partials' internal pads are no-ops."""
    V = w.shape[0]
    Vp = _ceil_to(V, block_v)
    if Vp != V:
        w = jnp.pad(w, ((0, Vp - V), (0, 0)))
        bias = jnp.pad(
            bias.astype(jnp.float32), (0, Vp - V), constant_values=_NEG
        )
    return w, bias


def vocab_topk_partials(
    h: jax.Array,      # [R, H] hidden states (compute dtype); see transform
    w: jax.Array,      # [V, H] tied classifier weight (word embedding)
    bias: jax.Array,   # [V] f32 classifier bias
    k: int,
    *,
    block_v: int = 2048,
    interpret: bool = False,
    transform=None,    # optional (wt [H,H], bt [H], g [H], b [H], eps)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns per-row top-k logits + logsumexp without HBM logits:
    (vals [R, k] f32 descending, idx [R, k] int32, lse [R] f32).

    ``transform``: when given, ``h`` is the RAW decoder hidden and the
    classifier transform (dense -> erf-GELU -> LayerNorm,
    fast_decoder._classify_hidden) runs IN-KERNEL at vocab tile 0 into a
    VMEM scratch that later tiles reuse — three fewer XLA ops per decode
    step and no [R, H] round-trip through HBM between the transform and
    the vocab GEMM. The fused transform computes in f32 end-to-end; the
    unfused path rounds to the compute dtype after the dense and the
    GELU, so on-chip logits shift at bf16 tolerance (same contract and
    gate class as --fused_decode; exact on CPU/f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, H = h.shape
    V = w.shape[0]
    assert w.shape == (V, H), (w.shape, (V, H))
    assert bias.shape == (V,), bias.shape
    assert k <= 64, k
    Rp = _ceil_to(R, 8)
    Vp = _ceil_to(V, block_v)
    nt = Vp // block_v

    if Rp != R:
        # zero rows produce logits == bias: harmless, sliced off at the end
        h = jnp.pad(h, ((0, Rp - R), (0, 0)))
    if Vp != V:
        w = jnp.pad(w, ((0, Vp - V), (0, 0)))
        # padded vocab columns get -1e30: exp -> 0, never in the top-k
    bias_p = jnp.pad(
        bias.astype(jnp.float32), (0, Vp - V), constant_values=_NEG
    )

    def kern(h_ref, *rest):
        if transform is not None:
            (wt_ref, bt_ref, g_ref, lb_ref, w_ref, b_ref,
             val_ref, idx_ref, stat_ref, ht_ref) = rest
            eps = transform[4]

            @pl.when(pl.program_id(0) == 0)
            def _():
                xr = h_ref[...].astype(jnp.float32)
                t = jax.lax.dot_general(
                    xr, wt_ref[...].astype(jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bt_ref[...][None, :]
                # A&S 7.1.26 erf from kernels/ffn.py (|err| <= 1.5e-7;
                # Mosaic has no erf primitive) — same formula in
                # interpret mode, so CPU tests cover the production math
                from univl_tpu.kernels.ffn import _erf_f32

                t = t * 0.5 * (1.0 + _erf_f32(t / jnp.sqrt(2.0)))
                u = jnp.mean(t, axis=1, keepdims=True)
                s = jnp.mean(jnp.square(t - u), axis=1, keepdims=True)
                t = (t - u) * jax.lax.rsqrt(s + eps)
                ht_ref[...] = (
                    t * g_ref[...][None, :] + lb_ref[...][None, :]
                ).astype(h.dtype)

            hh = ht_ref[...]
        else:
            w_ref, b_ref, val_ref, idx_ref, stat_ref = rest
            hh = h_ref[...]
        ww = w_ref[...]
        # [R, Vt] logits tile; contraction on H with f32 accumulation (MXU)
        L = jax.lax.dot_general(
            hh, ww,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[...][None, :]

        m = jnp.max(L, axis=1)                      # [R]
        s = jnp.sum(jnp.exp(L - m[:, None]), axis=1)

        col = jax.lax.broadcasted_iota(jnp.int32, (Rp, block_v), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Rp, 128), 1)
        vals = jnp.full((Rp, 128), _NEG, jnp.float32)
        idxs = jnp.zeros((Rp, 128), jnp.int32)
        Lw = L
        for r in range(k):
            v = jnp.max(Lw, axis=1)                 # [R]
            # first (lowest-index) argmax — matches lax.top_k tie-breaking
            i = jnp.min(
                jnp.where(Lw == v[:, None], col, jnp.int32(2**30)), axis=1
            )
            vals = jnp.where(lane == r, v[:, None], vals)
            idxs = jnp.where(lane == r, i[:, None], idxs)
            Lw = jnp.where(col == i[:, None], _NEG, Lw)

        val_ref[0] = vals
        idx_ref[0] = idxs
        stat_ref[0] = jnp.where(
            lane == 0, m[:, None], jnp.where(lane == 1, s[:, None], 0.0)
        )

    grid = (nt,)
    vec_spec = lambda: pl.BlockSpec((H,), lambda j: (0,),
                                    memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((Rp, H), lambda j: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [h]
    scratch_shapes = []
    if transform is not None:
        wt, bt, g, lb, _eps = transform
        assert wt.shape == (H, H) and bt.shape == (H,), (wt.shape, bt.shape)
        in_specs += [
            pl.BlockSpec((H, H), lambda j: (0, 0), memory_space=pltpu.VMEM),
            vec_spec(), vec_spec(), vec_spec(),
        ]
        operands += [wt, bt.astype(jnp.float32), g.astype(jnp.float32),
                     lb.astype(jnp.float32)]
        scratch_shapes = [pltpu.VMEM((Rp, H), h.dtype)]
    in_specs += [
        pl.BlockSpec(
            (block_v, H), lambda j: (j, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (block_v,), lambda j: (j,), memory_space=pltpu.VMEM
        ),
    ]
    operands += [w, bias_p]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, Rp, 128), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rp, 128), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rp, 128), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt, Rp, 128), jnp.float32),
            jax.ShapeDtypeStruct((nt, Rp, 128), jnp.int32),
            jax.ShapeDtypeStruct((nt, Rp, 128), jnp.float32),
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * H * Vp,
            bytes_accessed=(
                w.size * w.dtype.itemsize + Rp * H * h.dtype.itemsize
            ),
            transcendentals=Rp * Vp,
        ),
    )(*operands)

    tile_vals, tile_idx, tile_stat = out
    # ---- XLA epilogue over the Nt tiny partials ----
    m = tile_stat[:, :, 0]                          # [Nt, R]
    s = tile_stat[:, :, 1]
    M = jnp.max(m, axis=0)                          # [R]
    lse = M + jnp.log(jnp.sum(s * jnp.exp(m - M[None, :]), axis=0))

    # global vocab index of each tile winner, then top-k over Nt*k winners
    base = (jnp.arange(nt, dtype=jnp.int32) * block_v)[:, None, None]
    cand_v = tile_vals[:, :, :k].transpose(1, 0, 2).reshape(Rp, nt * k)
    cand_i = (tile_idx[:, :, :k] + base).transpose(1, 0, 2).reshape(Rp, nt * k)
    top_v, pos = jax.lax.top_k(cand_v, k)           # [R, k]
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_v[:R], top_i[:R], lse[:R]


def classify_topk(
    h: jax.Array,     # [R, H]
    w: jax.Array,     # [V, H]
    bias: jax.Array,  # [V]
    k: int,
    *,
    block_v: int = 2048,
    interpret: bool = False,
    transform=None,
) -> Tuple[jax.Array, jax.Array]:
    """(logp_topk [R, k] f32, idx [R, k] int32): top-k log-probabilities of
    the tied classifier, equal to
    ``lax.top_k(log_softmax(h @ w.T + bias), k)`` to f32 tolerance.
    ``transform``: run the classifier transform in-kernel on raw hiddens
    (see vocab_topk_partials)."""
    vals, idx, lse = vocab_topk_partials(
        h, w, bias, k, block_v=block_v, interpret=interpret,
        transform=transform,
    )
    return vals - lse[:, None], idx

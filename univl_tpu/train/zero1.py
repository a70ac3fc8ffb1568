"""ZeRO-1 sharded BertAdam: optimizer state + update sharded over dp.

The reference trains with NCCL DDP (main_task_retrieval.py:23,197-198):
every GPU all-reduces the full gradient and runs the FULL BertAdam update
on a replicated optimizer state — redundant work and memory on every rank.

This module is the TPU-native alternative (ZeRO stage 1, arXiv:1910.02054,
re-designed for the ICI collectives):

  - the gradient tree is flattened to ONE fp32 vector and
    ``lax.psum_scatter`` over the ``dp`` axis replaces the all-reduce —
    same bytes on the wire, but each device receives only its 1/dp shard
    of the (mean) gradient;
  - each device keeps 1/dp of the BertAdam m/v moments and updates 1/dp
    of the parameters: the measured HBM-roofline optimizer step
    (~4.4 ms/step on the 180M-param flagship, docs/PERF.md "MFU
    accounting") divides by the dp size, and optimizer memory drops from
    2x params per device to 2x/dp;
  - the fp32 MASTER PARAMETERS live flat in the optimizer state (v3):
    the same [C, 8192] chunked layout as the moments, row-sharded over
    dp. The shard update adds into the master shard directly and ONE
    ``lax.all_gather`` of the new master restores the replicated
    parameter tree (same wire bytes as v2's update all-gather, one
    collective pair per step, both riding ICI inside the compiled
    program). Keeping the master flat removes the two dp-invariant
    full-size passes the v2 profile named (docs/PERF.md zero1 v2:
    ~5.5 ms flatten DUS chains + 3.7 ms flat-buffer materializations):
    the weight-decay term reads the master shard in place of
    flatten(params)+dynamic_slice, and unflatten(all_gather(master))
    REPLACES unflatten(update)+apply_updates instead of preceding it.

Numerical contract: identical to the replicated
``optax.chain(clip_by_global_norm, bert_adam(...))`` path
(train/optimization.py) — the global-norm clip and the reference's
PER-TENSOR clip (modules/optimization.py:134-136) are computed from
shard-local partial sums + one ``psum``, so clipping sees the same full
norms as the replicated path.  tests/test_zero1.py pins one-step and
multi-step equivalence on an 8-device mesh.

Usage: construct with ``make_univl_zero1_optimizer(..., dp=mesh_dp)`` and
pass to ``Trainer(..., zero1=True)``.  ``update_fn`` MUST run inside the
trainer's ``shard_map`` (it issues dp-axis collectives); ``init_fn`` runs
outside and returns GLOBAL [T_pad // _CHUNK, _CHUNK] moment/master arrays
which the trainer places with a ``P('dp')`` (row-sharded) sharding.
Requires tp == 1 (params replicated within the dp group); with tp > 1
use train/zero1_tp.py.

CONTRACT DIVERGENCE from optax (v3): ``update_fn`` returns the NEW
PARAMETER TREE, not an update tree — the trainer's zero1 branch consumes
it directly instead of calling ``optax.apply_updates`` (the extra
read-read-write pass over the full tree is the point of the redesign).
The new tree is bitwise identical to ``params + update``: the master is
initialized as flatten(params) and the shard add is the same elementwise
fp32 add, just performed in the flat layout.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from univl_tpu.parallel.mesh import DP_AXIS
from univl_tpu.train.optimization import (
    SCHEDULES,
    univl_decay_mask,
    univl_lr_scale,
)


class Zero1Transformation(optax.GradientTransformation):
    """A ``GradientTransformation`` whose ``update`` returns the NEW
    PARAMETER TREE, not an update tree (the v3 contract divergence in the
    module docstring). The ``applies_params`` marker lets ``Trainer``
    verify the pairing: ``zero1=True`` requires it, ``zero1=False``
    rejects it — so a mismatched tx fails loudly at construction instead
    of silently double-applying params via ``optax.apply_updates``.
    Never feed one of these to ``optax.apply_updates`` or into an
    ``optax.chain``."""

    applies_params = True


class Zero1State(NamedTuple):
    """Sharded BertAdam state.

    ``m``/``v`` are [T_pad // _CHUNK, _CHUNK] row-chunked views of the flat
    moment vectors, sharded over dp on the row axis (``P('dp')``); inside
    the trainer's shard_map each device sees its [shard // _CHUNK, _CHUNK]
    rows. Storing the moments 2-D (the same layout the update math uses)
    removes four per-step relayout passes between the 1-D ``T(1024)`` and
    2-D ``T(8,128)`` tilings — measured 1.86 ms each at flagship scale
    (docs/PERF.md). ``step`` is the replicated scalar step count.

    ``p`` (v3) is the fp32 MASTER PARAMETER vector in the same row-chunked,
    row-sharded layout. It is the authority the update adds into; the
    replicated parameter tree handed back to the trainer each step is
    unflatten(all_gather(p)) and stays bitwise equal to it. Costs
    4*T_pad/dp bytes/device; buys back the two dp-invariant full-size
    passes of the v2 profile (docs/PERF.md zero1 v3).
    """

    step: jax.Array
    m: jax.Array
    v: jax.Array
    p: jax.Array


def zero1_state_pspecs():
    """shard_map in/out PartitionSpecs for a Zero1State."""
    from jax.sharding import PartitionSpec as P

    return Zero1State(step=P(), m=P(DP_AXIS), v=P(DP_AXIS), p=P(DP_AXIS))


class _Plan(NamedTuple):
    """Static flattening plan for one param tree (host-side, cached).

    Only PER-LEAF descriptors are stored ([n_leaves]-sized); per-ELEMENT
    metadata is never materialized from host. Baking [T_pad]-sized host
    constants into the program makes the HLO carry ~T_pad*12 bytes of
    literals — 2 GB at flagship scale, which the tunneled remote-compile
    endpoint rejects outright (HTTP 413; found by on-chip verification).
    Deriving them on device per ELEMENT (iota + searchsorted + gather) is
    HLO-small but catastrophically slow on TPU: profiled at 14.5 s/step at
    flagship scale — a 9-iteration binary-search while-loop over the
    [152M] vector (9.6 s), a segment_sum scatter (1.3 s), and three [152M]
    one-per-element gathers (~1.1-1.3 s each), all scalar-unit-bound. The
    update therefore works on a [C, _CHUNK] view and exploits that leaves
    are CONTIGUOUS runs of the flat vector: per-leaf metadata is applied
    as a per-ROW broadcast (fusing into its consumer) plus tiny
    boundary-row fixes (_RowPlan/_apply_leaf_mul), and per-leaf sq-sums
    use a [C]-sized row segment_sum plus boundary-row tail moves —
    O(n_leaves)-sized gathers/scatters only, and no [C, _CHUNK]
    metadata buffer is ever materialized.
    """

    shapes: tuple
    sizes: tuple
    offsets: tuple
    total: int
    total_pad: int
    shard: int
    leaf_ends: np.ndarray  # [n_leaves] int32 exclusive end offset per leaf
    leaf_decay: np.ndarray  # [n_leaves+1] f32 0/1 decay mask (pad leaf 0)
    leaf_scale: np.ndarray  # [n_leaves+1] f32 LR multiplier (pad leaf 0)


_CHUNK = 8192  # row width of the on-device [C, _CHUNK] view (64 f32 tiles)


def _build_plan(params, dp, decay_mask_fn, lr_scale_fn) -> _Plan:
    leaves = jax.tree.leaves(params)
    shapes = tuple(l.shape for l in leaves)
    sizes = tuple(int(np.prod(s)) if s else 1 for s in shapes)
    offsets = tuple(int(x) for x in np.cumsum((0,) + sizes)[:-1])
    total = int(sum(sizes))
    # ceil to dp shards, each a whole number of _CHUNK rows
    shard = -(-(-(-total // dp)) // _CHUNK) * _CHUNK
    total_pad = shard * dp
    n = len(leaves)
    ends = np.cumsum(sizes).astype(np.int32)
    d_leaves = jax.tree.leaves(decay_mask_fn(params)) if decay_mask_fn else [True] * n
    s_leaves = jax.tree.leaves(lr_scale_fn(params)) if lr_scale_fn else [1.0] * n
    decay = np.asarray([1.0 if d else 0.0 for d in d_leaves] + [0.0], np.float32)
    scale = np.asarray([float(s) for s in s_leaves] + [0.0], np.float32)
    return _Plan(shapes, sizes, offsets, total, total_pad, shard, ends, decay, scale)


class _RowPlan(NamedTuple):
    """On-device row/boundary geometry of THIS rank's [C, _CHUNK] shard.

    Per-leaf metadata is applied as a ROW-CONSTANT broadcast (the [C]
    per-row value fuses into the consumer for free) plus a tiny
    [n_leaves, _CHUNK] scatter-add that fixes the <= n_leaves rows a leaf
    boundary lands in. The round-2 design instead materialized full
    [C, _CHUNK] per-element metadata (zeros buffer + scatter + add pass,
    three times per step): measured ~2.8 ms of zeros writes plus the
    consumers' extra reads at flagship scale (docs/PERF.md). Because
    boundary corrections are additive deltas (`.at[rows].add`), several
    boundaries landing in ONE row (many sub-8192 bias/LN leaves) telescope
    correctly.
    """

    seg_row: jax.Array  # [C] leaf index of each row's first element
    rows_b: jax.Array  # [n] in-bounds row of each boundary (clamped)
    maskj: jax.Array  # [n, _CHUNK] f32: 1.0 at columns past the boundary
    valid: jax.Array  # [n] f32: 1.0 iff the boundary splits a row here


def _row_plan(ends: jax.Array, start: jax.Array, C: int) -> _RowPlan:
    K = _CHUNK
    rows_idx = start + jax.lax.iota(jnp.int32, C) * K
    # integer leaf index per row via compare-sum over the tiny [n] ends —
    # exact (no f32 delta accumulation across ~300 leaves)
    seg_row = jnp.sum(
        (rows_idx[:, None] >= ends[None, :]).astype(jnp.int32), axis=1
    )  # [C]
    b_rel = ends - start
    p = jnp.clip(b_rel, 0, C * K)
    # a boundary at a row START splits nothing — that row's base value is
    # already the new leaf's (rows_idx >= ends counted it); only boundaries
    # strictly inside a row need the correction
    valid = (b_rel > 0) & (b_rel < C * K) & (p % K > 0)
    rows_b = jnp.minimum(p // K, C - 1)
    off = p - rows_b * K
    maskj = (
        jax.lax.iota(jnp.int32, K)[None, :] >= off[:, None]
    ).astype(jnp.float32)  # [n, K]
    return _RowPlan(seg_row, rows_b, maskj, valid.astype(jnp.float32))


def _apply_leaf_mul(x: jax.Array, vals: jax.Array, rp: _RowPlan) -> jax.Array:
    """``x * vals[leaf_of_element]`` for a [C, _CHUNK] shard view: one fused
    broadcast multiply by the per-row value + a [n, _CHUNK] scatter-add
    fixing boundary rows with the delta ``(vals[k+1]-vals[k]) * x``. Exact
    up to 1 ulp vs expanding the metadata per element ((a+d)*x vs
    a*x + d*x); the zero1≡replicated equivalence is pinned at 1e-5 rtol."""
    d = (vals[1:] - vals[:-1]) * rp.valid  # [n] delta crossing ends[k]
    fix = x[rp.rows_b] * d[:, None] * rp.maskj  # [n, K]
    return (x * vals[rp.seg_row][:, None]).at[rp.rows_b].add(fix)


def _leaf_sq_sums(g2: jax.Array, rp: _RowPlan) -> jax.Array:
    """Rank-local per-leaf sums of ``g2`` ([C, _CHUNK] view of the shard).

    Each row's sum is attributed to the leaf containing its FIRST element
    (a [C]-sized segment_sum); rows a boundary crosses are fixed by moving
    the row's tail-past-the-boundary from leaf j to leaf j+1 — nested
    boundaries in one row telescope correctly. Never differences a global
    running sum (a cumsum-based variant lost ~ulp(total) per leaf to
    cancellation — 2.4e-5 rel on the resulting clip coefficients, outside
    the pinned 1e-5 equivalence rtol). Returns [n_leaves + 1] (last entry
    = the flat-padding tail)."""
    n = rp.maskj.shape[0]
    row_sum = jnp.sum(g2, axis=1)  # [C]
    base = jax.ops.segment_sum(row_sum, rp.seg_row, num_segments=n + 1)
    # sum of each boundary row PAST the boundary, summed directly (not
    # row_sum minus head — no cancellation)
    tails = rp.valid * jnp.sum(g2[rp.rows_b] * rp.maskj, axis=1)
    # move each boundary's tail from leaf j to leaf j+1 (index-aligned adds)
    return base.at[:n].add(-tails).at[1:].add(tails)


def _flatten(tree, total_pad: int) -> jax.Array:
    leaves = [l.astype(jnp.float32).reshape(-1) for l in jax.tree.leaves(tree)]
    flat = jnp.concatenate(leaves) if len(leaves) > 1 else leaves[0]
    return jnp.pad(flat, (0, total_pad - flat.shape[0]))


def _unflatten(flat: jax.Array, template, plan: _Plan):
    leaves = jax.tree.leaves(template)
    out = [
        flat[off : off + sz].reshape(shape).astype(l.dtype)
        for l, shape, sz, off in zip(leaves, plan.shapes, plan.sizes, plan.offsets)
    ]
    return jax.tree.unflatten(jax.tree.structure(template), out)


def zero1_bert_adam(
    lr: float,
    dp: int,
    warmup: float = -1.0,
    t_total: int = -1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    global_clip_norm: float = 1.0,
    decay_mask: Optional[Callable] = None,
    lr_scale: Optional[Callable] = None,
    state_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """ZeRO-1 sharded equivalent of
    ``optax.chain(clip_by_global_norm(global_clip_norm), bert_adam(...))``.

    ``update_fn`` must be called INSIDE a shard_map over the ``dp`` axis
    with the UNREDUCED per-device gradient tree (it performs the mean via
    psum_scatter itself).  Returns the NEW (all-gathered) parameter tree —
    NOT an optax update tree; see the module docstring (v3 contract).
    """
    sdt = jnp.dtype(state_dtype) if state_dtype else jnp.float32
    plan_cache: dict = {}

    def plan_for(params) -> _Plan:
        key = (
            jax.tree.structure(params),
            tuple(l.shape for l in jax.tree.leaves(params)),
        )
        if key not in plan_cache:
            plan_cache[key] = _build_plan(params, dp, decay_mask, lr_scale)
        return plan_cache[key]

    def init_fn(params):
        plan = plan_for(params)
        return Zero1State(
            step=jnp.zeros([], jnp.int32),
            m=jnp.zeros((plan.total_pad // _CHUNK, _CHUNK), sdt),
            v=jnp.zeros((plan.total_pad // _CHUNK, _CHUNK), sdt),
            # master params are ALWAYS fp32 (state_dtype rounds only the
            # moments) — they are the bitwise authority for the param tree
            p=_flatten(params, plan.total_pad).reshape(-1, _CHUNK),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("zero1_bert_adam requires params")
        plan = plan_for(params)
        C = plan.shard // _CHUNK

        # Reduce-scatter the mean gradient: each device gets its shard,
        # viewed [C, _CHUNK] (ONE shard-sized relayout in; the moments are
        # already stored 2-D so they need none).
        flat_g = _flatten(grads, plan.total_pad)
        g = jax.lax.psum_scatter(flat_g, DP_AXIS, tiled=True) / dp
        g = g.reshape(C, _CHUNK)

        rank = jax.lax.axis_index(DP_AXIS)
        start = rank * plan.shard
        ends = jnp.asarray(plan.leaf_ends)  # [n_leaves], tiny constant
        rp = _row_plan(ends, start, C)

        # Global-norm clip (mirrors optax.clip_by_global_norm: scale by
        # clip / max(norm, clip)).
        if global_clip_norm > 0:
            total_sq = jax.lax.psum(jnp.sum(g * g), DP_AXIS)
            g_norm = jnp.sqrt(total_sq)
            g = g * (global_clip_norm / jnp.maximum(g_norm, global_clip_norm))

        # Reference per-TENSOR clip (modules/optimization.py:134-136):
        # full-leaf norms from shard-local row/boundary sums + one psum
        # (see _Plan docstring for why not segment_sum + gather).
        if max_grad_norm > 0:
            leaf_sq = jax.lax.psum(_leaf_sq_sums(g * g, rp), DP_AXIS)
            # the tail-move arithmetic can round an (exactly zero) leaf sum
            # a few ulps NEGATIVE on TPU — observed -1.8e-12 on the flat
            # padding tail at flagship scale — and sqrt(<0)=NaN would then
            # spread through the boundary-fix deltas; sums of squares are
            # >= 0 by construction, so clamp before the sqrt
            leaf_sq = jnp.maximum(leaf_sq, 0.0)
            coef = jnp.minimum(max_grad_norm / (jnp.sqrt(leaf_sq) + 1e-6), 1.0)
            g = _apply_leaf_mul(g, coef, rp)

        # Sharded moments: math in fp32, then rounded to ``state_dtype``
        # BEFORE the update is computed from them — the replicated
        # bert_adam stores first and updates from the stored (rounded)
        # moments (optimization.py update_fn). Matching that keeps --zero1
        # equivalent to the replicated chain up to fp32 reduction-order
        # tolerance (1e-5 rtol, pinned in tests/test_zero1.py; the
        # boundary-fix algebra in _apply_leaf_mul is (a+d)*x vs a*x+d*x,
        # ~1 ulp), including across checkpoint restores.
        m = (b1 * state.m.astype(jnp.float32) + (1 - b1) * g).astype(sdt)
        v = (b2 * state.v.astype(jnp.float32) + (1 - b2) * g * g).astype(sdt)

        if t_total != -1:
            progress = state.step.astype(jnp.float32) / t_total
            lr_t = lr * SCHEDULES[schedule](progress, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)

        ahat = m.astype(jnp.float32) / (jnp.sqrt(v.astype(jnp.float32)) + eps)
        # Final update = -(lr_t*smul) * (ahat + wd*dmask*p)
        #              = a[leaf]*ahat + b[leaf]*p
        # with a = -lr_t*smul and b = -lr_t*wd*smul*dmask — ONE fused
        # row-broadcast pass over the shard plus the boundary-row fixes.
        a_vals = -lr_t * jnp.asarray(plan.leaf_scale)
        da = (a_vals[1:] - a_vals[:-1]) * rp.valid
        upd = a_vals[rp.seg_row][:, None] * ahat
        fix = da[:, None] * rp.maskj * ahat[rp.rows_b]
        if weight_decay > 0.0:
            # v3: the weight-decay term reads this rank's MASTER shard in
            # place of v2's flatten(params) + dynamic_slice — the first of
            # the two dp-invariant full-size passes the v2 profile named.
            p = state.p
            b_vals = weight_decay * a_vals * jnp.asarray(plan.leaf_decay)
            db = (b_vals[1:] - b_vals[:-1]) * rp.valid
            upd = upd + b_vals[rp.seg_row][:, None] * p
            fix = fix + db[:, None] * rp.maskj * p[rp.rows_b]
        upd = upd.at[rp.rows_b].add(fix)

        # v3: add into the master SHARD (fp32, elementwise — same values as
        # v2's per-leaf params+update, so bitwise identical), then ONE
        # all-gather of the new master re-assembles the replicated params
        # directly (the only gather in the step; same wire bytes as v2's
        # update gather, but the unflatten now PRODUCES the new param tree
        # instead of preceding a full-size apply_updates pass).
        new_p = state.p + upd
        p_flat = jax.lax.all_gather(
            new_p.reshape(plan.shard), DP_AXIS, tiled=True
        )
        new_params = _unflatten(p_flat, params, plan)
        return new_params, Zero1State(step=state.step + 1, m=m, v=v, p=new_p)

    return Zero1Transformation(init_fn, update_fn)


def zero1_state_from_replicated(params, chain_state, dp: int,
                                state_dtype: Optional[str] = None) -> Zero1State:
    """Convert a replicated make_univl_optimizer state — the
    (clip_by_global_norm, BertAdamState) optax.chain tuple — into the
    flat sharded Zero1State, so a run checkpointed without --zero1 can
    resume with it. Flat order is jax.tree.leaves(params) order (the
    same order zero1_bert_adam uses)."""
    adam = chain_state[1] if isinstance(chain_state, (tuple, list)) else chain_state
    plan = _build_plan(params, dp, None, None)
    sdt = jnp.dtype(state_dtype) if state_dtype else jnp.float32
    return Zero1State(
        step=jnp.asarray(adam.step, jnp.int32),
        m=_flatten(adam.m, plan.total_pad).astype(sdt).reshape(-1, _CHUNK),
        v=_flatten(adam.v, plan.total_pad).astype(sdt).reshape(-1, _CHUNK),
        p=_flatten(params, plan.total_pad).reshape(-1, _CHUNK),
    )


def replicated_state_from_zero1(params, z_state: Zero1State,
                                state_dtype: Optional[str] = None):
    """Inverse of zero1_state_from_replicated: rebuild the
    (clip_by_global_norm, BertAdamState) chain state from the flat
    shards, so a --zero1 checkpoint can resume replicated."""
    from univl_tpu.train.optimization import BertAdamState

    plan = _build_plan(params, 1, None, None)
    sdt = jnp.dtype(state_dtype) if state_dtype else None

    def un(chunked):
        flat = chunked.reshape(-1)
        tree = _unflatten(flat.astype(jnp.float32), params, plan)
        return jax.tree.map(
            lambda l, p: l.astype(sdt or p.dtype), tree, params
        )

    adam = BertAdamState(
        step=jnp.asarray(z_state.step, jnp.int32),
        m=un(z_state.m), v=un(z_state.v),
    )
    return (optax.EmptyState(), adam)


def make_univl_zero1_optimizer(
    lr: float,
    t_total: int,
    dp: int,
    warmup_proportion: float = 0.1,
    coef_lr: float = 1.0,
    schedule: str = "warmup_linear",
    weight_decay: float = 0.01,
    global_clip_norm: float = 1.0,
    state_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """ZeRO-1 twin of make_univl_optimizer (same UniVL param-group policy:
    no decay on biases/LN scales, coef_lr on the BERT branch)."""
    return zero1_bert_adam(
        lr=lr,
        dp=dp,
        warmup=warmup_proportion,
        t_total=t_total,
        schedule=schedule,
        weight_decay=weight_decay,
        max_grad_norm=1.0,
        global_clip_norm=global_clip_norm,
        decay_mask=univl_decay_mask,
        lr_scale=lambda p: univl_lr_scale(p, coef_lr),
        state_dtype=state_dtype,
    )

"""ZeRO-1 x tensor parallelism: sharded BertAdam on a (dp, tp) mesh.

Round-3 VERDICT item 5: ``zero1 requires tp == 1`` was a hole in the
advertised parallelism matrix. The flat ZeRO-1 machinery (train/zero1.py)
assumes every dp rank holds FULL param/grad leaves — under tensor
parallelism the Megatron-split leaves (parallel/tp.py) are GSPMD-sharded
over the tp axis, and flattening them into one vector would force an
all-gather over tp each step.

Design: partition the param tree by its tp PartitionSpec.

  - tp-REPLICATED leaves (LayerNorms, embeddings that don't divide, pos
    tables, poolers — the leaves ``tp_pspec`` leaves at P()): the flat
    ZeRO-1 path — one psum_scatter'd fp32 vector over dp, moments
    row-sharded P('dp'), exactly train/zero1.py.
  - tp-SHARDED leaves (attention/FFN kernels, vocab-parallel tables):
    per-leaf BertAdam. Their moments inherit the param shardings, so the
    optimizer state and the HBM-roofline update are already divided by tp
    (ZeRO-for-free over the tp axis — docs/PERF.md "Tensor parallelism");
    scattering them over dp as well would trade one all-gather for
    another with no memory left to win at UniVL scale.

Numerical contract: same as zero1_bert_adam — equivalent to the
replicated optax.chain(clip_by_global_norm, bert_adam) to fp32
reduction-order tolerance. The global-norm clip combines the flat
shard's psum with the per-leaf group's sums so clipping sees the SAME
full gradient norm as the replicated path. Equivalence vs the dp x tp
trajectory is pinned in tests/test_zero1.py.

``update_fn`` must run inside the trainer's shard_map over dp (manual
dp axis, tp auto) with the UNREDUCED per-device gradients.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from univl_tpu.parallel.mesh import DP_AXIS
from univl_tpu.train.optimization import SCHEDULES, univl_decay_mask, univl_lr_scale
from univl_tpu.train.zero1 import (
    _CHUNK,
    Zero1Transformation,
    _build_plan,
    _leaf_sq_sums,
    _row_plan,
    _apply_leaf_mul,
)


class Zero1TpState(NamedTuple):
    """step: replicated scalar; m/v: [T_pad//8192, 8192] flat moments of the
    tp-replicated subset, row-sharded over dp; leaf_m/leaf_v: per-leaf
    moments of the tp-sharded subset (same tree structure as params, with
    shape-() placeholders on flat-subset leaves), GSPMD-sharded like the
    params over tp."""

    step: jax.Array
    m: jax.Array
    v: jax.Array
    leaf_m: optax.Params
    leaf_v: optax.Params


def zero1_tp_state_pspecs():
    """shard_map in/out PartitionSpecs (dp-manual view; tp is auto)."""
    from jax.sharding import PartitionSpec as P

    return Zero1TpState(step=P(), m=P(DP_AXIS), v=P(DP_AXIS),
                        leaf_m=P(), leaf_v=P())


def _masked(tree, keep):
    return [l for l, k in zip(jax.tree.leaves(tree), keep) if k]


def zero1_tp_bert_adam(
    lr: float,
    dp: int,
    flat_mask_fn: Callable,
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
    """ZeRO-1 x tp equivalent of
    ``optax.chain(clip_by_global_norm, bert_adam(...))``.

    ``flat_mask_fn(params) -> tree[bool]``: True = tp-replicated leaf
    (flat ZeRO-1 path over dp); False = tp-sharded leaf (per-leaf adam).

    v3 contract (matches zero1_bert_adam): ``update_fn`` returns the NEW
    PARAMETER TREE, not an optax update tree — the trainer's zero1 branch
    consumes it directly instead of calling ``optax.apply_updates``."""
    sdt = jnp.dtype(state_dtype) if state_dtype else jnp.float32
    cache: dict = {}

    def setup(params):
        key = (
            jax.tree.structure(params),
            tuple(l.shape for l in jax.tree.leaves(params)),
        )
        if key not in cache:
            keep = jax.tree.leaves(flat_mask_fn(params))
            sub_leaves = _masked(params, keep)
            sub_struct = jax.tree.structure(sub_leaves)
            sub_tree = jax.tree.unflatten(sub_struct, sub_leaves)
            dm = (lambda t, _d=decay_mask, _k=keep: _masked(_d(params), _k)) \
                if decay_mask else None
            ls = (lambda t, _s=lr_scale, _k=keep: _masked(_s(params), _k)) \
                if lr_scale else None
            plan = _build_plan(sub_tree, dp, dm, ls)
            d_all = jax.tree.leaves(decay_mask(params)) if decay_mask \
                else [True] * len(keep)
            s_all = jax.tree.leaves(lr_scale(params)) if lr_scale \
                else [1.0] * len(keep)
            cache[key] = (keep, sub_struct, plan, d_all, s_all)
        return cache[key]

    def init_fn(params):
        keep, _struct, plan, _d, _s = setup(params)
        keep_tree = flat_mask_fn(params)
        leaf_m = jax.tree.map(
            lambda p, k: jnp.zeros((), sdt) if k else jnp.zeros(p.shape, sdt),
            params, keep_tree,
        )
        leaf_v = jax.tree.map(
            lambda p, k: jnp.zeros((), sdt) if k else jnp.zeros(p.shape, sdt),
            params, keep_tree,
        )
        return Zero1TpState(
            step=jnp.zeros([], jnp.int32),
            m=jnp.zeros((plan.total_pad // _CHUNK, _CHUNK), sdt),
            v=jnp.zeros((plan.total_pad // _CHUNK, _CHUNK), sdt),
            leaf_m=leaf_m,
            leaf_v=leaf_v,
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("zero1_tp_bert_adam requires params")
        keep, sub_struct, plan, d_all, s_all = setup(params)
        C = plan.shard // _CHUNK
        struct = jax.tree.structure(params)
        g_leaves = jax.tree.leaves(grads)
        p_leaves = jax.tree.leaves(params)

        # ---- per-leaf group: mean over dp first (the flat path folds its
        # mean into psum_scatter) ----
        gl = [
            None if k else jax.lax.pmean(g, DP_AXIS)
            for g, k in zip(g_leaves, keep)
        ]

        # ---- flat group: reduce-scatter its mean over dp ----
        sub_g = jax.tree.unflatten(sub_struct, _masked(grads, keep))
        from univl_tpu.train.zero1 import _flatten

        flat_g = _flatten(sub_g, plan.total_pad)
        g = jax.lax.psum_scatter(flat_g, DP_AXIS, tiled=True) / dp
        g = g.reshape(C, _CHUNK)

        rank = jax.lax.axis_index(DP_AXIS)
        start = rank * plan.shard
        ends = jnp.asarray(plan.leaf_ends)
        rp = _row_plan(ends, start, C)

        # ---- GLOBAL clip over the FULL gradient (both groups) ----
        if global_clip_norm > 0:
            flat_sq = jax.lax.psum(jnp.sum(g * g), DP_AXIS)
            leaf_sq = sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in gl if x is not None
            ) if any(not k for k in keep) else 0.0
            g_norm = jnp.sqrt(flat_sq + leaf_sq)
            coefg = global_clip_norm / jnp.maximum(g_norm, global_clip_norm)
            g = g * coefg
            gl = [None if x is None else x * coefg for x in gl]

        # ---- reference per-TENSOR clip ----
        if max_grad_norm > 0:
            leaf_sq_flat = jax.lax.psum(_leaf_sq_sums(g * g, rp), DP_AXIS)
            leaf_sq_flat = jnp.maximum(leaf_sq_flat, 0.0)
            coef = jnp.minimum(
                max_grad_norm / (jnp.sqrt(leaf_sq_flat) + 1e-6), 1.0
            )
            g = _apply_leaf_mul(g, coef, rp)
            gl = [
                None if x is None else x * jnp.minimum(
                    max_grad_norm
                    / (jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32))))
                       + 1e-6),
                    1.0,
                )
                for x in gl
            ]

        if t_total != -1:
            progress = state.step.astype(jnp.float32) / t_total
            lr_t = lr * SCHEDULES[schedule](progress, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)

        # ---- flat group: sharded moments + update (zero1 v3 math) ----
        m = (b1 * state.m.astype(jnp.float32) + (1 - b1) * g).astype(sdt)
        v = (b2 * state.v.astype(jnp.float32) + (1 - b2) * g * g).astype(sdt)
        ahat = m.astype(jnp.float32) / (jnp.sqrt(v.astype(jnp.float32)) + eps)
        a_vals = -lr_t * jnp.asarray(plan.leaf_scale)
        da = (a_vals[1:] - a_vals[:-1]) * rp.valid
        upd = a_vals[rp.seg_row][:, None] * ahat
        fix = da[:, None] * rp.maskj * ahat[rp.rows_b]
        upd = upd.at[rp.rows_b].add(fix)
        upd_flat = jax.lax.all_gather(
            upd.reshape(plan.shard), DP_AXIS, tiled=True
        )
        from univl_tpu.train.zero1 import _unflatten

        sub_params = jax.tree.unflatten(sub_struct, _masked(params, keep))
        sub_upd = _unflatten(upd_flat, sub_params, plan)
        sub_upd_leaves = jax.tree.leaves(sub_upd)
        sub_p_leaves = jax.tree.leaves(sub_params)
        # leaf-lifted weight decay (zero1 v3): b[leaf] is leaf-constant
        flat_idx = [i for i, k in enumerate(keep) if k]
        if weight_decay > 0.0:
            fixed = []
            for j, i in enumerate(flat_idx):
                b_i = float(
                    weight_decay * float(s_all[i]) * (1.0 if d_all[i] else 0.0)
                )
                u = sub_upd_leaves[j]
                if b_i:
                    u = u + (-lr_t * b_i) * sub_p_leaves[j].astype(jnp.float32)
                fixed.append(u)
            sub_upd_leaves = fixed

        # ---- per-leaf group: replicated BertAdam math (moments sharded
        # over tp by GSPMD, replicated over dp) ----
        lm_leaves = jax.tree.leaves(state.leaf_m)
        lv_leaves = jax.tree.leaves(state.leaf_v)
        new_lm, new_lv, leaf_upd = [], [], {}
        for i, (k, p) in enumerate(zip(keep, p_leaves)):
            if k:
                new_lm.append(lm_leaves[i])
                new_lv.append(lv_leaves[i])
                continue
            gi = gl[i]
            mi = (b1 * lm_leaves[i].astype(jnp.float32) + (1 - b1) * gi)
            vi = (b2 * lv_leaves[i].astype(jnp.float32) + (1 - b2) * gi * gi)
            mi_s, vi_s = mi.astype(sdt), vi.astype(sdt)
            new_lm.append(mi_s)
            new_lv.append(vi_s)
            u = mi_s.astype(jnp.float32) / (
                jnp.sqrt(vi_s.astype(jnp.float32)) + eps
            )
            if weight_decay > 0.0 and d_all[i]:
                u = u + weight_decay * p.astype(jnp.float32)
            leaf_upd[i] = -(lr_t * float(s_all[i])) * u

        # ---- interleave the two groups back into the params order,
        # applying the update in place (v3 contract: update_fn returns the
        # NEW PARAMETER TREE, matching zero1_bert_adam — the trainer's
        # zero1 branch consumes it without an optax.apply_updates pass) ----
        out, j = [], 0
        for i, k in enumerate(keep):
            if k:
                out.append(
                    (sub_p_leaves[j].astype(jnp.float32) + sub_upd_leaves[j])
                    .astype(p_leaves[i].dtype)
                )
                j += 1
            else:
                out.append(
                    (p_leaves[i].astype(jnp.float32) + leaf_upd[i])
                    .astype(p_leaves[i].dtype)
                )
        new_params = jax.tree.unflatten(struct, out)
        new_state = Zero1TpState(
            step=state.step + 1, m=m, v=v,
            leaf_m=jax.tree.unflatten(struct, new_lm),
            leaf_v=jax.tree.unflatten(struct, new_lv),
        )
        return new_params, new_state

    return Zero1Transformation(init_fn, update_fn)


def make_univl_zero1_tp_optimizer(
    lr: float,
    t_total: int,
    dp: int,
    tp: int,
    warmup_proportion: float = 0.1,
    coef_lr: float = 1.0,
    schedule: str = "warmup_linear",
    weight_decay: float = 0.01,
    global_clip_norm: float = 1.0,
    state_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """ZeRO-1 x tp twin of make_univl_optimizer: flat-subset selection from
    the Megatron shardings (parallel/tp.py tp_pspec == P() -> flat)."""
    from jax.sharding import PartitionSpec as P

    from univl_tpu.parallel.tp import tp_pspec

    def flat_mask_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: tp_pspec(path, leaf, tp) == P(), params
        )

    return zero1_tp_bert_adam(
        lr=lr,
        dp=dp,
        flat_mask_fn=flat_mask_fn,
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

"""BertAdam-exact optimizer as an optax transformation.

The reference optimizer (modules/optimization.py:52-167) is NOT Adam:
  - no bias correction on the moments
  - decoupled weight decay added to the *update* (not the grad)
  - per-parameter gradient-norm clipping INSIDE the step (:134-136)
  - LR schedule computed inline from the per-param step count, evaluated
    BEFORE the increment (so the very first update uses progress=0, i.e.
    lr=0 under warmup_linear with warmup>0)

Plus the driver-level global clip_grad_norm(1.0) right before step
(main_task_retrieval.py:347) — composed here via optax.clip_by_global_norm.

Param groups (main_task_retrieval.py:168-190): weight decay 0.01 for all
params except biases and LayerNorm scales; the BERT branch gets lr * coef_lr.
(Note the reference's group variable names are swapped — no_decay_param_tp
actually holds the *decay* params — but the net effect is the standard rule.)
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_cosine(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, 0.5 * (1.0 + jnp.cos(math.pi * x)))


def warmup_constant(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_linear(x, warmup=0.002):
    """Triangular: peak at warmup*t_total, zero at t_total
    (reference: modules/optimization.py:38-43)."""
    return jnp.where(
        x < warmup, x / warmup, jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0)
    )


SCHEDULES = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


class BertAdamState(NamedTuple):
    step: jax.Array  # scalar int32
    m: optax.Params
    v: optax.Params


def _clip_per_param(g: jax.Array, max_norm: float) -> jax.Array:
    """torch clip_grad_norm_ on a single tensor: scale if norm > max_norm."""
    norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
    coef = jnp.minimum(max_norm / (norm + 1e-6), 1.0)
    return g * coef


def bert_adam(
    lr: float,
    warmup: float = -1.0,
    t_total: int = -1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    decay_mask: Optional[Callable] = None,
    lr_scale: Optional[Callable] = None,
    state_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Exact BertAdam clone.

    decay_mask(params) -> tree of bool: True where weight decay applies.
    lr_scale(params)   -> tree of float: per-leaf LR multiplier (coef_lr).
    state_dtype: storage dtype for the m/v moments (default: the param
    dtype, fp32). "bfloat16" halves optimizer HBM traffic + memory — the
    optimizer is bandwidth-bound at ~3.2 ms of a 24 ms step (docs/PERF.md)
    — at slightly noisier moment accumulation (moment MATH stays fp32).
    Not reference-exact; keep fp32 for bit-level finetune parity.
    """
    sdt = jnp.dtype(state_dtype) if state_dtype else None

    def init_fn(params):
        def z(p):
            return jnp.zeros(p.shape, sdt or p.dtype)

        return BertAdamState(
            step=jnp.zeros([], jnp.int32),
            m=jax.tree.map(z, params),
            v=jax.tree.map(z, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("bert_adam requires params")
        if max_grad_norm > 0:
            grads = jax.tree.map(lambda g: _clip_per_param(g, max_grad_norm), grads)

        store = (lambda x: x.astype(sdt)) if sdt else (lambda x: x)
        m = jax.tree.map(
            lambda mm, g: store(b1 * mm.astype(jnp.float32) + (1 - b1) * g),
            state.m, grads,
        )
        v = jax.tree.map(
            lambda vv, g: store(b2 * vv.astype(jnp.float32) + (1 - b2) * g * g),
            state.v, grads,
        )

        decay = (
            decay_mask(params)
            if decay_mask is not None
            else jax.tree.map(lambda _: True, params)
        )
        scale = (
            lr_scale(params)
            if lr_scale is not None
            else jax.tree.map(lambda _: 1.0, params)
        )

        if t_total != -1:
            progress = state.step.astype(jnp.float32) / t_total
            lr_t = lr * SCHEDULES[schedule](progress, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)

        def one(mm, vv, p, d, s):
            mm, vv = mm.astype(jnp.float32), vv.astype(jnp.float32)
            upd = mm / (jnp.sqrt(vv) + eps)
            if weight_decay > 0.0:
                upd = upd + jnp.where(d, weight_decay, 0.0) * p
            return -(lr_t * s) * upd

        updates = jax.tree.map(one, m, v, params, decay, scale)
        return updates, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)


# --------------------------------------------------------------------- #
# UniVL param-group policy
# --------------------------------------------------------------------- #

_BERT_PREFIXES = ("text", "word_embed", "text_pos_embed")


def _is_bert_path(path) -> bool:
    head = path[0].key if hasattr(path[0], "key") else str(path[0])
    return head in _BERT_PREFIXES


def _is_no_decay_path(path) -> bool:
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    # "scale" only occurs in LayerNorm modules; "bias" matches torch's
    # substring rule (all biases, incl. head biases).
    return leaf in ("bias", "scale", "classifier_bias")


def univl_decay_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_no_decay_path(path), params
    )


def univl_lr_scale(params, coef_lr: float):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: coef_lr if _is_bert_path(path) else 1.0, params
    )


def make_univl_optimizer(
    lr: float,
    t_total: int,
    warmup_proportion: float = 0.1,
    coef_lr: float = 1.0,
    schedule: str = "warmup_linear",
    weight_decay: float = 0.01,
    global_clip_norm: float = 1.0,
    state_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """BertAdam + driver-level global grad clip, with UniVL param groups.

    Mirrors prep_optimizer (reference: main_task_retrieval.py:168-200) and
    the train-loop clip (main_task_retrieval.py:347).
    """
    return optax.chain(
        optax.clip_by_global_norm(global_clip_norm),
        bert_adam(
            lr=lr,
            warmup=warmup_proportion,
            t_total=t_total,
            schedule=schedule,
            weight_decay=weight_decay,
            max_grad_norm=1.0,
            decay_mask=univl_decay_mask,
            lr_scale=lambda p: univl_lr_scale(p, coef_lr),
            state_dtype=state_dtype,
        ),
    )

"""UniVL training objectives as pure functions.

Numerical contract with the reference (modules/until_module.py:179-251 and
modules/modeling.py:273-297):

  - cross_en_loss:           CrossEn          (until_module.py:182-191)
  - milnce_loss:             MILNCELoss       (until_module.py:193-221)
  - max_margin_ranking_loss: MaxMarginRankingLoss (until_module.py:223-251)
  - masked_cross_entropy:    CrossEntropyLoss(ignore_index=-1) used for both
                             MLM (modeling.py:273-276) and the decoder LM
                             (modeling.py:252-254). NOTE: caption targets are
                             padded with token 0, not -1, so padded positions
                             intentionally contribute loss — reference parity.
  - mfm_nce_loss:            masked-frame NCE (modeling.py:278-297)

All losses reduce over the *per-device* batch: the reference computes its
similarity-matrix losses per GPU with no cross-device negatives
(mask shapes baked from batch_size // n_gpu, until_module.py:202-204,238-243).
The shard_map trainer preserves this by calling these inside the mapped body.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def cross_en_loss(sim_matrix: jax.Array) -> jax.Array:
    """Softmax-diagonal NCE over a square similarity matrix."""
    logpt = jax.nn.log_softmax(sim_matrix, axis=-1)
    return -jnp.mean(jnp.diagonal(logpt))


def _mil_mask(batch_size: int, n_pair: int) -> np.ndarray:
    """Block-diagonal positive mask: kron(I_B, ones(n_pair, n_pair))."""
    return np.kron(np.eye(batch_size), np.ones((n_pair, n_pair))).astype(np.float32)


def milnce_loss(sim_matrix: jax.Array, batch_size: int, n_pair: int) -> jax.Array:
    """MIL-NCE (Miech et al. 2020 style) as implemented by the reference.

    ``sim_matrix`` is [B*n_pair, B*n_pair]; positives are the n_pair x n_pair
    blocks on the diagonal. The loss is evaluated only at the middle row of
    each block (mark_ind, until_module.py:218).
    """
    mm_mask = jnp.asarray(_mil_mask(batch_size, n_pair))

    from_text = sim_matrix + mm_mask * -1e12
    from_video = sim_matrix.T
    new_sim = jnp.concatenate([from_video, from_text], axis=-1)
    logpt = jax.nn.log_softmax(new_sim, axis=-1)

    mask_logpt = jnp.concatenate([mm_mask, jnp.zeros_like(mm_mask)], axis=-1)
    masked_logpt = logpt + (1.0 - mask_logpt) * -1e12
    new_logpt = -jax.nn.logsumexp(masked_logpt, axis=-1)

    mark_ind = np.arange(batch_size) * n_pair + (n_pair // 2)
    return jnp.mean(new_logpt[jnp.asarray(mark_ind)])


def max_margin_ranking_loss(
    sim_matrix: jax.Array,
    margin: float = 0.1,
    negative_weighting: bool = False,
    batch_size: int = 1,
    n_pair: int = 1,
    hard_negative_rate: float = 0.5,
) -> jax.Array:
    """Bidirectional hinge loss with optional hard-negative weighting."""
    d = jnp.diagonal(sim_matrix)
    max_margin = jax.nn.relu(margin + sim_matrix - d[:, None]) + jax.nn.relu(
        margin + sim_matrix - d[None, :]
    )
    if negative_weighting and n_pair > 1 and batch_size > 1:
        easy_negative_rate = 1 - hard_negative_rate
        alpha = easy_negative_rate / ((batch_size - 1) * (1 - easy_negative_rate))
        mm = (1 - alpha) * np.eye(batch_size) + alpha
        mm = np.kron(mm, np.ones((n_pair, n_pair)))
        mm = mm * (batch_size * (1 - easy_negative_rate))
        max_margin = max_margin * jnp.asarray(mm.astype(np.float32))
    return jnp.mean(max_margin)


def masked_cross_entropy(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -1
) -> jax.Array:
    """Mean CE over positions where labels != ignore_index.

    Matches torch CrossEntropyLoss(ignore_index=-1) semantics including the
    all-ignored edge case guarded to 0 instead of NaN.
    """
    logits = logits.reshape(-1, logits.shape[-1]).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logpt = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logpt, safe_labels[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def mfm_nce_loss(
    frame_scores: jax.Array,  # [B, F, video_dim] predictions from visual head
    video: jax.Array,  # [B, F, video_dim] normalized clean features
    video_mask: jax.Array,  # [B, F]
    video_labels_index: jax.Array,  # [B, F], -1 = not masked
    ignore_index: int = -1,
) -> jax.Array:
    """Masked-frame NCE vs all frames in the batch (modeling.py:278-297)."""
    dim = frame_scores.shape[-1]
    scores = frame_scores.reshape(-1, dim).astype(jnp.float32)  # [BF, dim]
    targets = video.reshape(-1, dim).astype(jnp.float32)  # [BF, dim]
    logits = scores @ targets.T  # [BF, BF]
    m = video_mask.reshape(-1).astype(jnp.float32)
    mask_matrix = m[:, None] * m[None, :]
    masked_logits = logits + (1.0 - mask_matrix) * -1e8
    logpt = jax.nn.log_softmax(masked_logits, axis=-1)
    nce = -jnp.diagonal(logpt)
    sel = (video_labels_index.reshape(-1) != ignore_index).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(sel), 1.0)
    return jnp.sum(nce * sel) / denom

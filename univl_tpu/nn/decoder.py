"""Autoregressive caption decoder (reference: modules/module_decoder.py).

Each layer: causal self-attention, encoder-attention over the cross-encoder
output, then FFN — all post-LN residual blocks
(reference: module_decoder.py:279-292). Embeddings and classifier are tied to
the BERT word/position tables (reference: modeling.py:159,
module_decoder.py:297-302,342-349).

TPU-first: masks are built once outside the layer loop; the classifier logits
matmul runs with fp32 accumulation. Beam-search decoding reuses this module
under jit with static shapes (see univl_tpu/evals/beam.py) with the
cross-encoder output computed once and cached — the reference recomputes it
every decode step (reference: modeling.py:404).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from univl_tpu.config import DecoderConfig
from univl_tpu.nn.layers import (
    ACT2FN,
    MASK_BIAS,
    LayerNormTF,
    MultiHeadAttention,
    PredictionHeadTransform,
    ResidualOutput,
    _dense,
)


def decoder_self_attn_bias(answer_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, L] pad mask -> [B, 1, L, L] additive causal+pad bias.

    Matches reference module_decoder.py:389-396: a position is masked if it is
    padding OR in the future (strict upper triangle), bias value -10000.
    """
    L = answer_mask.shape[-1]
    pad = 1.0 - answer_mask.astype(dtype)[:, None, None, :]  # [B,1,1,L]
    future = jnp.triu(jnp.ones((L, L), dtype=dtype), k=1)[None, None]  # [1,1,L,L]
    masked = (pad + future) > 0
    return masked.astype(dtype) * MASK_BIAS


class DecoderLayer(nn.Module):
    """Self-attn + enc-attn + FFN (reference: module_decoder.py:279-292)."""

    cfg: DecoderConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: object = False  # False | True | "auto"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoder_out: jax.Array,
        self_bias: jax.Array,
        enc_bias: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        mha = dict(
            num_heads=cfg.num_attention_heads,
            head_dim=cfg.hidden_size // cfg.num_attention_heads,
            dropout_rate=cfg.attention_probs_dropout_prob,
            initializer_range=cfg.initializer_range,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
        )
        res = dict(
            features=cfg.hidden_size,
            dropout_rate=cfg.hidden_dropout_prob,
            initializer_range=cfg.initializer_range,
            dtype=self.dtype,
        )
        slf = MultiHeadAttention(**mha, name="self_attn")(
            x, None, self_bias, deterministic=deterministic
        )
        slf_out = ResidualOutput(**res, name="self_attn_output")(
            slf, x, deterministic=deterministic
        )
        enc = MultiHeadAttention(**mha, name="enc_attn")(
            slf_out, encoder_out, enc_bias, deterministic=deterministic
        )
        enc_out = ResidualOutput(**res, name="enc_attn_output")(
            enc, slf_out, deterministic=deterministic
        )
        inter = _dense(
            cfg.intermediate_size, cfg.initializer_range, "intermediate", self.dtype
        )(enc_out)
        inter = ACT2FN[cfg.hidden_act](inter)
        return ResidualOutput(**res, name="output")(
            inter, enc_out, deterministic=deterministic
        )


class CaptionDecoder(nn.Module):
    """Decoder stack + tied classifier (reference: module_decoder.py:351-406).

    ``word_embed`` / ``pos_embed`` are the BERT tables shared from UniVL.
    Returns logits [B, L, vocab].
    """

    cfg: DecoderConfig
    word_embed: nn.Module  # shared nn.Embed (BERT word table)
    pos_embed: nn.Module  # shared nn.Embed (BERT position table)
    dtype: jnp.dtype = jnp.float32
    use_pallas: object = False  # False | True | "auto"

    @nn.compact
    def __call__(
        self,
        input_caption_ids: jax.Array,  # [B, L]
        encoder_out: jax.Array,  # [B, Lenc, H] cross-encoder output
        answer_mask: jax.Array,  # [B, L]
        encoder_mask: jax.Array,  # [B, Lenc]
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        L = input_caption_ids.shape[1]
        positions = jnp.arange(L, dtype=jnp.int32)[None, :]
        x = self.word_embed(input_caption_ids) + self.pos_embed(positions)
        x = LayerNormTF(name="embed_ln")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        x = x.astype(self.dtype)

        self_bias = decoder_self_attn_bias(answer_mask)
        enc_bias = (
            (1.0 - encoder_mask.astype(jnp.float32)) * MASK_BIAS
        )[:, None, None, :]

        for i in range(cfg.num_decoder_layers):
            x = DecoderLayer(
                cfg, dtype=self.dtype, use_pallas=self.use_pallas, name=f"layer_{i}"
            )(x, encoder_out, self_bias, enc_bias, deterministic)

        h = PredictionHeadTransform(
            cfg.hidden_size,
            cfg.hidden_act,
            cfg.initializer_range,
            self.dtype,
            name="classifier_transform",
        )(x)
        # Tied output projection: logits = h @ E^T + b
        # (reference: module_decoder.py:167-183)
        table = self.word_embed.embedding  # [vocab, H]
        bias = self.param(
            "classifier_bias", nn.initializers.zeros, (table.shape[0],), jnp.float32
        )
        logits = (
            jnp.einsum(
                "blh,vh->blv",
                h,
                table.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + bias
        )
        return logits

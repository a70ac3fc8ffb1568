"""The three encoder towers: text (BERT), visual (S3D features), cross (fusion).

In the reference these are three near-identical files
(modules/module_bert.py, modules/module_visual.py, modules/module_cross.py);
here they share ``TransformerStack`` and differ only in embeddings:

  - TextEncoder:   word + position + type embeddings  (module_bert.py:118-146)
  - VisualEncoder: Linear(video_dim -> hidden) + position (module_visual.py:104-131)
  - CrossEncoder:  pre-computed features + position + type (module_cross.py:109-138)

Weight sharing: the BERT word/position embedding tables are owned by the
parent UniVL module and passed in as shared flax submodules, because the
caption decoder and the MLM head tie to them (reference: modeling.py:137-138,159).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from univl_tpu.config import BertConfig, CrossConfig, VisualConfig
from univl_tpu.nn.layers import (
    LayerNormTF,
    Pooler,
    TransformerStack,
    additive_mask_bias,
)


def _stack(cfg, dtype, use_pallas, remat, scan_layers=False, num_layers=None,
           use_fused_ffn=False, use_train_pallas=False, seq_shard=False,
           fused_qkv=False):
    return TransformerStack(
        num_layers=num_layers if num_layers is not None else cfg.num_hidden_layers,
        hidden_size=cfg.hidden_size,
        num_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act=cfg.hidden_act,
        dropout_rate=cfg.hidden_dropout_prob,
        attn_dropout_rate=cfg.attention_probs_dropout_prob,
        initializer_range=cfg.initializer_range,
        dtype=dtype,
        use_pallas=use_pallas,
        use_train_pallas=use_train_pallas,
        use_fused_ffn=use_fused_ffn,
        fused_qkv=fused_qkv,
        remat=remat,
        scan_layers=scan_layers,
        seq_shard=seq_shard,
        name="encoder",
    )


class TextEncoder(nn.Module):
    """BERT text encoder (reference: modules/module_bert.py:364-447).

    The pooler is omitted: UniVL never consumes it
    (reference: modeling.py:307-308 takes encoded_layers[-1] only).
    """

    cfg: BertConfig
    word_embed: nn.Module  # shared nn.Embed, owned by UniVL
    pos_embed: nn.Module  # shared nn.Embed, owned by UniVL
    dtype: jnp.dtype = jnp.float32
    use_pallas: object = False  # False | True | "auto"
    use_train_pallas: object = False  # False | True | "auto"
    use_fused_ffn: object = False  # False | True | "auto"
    fused_qkv: bool = False  # single q/k/v GEMM (nn/layers.py MultiHeadAttention)
    remat: bool = False
    scan_layers: bool = False
    seq_shard: bool = False  # sequence parallelism over tp (parallel/sp.py)

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        token_type_ids: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        seq_len = input_ids.shape[1]
        positions = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
        type_embed = nn.Embed(
            cfg.type_vocab_size,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
            param_dtype=jnp.float32,
            name="type_embed",
        )
        x = (
            self.word_embed(input_ids)
            + self.pos_embed(positions)
            + type_embed(token_type_ids)
        )
        x = LayerNormTF(name="embed_ln")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        x = x.astype(self.dtype)
        bias = additive_mask_bias(attention_mask)
        return _stack(cfg, self.dtype, self.use_pallas, self.remat, self.scan_layers,
                      use_fused_ffn=self.use_fused_ffn,
                      use_train_pallas=self.use_train_pallas,
                      seq_shard=self.seq_shard,
                      fused_qkv=self.fused_qkv)(
            x, bias, deterministic
        )


class FeatureProjection(nn.Module):
    """Linear(video_dim -> hidden) with an explicit (setup-time) kernel.

    This is the visual tower's "word embedding"
    (reference: modules/module_visual.py:110). The kernel is exposed so the
    MFM prediction head can tie to it (reference: module_visual.py:298-311:
    ``hidden.matmul(self.weight)``).
    """

    video_dim: int
    hidden_size: int
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.normal(stddev=self.initializer_range),
            (self.video_dim, self.hidden_size),
            jnp.float32,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.hidden_size,), jnp.float32
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return (
            jnp.dot(
                x.astype(self.dtype),
                self.kernel.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            + self.bias
        )


class VisualEncoder(nn.Module):
    """Transformer over pre-extracted S3D features
    (reference: modules/module_visual.py:386-425).

    ``feature_proj`` is a shared FeatureProjection owned by UniVL; its kernel
    is tied into the MFM prediction head (reference: module_visual.py:298-311).
    """

    cfg: VisualConfig
    feature_proj: nn.Module
    dtype: jnp.dtype = jnp.float32
    use_pallas: object = False  # False | True | "auto"
    use_train_pallas: object = False  # False | True | "auto"
    use_fused_ffn: object = False  # False | True | "auto"
    fused_qkv: bool = False  # single q/k/v GEMM (nn/layers.py MultiHeadAttention)
    remat: bool = False
    scan_layers: bool = False
    seq_shard: bool = False  # sequence parallelism over tp (parallel/sp.py)

    @nn.compact
    def __call__(
        self,
        video: jax.Array,  # [B, F, video_dim], already LayerNorm-normalized
        video_mask: jax.Array,  # [B, F]
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        seq_len = video.shape[1]
        positions = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
        proj = self.feature_proj
        pos_embed = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
            param_dtype=jnp.float32,
            name="pos_embed",
        )
        x = proj(video) + pos_embed(positions)
        x = LayerNormTF(name="embed_ln")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        x = x.astype(self.dtype)
        bias = additive_mask_bias(video_mask)
        return _stack(cfg, self.dtype, self.use_pallas, self.remat, self.scan_layers,
                      use_fused_ffn=self.use_fused_ffn,
                      use_train_pallas=self.use_train_pallas,
                      seq_shard=self.seq_shard,
                      fused_qkv=self.fused_qkv)(
            x, bias, deterministic
        )


class CrossEncoder(nn.Module):
    """Fusion transformer over concatenated [text ; video] hidden states
    (reference: modules/module_cross.py:356-394).

    Returns (last_hidden, pooled): the CLS pooler feeds the FT-Align
    similarity head (reference: modeling.py:371).
    """

    cfg: CrossConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: object = False  # False | True | "auto"
    use_train_pallas: object = False  # False | True | "auto"
    use_fused_ffn: object = False  # False | True | "auto"
    fused_qkv: bool = False  # single q/k/v GEMM (nn/layers.py MultiHeadAttention)
    remat: bool = False
    scan_layers: bool = False
    seq_shard: bool = False  # sequence parallelism over tp (parallel/sp.py)

    @nn.compact
    def __call__(
        self,
        concat_features: jax.Array,  # [B, Lt+Lv, H]
        concat_type: jax.Array,  # [B, Lt+Lv] 0=text, 1=video
        concat_mask: jax.Array,  # [B, Lt+Lv]
        deterministic: bool = True,
    ):
        cfg = self.cfg
        seq_len = concat_features.shape[1]
        positions = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
        pos_embed = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
            param_dtype=jnp.float32,
            name="pos_embed",
        )
        type_embed = nn.Embed(
            cfg.type_vocab_size,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
            param_dtype=jnp.float32,
            name="type_embed",
        )
        x = concat_features + pos_embed(positions) + type_embed(concat_type)
        x = LayerNormTF(name="embed_ln")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        x = x.astype(self.dtype)
        bias = additive_mask_bias(concat_mask)
        h = _stack(cfg, self.dtype, self.use_pallas, self.remat, self.scan_layers,
                   use_fused_ffn=self.use_fused_ffn,
                   use_train_pallas=self.use_train_pallas,
                   seq_shard=self.seq_shard,
                   fused_qkv=self.fused_qkv)(
            x, bias, deterministic
        )
        pooled = Pooler(
            cfg.hidden_size, cfg.initializer_range, self.dtype, name="pooler"
        )(h)
        return h, pooled

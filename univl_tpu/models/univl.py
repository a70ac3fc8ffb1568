"""The composite UniVL model (reference: modules/modeling.py).

Assembles the four towers, ties the BERT embedding tables into the decoder
and the MLM head (reference: modeling.py:137-138,159,163), and computes the
five pretraining objectives plus the task losses (reference:
modeling.py:188-271).

The flax params layout (stable contract for the torch->flax checkpoint
converter, univl_tpu/checkpoint/torch_convert.py):

    word_embed/embedding                 <- bert.embeddings.word_embeddings
    text_pos_embed/embedding             <- bert.embeddings.position_embeddings
    feature_proj/{kernel,bias}           <- visual.embeddings.word_embeddings (kernel = weight.T)
    video_norm/{scale,bias}              <- normalize_video.visual_norm2d
    text/...                             <- bert.*
    visual/...                           <- visual.*
    cross/...                            <- cross.*
    decoder/...                          <- decoder.*
    similarity_dense/{kernel,bias}       <- similarity_dense
    mlm_head/...                         <- cls.predictions
    mfm_head/...                         <- cls_visual.predictions
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from univl_tpu.config import UniVLConfig
from univl_tpu.models import losses as L
from univl_tpu.nn.decoder import CaptionDecoder
from univl_tpu.nn.layers import LayerNormTF, PredictionHeadTransform
from univl_tpu.nn.towers import (
    CrossEncoder,
    FeatureProjection,
    TextEncoder,
    VisualEncoder,
)


class TiedLMHead(nn.Module):
    """transform -> h @ table^T + bias (reference: module_bert.py:314-330)."""

    hidden_size: int
    vocab_size: int
    hidden_act: str = "gelu"
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, table: jax.Array) -> jax.Array:
        h = PredictionHeadTransform(
            self.hidden_size,
            self.hidden_act,
            self.initializer_range,
            self.dtype,
            name="transform",
        )(h)
        bias = self.param("bias", nn.initializers.zeros, (self.vocab_size,), jnp.float32)
        logits = (
            jnp.einsum(
                "...h,vh->...v",
                h,
                table.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + bias
        )
        return logits


class TiedVisualHead(nn.Module):
    """transform -> h @ proj_kernel^T + bias (reference: module_visual.py:283-311).

    Projects hidden back to video_dim via the tied FeatureProjection kernel.
    """

    hidden_size: int
    video_dim: int
    hidden_act: str = "gelu"
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, proj_kernel: jax.Array) -> jax.Array:
        h = PredictionHeadTransform(
            self.hidden_size,
            self.hidden_act,
            self.initializer_range,
            self.dtype,
            name="transform",
        )(h)
        bias = self.param("bias", nn.initializers.zeros, (self.video_dim,), jnp.float32)
        # torch: hidden.matmul(weight) with weight [hidden, video_dim];
        # our kernel is [video_dim, hidden] so contract on the hidden axis.
        scores = (
            jnp.einsum(
                "...h,dh->...d",
                h,
                proj_kernel.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + bias
        )
        return scores


class UniVL(nn.Module):
    """TPU-native UniVL (reference: modules/modeling.py:109-427)."""

    cfg: UniVLConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self._dtype = dtype
        emb = nn.initializers.normal(stddev=c.bert.initializer_range)

        # Shared BERT tables (tied into decoder + MLM head, modeling.py:137-159).
        self.word_embed = nn.Embed(
            c.bert.vocab_size, c.bert.hidden_size, embedding_init=emb,
            param_dtype=jnp.float32, name="word_embed",
        )
        self.text_pos_embed = nn.Embed(
            c.bert.max_position_embeddings, c.bert.hidden_size, embedding_init=emb,
            param_dtype=jnp.float32, name="text_pos_embed",
        )
        # Raw S3D feature LayerNorm (reference: modeling.py:83-92).
        self.video_norm = LayerNormTF(name="video_norm")
        # Shared visual feature projection (tied into MFM head).
        self.feature_proj = FeatureProjection(
            video_dim=c.video_dim,
            hidden_size=c.visual.hidden_size,
            initializer_range=c.visual.initializer_range,
            dtype=dtype,
            name="feature_proj",
        )

        kw = dict(
            dtype=dtype,
            use_pallas=c.use_pallas,
            use_train_pallas=c.use_train_pallas,
            use_fused_ffn=c.use_fused_ffn,
            fused_qkv=c.fused_qkv,
            remat=c.remat,
            scan_layers=c.scan_layers,
            seq_shard=c.sequence_parallel,
        )
        self.text = TextEncoder(
            c.bert, self.word_embed, self.text_pos_embed, name="text", **kw
        )
        self.visual = VisualEncoder(
            c.visual, self.feature_proj, name="visual", **kw
        )

        self.has_cross = c.stage_two or c.train_sim_after_cross
        self.has_decoder = c.stage_two and not c.train_sim_after_cross
        if self.has_cross:
            self.cross = CrossEncoder(c.cross, name="cross", **kw)
            self.similarity_dense = nn.Dense(
                1,
                kernel_init=nn.initializers.normal(stddev=c.bert.initializer_range),
                param_dtype=jnp.float32,
                dtype=dtype,
                name="similarity_dense",
            )
        if self.has_decoder:
            self.decoder = CaptionDecoder(
                c.decoder,
                self.word_embed,
                self.text_pos_embed,
                dtype=dtype,
                use_pallas=c.use_pallas,
                name="decoder",
            )
        if c.do_pretrain and c.stage_two:
            self.mlm_head = TiedLMHead(
                c.bert.hidden_size, c.bert.vocab_size, c.bert.hidden_act,
                c.bert.initializer_range, dtype, name="mlm_head",
            )
            self.mfm_head = TiedVisualHead(
                c.visual.hidden_size, c.video_dim, c.visual.hidden_act,
                c.visual.initializer_range, dtype, name="mfm_head",
            )

    # ------------------------------------------------------------------ #
    # Encoding
    # ------------------------------------------------------------------ #
    def normalize_video(self, video: jax.Array) -> jax.Array:
        """LayerNorm over raw feature dim; flattens pair dims
        (reference: modeling.py:83-92)."""
        video = video.astype(jnp.float32)
        video = video.reshape(-1, video.shape[-2], video.shape[-1])
        return self.video_norm(video)

    def encode(
        self,
        input_ids: jax.Array,
        token_type_ids: jax.Array,
        attention_mask: jax.Array,
        video: jax.Array,
        video_mask: jax.Array,
        deterministic: bool = True,
        video_normalized: bool = False,
    ):
        """Text + visual encoders (reference: modeling.py:299-313)."""
        if not video_normalized:
            video = self.normalize_video(video)
        seq_out = self.text(
            input_ids, token_type_ids, attention_mask, deterministic=deterministic
        )
        vis_out = self.visual(video, video_mask, deterministic=deterministic)
        return seq_out, vis_out

    def encode_text(
        self,
        input_ids: jax.Array,
        token_type_ids: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Text tower only — serving path (queries arrive without video)."""
        return self.text(
            input_ids, token_type_ids, attention_mask, deterministic=deterministic
        )

    def encode_video(
        self,
        video: jax.Array,
        video_mask: jax.Array,
        deterministic: bool = True,
        video_normalized: bool = False,
    ) -> jax.Array:
        """Visual tower only — serving path (index build without text)."""
        if not video_normalized:
            video = self.normalize_video(video)
        return self.visual(video, video_mask, deterministic=deterministic)

    def get_cross_output(
        self,
        sequence_output: jax.Array,
        visual_output: jax.Array,
        attention_mask: jax.Array,
        video_mask: jax.Array,
        deterministic: bool = True,
    ):
        """Fusion encoder over [text ; video] (reference: modeling.py:315-325)."""
        concat_features = jnp.concatenate([sequence_output, visual_output], axis=1)
        concat_mask = jnp.concatenate([attention_mask, video_mask], axis=1)
        concat_type = jnp.concatenate(
            [jnp.zeros_like(attention_mask), jnp.ones_like(video_mask)], axis=1
        ).astype(jnp.int32)
        cross_out, pooled = self.cross(
            concat_features, concat_type, concat_mask, deterministic=deterministic
        )
        return cross_out, pooled, concat_mask

    # ------------------------------------------------------------------ #
    # Similarity
    # ------------------------------------------------------------------ #
    @staticmethod
    def mean_pool(
        sequence_output: jax.Array,
        visual_output: jax.Array,
        attention_mask: jax.Array,
        video_mask: jax.Array,
    ):
        """Masked mean pooling; text excludes CLS (reference: modeling.py:327-339)."""
        am = jnp.asarray(attention_mask).astype(jnp.float32)[:, :, None]
        am = am.at[:, 0, :].set(0.0)
        text_out = jnp.sum(sequence_output.astype(jnp.float32) * am, axis=1) / jnp.sum(
            am, axis=1
        )
        vm = video_mask.astype(jnp.float32)[:, :, None]
        vm_sum = jnp.sum(vm, axis=1)
        vm_sum = jnp.where(vm_sum == 0.0, 1.0, vm_sum)
        video_out = (
            jnp.sum(visual_output.astype(jnp.float32) * vm, axis=1) / vm_sum
        )
        return text_out, video_out

    def joint_similarity(
        self,
        sequence_output: jax.Array,
        visual_output: jax.Array,
        attention_mask: jax.Array,
        video_mask: jax.Array,
    ) -> jax.Array:
        """Mean-pool dot-product similarity (reference: modeling.py:384-389)."""
        text_out, video_out = self.mean_pool(
            sequence_output, visual_output, attention_mask, video_mask
        )
        if not self.cfg.use_mil:
            text_out = text_out / jnp.linalg.norm(text_out, axis=-1, keepdims=True)
            video_out = video_out / jnp.linalg.norm(video_out, axis=-1, keepdims=True)
        return text_out @ video_out.T

    def cross_similarity(
        self,
        sequence_output: jax.Array,
        visual_output: jax.Array,
        attention_mask: jax.Array,
        video_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """All-pairs cross-encoder similarity [Bt, Bv]
        (reference: modeling.py:341-375).

        The reference loops over 5-row chunks to bound GPU memory; on TPU we
        run the full Bt x Bv block in one batched pass (static shapes, MXU
        friendly). Eval-time chunking happens in the eval driver instead.
        """
        b_text, s_text, h = sequence_output.shape
        b_visual, s_visual, _ = visual_output.shape

        seq_l = jnp.repeat(sequence_output, b_visual, axis=0)
        am_l = jnp.repeat(attention_mask, b_visual, axis=0)
        vis_r = jnp.tile(visual_output, (b_text, 1, 1))
        vm_r = jnp.tile(video_mask, (b_text, 1))

        _, pooled, _ = self.get_cross_output(
            seq_l, vis_r, am_l, vm_r, deterministic=deterministic
        )
        logits = self.similarity_dense(pooled)
        return logits.reshape(b_text, b_visual).astype(jnp.float32)

    def cross_similarity_pairs(
        self,
        sequence_output: jax.Array,
        visual_output: jax.Array,
        attention_mask: jax.Array,
        video_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Row-ALIGNED cross-encoder similarity [N] (serving rerank path:
        score pre-paired (text, candidate) rows without the all-pairs
        repeat of cross_similarity)."""
        _, pooled, _ = self.get_cross_output(
            sequence_output, visual_output, attention_mask, video_mask,
            deterministic=deterministic,
        )
        return self.similarity_dense(pooled)[:, 0].astype(jnp.float32)

    def similarity_logits(
        self,
        sequence_output: jax.Array,
        visual_output: jax.Array,
        attention_mask: jax.Array,
        video_mask: jax.Array,
        pretrain_joint: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        """Routing per reference modeling.py:377-391."""
        if (self.cfg.stage_two and not pretrain_joint) or self.cfg.train_sim_after_cross:
            return self.cross_similarity(
                sequence_output, visual_output, attention_mask, video_mask,
                deterministic=deterministic,
            )
        return self.joint_similarity(
            sequence_output, visual_output, attention_mask, video_mask
        )

    # ------------------------------------------------------------------ #
    # Decoder
    # ------------------------------------------------------------------ #
    def decoder_logits(
        self,
        sequence_output: jax.Array,
        visual_output: jax.Array,
        attention_mask: jax.Array,
        video_mask: jax.Array,
        input_caption_ids: jax.Array,
        decoder_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Cross-encode once, then decode (reference: modeling.py:393-407)."""
        cross_out, _, concat_mask = self.get_cross_output(
            sequence_output, visual_output, attention_mask, video_mask,
            deterministic=deterministic,
        )
        return self.decoder(
            input_caption_ids, cross_out, decoder_mask, concat_mask,
            deterministic=deterministic,
        )

    def decode_step_logits(
        self,
        cross_out: jax.Array,
        concat_mask: jax.Array,
        input_caption_ids: jax.Array,
        decoder_mask: jax.Array,
    ) -> jax.Array:
        """Decoder on a precomputed cross output — the beam-search hot path.

        The reference recomputes the cross encoder every decode step
        (modeling.py:404); here callers hoist it.
        """
        return self.decoder(
            input_caption_ids, cross_out, decoder_mask, concat_mask,
            deterministic=True,
        )

    # ------------------------------------------------------------------ #
    # Training forward: returns dict of losses
    # ------------------------------------------------------------------ #
    def _sim_stage_loss(self, sim_matrix: jax.Array) -> jax.Array:
        """loss_fct routing (reference: modeling.py:179-184)."""
        c = self.cfg
        if c.stage_two:
            return L.cross_en_loss(sim_matrix)
        if c.use_mil:
            return L.milnce_loss(sim_matrix, c.batch_size_per_device, c.n_pair)
        return L.max_margin_ranking_loss(
            sim_matrix,
            margin=c.margin,
            negative_weighting=c.negative_weighting,
            batch_size=c.batch_size_per_device,
            n_pair=c.n_pair,
            hard_negative_rate=c.hard_negative_rate,
        )

    def _pretrain_sim_loss(self, sim_matrix: jax.Array) -> jax.Array:
        c = self.cfg
        if c.use_mil:
            return L.milnce_loss(sim_matrix, c.batch_size_per_device, c.n_pair)
        return L.max_margin_ranking_loss(
            sim_matrix,
            margin=c.margin,
            negative_weighting=c.negative_weighting,
            batch_size=c.batch_size_per_device,
            n_pair=c.n_pair,
            hard_negative_rate=c.hard_negative_rate,
        )

    def __call__(self, batch: Dict[str, jax.Array], deterministic: bool = False):
        """Training forward (reference: modeling.py:188-271).

        ``batch`` keys mirror the reference dataloader tuple names; any pair
        dims are flattened to [B*, L].
        """
        c = self.cfg

        def flat2(x):
            return x.reshape(-1, x.shape[-1])

        input_ids = flat2(batch["input_ids"])
        token_type_ids = flat2(batch["token_type_ids"]).astype(jnp.int32)
        attention_mask = flat2(batch["attention_mask"])
        video = self.normalize_video(batch["video"])
        video_mask = flat2(batch["video_mask"])

        seq_out, vis_out = self.encode(
            input_ids, token_type_ids, attention_mask, video, video_mask,
            deterministic=deterministic, video_normalized=True,
        )

        out: Dict[str, jax.Array] = {}
        total = 0.0

        if c.stage_one:
            sim = self.similarity_logits(
                seq_out, vis_out, attention_mask, video_mask,
                deterministic=deterministic,
            )
            out["sim_loss"] = self._sim_stage_loss(sim)
            total += out["sim_loss"]

        if c.stage_two:
            seq_alm = vis_alm = None
            if c.do_pretrain:
                masked_text = flat2(batch["masked_text"])
                token_labels = flat2(batch["token_labels"])
                masked_video = self.normalize_video(batch["masked_video"])
                video_labels_index = flat2(batch["video_labels_index"])

                seq_alm, vis_alm = self.encode(
                    masked_text, token_type_ids, attention_mask,
                    masked_video, video_mask,
                    deterministic=deterministic, video_normalized=True,
                )
                cross_out, _, _ = self.get_cross_output(
                    seq_alm, vis_alm, attention_mask, video_mask,
                    deterministic=deterministic,
                )
                lt = attention_mask.shape[-1]
                seq_cross = cross_out[:, :lt]
                vis_cross = cross_out[:, lt:]

                mlm_logits = self.mlm_head(seq_cross, self.word_embed.embedding)
                out["alm_loss"] = L.masked_cross_entropy(mlm_logits, token_labels)
                total += out["alm_loss"]

                mfm_scores = self.mfm_head(vis_cross, self.feature_proj.kernel)
                out["nce_loss"] = L.mfm_nce_loss(
                    mfm_scores, video, video_mask, video_labels_index
                )
                total += out["nce_loss"]

                sim_joint = self.similarity_logits(
                    seq_out, vis_out, attention_mask, video_mask,
                    pretrain_joint=True, deterministic=deterministic,
                )
                out["sim_loss_joint"] = self._pretrain_sim_loss(sim_joint)
                total += out["sim_loss_joint"]

            if "input_caption_ids" in batch and batch["input_caption_ids"] is not None:
                if c.do_pretrain or c.task_type == "caption":
                    input_caption_ids = flat2(batch["input_caption_ids"])
                    decoder_mask = flat2(batch["decoder_mask"])
                    output_caption_ids = flat2(batch["output_caption_ids"])
                    src_seq = seq_alm if c.do_pretrain else seq_out
                    src_vis = vis_alm if c.do_pretrain else vis_out
                    dec_logits = self.decoder_logits(
                        src_seq, src_vis, attention_mask, video_mask,
                        input_caption_ids, decoder_mask,
                        deterministic=deterministic,
                    )
                    out["decoder_loss"] = L.masked_cross_entropy(
                        dec_logits, output_caption_ids
                    )
                    total += out["decoder_loss"]

            if c.do_pretrain or c.task_type == "retrieval":
                src_seq = seq_alm if c.do_pretrain else seq_out
                src_vis = vis_alm if c.do_pretrain else vis_out
                sim_tv = self.similarity_logits(
                    src_seq, src_vis, attention_mask, video_mask,
                    deterministic=deterministic,
                )
                out["sim_loss_text_visual"] = L.cross_en_loss(sim_tv)
                total += out["sim_loss_text_visual"]

        out["loss"] = total
        return out

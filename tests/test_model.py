"""End-to-end forward tests for the UniVL assembly on tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.config import UniVLConfig
from univl_tpu.models.univl import UniVL


def make_batch(cfg, rng, with_caption=False, with_pretrain=False):
    B = cfg.batch_size_per_device
    Lw, Lf, D = cfg.max_words, cfg.max_frames, cfg.video_dim
    batch = {
        "input_ids": rng.randint(0, cfg.bert.vocab_size, (B, Lw)).astype(np.int32),
        "token_type_ids": np.zeros((B, Lw), np.int32),
        "attention_mask": np.ones((B, Lw), np.int32),
        "video": rng.randn(B, Lf, D).astype(np.float32),
        "video_mask": np.ones((B, Lf), np.int32),
    }
    if with_caption:
        batch.update(
            input_caption_ids=rng.randint(0, cfg.bert.vocab_size, (B, Lw)).astype(np.int32),
            decoder_mask=np.ones((B, Lw), np.int32),
            output_caption_ids=rng.randint(0, cfg.bert.vocab_size, (B, Lw)).astype(np.int32),
        )
    if with_pretrain:
        batch.update(
            masked_text=batch["input_ids"].copy(),
            token_labels=np.where(
                rng.rand(B, Lw) < 0.15,
                rng.randint(0, cfg.bert.vocab_size, (B, Lw)),
                -1,
            ).astype(np.int32),
            masked_video=batch["video"].copy(),
            video_labels_index=np.where(
                rng.rand(B, Lf) < 0.15, np.arange(Lf)[None, :], -1
            ).astype(np.int32),
        )
    return {k: jnp.asarray(v) for k, v in batch.items()}


def init_and_forward(cfg, batch):
    model = UniVL(cfg)
    params = model.init(jax.random.key(0), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True)
    return model, params, out


def test_stage_one_retrieval_forward(rng):
    cfg = UniVLConfig.tiny()
    batch = make_batch(cfg, rng)
    _, _, out = init_and_forward(cfg, batch)
    assert "sim_loss" in out
    assert np.isfinite(float(out["loss"]))


def test_stage_one_ft_align_forward(rng):
    cfg = UniVLConfig.tiny(train_sim_after_cross=True)
    batch = make_batch(cfg, rng)
    _, _, out = init_and_forward(cfg, batch)
    assert np.isfinite(float(out["loss"]))


def test_stage_two_caption_forward(rng):
    cfg = UniVLConfig.tiny(stage_two=True, task_type="caption")
    batch = make_batch(cfg, rng, with_caption=True)
    _, _, out = init_and_forward(cfg, batch)
    assert "decoder_loss" in out
    assert np.isfinite(float(out["loss"]))


def test_stage_two_pretrain_forward(rng):
    cfg = UniVLConfig.tiny(stage_two=True, do_pretrain=True, use_mil=True)
    batch = make_batch(cfg, rng, with_caption=True, with_pretrain=True)
    _, _, out = init_and_forward(cfg, batch)
    for k in ("alm_loss", "nce_loss", "sim_loss_joint", "decoder_loss",
              "sim_loss_text_visual"):
        assert k in out, k
        assert np.isfinite(float(out[k])), k


def test_mean_pool_excludes_cls(rng):
    cfg = UniVLConfig.tiny()
    B, L, H = 2, 4, 8
    seq = rng.randn(B, L, H).astype(np.float32)
    vis = rng.randn(B, 3, H).astype(np.float32)
    am = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], np.float32)
    vm = np.array([[1, 1, 0], [0, 0, 0]], np.float32)
    text_out, video_out = UniVL.mean_pool(
        jnp.asarray(seq), jnp.asarray(vis), jnp.asarray(am), jnp.asarray(vm)
    )
    # text: CLS (pos 0) excluded
    expect0 = seq[0, 1:3].mean(0)
    np.testing.assert_allclose(np.asarray(text_out)[0], expect0, rtol=1e-5)
    expect1 = seq[1, 1:2].mean(0)
    np.testing.assert_allclose(np.asarray(text_out)[1], expect1, rtol=1e-5)
    # video row with empty mask: zero-guard, no NaN
    np.testing.assert_allclose(np.asarray(video_out)[1], np.zeros(H), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(video_out)[0], vis[0, :2].mean(0), rtol=1e-5
    )


def test_similarity_logits_square(rng):
    cfg = UniVLConfig.tiny()
    batch = make_batch(cfg, rng)
    model = UniVL(cfg)
    params = model.init(jax.random.key(0), batch, deterministic=True)
    seq, vis = model.apply(
        params,
        batch["input_ids"], batch["token_type_ids"], batch["attention_mask"],
        batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    sim = model.apply(
        params, seq, vis, batch["attention_mask"], batch["video_mask"],
        method=UniVL.similarity_logits,
    )
    B = cfg.batch_size_per_device
    assert sim.shape == (B, B)
    # normalized similarity bounded by 1
    assert float(jnp.max(jnp.abs(sim))) <= 1.0 + 1e-5


def test_train_mode_with_dropout_runs(rng):
    cfg = UniVLConfig.tiny()
    batch = make_batch(cfg, rng)
    model = UniVL(cfg)
    params = model.init(jax.random.key(0), batch, deterministic=True)
    out = model.apply(
        params, batch, deterministic=False,
        rngs={"dropout": jax.random.key(42)},
    )
    assert np.isfinite(float(out["loss"]))


def test_stage_two_retrieval_forward(rng):
    """Stage-two retrieval finetune: CrossEn over cross-encoder similarity
    (reference modeling.py:256-267 with task_type=retrieval)."""
    cfg = UniVLConfig.tiny(stage_two=True, task_type="retrieval")
    batch = make_batch(cfg, rng)
    _, _, out = init_and_forward(cfg, batch)
    assert "sim_loss_text_visual" in out
    assert np.isfinite(float(out["loss"]))


def test_random_config_fuzz(rng):
    """Forward passes across randomized tiny architectures (shape fuzz)."""
    from univl_tpu.config import (
        BertConfig, CrossConfig, DecoderConfig, UniVLConfig, VisualConfig,
    )

    for trial in range(6):
        heads = int(rng.choice([1, 2, 4]))
        hidden = heads * int(rng.choice([8, 16]))
        enc = dict(hidden_size=hidden, num_hidden_layers=int(rng.randint(1, 3)),
                   num_attention_heads=heads,
                   intermediate_size=int(rng.choice([32, 64])))
        lw = int(rng.randint(4, 20))
        lf = int(rng.randint(2, 16))
        vd = int(rng.choice([8, 24]))
        cfg = UniVLConfig(
            bert=BertConfig(vocab_size=64, **enc),
            visual=VisualConfig(vocab_size=vd, **enc),
            cross=CrossConfig(vocab_size=hidden, max_position_embeddings=1024, **enc),
            decoder=DecoderConfig(vocab_size=64, num_decoder_layers=1, **enc),
            max_words=lw, max_frames=lf, video_dim=vd,
            stage_two=bool(rng.randint(0, 2)), task_type="caption",
            batch_size_per_device=int(rng.randint(1, 4)),
            use_pallas=False,
        ).validate()
        batch = make_batch(cfg, rng, with_caption=cfg.stage_two)
        _, _, out = init_and_forward(cfg, batch)
        assert np.isfinite(float(out["loss"])), (trial, cfg)

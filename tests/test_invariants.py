"""Property tests: padded/masked positions must not influence valid outputs.

These catch mask-wiring bugs that unit parity tests can miss (SURVEY §4:
the reference's only data-contract checks are inline padding asserts).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.config import UniVLConfig
from univl_tpu.models.univl import UniVL

from test_model import make_batch


@pytest.fixture(scope="module")
def setup():
    cfg = UniVLConfig.tiny(stage_two=True, task_type="caption")
    rng = np.random.RandomState(0)
    model = UniVL(cfg)
    batch = make_batch(cfg, rng, with_caption=True)
    params = model.init(jax.random.key(0), batch, deterministic=True)
    return cfg, model, params


def _batch_with_padding(cfg, rng, n_valid_text=5, n_valid_video=4):
    b = make_batch(cfg, rng)
    B, Lw, Lf = cfg.batch_size_per_device, cfg.max_words, cfg.max_frames
    am = np.zeros((B, Lw), np.int32)
    am[:, :n_valid_text] = 1
    vm = np.zeros((B, Lf), np.int32)
    vm[:, :n_valid_video] = 1
    b["attention_mask"] = jnp.asarray(am)
    b["video_mask"] = jnp.asarray(vm)
    return b


def test_text_encoder_ignores_padded_tokens(setup, rng):
    cfg, model, params = setup
    b = _batch_with_padding(cfg, rng)
    seq1, vis1 = model.apply(
        params, b["input_ids"], b["token_type_ids"], b["attention_mask"],
        b["video"], b["video_mask"], method=UniVL.encode,
    )
    # scramble token ids and video features in the PADDED region only
    ids2 = np.asarray(b["input_ids"]).copy()
    ids2[:, 5:] = (ids2[:, 5:] + 7) % cfg.bert.vocab_size
    vid2 = np.asarray(b["video"]).copy()
    vid2[:, 4:] = vid2[:, 4:] * -3.0 + 1.0
    seq2, vis2 = model.apply(
        params, jnp.asarray(ids2), b["token_type_ids"], b["attention_mask"],
        jnp.asarray(vid2), b["video_mask"], method=UniVL.encode,
    )
    # valid positions unchanged
    np.testing.assert_allclose(
        np.asarray(seq1)[:, :5], np.asarray(seq2)[:, :5], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(vis1)[:, :4], np.asarray(vis2)[:, :4], rtol=1e-5, atol=1e-5
    )


def test_similarity_ignores_padding(setup, rng):
    cfg, model, params = setup
    b = _batch_with_padding(cfg, rng)

    def sim(ids, vid):
        seq, vis = model.apply(
            params, ids, b["token_type_ids"], b["attention_mask"],
            vid, b["video_mask"], method=UniVL.encode,
        )
        return np.asarray(model.apply(
            params, seq, vis, b["attention_mask"], b["video_mask"],
            method=UniVL.joint_similarity,
        ))

    s1 = sim(b["input_ids"], b["video"])
    ids2 = np.asarray(b["input_ids"]).copy()
    ids2[:, 5:] = 1
    vid2 = np.asarray(b["video"]).copy()
    vid2[:, 4:] = 99.0
    s2 = sim(jnp.asarray(ids2), jnp.asarray(vid2))
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_decoder_causality(setup, rng):
    """Changing future caption tokens must not change earlier logits."""
    cfg, model, params = setup
    b = make_batch(cfg, rng, with_caption=True)
    seq, vis = model.apply(
        params, b["input_ids"], b["token_type_ids"], b["attention_mask"],
        b["video"], b["video_mask"], method=UniVL.encode,
    )
    logits1 = np.asarray(model.apply(
        params, seq, vis, b["attention_mask"], b["video_mask"],
        b["input_caption_ids"], b["decoder_mask"], method=UniVL.decoder_logits,
    ))
    cap2 = np.asarray(b["input_caption_ids"]).copy()
    t_split = 6
    cap2[:, t_split:] = (cap2[:, t_split:] + 13) % cfg.decoder.vocab_size
    logits2 = np.asarray(model.apply(
        params, seq, vis, b["attention_mask"], b["video_mask"],
        jnp.asarray(cap2), b["decoder_mask"], method=UniVL.decoder_logits,
    ))
    np.testing.assert_allclose(
        logits1[:, :t_split], logits2[:, :t_split], rtol=1e-4, atol=1e-4
    )
    assert np.abs(logits1[:, t_split:] - logits2[:, t_split:]).max() > 1e-3


def test_cross_encoder_ignores_padding(setup, rng):
    cfg, model, params = setup
    b = _batch_with_padding(cfg, rng)
    seq, vis = model.apply(
        params, b["input_ids"], b["token_type_ids"], b["attention_mask"],
        b["video"], b["video_mask"], method=UniVL.encode,
    )
    _, pooled1, _ = model.apply(
        params, seq, vis, b["attention_mask"], b["video_mask"],
        method=UniVL.get_cross_output,
    )
    # perturb encoder outputs at padded positions only
    seq2 = np.asarray(seq).copy()
    seq2[:, 5:] += 42.0
    vis2 = np.asarray(vis).copy()
    vis2[:, 4:] -= 17.0
    _, pooled2, _ = model.apply(
        params, jnp.asarray(seq2), jnp.asarray(vis2),
        b["attention_mask"], b["video_mask"], method=UniVL.get_cross_output,
    )
    np.testing.assert_allclose(
        np.asarray(pooled1), np.asarray(pooled2), rtol=1e-5, atol=1e-5
    )

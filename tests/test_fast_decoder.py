"""KV-cache incremental decoder parity vs the full-prefix flax decoder."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.config import UniVLConfig
from univl_tpu.evals.beam import make_beam_decode_fn, make_fast_beam_decode_fn
from univl_tpu.evals.fast_decoder import FastDecoder
from univl_tpu.models.univl import UniVL

from test_model import make_batch


@pytest.fixture(scope="module")
def setup():
    cfg = UniVLConfig.tiny(stage_two=True, task_type="caption")
    rng = np.random.RandomState(0)
    model = UniVL(cfg)
    batch = make_batch(cfg, rng, with_caption=True)
    params = model.init(jax.random.key(0), batch, deterministic=True)
    seq, vis = model.apply(
        params, batch["input_ids"], batch["token_type_ids"],
        batch["attention_mask"], batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    cross_out, _, concat_mask = model.apply(
        params, seq, vis, batch["attention_mask"], batch["video_mask"],
        method=UniVL.get_cross_output,
    )
    return cfg, model, params, batch, seq, vis, cross_out, concat_mask


def test_step_logits_match_full_prefix(setup):
    """Step-by-step incremental logits == full-prefix decoder logits at
    every position, for a random teacher-forced sequence."""
    cfg, model, params, batch, seq, vis, cross_out, concat_mask = setup
    B = cross_out.shape[0]
    L = 10
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, cfg.decoder.vocab_size, (B, L)).astype(np.int32)
    dec_mask = np.ones((B, L), np.int32)

    full_logits = np.asarray(model.apply(
        params, cross_out, concat_mask,
        jnp.asarray(tokens), jnp.asarray(dec_mask),
        method=UniVL.decode_step_logits,
    ))

    fd = FastDecoder(cfg.decoder, params["params"])
    enc_kv = fd.precompute_enc_kv(cross_out)
    enc_bias = ((1.0 - np.asarray(concat_mask, np.float32)) * -10000.0)[:, None, None, :]
    cache = fd.init_cache(B, L)
    for t in range(L):
        logits_t, cache = fd.step(
            jnp.asarray(tokens[:, t]), jnp.asarray(t), cache,
            enc_kv, jnp.asarray(enc_bias),
        )
        np.testing.assert_allclose(
            np.asarray(logits_t), full_logits[:, t], rtol=2e-4, atol=2e-4,
            err_msg=f"step {t}",
        )


def test_fast_beam_matches_full_beam(setup):
    cfg, model, params, batch, seq, vis, _, _ = setup
    for K in (1, 5):
        slow = make_beam_decode_fn(model, K, 12, bos_id=2, eos_id=3)
        fast = make_fast_beam_decode_fn(model, K, 12, bos_id=2, eos_id=3)
        t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
        t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_fast_beam_fused_vocab_in_kernel_cls_matches_full_beam(setup, monkeypatch):
    """UNIVL_TPU_FUSED_CLS=1 (opt-in, rejected-as-default round 5) runs
    the classifier transform inside the vocab kernel — must still match
    the full-prefix beam. The default (transform in XLA) is covered by
    the other fused_vocab tests."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.setenv("UNIVL_TPU_FUSED_CLS", "1")
    slow = make_beam_decode_fn(model, 4, 12, bos_id=2, eos_id=3)
    fast = make_fast_beam_decode_fn(model, 4, 12, bos_id=2, eos_id=3,
                                    fused_vocab=True)
    t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_fused_vocab_in_kernel_cls_composes_with_fused_decode(setup, monkeypatch):
    """FUSED_CLS=1 + both decode kernels: step_fused's return_hidden='raw'
    branch (raw hidden emitted after the deferred-permutation fused
    attention) feeding the in-kernel transform must match the full-prefix
    beam."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.setenv("UNIVL_TPU_FUSED_CLS", "1")
    slow = make_beam_decode_fn(model, 3, 12, bos_id=2, eos_id=3)
    fast = make_fast_beam_decode_fn(model, 3, 12, bos_id=2, eos_id=3,
                                    fused_decode=True, fused_vocab=True)
    t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_fused_cls_without_fused_vocab_warns(setup, monkeypatch):
    """UNIVL_TPU_FUSED_CLS=1 without the vocab kernel is ignored — the
    build must say so instead of silently comparing identical programs."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.setenv("UNIVL_TPU_FUSED_CLS", "1")
    with pytest.warns(UserWarning, match="FUSED_CLS"):
        make_fast_beam_decode_fn(model, 3, 8, bos_id=2, eos_id=3,
                                 fused_vocab=False)


def test_fast_beam_unfused_qkv_matches_full_beam(setup, monkeypatch):
    """UNIVL_TPU_DECODE_FUSED_QKV=0 restores the three per-projection
    GEMMs in place of the default fused [Hid, 3*Hid] one
    (evals/fast_decoder.py precompute_qkv, round 5) — both must match
    the full-prefix beam."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.setenv("UNIVL_TPU_DECODE_FUSED_QKV", "0")
    slow = make_beam_decode_fn(model, 4, 12, bos_id=2, eos_id=3)
    fast = make_fast_beam_decode_fn(model, 4, 12, bos_id=2, eos_id=3)
    t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("unroll", [2, 3, 8])
def test_fast_beam_unrolled_matches_full_beam(setup, monkeypatch, unroll):
    """UNIVL_TPU_DECODE_UNROLL=U (U decode steps per while_loop iteration,
    evals/beam.py) must produce the full-prefix beam's hypotheses exactly:
    step() is deterministic and done-freezing masks sub-steps after all
    instances finish. U=3 leaves a remainder step per bucket; U=8 exceeds
    the 12-step budget minus warmup, exercising the remainder-only path."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.setenv("UNIVL_TPU_DECODE_UNROLL", str(unroll))
    slow = make_beam_decode_fn(model, 4, 12, bos_id=2, eos_id=3)
    fast = make_fast_beam_decode_fn(model, 4, 12, bos_id=2, eos_id=3)
    t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_sharded_caption_generation_matches_single(setup, tmp_path):
    """Mesh-sharded beam decode must produce identical captions."""
    from univl_tpu.data import fixtures
    from univl_tpu.data.tokenization import WordPieceTokenizer
    from univl_tpu.evals.beam import CaptionGenerator
    from univl_tpu.parallel.mesh import make_mesh

    cfg, model, params, batch, seq, vis, *_ = setup
    vocab = fixtures.make_vocab(str(tmp_path / "v.txt"))
    tok = WordPieceTokenizer(vocab)
    gen_kw = dict(beam_size=3, max_len=8, batch_size=4)

    g1 = CaptionGenerator(model, params, tok, **gen_kw)
    g2 = CaptionGenerator(model, params, tok, mesh=make_mesh(4), **gen_kw)
    # compare raw decoded token ids (model vocab > fixture tokenizer vocab,
    # so string decoding is not meaningful here)
    t1, s1 = g1._decode(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    import jax as _jax

    sharded = {
        "seq": _jax.device_put(np.asarray(seq), g2._sharding),
        "vis": _jax.device_put(np.asarray(vis), g2._sharding),
        "am": _jax.device_put(np.asarray(batch["attention_mask"]), g2._sharding),
        "vm": _jax.device_put(np.asarray(batch["video_mask"]), g2._sharding),
    }
    t2, s2 = g2._decode(params, sharded["seq"], sharded["vis"],
                        sharded["am"], sharded["vm"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_fast_beam_expanded_enc_kv_matches_full_beam(setup, monkeypatch):
    """UNIVL_TPU_SHARED_ENC_KV=0 restores the beam-EXPANDED encoder-K/V
    layout ([B*K, H, Lenc, D], Lq=1) in place of the default beam-shared
    one ([B, H, Lenc, D], Lq=K; evals/beam.py round 4) — both must match
    the full-prefix beam."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.setenv("UNIVL_TPU_SHARED_ENC_KV", "0")
    slow = make_beam_decode_fn(model, 4, 12, bos_id=2, eos_id=3)
    fast = make_fast_beam_decode_fn(model, 4, 12, bos_id=2, eos_id=3)
    t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_fast_beam_matches_full_beam_fused_ln(setup, monkeypatch):
    """The opt-in UNIVL_TPU_FUSED_LN=1 Pallas-LayerNorm swap must preserve
    the KV-cache <-> full-prefix bit-identity invariant (CLAUDE.md): the
    fast decoder's _ln mirrors LayerNormTF's dispatch, so both paths run
    the same kernel. Interpret mode stands in for the TPU lowering on CPU
    (exact f32, same math)."""
    from jax.experimental import pallas as pl  # noqa: F401  (plugin load)
    from jax.experimental.pallas import tpu as pltpu

    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.setenv("UNIVL_TPU_FUSED_LN", "1")
    with pltpu.force_tpu_interpret_mode():
        slow = make_beam_decode_fn(model, 3, 12, bos_id=2, eos_id=3)
        fast = make_fast_beam_decode_fn(model, 3, 12, bos_id=2, eos_id=3)
        t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
        t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("max_len", [20, 32, 33, 48, 70])
def test_bucketed_cache_parity_at_boundaries(setup, max_len):
    """The bucketed-cache fast decoder must match the fixed-cache full-prefix
    beam at every max_len around the 32/64 bucket boundaries (buckets:
    20 -> [20]; 32 -> [32]; 33 -> [32,33]; 48 -> [32,48]; 70 -> [32,64,70])."""
    from univl_tpu.evals.beam import _cache_buckets

    cfg, model, params, batch, seq, vis, cross_out, concat_mask = setup
    assert _cache_buckets(33) == [32, 33]
    assert _cache_buckets(70) == [32, 64, 70]
    assert _cache_buckets(20) == [20]

    slow = make_beam_decode_fn(model, 3, max_len, bos_id=1, eos_id=2)
    fast = make_fast_beam_decode_fn(model, 3, max_len, bos_id=1, eos_id=2)
    args = (params, seq, vis, batch["attention_mask"], batch["video_mask"])
    ts, ss = slow(*args)
    tf, sf = fast(*args)
    np.testing.assert_array_equal(np.asarray(ts), np.asarray(tf))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(sf), atol=1e-4)


def test_fused_decode_attention_kernel_matches_oracle():
    """kernels/decode_attention.py (interpret mode, exact f32) ==
    reorder-then-update-then-attend composed from plain jnp ops — the
    exact semantics fast_decoder.step + the grouped reorder produce."""
    from univl_tpu.kernels.decode_attention import beam_decode_self_attention

    B, K, H, L, D = 3, 5, 2, 16, 8
    N = B * K
    rng = np.random.RandomState(0)
    q = rng.randn(N, H, D).astype(np.float32)
    kn = rng.randn(N, H, D).astype(np.float32)
    vn = rng.randn(N, H, D).astype(np.float32)
    t = 6
    # valid history at positions < t, zeros at >= t (cache invariant)
    kc = np.zeros((N, H, L, D), np.float32)
    vc = np.zeros((N, H, L, D), np.float32)
    kc[:, :, :t, :] = rng.randn(N, H, t, D)
    vc[:, :, :t, :] = rng.randn(N, H, t, D)
    prev_k = rng.randint(0, K, (N,)).astype(np.int32)
    scale = 1.0 / np.sqrt(D)

    ctx, ko, vo = beam_decode_self_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(prev_k),
        jnp.asarray(t, jnp.int32), K, scale=float(scale), interpret=True,
    )

    # oracle: grouped row gather, position-t update, masked attention
    src = (np.arange(N) // K) * K + prev_k
    ko_ref = kc[src].copy()
    vo_ref = vc[src].copy()
    ko_ref[:, :, t, :] = kn
    vo_ref[:, :, t, :] = vn
    scores = np.einsum("nhd,nhld->nhl", q, ko_ref) * scale
    scores = np.where(np.arange(L)[None, None, :] <= t, scores, -1e9)
    scores = scores - scores.max(-1, keepdims=True)
    probs = np.exp(scores)
    probs /= probs.sum(-1, keepdims=True)
    ctx_ref = np.einsum("nhl,nhld->nhd", probs, vo_ref)

    np.testing.assert_allclose(np.asarray(ko), ko_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vo), vo_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ctx), ctx_ref, atol=1e-5, rtol=1e-5)


def test_effective_gpb_semantics():
    """kernels/decode_attention.effective_gpb: 0/negative clamps to 1
    (UNIVL_TPU_*=0-means-off convention — requesting 0 used to raise
    ZeroDivisionError), non-dividing batches fall back to 1, and the
    scoped-VMEM guard halves big requests (gpb=4 at L=128 failed AOT
    compile at scoped 75.25M vs the 64M limit; docs/PERF.md round-5)."""
    from univl_tpu.kernels.decode_attention import effective_gpb

    # production shapes: N=80 rows, group=5, H=12, D=64, bf16
    assert effective_gpb(0, 80, 5, 12, 32, 64, 2) == 1
    assert effective_gpb(-3, 80, 5, 12, 32, 64, 2) == 1
    assert effective_gpb(4, 80, 5, 12, 32, 64, 2) == 4   # floor keeps 4
    assert effective_gpb(4, 80, 5, 12, 64, 64, 2) == 4   # L=64 keeps 4
    assert effective_gpb(4, 80, 5, 12, 128, 64, 2) == 2  # ceiling halves
    assert effective_gpb(16, 80, 5, 12, 128, 64, 2) == 2
    assert effective_gpb(3, 80, 5, 12, 32, 64, 2) == 1   # 80 % 15 != 0
    assert effective_gpb(16, 80, 5, 12, 32, 64, 2) == 8  # 16 -> VMEM -> 8


@pytest.mark.parametrize("donate", [True, False])
def test_fused_decode_attention_gpb_bitwise(donate):
    """groups_per_block in {1, 2, 4} must be BITWISE identical (interpret
    mode): gpb only batches K-row groups into larger block DMAs — the
    group-local permutation indexing (block row j*group + idx[...]) and
    the per-row math are unchanged. Covers both the donate=True aliasing
    path (in/out cache blocks share VMEM) and donate=False. Round-4
    advisor item: gpb>1 was previously only exercised by the on-chip
    bench (tools/bench_decode_gpb.py) at 1e-3 tolerance."""
    from univl_tpu.kernels.decode_attention import beam_decode_self_attention

    B, K, H, L, D = 4, 5, 2, 16, 8
    N = B * K  # divisible by group*gpb for gpb in {1, 2, 4}
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(N, H, D).astype(np.float32))
    kn = jnp.asarray(rng.randn(N, H, D).astype(np.float32))
    vn = jnp.asarray(rng.randn(N, H, D).astype(np.float32))
    t = 7
    kc = np.zeros((N, H, L, D), np.float32)
    vc = np.zeros((N, H, L, D), np.float32)
    kc[:, :, :t, :] = rng.randn(N, H, t, D)
    vc[:, :, :t, :] = rng.randn(N, H, t, D)
    prev_k = jnp.asarray(rng.randint(0, K, (N,)).astype(np.int32))
    scale = 1.0 / np.sqrt(D)

    outs = {}
    for gpb in (1, 2, 4):
        outs[gpb] = beam_decode_self_attention(
            q, kn, vn, jnp.asarray(kc), jnp.asarray(vc), prev_k,
            jnp.asarray(t, jnp.int32), K, scale=float(scale),
            interpret=True, donate=donate, groups_per_block=gpb,
        )
    for gpb in (2, 4):
        for ref, got, name in zip(outs[1], outs[gpb], ("ctx", "k", "v")):
            np.testing.assert_array_equal(
                np.asarray(ref), np.asarray(got),
                err_msg=f"gpb={gpb} {name} differs from gpb=1",
            )


@pytest.mark.parametrize("beam,max_len", [(1, 12), (5, 12), (3, 40)])
def test_fast_beam_fused_decode_matches_full_beam(setup, monkeypatch, beam, max_len):
    """UNIVL_TPU_FUSED_DECODE (deferred-permutation fused decode attention)
    must produce the full-prefix beam's hypotheses: same tokens, scores to
    f32 tolerance. (3, 40) crosses the 32->40 bucket boundary with a
    PENDING permutation, pinning that cache growth pads the L axis without
    disturbing the deferred row permutation."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.setenv("UNIVL_TPU_FUSED_DECODE", "interpret")
    slow = make_beam_decode_fn(model, beam, max_len, bos_id=2, eos_id=3)
    fast = make_fast_beam_decode_fn(model, beam, max_len, bos_id=2, eos_id=3)
    t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_fused_decode_explicit_arg_matches_full_beam(setup, monkeypatch):
    """The --fused_decode CLI path (fused_decode=True, no env var): off-TPU
    it must run the kernel in interpret mode and still match the full-prefix
    beam, so the flag behaves identically everywhere."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.delenv("UNIVL_TPU_FUSED_DECODE", raising=False)
    slow = make_beam_decode_fn(model, 3, 12, bos_id=2, eos_id=3)
    fast = make_fast_beam_decode_fn(model, 3, 12, bos_id=2, eos_id=3,
                                    fused_decode=True)
    t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("beam,max_len", [(1, 12), (5, 12), (3, 40)])
def test_fast_beam_fused_vocab_matches_full_beam(setup, beam, max_len):
    """--fused_vocab (kernels/vocab_topk.py): the vocab-tiled classifier ->
    top-k kernel must produce the full-prefix beam's hypotheses — same
    tokens, scores to f32 tolerance. Per-row top-K of score + logp is
    monotone in the row's logits, so the K*K candidate top_k selects the
    same beams as the full K*V one."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    slow = make_beam_decode_fn(model, beam, max_len, bos_id=2, eos_id=3)
    fast = make_fast_beam_decode_fn(model, beam, max_len, bos_id=2, eos_id=3,
                                    fused_vocab=True)
    t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_fused_vocab_composes_with_fused_decode(setup, monkeypatch):
    """Both decode kernels on together (the serving default on TPU) must
    still match the full-prefix beam."""
    cfg, model, params, batch, seq, vis, _, _ = setup
    monkeypatch.delenv("UNIVL_TPU_FUSED_DECODE", raising=False)
    monkeypatch.delenv("UNIVL_TPU_FUSED_VOCAB", raising=False)
    slow = make_beam_decode_fn(model, 3, 12, bos_id=2, eos_id=3)
    fast = make_fast_beam_decode_fn(model, 3, 12, bos_id=2, eos_id=3,
                                    fused_decode=True, fused_vocab=True)
    t1, s1 = slow(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    t2, s2 = fast(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)

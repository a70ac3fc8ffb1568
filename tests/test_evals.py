"""Eval stack tests: retrieval metrics/evaluator, beam search, caption metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.config import UniVLConfig
from univl_tpu.evals.beam import CaptionGenerator, ids_to_text, make_beam_decode_fn
from univl_tpu.evals.caption_metrics import (
    bleu,
    cider_d,
    compute_caption_metrics,
    meteor,
    rouge_l,
)
from univl_tpu.evals.metrics import compute_retrieval_metrics
from univl_tpu.evals.retrieval import RetrievalEvaluator
from univl_tpu.models.univl import UniVL

from test_model import make_batch


# ------------------------------------------------------------------ #
# Retrieval metrics
# ------------------------------------------------------------------ #
def test_retrieval_metrics_identity():
    sim = np.eye(10)
    m = compute_retrieval_metrics(sim)
    assert m["R1"] == 1.0 and m["R5"] == 1.0 and m["MR"] == 1.0


def test_retrieval_metrics_known_ranks():
    # row 0: diag best (rank0); row 1: diag 2nd (rank1); row 2: diag worst (rank2)
    sim = np.array([
        [1.0, 0.5, 0.2],
        [0.9, 0.4, 0.1],
        [0.9, 0.8, 0.3],
    ])
    m = compute_retrieval_metrics(sim)
    assert m["R1"] == pytest.approx(1 / 3)
    assert m["R5"] == 1.0
    assert m["MR"] == 2.0


# ------------------------------------------------------------------ #
# Retrieval evaluator
# ------------------------------------------------------------------ #
@pytest.fixture(scope="module")
def tiny_setup():
    cfg = UniVLConfig.tiny(train_sim_after_cross=True)  # cross tower exists
    rng = np.random.RandomState(0)
    model = UniVL(cfg)
    batch = make_batch(cfg, rng)
    params = model.init(jax.random.key(0), batch, deterministic=True)
    return cfg, model, params


def _eval_batches(cfg, rng, n_batches=3, bs=4):
    for i in range(n_batches):
        b = make_batch(cfg, rng)
        yield {k: np.asarray(v) for k, v in b.items()
               if k in ("input_ids", "token_type_ids", "attention_mask",
                        "video", "video_mask")}


def test_retrieval_evaluator_joint(tiny_setup, rng):
    cfg, model, params = tiny_setup
    ev = RetrievalEvaluator(model, params, batch_size=4)
    m = ev.evaluate(_eval_batches(cfg, rng), mode="joint")
    assert set(m) >= {"R1", "R5", "R10", "MR", "MeanR"}
    assert 0.0 <= m["R1"] <= 1.0


def test_retrieval_evaluator_cross(tiny_setup, rng):
    cfg, model, params = tiny_setup
    ev = RetrievalEvaluator(model, params, batch_size=4,
                            cross_text_block=4, cross_video_block=8)
    m = ev.evaluate(_eval_batches(cfg, rng), mode="cross")
    assert 0.0 <= m["R1"] <= 1.0


def test_device_resident_rescoring_matches_host_path(tiny_setup, rng):
    """cross_sim_matrix_device (HBM-resident fori_loop stripes, the
    corpus-scale FT-Align path) == the host-bounce tile loop, including
    padded edge blocks (11 clips, tb=4, vb=8)."""
    cfg, model, params = tiny_setup
    ev = RetrievalEvaluator(model, params, batch_size=4,
                            cross_text_block=4, cross_video_block=8)
    batches = [dict(b) for b in _eval_batches(cfg, rng, n_batches=3)]
    batches[-1] = {k: v[:3] for k, v in batches[-1].items()}  # N=11, ragged
    host_enc = ev.encode_dataset(iter(batches), store_full=True)
    host = ev.cross_sim_matrix(host_enc)
    dev_enc = ev.encode_dataset_device(iter(batches))
    dev = ev.cross_sim_matrix_device(dev_enc)
    assert dev.shape == host.shape == (11, 11)
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_cross_blocking_matches_unblocked(tiny_setup, rng):
    """Tiled cross-sim must equal the single-shot model cross_similarity."""
    cfg, model, params = tiny_setup
    ev = RetrievalEvaluator(model, params, batch_size=4,
                            cross_text_block=3, cross_video_block=5)
    enc = ev.encode_dataset(_eval_batches(cfg, rng, n_batches=2))
    tiled = ev.cross_sim_matrix(enc)
    full = np.asarray(model.apply(
        params, jnp.asarray(enc["seq"]), jnp.asarray(enc["vis"]),
        jnp.asarray(enc["am"]), jnp.asarray(enc["vm"]),
        method=UniVL.cross_similarity,
    ))
    np.testing.assert_allclose(tiled, full, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ #
# Beam search
# ------------------------------------------------------------------ #
@pytest.fixture(scope="module")
def caption_setup():
    cfg = UniVLConfig.tiny(stage_two=True, task_type="caption")
    rng = np.random.RandomState(0)
    model = UniVL(cfg)
    batch = make_batch(cfg, rng, with_caption=True)
    params = model.init(jax.random.key(0), batch, deterministic=True)
    return cfg, model, params, batch


def test_beam1_equals_greedy(caption_setup):
    """Beam size 1 must equal a step-by-step greedy rollout."""
    cfg, model, params, batch = caption_setup
    B = cfg.batch_size_per_device
    max_len = 8
    bos, eos = 2, 3

    seq, vis = model.apply(
        params, batch["input_ids"], batch["token_type_ids"],
        batch["attention_mask"], batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    decode = make_beam_decode_fn(model, beam_size=1, max_len=max_len,
                                 bos_id=bos, eos_id=eos, pad_id=0)
    tokens, scores = decode(params, seq, vis,
                            batch["attention_mask"], batch["video_mask"])

    # greedy rollout oracle
    cross_out, _, concat_mask = model.apply(
        params, seq, vis, batch["attention_mask"], batch["video_mask"],
        method=UniVL.get_cross_output,
    )
    ids = np.zeros((B, max_len), np.int32)
    ids[:, 0] = bos
    done = np.zeros(B, bool)
    out = np.zeros((B, max_len - 1), np.int32)
    for t in range(1, max_len):
        mask = (np.arange(max_len) < t).astype(np.int32)[None].repeat(B, 0)
        logits = model.apply(
            params, cross_out, concat_mask, jnp.asarray(ids), jnp.asarray(mask),
            method=UniVL.decode_step_logits,
        )
        nxt = np.asarray(jnp.argmax(logits[:, t - 1], axis=-1))
        nxt = np.where(done, out[:, t - 1] * 0, nxt)
        for b in range(B):
            if not done[b]:
                ids[b, t] = nxt[b]
                out[b, t - 1] = nxt[b]
        done = done | (out[:, t - 1] == eos) | done
    got = np.asarray(tokens)
    for b in range(B):
        # compare up to and including first EOS
        g = list(got[b])
        o = list(out[b])
        end = o.index(eos) + 1 if eos in o else len(o)
        assert g[:end] == o[:end], (b, g, o)


def test_beam5_score_not_worse_than_beam1(caption_setup):
    cfg, model, params, batch = caption_setup
    seq, vis = model.apply(
        params, batch["input_ids"], batch["token_type_ids"],
        batch["attention_mask"], batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    d1 = make_beam_decode_fn(model, 1, 8, 2, 3)
    d5 = make_beam_decode_fn(model, 5, 8, 2, 3)
    _, s1 = d1(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    _, s5 = d5(params, seq, vis, batch["attention_mask"], batch["video_mask"])
    assert (np.asarray(s5) >= np.asarray(s1) - 1e-4).all()


def test_ids_to_text_wordpiece_merge(tmp_path):
    from univl_tpu.data import fixtures
    from univl_tpu.data.tokenization import WordPieceTokenizer
    vocab = fixtures.make_vocab(str(tmp_path / "vocab.txt"))
    tok = WordPieceTokenizer(vocab)
    ids = tok.convert_tokens_to_ids(["add", "##ing", "salt", "[SEP]", "add"])
    assert ids_to_text(ids, tok) == "adding salt"


# ------------------------------------------------------------------ #
# Caption metrics
# ------------------------------------------------------------------ #
def test_bleu_perfect_and_disjoint():
    refs = [["the cat sat on the mat"]]
    assert bleu(refs, ["the cat sat on the mat"])[3] == pytest.approx(1.0, abs=1e-6)
    assert bleu(refs, ["dog runs fast quickly today always"])[3] < 1e-6


def test_bleu_brevity_penalty():
    refs = [["the cat sat on the mat"]]
    short = bleu(refs, ["the cat sat"])[0]
    assert short < 1.0  # BP < 1 for short hyp
    assert short == pytest.approx(3 / 3 * np.exp(1 - 6 / 3), rel=1e-3)


def test_rouge_l_values():
    refs = [["a b c d"]]
    assert rouge_l(refs, ["a b c d"]) == pytest.approx(1.0)
    assert rouge_l(refs, ["x y z w"]) == 0.0


def test_cider_perfect():
    refs = [["the cat sat"], ["a dog runs"]]
    hyps = ["the cat sat", "a dog runs"]
    score = cider_d(refs, hyps)
    assert score > 5.0  # perfect match scores high (10 * mean cosine=1 w/ penalty)


def test_meteor_ordering():
    refs = [["the cat sat on the mat"]]
    good = meteor(refs, ["the cat sat on the mat"])
    stem = meteor(refs, ["the cats sitting on the mats"])
    bad = meteor(refs, ["quantum flux capacitor energy"])
    assert good > stem > bad
    assert bad == 0.0


def test_meteor_15_formula_fixtures():
    """Hand-computed METEOR 1.5 values (en rank parameters alpha=.85,
    beta=.2, gamma=.6, delta=.75; exact matcher w=1.0, stem w=0.6).

    Worked fixture (all-exact alignment, one dropped word, 2 chunks):
      ref 'the cat sat on the mat', hyp 'the cat on the mat'
      weighted P=1, R=2.25/3, fmean=.75/.9625, frag=2/5,
      score = fmean * (1 - .6 * .4**.2) = 0.389975...
    """
    # perfectly contiguous full alignment -> zero fragmentation -> 1.0
    assert meteor([["the cat sat"]], ["the cat sat"]) == pytest.approx(1.0)
    assert meteor(
        [["the cat sat on the mat"]], ["the cat on the mat"]
    ) == pytest.approx(0.3899751238121113, abs=1e-9)
    # stem match (Snowball 'cats'->'cat') at module weight 0.6; single
    # full-coverage chunk -> unpenalized: P=R=(1*.25+.6*.75)/1.0=0.7
    assert meteor([["the cat"]], ["the cats"]) == pytest.approx(0.7, abs=1e-9)


def test_meteor_multi_reference_picks_best():
    refs = [["a dog runs fast", "the cat sat on the mat"]]
    one = meteor([["the cat sat on the mat"]], ["the cat sat on the mat"])
    assert meteor(refs, ["the cat sat on the mat"]) == pytest.approx(one)


def test_compute_caption_metrics_keys():
    refs = [["add the onions", "add onions now"]]
    m = compute_caption_metrics(refs, ["add the onions"])
    assert set(m) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                      "METEOR", "ROUGE_L", "CIDEr"}
    assert m["Bleu_1"] == pytest.approx(1.0, abs=1e-6)


def test_sharded_evaluator_matches_single(tiny_setup, rng):
    """Mesh-sharded eval (parallel_apply equivalent) must match 1-device."""
    from univl_tpu.parallel.mesh import make_mesh

    cfg, model, params = tiny_setup
    base = RetrievalEvaluator(model, params, batch_size=4,
                              cross_text_block=2, cross_video_block=8)
    enc = base.encode_dataset(_eval_batches(cfg, rng, n_batches=2))
    sim_1 = base.cross_sim_matrix(enc)
    joint_1 = base.joint_sim_matrix(enc)

    mesh = make_mesh()
    sharded = RetrievalEvaluator(model, params, batch_size=4,
                                 cross_text_block=1, cross_video_block=8,
                                 mesh=mesh)
    rng2 = np.random.RandomState(0)
    enc_s = sharded.encode_dataset(_eval_batches(cfg, rng2, n_batches=2))
    sim_8 = sharded.cross_sim_matrix(enc_s)
    joint_8 = sharded.joint_sim_matrix(enc_s)
    np.testing.assert_allclose(joint_1, joint_8, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sim_1, sim_8, rtol=1e-4, atol=1e-5)


def test_mesh_resident_rescoring_matches_host_and_single(tiny_setup):
    """Round-4: evaluate(mode='cross') takes the device-RESIDENT path with
    or without a mesh. On the 8-device CPU mesh the resident row-stripes
    shard over dp (visual corpus replicated); the sim matrix must equal
    both the single-device resident path and the host-bounce tile loop,
    including a ragged final batch."""
    from univl_tpu.parallel.mesh import make_mesh

    cfg, model, params = tiny_setup
    rng1 = np.random.RandomState(7)
    batches = [dict(b) for b in _eval_batches(cfg, rng1, n_batches=3)]
    batches[-1] = {k: v[:3] for k, v in batches[-1].items()}  # N=11, ragged

    single = RetrievalEvaluator(model, params, batch_size=4,
                                cross_text_block=2, cross_video_block=8)
    enc_1 = single.encode_dataset_device(iter(batches))
    sim_1 = single.cross_sim_matrix_device(enc_1)
    host_enc = single.encode_dataset(iter(batches), store_full=True)
    sim_host = single.cross_sim_matrix(host_enc)

    mesh = make_mesh()
    sharded = RetrievalEvaluator(model, params, batch_size=4,
                                 cross_text_block=1, cross_video_block=8,
                                 mesh=mesh)
    enc_8 = sharded.encode_dataset_device(iter(batches))
    sim_8 = sharded.cross_sim_matrix_device(enc_8)

    assert sim_8.shape == sim_1.shape == (11, 11)
    np.testing.assert_allclose(sim_1, sim_host, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(sim_8, sim_1, rtol=1e-4, atol=1e-5)

    # the public entry point routes through the resident path on a mesh
    m = sharded.evaluate(iter(batches), mode="cross")
    assert 0.0 <= m["R1"] <= 1.0

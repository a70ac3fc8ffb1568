"""Reference-as-oracle parity: the ACTUAL /root/reference torch model.

Round-1 VERDICT item 2: `tests/test_torch_parity.py` checks against a
hand-written oracle that encodes the builder's *reading* of the reference,
so it cannot catch mis-readings. Here we import the reference package
itself (pure-Python torch, CPU), build its `UniVL` (modules/modeling.py:109)
at the tiny config with synthetic weights, pipe its real `state_dict()`
through `checkpoint/torch_convert.py`, and assert:

  (a) tower / cross / decoder activations match to fp32 tolerance
  (b) all five stage-II pretrain losses match (modeling.py:188-271), and the
      reference's train-mode forward total equals our summed total
  (c) the reference's Python beam decode (main_task_caption.py:395-545 +
      modules/beam.py) and evals/beam.py produce identical hypotheses
  (d) the reference's similarity matrices (mean-pool joint and chunked
      cross rescoring, modeling.py:327-391) equal RetrievalEvaluator's

The reference import chain needs boto3/nlgeval which are not in this image
and are never exercised at test time — they are stubbed in sys.modules.
"""

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from univl_tpu.checkpoint.torch_convert import convert_torch_state_dict, merge_params
from univl_tpu.config import UniVLConfig
from univl_tpu.evals.beam import make_beam_decode_fn, make_fast_beam_decode_fn
from univl_tpu.evals.retrieval import RetrievalEvaluator
from univl_tpu.models.univl import UniVL

from test_model import make_batch

REF_DIR = "/root/reference"

# tiny geometry, mirrored on both sides
HIDDEN, LAYERS, HEADS, INTER = 64, 2, 4, 128
VOCAB, VIDEO_DIM, MAX_WORDS, MAX_FRAMES, BATCH = 512, 32, 16, 8, 4
BOS_ID, EOS_ID = 2, 3  # reference modules/beam.py Constants defaults


def _stub(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def _import_reference():
    """Make /root/reference importable; stub its unused third-party deps."""
    _stub("boto3", resource=lambda *a, **k: None)
    _stub("botocore")
    _stub("botocore.exceptions", ClientError=Exception)
    sys.modules["botocore"].exceptions = sys.modules["botocore.exceptions"]

    class _FakeNLGEval:  # constructed lazily in the reference main; never used
        def __init__(self, *a, **k):
            pass

    _stub("nlgeval", NLGEval=_FakeNLGEval)
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    from modules import modeling  # noqa: F401  (the reference package)

    return modeling


def _t(x):
    return torch.from_numpy(np.asarray(x).copy())


@pytest.fixture(scope="module")
def setup():
    modeling = _import_reference()

    enc = dict(
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        # zero dropout so the reference's train()-mode forward (the only path
        # that computes losses, modeling.py:206) is deterministic
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    bert_cfg = modeling.BertConfig(VOCAB, max_position_embeddings=512, **enc)
    visual_cfg = modeling.VisualConfig(VIDEO_DIM, max_position_embeddings=512, **enc)
    cross_cfg = modeling.CrossConfig(HIDDEN, max_position_embeddings=1024, **enc)
    decoder_cfg = modeling.DecoderConfig(
        VOCAB, max_target_embeddings=512, num_decoder_layers=LAYERS, **enc
    )
    task = SimpleNamespace(
        max_words=MAX_WORDS,
        max_frames=MAX_FRAMES,
        video_dim=VIDEO_DIM,
        stage_two=True,
        do_pretrain=True,
        use_mil=True,
        task_type="caption",
        batch_size=BATCH,
        n_gpu=1,
        n_pair=1,
        margin=0.1,
        negative_weighting=1,
        hard_negative_rate=0.5,
        text_num_hidden_layers=LAYERS,
        visual_num_hidden_layers=LAYERS,
        cross_num_hidden_layers=LAYERS,
        decoder_num_hidden_layers=LAYERS,
        local_rank=0,
    )
    torch.manual_seed(0)
    ref = modeling.UniVL(bert_cfg, visual_cfg, cross_cfg, decoder_cfg, task).eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, report = convert_torch_state_dict(sd)
    assert not report["unknown"], f"converter missed: {report['unknown']}"

    cfg = UniVLConfig.tiny(
        stage_two=True, do_pretrain=True, use_mil=True, task_type="caption"
    )
    assert cfg.bert.vocab_size == VOCAB and cfg.max_words == MAX_WORDS
    model = UniVL(cfg)
    batch = make_batch(
        cfg, np.random.RandomState(0), with_caption=True, with_pretrain=True
    )
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    params, missing = merge_params(variables["params"], tree)
    assert not missing, missing
    return cfg, ref, model, {"params": params}, batch


def _ref_encode(ref, batch, masked=False):
    """Reference encode path, video pre-normalized (modeling.py:195-204)."""
    ids = _t(batch["masked_text" if masked else "input_ids"]).long()
    types_ = _t(batch["token_type_ids"]).long()
    am = _t(batch["attention_mask"])
    video = ref.normalize_video(
        _t(batch["masked_video" if masked else "video"])
    )
    vm = _t(batch["video_mask"])
    seq, vis = ref.get_sequence_visual_output(ids, types_, am, video, vm, shaped=True)
    return seq, vis, am, vm, video


def test_activations_towers_cross_decoder(setup):
    """(a) end-to-end activation parity vs the real reference model."""
    cfg, ref, model, params, batch = setup
    seq_j, vis_j = model.apply(
        params, batch["input_ids"], batch["token_type_ids"],
        batch["attention_mask"], batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    with torch.no_grad():
        seq_t, vis_t, am, vm, _ = _ref_encode(ref, batch)
        cross_t, pooled_t, concat_mask_t = ref._get_cross_output(seq_t, vis_t, am, vm)
        dec_t, _ = ref._get_decoder_score(
            seq_t, vis_t, _t(batch["input_ids"]).long(), am, vm,
            _t(batch["input_caption_ids"]).long(), _t(batch["decoder_mask"]),
            shaped=True,
        )
    np.testing.assert_allclose(np.asarray(seq_j), seq_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vis_j), vis_t.numpy(), rtol=1e-4, atol=1e-4)

    cross_j, pooled_j, _ = model.apply(
        params, seq_j, vis_j, batch["attention_mask"], batch["video_mask"],
        method=UniVL.get_cross_output,
    )
    np.testing.assert_allclose(np.asarray(cross_j), cross_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled_j), pooled_t.numpy(), rtol=1e-4, atol=1e-4)

    dec_j = model.apply(
        params, seq_j, vis_j, batch["attention_mask"], batch["video_mask"],
        batch["input_caption_ids"], batch["decoder_mask"],
        method=UniVL.decoder_logits,
    )
    np.testing.assert_allclose(np.asarray(dec_j), dec_t.numpy(), rtol=1e-3, atol=2e-3)


def test_five_pretrain_losses(setup):
    """(b) each stage-II pretrain objective matches (modeling.py:213-271)."""
    cfg, ref, model, params, batch = setup
    out = model.apply(params, batch, deterministic=True)

    with torch.no_grad():
        seq, vis, am, vm, video_n = _ref_encode(ref, batch)
        seq_alm, vis_alm, _, _, _ = _ref_encode(ref, batch, masked=True)

        cross_out, _, _ = ref._get_cross_output(seq_alm, vis_alm, am, vm)
        seq_cross, vis_cross = torch.split(
            cross_out, [am.size(-1), vm.size(-1)], dim=1
        )
        alm = ref._calculate_mlm_loss(seq_cross, _t(batch["token_labels"]).long())
        nce = ref._calculate_mfm_loss(
            vis_cross, video_n, vm, _t(batch["video_labels_index"]).long()
        )
        sim_joint = ref._pretrain_sim_loss_fct(
            ref.get_similarity_logits(seq, vis, am, vm, shaped=True, _pretrain_joint=True)
        )
        dec_scores, _ = ref._get_decoder_score(
            seq_alm, vis_alm, _t(batch["input_ids"]).long(), am, vm,
            _t(batch["input_caption_ids"]).long(), _t(batch["decoder_mask"]),
            shaped=True,
        )
        dec = ref.decoder_loss_fct(
            dec_scores.view(-1, VOCAB), _t(batch["output_caption_ids"]).long().view(-1)
        )
        sim_tv = ref.loss_fct(
            ref.get_similarity_logits(seq_alm, vis_alm, am, vm, shaped=True)
        )

    np.testing.assert_allclose(float(out["alm_loss"]), float(alm), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(out["nce_loss"]), float(nce), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        float(out["sim_loss_joint"]), float(sim_joint), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(float(out["decoder_loss"]), float(dec), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        float(out["sim_loss_text_visual"]), float(sim_tv), rtol=2e-4, atol=2e-4
    )

    # routing check: the reference's own train-mode forward total (zero
    # dropout) must equal our summed total — proves the loss SUM and the
    # do_pretrain/caption branch selection match modeling.py:206-271
    ref.train()
    try:
        with torch.no_grad():
            total_t = ref(
                _t(batch["input_ids"]).long(), _t(batch["token_type_ids"]).long(),
                _t(batch["attention_mask"]), _t(batch["video"]),
                _t(batch["video_mask"]),
                pairs_masked_text=_t(batch["masked_text"]).long(),
                pairs_token_labels=_t(batch["token_labels"]).long(),
                masked_video=_t(batch["masked_video"]),
                video_labels_index=_t(batch["video_labels_index"]).long(),
                input_caption_ids=_t(batch["input_caption_ids"]).long(),
                decoder_mask=_t(batch["decoder_mask"]),
                output_caption_ids=_t(batch["output_caption_ids"]).long(),
            )
    finally:
        ref.eval()
    np.testing.assert_allclose(float(out["loss"]), float(total_t), rtol=2e-4, atol=5e-4)


def _ref_beam_decode(ref, batch, n_bm: int, n_steps: int):
    """The reference's exact beam driver, via its own functions
    (main_task_caption.py:395-545 + modules/beam.py), n_steps decode steps."""
    # main_task_caption.py:24 calls torch.distributed.init_process_group
    # (nccl) at import time; neutralize it for the CPU test process
    if "main_task_caption" not in sys.modules:
        import torch.distributed as dist

        orig_init = dist.init_process_group
        dist.init_process_group = lambda *a, **k: None
        try:
            import main_task_caption as mtc  # noqa: F401
        finally:
            dist.init_process_group = orig_init
    import main_task_caption as mtc
    from modules.beam import Beam

    device = torch.device("cpu")
    with torch.no_grad():
        seq, vis, am, vm, _ = _ref_encode(ref, batch)
        n_inst, len_s, d_h = seq.size()
        _, len_v, v_h = vis.size()
        input_ids = _t(batch["input_ids"]).long()

        decoder = ref.decoder_caption
        seq_rpt = seq.repeat(1, n_bm, 1).view(n_inst * n_bm, len_s, d_h)
        vis_rpt = vis.repeat(1, n_bm, 1).view(n_inst * n_bm, len_v, v_h)
        ids_rpt = input_ids.repeat(1, n_bm).view(n_inst * n_bm, len_s)
        am_rpt = am.repeat(1, n_bm).view(n_inst * n_bm, len_s)
        vm_rpt = vm.repeat(1, n_bm).view(n_inst * n_bm, len_v)

        inst_dec_beams = [Beam(n_bm, device=device) for _ in range(n_inst)]
        active = list(range(n_inst))
        pos_map = mtc.get_inst_idx_to_tensor_position_map(active)
        tuples = (seq_rpt, vis_rpt, ids_rpt, am_rpt, vm_rpt)
        for len_dec_seq in range(1, n_steps + 1):
            active = mtc.beam_decode_step(
                decoder, inst_dec_beams, len_dec_seq, pos_map, n_bm, device, tuples
            )
            if not active:
                break
            tuples, pos_map = mtc.collate_active_info(tuples, pos_map, active, n_bm, device)
        hyps, scores = mtc.collect_hypothesis_and_scores(inst_dec_beams, 1)
    return [h[0] for h in hyps], [float(s[0]) for s in scores]


def _truncate(tokens, eos_id):
    out = []
    for t in tokens:
        out.append(int(t))
        if t == eos_id:
            break
    return out


@pytest.mark.parametrize("fast", [False, True], ids=["full-prefix", "kv-cache"])
def test_beam_search_hypotheses(setup, fast):
    """(c) identical beam-5 hypotheses from the reference's Python beam and
    the jitted static-shape beam, on identical weights."""
    cfg, ref, model, params, batch = setup
    n_steps = 12
    ref_hyps, ref_scores = _ref_beam_decode(ref, batch, n_bm=5, n_steps=n_steps)

    maker = make_fast_beam_decode_fn if fast else make_beam_decode_fn
    decode = maker(model, beam_size=5, max_len=n_steps + 1,
                   bos_id=BOS_ID, eos_id=EOS_ID)
    seq_j, vis_j = model.apply(
        params, batch["input_ids"], batch["token_type_ids"],
        batch["attention_mask"], batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    tokens, scores = decode(
        params, seq_j, vis_j, batch["attention_mask"], batch["video_mask"]
    )
    tokens, scores = np.asarray(tokens), np.asarray(scores)
    for i in range(len(ref_hyps)):
        ours = _truncate(tokens[i], EOS_ID)
        theirs = _truncate(ref_hyps[i], EOS_ID)
        assert ours == theirs, f"instance {i}: {ours} != {theirs}"


def test_export_torch_matches_reference_state_dict(setup):
    """(e) --export_torch closes the checkpoint loop against the REAL
    reference model: exporting our flax params reproduces the reference's
    own state_dict() exactly (same keys minus the unused poolers, same
    values, tied duplicates included), and a reference model accepts it
    via load_state_dict with nothing unexpected."""
    import re as _re

    from univl_tpu.checkpoint.torch_convert import export_torch_state_dict

    cfg, ref, model, params, batch = setup
    sd_ref = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    out = export_torch_state_dict(params["params"])

    want = {k for k in sd_ref if not _re.match(r"^(bert|visual)\.pooler\.", k)}
    assert set(out) == want, set(out) ^ want
    for k in sorted(want):
        np.testing.assert_array_equal(out[k], sd_ref[k], err_msg=k)

    result = ref.load_state_dict({k: _t(v) for k, v in out.items()},
                                 strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    assert all(_re.match(r"^(bert|visual)\.pooler\.", m)
               for m in result.missing_keys), result.missing_keys


def test_retrieval_sim_matrices(setup):
    """(d) reference mean-pool joint matrix and chunked cross-rescoring
    matrix (modeling.py:327-391) == RetrievalEvaluator's."""
    cfg, ref, model, params, batch = setup
    rng = np.random.RandomState(7)
    batches = [
        {k: np.asarray(v) for k, v in
         make_batch(cfg, rng, with_caption=False).items()}
        for _ in range(3)
    ]

    ev = RetrievalEvaluator(model, params, batch_size=BATCH,
                            cross_text_block=3, cross_video_block=5)
    enc = ev.encode_dataset(iter(batches), store_full=True)
    joint_j = enc["text_emb"] @ enc["video_emb"].T
    cross_j = ev.cross_sim_matrix(enc)

    with torch.no_grad():
        seqs, viss, ams, vms = [], [], [], []
        for b in batches:
            s, v, am, vm, _ = _ref_encode(ref, b)
            seqs.append(s), viss.append(v), ams.append(am), vms.append(vm)
        seq = torch.cat(seqs)
        vis = torch.cat(viss)
        am = torch.cat(ams)
        vm = torch.cat(vms)
        # joint (mean-pool) path: _pretrain_joint=True routes around the
        # cross encoder even in stage two (modeling.py:384-389)
        joint_t = ref.get_similarity_logits(
            seq, vis, am, vm, shaped=True, _pretrain_joint=True
        )
        # cross path: the reference's 5-row-chunk loop (modeling.py:341-375)
        cross_t = ref._cross_similarity(seq, vis, am, vm)

    np.testing.assert_allclose(joint_j, joint_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(cross_j, cross_t.numpy(), rtol=1e-4, atol=2e-4)

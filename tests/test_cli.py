"""Driver-level tests: run the CLI mains end-to-end on synthetic fixtures
with small layer counts (full hidden size, tiny data)."""

import os

import numpy as np
import pytest

from univl_tpu.data import fixtures


@pytest.fixture(scope="module")
def vocab(tmp_path_factory):
    return fixtures.make_vocab(str(tmp_path_factory.mktemp("v") / "vocab.txt"))


@pytest.fixture(scope="module")
def youcook(tmp_path_factory):
    return fixtures.make_youcook(
        str(tmp_path_factory.mktemp("yc")), n_videos=4, clips_per_video=4,
        video_dim=32,
    )


COMMON = [
    "--video_dim", "32", "--max_words", "16", "--max_frames", "12",
    "--text_num_hidden_layers", "2", "--visual_num_hidden_layers", "1",
    "--cross_num_hidden_layers", "1", "--decoder_num_hidden_layers", "1",
    "--hidden_size", "64", "--num_attention_heads", "4",
    "--intermediate_size", "128",
    "--batch_size", "8", "--batch_size_val", "8", "--epochs", "1",
    "--lr", "1e-4", "--n_display", "1", "--num_thread_reader", "2",
    "--seed", "0",
]


def test_retrieval_driver_train_eval(tmp_path, vocab, youcook):
    from univl_tpu.cli.task_retrieval import main

    csv_path, data_path, feat_path = youcook
    out = str(tmp_path / "out")
    best = main(
        ["--do_train", "--do_eval", "--datatype", "youcook",
         "--vocab_file", vocab,
         "--train_csv", csv_path, "--val_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_path,
         "--output_dir", out] + COMMON
    )
    assert best is not None and "R1" in best
    assert os.path.exists(os.path.join(out, "params.msgpack.0"))
    assert os.path.exists(os.path.join(out, "best.msgpack"))


def test_retrieval_driver_train_zero1(tmp_path, vocab, youcook):
    """--zero1 end-to-end through the retrieval driver: trains, evals,
    writes checkpoints (the sharded optimizer is a drop-in for the CLI)."""
    from univl_tpu.cli.task_retrieval import main

    csv_path, data_path, feat_path = youcook
    out = str(tmp_path / "outz")
    best = main(
        ["--do_train", "--do_eval", "--datatype", "youcook",
         "--vocab_file", vocab, "--zero1",
         "--train_csv", csv_path, "--val_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_path,
         "--output_dir", out] + COMMON
    )
    assert best is not None and "R1" in best
    assert os.path.exists(os.path.join(out, "params.msgpack.0"))


def test_retrieval_driver_train_tp_sp(tmp_path, vocab, youcook):
    """--tensor_parallel 2 --sequence_parallel through the retrieval
    driver: the (dp=4, tp=2) mesh + Megatron/SP shardings are wired from
    the CLI, train + eval complete."""
    from univl_tpu.cli.task_retrieval import main

    csv_path, data_path, feat_path = youcook
    out = str(tmp_path / "outtp")
    best = main(
        ["--do_train", "--do_eval", "--datatype", "youcook",
         "--vocab_file", vocab,
         "--tensor_parallel", "2", "--sequence_parallel",
         "--train_csv", csv_path, "--val_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_path,
         "--output_dir", out] + COMMON
    )
    assert best is not None and "R1" in best


def test_retrieval_driver_eval_only(tmp_path, vocab, youcook):
    from univl_tpu.cli.task_retrieval import main

    csv_path, data_path, feat_path = youcook
    m = main(
        ["--do_eval", "--datatype", "youcook", "--vocab_file", vocab,
         "--train_csv", csv_path, "--val_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_path,
         "--output_dir", str(tmp_path / "out2")] + COMMON
    )
    assert 0.0 <= m["R1"] <= 1.0


def test_caption_driver_train_eval(tmp_path, vocab, youcook):
    from univl_tpu.cli.task_caption import main

    csv_path, data_path, feat_path = youcook
    out = str(tmp_path / "cap")
    best = main(
        ["--do_train", "--do_eval", "--stage_two", "--datatype", "youcook",
         "--vocab_file", vocab,
         "--train_csv", csv_path, "--val_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_path,
         "--output_dir", out] + COMMON
    )
    assert best is not None and "Bleu_4" in best
    assert os.path.exists(os.path.join(out, "hyp.0.txt"))


def test_pretrain_driver_and_resume(tmp_path, vocab):
    from univl_tpu.cli.pretrain import main

    ht = str(tmp_path / "ht")
    csv_path, data_path, feat_dir = fixtures.make_howto100m(
        ht, n_videos=8, clips_per_video=4, video_dim=32, corrupt_last=False,
    )
    out = str(tmp_path / "pre")
    argv = (
        ["--do_pretrain", "--stage_two", "--sampled_use_mil", "--n_pair", "2",
         "--vocab_file", vocab, "--train_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_dir,
         "--output_dir", out, "--min_time", "5.0"] + COMMON
    )
    state = main(argv)
    assert os.path.exists(os.path.join(out, "train_state.msgpack"))
    step_after_1 = int(state.step)
    assert step_after_1 >= 1

    # resume for one more epoch
    argv2 = [a for a in argv]
    argv2[argv2.index("--epochs") + 1] = "2"
    state2 = main(argv2 + ["--load_checkpoint"])
    assert int(state2.step) > step_after_1


@pytest.fixture(scope="module")
def msrvtt_fix(tmp_path_factory):
    return fixtures.make_msrvtt(str(tmp_path_factory.mktemp("mv")), video_dim=32,
                                n_videos=8)


def test_msrvtt_retrieval_driver(tmp_path, vocab, msrvtt_fix):
    from univl_tpu.cli.task_retrieval import main

    train_csv, test_csv, json_path, feat_path = msrvtt_fix
    m = main(
        ["--do_train", "--do_eval", "--datatype", "msrvtt",
         "--expand_msrvtt_sentences", "--vocab_file", vocab,
         "--train_csv", train_csv, "--val_csv", test_csv,
         "--data_path", json_path, "--features_path", feat_path,
         "--output_dir", str(tmp_path / "mvout")] + COMMON
    )
    assert m is not None and 0.0 <= m["R1"] <= 1.0


def test_msrvtt_caption_driver_eval(tmp_path, vocab):
    from univl_tpu.cli.task_caption import main

    train_csv, test_csv, json_path, feat_path = fixtures.make_msrvtt(
        str(tmp_path / "mvtest"), video_dim=32, n_videos=8,
        caption_test_layout=True,
    )
    m = main(
        ["--do_eval", "--stage_two", "--datatype", "msrvtt",
         "--vocab_file", vocab,
         "--train_csv", train_csv, "--val_csv", test_csv,
         "--data_path", json_path, "--features_path", feat_path,
         "--output_dir", str(tmp_path / "mvcap")] + COMMON
    )
    assert m is not None and "Bleu_4" in m
    # multi-reference scoring: each video has 3 refs
    assert 0.0 <= m["Bleu_4"] <= 1.0


def test_eval_with_msgpack_init(tmp_path, vocab, youcook):
    """--init_model best.msgpack reproduces the training-time eval metrics."""
    from univl_tpu.cli.task_retrieval import main

    csv_path, data_path, feat_path = youcook
    out = str(tmp_path / "m1")
    best = main(
        ["--do_train", "--do_eval", "--datatype", "youcook",
         "--vocab_file", vocab,
         "--train_csv", csv_path, "--val_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_path,
         "--output_dir", out] + COMMON
    )
    m = main(
        ["--do_eval", "--datatype", "youcook", "--vocab_file", vocab,
         "--train_csv", csv_path, "--val_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_path,
         "--init_model", os.path.join(out, "best.msgpack"),
         "--output_dir", str(tmp_path / "m2")] + COMMON
    )
    assert m["R1"] == best["R1"]


def test_convert_checkpoint_cli(tmp_path):
    """Converter tool: synthetic torch .bin -> msgpack, full coverage."""
    import torch
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_checkpoint import synth_reference_state_dict
    from univl_tpu.config import UniVLConfig

    cfg = UniVLConfig.tiny(stage_two=True, do_pretrain=True, use_mil=True)
    sd = synth_reference_state_dict(cfg, np.random.RandomState(0))
    bin_path = str(tmp_path / "univl.pretrained.bin")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, bin_path)

    from univl_tpu.cli.convert_checkpoint import main
    out = str(tmp_path / "out.msgpack")
    main(["--torch_bin", bin_path, "--output", out,
          "--stage_two", "--do_pretrain",
          "--text_num_hidden_layers", str(cfg.bert.num_hidden_layers),
          "--visual_num_hidden_layers", str(cfg.visual.num_hidden_layers),
          "--cross_num_hidden_layers", str(cfg.cross.num_hidden_layers),
          "--decoder_num_hidden_layers", str(cfg.decoder.num_decoder_layers),
          "--hidden_size", str(cfg.bert.hidden_size),
          "--num_attention_heads", str(cfg.bert.num_attention_heads),
          "--intermediate_size", str(cfg.bert.intermediate_size),
          "--vocab_size", str(cfg.bert.vocab_size),
          "--max_words", "16", "--max_frames", "8", "--video_dim", "32"])
    assert os.path.exists(out)

    # the written msgpack must contain the converted weights, not merely
    # exist: partially restore it over the converted-tree template and
    # compare every leaf against convert_torch_state_dict run directly on
    # the same .bin (a CLI that built the wrong template or wrote an
    # empty/partial tree would still create the file)
    import jax as _jax

    from univl_tpu.checkpoint.io import restore_checkpoint
    from univl_tpu.checkpoint.torch_convert import convert_torch_state_dict

    expected, _report = convert_torch_state_dict({k: np.asarray(v) for k, v in sd.items()})
    zero_tmpl = _jax.tree.map(np.zeros_like, expected)
    restored, _meta, missing = restore_checkpoint(out, zero_tmpl, partial=True)
    assert not missing, missing  # every converted leaf is in the msgpack
    n = 0
    for (path, a), (_, b) in zip(
        _jax.tree_util.tree_leaves_with_path(restored),
        _jax.tree_util.tree_leaves_with_path(expected),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=_jax.tree_util.keystr(path))
        n += 1
    assert n == len(_jax.tree.leaves(expected)) and n > 50, n

    # reverse direction: --export_torch writes the reference-layout .bin
    # back from the msgpack; keys == original minus the dropped poolers,
    # values identical for everything that came from the .bin
    bin2 = str(tmp_path / "exported.bin")
    main(["--export_torch", "--flax_params", out, "--output", bin2])
    import re as _re

    exported = {k: v.numpy() for k, v in torch.load(bin2, weights_only=True).items()}
    want_keys = {k for k in sd if not _re.match(r"^(bert|visual)\.pooler\.", k)}
    assert set(exported) == want_keys, set(exported) ^ want_keys
    for k in want_keys:
        np.testing.assert_array_equal(exported[k], np.asarray(sd[k]), err_msg=k)


def test_ft_align_driver(tmp_path, vocab, youcook):
    """--train_sim_after_cross: cross-encoder loss in training, 'cross'
    rescoring mode in eval (reference FT-Align, README.md:93-95)."""
    from univl_tpu.cli.task_retrieval import main

    csv_path, data_path, feat_path = youcook
    best = main(
        ["--do_train", "--do_eval", "--train_sim_after_cross",
         "--datatype", "youcook", "--vocab_file", vocab,
         "--train_csv", csv_path, "--val_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_path,
         "--output_dir", str(tmp_path / "fta")] + COMMON
    )
    assert best is not None and best["mode"] == "cross"
    assert 0.0 <= best["R1"] <= 1.0


def test_metrics_jsonl_written(tmp_path, vocab, youcook):
    """Structured metrics sidecar: train/epoch/eval records with floats."""
    import json as _json

    from univl_tpu.cli.task_retrieval import main

    csv_path, data_path, feat_path = youcook
    out = str(tmp_path / "mj")
    main(
        ["--do_train", "--do_eval", "--datatype", "youcook",
         "--vocab_file", vocab, "--train_csv", csv_path, "--val_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_path,
         "--output_dir", out] + COMMON
    )
    path = os.path.join(out, "metrics.jsonl")
    assert os.path.exists(path)
    records = [_json.loads(l) for l in open(path)]
    kinds = {r["kind"] for r in records}
    assert {"train", "epoch", "eval"} <= kinds
    train = [r for r in records if r["kind"] == "train"]
    assert all(np.isfinite(r["loss"]) for r in train)
    ev = [r for r in records if r["kind"] == "eval"][0]
    assert "R1" in ev and 0.0 <= ev["R1"] <= 1.0


def test_retrieval_preemption_resume_bitexact(tmp_path, vocab, youcook):
    """Finetune preemption (run_train_epochs): inject mid-run, resume with
    --load_checkpoint, and BOTH the per-epoch param checkpoints and the
    best-model metrics must bit-match an uninterrupted run. (The reference
    finetune drivers have no resume at all — main_task_retrieval.py offers
    --init_model only.)"""
    import filecmp
    import json as _json

    from univl_tpu.cli.task_retrieval import main

    csv_path, data_path, feat_path = youcook

    def argv(out):
        a = ["--do_train", "--do_eval", "--datatype", "youcook",
             "--vocab_file", vocab, "--train_csv", csv_path,
             "--val_csv", csv_path, "--data_path", data_path,
             "--features_path", feat_path, "--output_dir", out] + COMMON
        a[a.index("--epochs") + 1] = "2"
        return a

    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    main(argv(out_a) + ["--inject_preempt_after", "2"])
    meta = _json.load(open(os.path.join(out_a, "train_state.msgpack.json")))
    assert meta["preempted"] is True
    assert int(meta["in_epoch_step"]) >= 1

    best_a = main(argv(out_a) + ["--load_checkpoint"])
    best_b = main(argv(out_b))
    assert best_a is not None and best_a["epoch"] == best_b["epoch"]
    np.testing.assert_allclose(best_a["R1"], best_b["R1"])
    for e in range(2):
        fa = os.path.join(out_a, f"params.msgpack.{e}")
        fb = os.path.join(out_b, f"params.msgpack.{e}")
        assert filecmp.cmp(fa, fb, shallow=False), f"epoch {e} params differ"


def test_retrieval_preempt_after_eval_carries_best(tmp_path, vocab, youcook):
    """Preemption AFTER an epoch completed (first step of epoch 1): the
    checkpoint carries epoch 0's best-model tracking, so the resumed run
    reports the overall best across BOTH runs — not just the epochs it saw
    itself — and the final params stay bit-identical to an uninterrupted
    2-epoch run. (Runs must share --epochs: t_total and hence the lr
    schedule depend on it.)"""
    import filecmp
    import json as _json

    from univl_tpu.cli.task_retrieval import main

    csv_path, data_path, feat_path = youcook

    def argv(out):
        a = ["--do_train", "--do_eval", "--datatype", "youcook",
             "--vocab_file", vocab, "--train_csv", csv_path,
             "--val_csv", csv_path, "--data_path", data_path,
             "--features_path", feat_path, "--output_dir", out] + COMMON
        a[a.index("--epochs") + 1] = "2"
        return a

    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    best_b = main(argv(out_b))  # uninterrupted baseline
    records = [_json.loads(l)
               for l in open(os.path.join(out_b, "metrics.jsonl"))]
    spe = [r for r in records if r["kind"] == "epoch"][0]["steps"]

    main(argv(out_a) + ["--inject_preempt_after", str(int(spe) + 1)])
    meta = _json.load(open(os.path.join(out_a, "train_state.msgpack.json")))
    assert meta["preempted"] is True
    assert meta["best"] is not None and meta["best"]["epoch"] == 0

    best_a = main(argv(out_a) + ["--load_checkpoint"])
    assert best_a["epoch"] == best_b["epoch"]
    np.testing.assert_allclose(best_a["R1"], best_b["R1"])
    for e in range(2):
        assert filecmp.cmp(
            os.path.join(out_a, f"params.msgpack.{e}"),
            os.path.join(out_b, f"params.msgpack.{e}"), shallow=False,
        ), f"epoch {e} params differ"


def test_pretrain_periodic_checkpoint_survives_crash(tmp_path, vocab):
    """--checkpoint_every_steps: an UNCLEAN kill (no SIGTERM, no save —
    injected RuntimeError) loses at most the steps since the last periodic
    checkpoint; resume replays them bit-identically (global_step-keyed rng
    + seeded batcher order), ending equal to an uninterrupted run."""
    import jax as _jax

    ht = str(tmp_path / "ht")
    csv_path, data_path, feat_dir = fixtures.make_howto100m(
        ht, n_videos=8, clips_per_video=4, video_dim=32, corrupt_last=False,
    )
    from univl_tpu.cli.pretrain import main

    def argv(out):
        a = (["--do_pretrain", "--sampled_use_mil", "--n_pair", "2",
              "--vocab_file", vocab, "--train_csv", csv_path,
              "--data_path", data_path, "--features_path", feat_dir,
              "--output_dir", out, "--min_time", "5.0",
              "--checkpoint_every_steps", "2"] + COMMON)
        a[a.index("--epochs") + 1] = "3"
        return a

    out = str(tmp_path / "pre")
    with pytest.raises(RuntimeError, match="injected crash"):
        main(argv(out) + ["--inject_crash_after", "3"])
    # last periodic save was at step 2; step 3's work is lost and replayed
    state2 = main(argv(out) + ["--load_checkpoint"])

    out_full = str(tmp_path / "pre_full")
    state_full = main(argv(out_full))
    assert int(state2.step) == int(state_full.step)
    for (path, a), (_, b) in zip(
        _jax.tree_util.tree_leaves_with_path(state2.params),
        _jax.tree_util.tree_leaves_with_path(state_full.params),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(path))


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_pretrain_preemption_save_and_resume(tmp_path, vocab, backend):
    """Simulated preemption (fault injection): checkpoint mid-run, exit
    cleanly, resume continues the interrupted epoch at the exact
    update-batch — bit-identical to a run that was never preempted.
    Covered for BOTH checkpoint backends (the orbax manager carries the
    in-epoch offset through its metrics metadata)."""
    import json as _json

    import jax as _jax

    from univl_tpu.cli.pretrain import main

    ht = str(tmp_path / "ht")
    csv_path, data_path, feat_dir = fixtures.make_howto100m(
        ht, n_videos=8, clips_per_video=4, video_dim=32, corrupt_last=False,
    )
    out = str(tmp_path / "pre")
    argv = (
        ["--do_pretrain", "--sampled_use_mil", "--n_pair", "2",
         "--vocab_file", vocab, "--train_csv", csv_path,
         "--data_path", data_path, "--features_path", feat_dir,
         "--output_dir", out, "--min_time", "5.0",
         "--checkpoint_backend", backend] + COMMON
    )
    argv[argv.index("--epochs") + 1] = "3"

    state = main(argv + ["--inject_preempt_after", "2"])
    steps_done = int(state.step)
    assert steps_done == 2  # stopped right after the injected signal
    if backend == "msgpack":
        meta = _json.load(open(os.path.join(out, "train_state.msgpack.json")))
        assert meta["preempted"] is True
        assert int(meta["in_epoch_step"]) >= 0

    state2 = main(argv + ["--load_checkpoint"])
    assert int(state2.step) > steps_done  # resumed past the save point

    # Exact mid-epoch resume: interrupted + resumed must be BIT-IDENTICAL
    # to a run that was never preempted — same total step count (no epoch
    # replayed, none skipped: the batcher continues at the recorded
    # in-epoch offset and the step rng is keyed on global_step) and the
    # same final params.
    argv_full = list(argv)
    argv_full[argv_full.index("--output_dir") + 1] = str(tmp_path / "pre_full")
    state_full = main(argv_full)
    assert int(state2.step) == int(state_full.step), (
        int(state2.step), int(state_full.step))
    for (path, a), (_, b) in zip(
        _jax.tree_util.tree_leaves_with_path(state2.params),
        _jax.tree_util.tree_leaves_with_path(state_full.params),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(path))


def test_full_reference_workflow_chain(tmp_path, vocab, youcook):
    """The reference's complete published pipeline, artifact-for-artifact
    (README.md:77-247; VERDICT r2 item 4): stage-I pretrain -> stage-II
    pretrain initialized from stage-I params -> export the torch-layout
    `univl.pretrained.bin` -> FT-Joint retrieval finetune via --init_model
    -> caption finetune from the same .bin. Fails if ANY inter-stage
    contract regresses: param-tree layout, tied weights, partial stage-I
    -> stage-II restore, the torch exporter/importer round-trip, or either
    task driver's --init_model path.
    """
    from univl_tpu.cli import convert_checkpoint, pretrain, task_caption, \
        task_retrieval

    ht = str(tmp_path / "ht")
    ht_csv, ht_data, ht_feat = fixtures.make_howto100m(
        ht, n_videos=8, clips_per_video=4, video_dim=32, corrupt_last=False,
    )
    yc_csv, yc_data, yc_feat = youcook

    # --- stage I: encoders + joint sim only (README.md:212-223)
    out1 = str(tmp_path / "stage1")
    pretrain.main(
        ["--do_pretrain", "--sampled_use_mil", "--n_pair", "2",
         "--vocab_file", vocab, "--train_csv", ht_csv,
         "--data_path", ht_data, "--features_path", ht_feat,
         "--output_dir", out1, "--min_time", "5.0"] + COMMON
    )
    stage1_params = os.path.join(out1, "params.msgpack.0")
    assert os.path.exists(stage1_params)

    # --- stage II: adds cross+decoder, initialized from stage-I params
    # (partial restore: new modules keep their fresh init; README.md:233-247)
    out2 = str(tmp_path / "stage2")
    pretrain.main(
        ["--do_pretrain", "--stage_two", "--pretrain_enhance_vmodal",
         "--sampled_use_mil", "--n_pair", "2",
         "--init_model", stage1_params,
         "--vocab_file", vocab, "--train_csv", ht_csv,
         "--data_path", ht_data, "--features_path", ht_feat,
         "--output_dir", out2, "--min_time", "5.0"] + COMMON
    )
    stage2_params = os.path.join(out2, "params.msgpack.0")
    assert os.path.exists(stage2_params)

    # --- export the reference-layout weight file (the artifact the
    # reference calls `univl.pretrained.bin`)
    bin_path = str(tmp_path / "univl.pretrained.bin")
    convert_checkpoint.main(
        ["--export_torch", "--flax_params", stage2_params,
         "--output", bin_path])
    assert os.path.exists(bin_path)

    # --- round-trip contract: eval from the exported .bin must equal eval
    # from the flax params it was exported from
    eval_common = [
        "--do_eval", "--datatype", "youcook", "--vocab_file", vocab,
        "--train_csv", yc_csv, "--val_csv", yc_csv,
        "--data_path", yc_data, "--features_path", yc_feat,
    ] + COMMON
    m_msgpack = task_retrieval.main(
        eval_common + ["--init_model", stage2_params,
                       "--output_dir", str(tmp_path / "ev_msgpack")])
    m_bin = task_retrieval.main(
        eval_common + ["--init_model", bin_path,
                       "--output_dir", str(tmp_path / "ev_bin")])
    assert m_bin["R1"] == m_msgpack["R1"], (m_bin, m_msgpack)
    assert m_bin["R5"] == m_msgpack["R5"]

    # --- FT-Joint retrieval finetune from the .bin (README.md:77-91)
    out_ret = str(tmp_path / "ft_joint")
    best_ret = task_retrieval.main(
        ["--do_train", "--do_eval", "--datatype", "youcook",
         "--vocab_file", vocab, "--init_model", bin_path,
         "--train_csv", yc_csv, "--val_csv", yc_csv,
         "--data_path", yc_data, "--features_path", yc_feat,
         "--output_dir", out_ret] + COMMON
    )
    assert best_ret is not None and 0.0 <= best_ret["R1"] <= 1.0
    assert os.path.exists(os.path.join(out_ret, "best.msgpack"))

    # --- caption finetune from the same .bin (README.md:137-163)
    out_cap = str(tmp_path / "ft_caption")
    best_cap = task_caption.main(
        ["--do_train", "--do_eval", "--stage_two", "--datatype", "youcook",
         "--vocab_file", vocab, "--init_model", bin_path,
         "--train_csv", yc_csv, "--val_csv", yc_csv,
         "--data_path", yc_data, "--features_path", yc_feat,
         "--output_dir", out_cap] + COMMON
    )
    assert best_cap is not None and "Bleu_4" in best_cap
    assert os.path.exists(os.path.join(out_cap, "hyp.0.txt"))
    assert os.path.exists(os.path.join(out_cap, "ref.0.txt"))

"""Checkpoint tests: torch-name conversion coverage + save/restore roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univl_tpu.config import UniVLConfig
from univl_tpu.checkpoint.io import restore_checkpoint, save_checkpoint
from univl_tpu.checkpoint.torch_convert import (
    convert_torch_state_dict,
    merge_params,
)
from univl_tpu.models.univl import UniVL

from test_model import make_batch


def synth_reference_state_dict(cfg: UniVLConfig, rng) -> dict:
    """Synthesize a state dict with the reference's torch parameter names
    (modules/modeling.py layout) at the given config's shapes."""
    H = cfg.bert.hidden_size
    I = cfg.bert.intermediate_size
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32)

    def ln(name, d=None):
        d = d or H
        sd[f"{name}.weight"] = rng.rand(d).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(d).astype(np.float32) * 0.1

    def emb(name, n, d=None):
        sd[f"{name}.weight"] = rng.randn(n, d or H).astype(np.float32)

    def block(prefix):
        for qkv in ("query", "key", "value"):
            lin(f"{prefix}.attention.self.{qkv}", H, H)
        lin(f"{prefix}.attention.output.dense", H, H)
        ln(f"{prefix}.attention.output.LayerNorm")
        lin(f"{prefix}.intermediate.dense", H, I)
        lin(f"{prefix}.output.dense", I, H)
        ln(f"{prefix}.output.LayerNorm")

    # bert
    emb("bert.embeddings.word_embeddings", cfg.bert.vocab_size)
    emb("bert.embeddings.position_embeddings", cfg.bert.max_position_embeddings)
    emb("bert.embeddings.token_type_embeddings", cfg.bert.type_vocab_size)
    ln("bert.embeddings.LayerNorm")
    for i in range(cfg.bert.num_hidden_layers):
        block(f"bert.encoder.layer.{i}")
    lin("bert.pooler.dense", H, H)  # unused by UniVL

    # visual
    lin("visual.embeddings.word_embeddings", cfg.video_dim, H)
    emb("visual.embeddings.position_embeddings", cfg.visual.max_position_embeddings)
    ln("visual.embeddings.LayerNorm")
    for i in range(cfg.visual.num_hidden_layers):
        block(f"visual.encoder.layer.{i}")
    lin("visual.pooler.dense", H, H)

    # cross
    emb("cross.embeddings.position_embeddings", cfg.cross.max_position_embeddings)
    emb("cross.embeddings.token_type_embeddings", cfg.cross.type_vocab_size)
    ln("cross.embeddings.LayerNorm")
    for i in range(cfg.cross.num_hidden_layers):
        block(f"cross.encoder.layer.{i}")
    lin("cross.pooler.dense", H, H)

    # decoder (embeddings tied to bert)
    sd["decoder.embeddings.word_embeddings.weight"] = sd[
        "bert.embeddings.word_embeddings.weight"
    ]
    sd["decoder.embeddings.position_embeddings.weight"] = sd[
        "bert.embeddings.position_embeddings.weight"
    ]
    ln("decoder.embeddings.LayerNorm")
    for i in range(cfg.decoder.num_decoder_layers):
        p = f"decoder.decoder.layer.{i}"
        for att in ("slf_attn", "enc_attn"):
            for qkv in ("query", "key", "value"):
                lin(f"{p}.{att}.att.{qkv}", H, H)
            lin(f"{p}.{att}.output.dense", H, H)
            ln(f"{p}.{att}.output.LayerNorm")
        lin(f"{p}.intermediate.dense", H, I)
        lin(f"{p}.output.dense", I, H)
        ln(f"{p}.output.LayerNorm")
    lin("decoder.classifier.cls.predictions.transform.dense", H, H)
    ln("decoder.classifier.cls.predictions.transform.LayerNorm")
    sd["decoder.classifier.cls.predictions.decoder.weight"] = sd[
        "bert.embeddings.word_embeddings.weight"
    ]
    sd["decoder.classifier.cls.predictions.bias"] = rng.randn(
        cfg.bert.vocab_size
    ).astype(np.float32)

    # pretrain heads
    lin("cls.predictions.transform.dense", H, H)
    ln("cls.predictions.transform.LayerNorm")
    sd["cls.predictions.decoder.weight"] = sd[
        "bert.embeddings.word_embeddings.weight"
    ]
    sd["cls.predictions.bias"] = rng.randn(cfg.bert.vocab_size).astype(np.float32)
    lin("cls_visual.predictions.transform.dense", H, H)
    ln("cls_visual.predictions.transform.LayerNorm")
    sd["cls_visual.predictions.weight"] = sd[
        "visual.embeddings.word_embeddings.weight"
    ]
    sd["cls_visual.predictions.bias"] = rng.randn(cfg.video_dim).astype(np.float32)

    # top-level
    ln("normalize_video.visual_norm2d", cfg.video_dim)
    lin("similarity_dense", H, 1)
    return sd


def test_conversion_full_coverage(rng):
    cfg = UniVLConfig.tiny(stage_two=True, do_pretrain=True, use_mil=True)
    sd = synth_reference_state_dict(cfg, rng)
    tree, report = convert_torch_state_dict(sd)
    assert not report["unknown"], report["unknown"]

    model = UniVL(cfg)
    batch = make_batch(cfg, rng, with_caption=True, with_pretrain=True)
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    merged, missing = merge_params(variables["params"], tree)
    assert not missing, missing  # every flax param covered by the checkpoint

    out = model.apply({"params": merged}, batch, deterministic=True)
    assert np.isfinite(float(out["loss"]))


def test_conversion_gamma_beta_rename(rng):
    cfg = UniVLConfig.tiny()
    sd = synth_reference_state_dict(cfg, rng)
    # simulate old-style naming for one LN
    w = sd.pop("bert.embeddings.LayerNorm.weight")
    b = sd.pop("bert.embeddings.LayerNorm.bias")
    sd["bert.embeddings.LayerNorm.gamma"] = w
    sd["bert.embeddings.LayerNorm.beta"] = b
    tree, report = convert_torch_state_dict(sd)
    np.testing.assert_array_equal(tree["text"]["embed_ln"]["scale"], w)
    np.testing.assert_array_equal(tree["text"]["embed_ln"]["bias"], b)


def test_linear_transpose_semantics(rng):
    """Converted kernel must reproduce torch Linear y = x @ W.T + b."""
    cfg = UniVLConfig.tiny()
    sd = synth_reference_state_dict(cfg, rng)
    tree, _ = convert_torch_state_dict(sd)
    W = sd["similarity_dense.weight"]  # [1, H]
    b = sd["similarity_dense.bias"]
    x = rng.randn(3, cfg.bert.hidden_size).astype(np.float32)
    got = x @ tree["similarity_dense"]["kernel"] + tree["similarity_dense"]["bias"]
    expect = x @ W.T + b
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_tied_weights_single_source(rng):
    """Decoder/MLM logits must follow the (single) word embedding table."""
    cfg = UniVLConfig.tiny(stage_two=True, task_type="caption")
    sd = synth_reference_state_dict(cfg, rng)
    tree, _ = convert_torch_state_dict(sd)
    # tied tensors were skipped, not duplicated
    assert "classifier_transform" in tree["decoder"]
    assert "embedding" in tree["word_embed"]
    np.testing.assert_array_equal(
        tree["word_embed"]["embedding"],
        sd["bert.embeddings.word_embeddings.weight"],
    )


def test_export_torch_roundtrip(rng):
    """torch -> flax -> torch is the identity on every exportable key: the
    reverse converter reproduces the reference state dict exactly,
    including the tied duplicates, minus the (bert|visual).pooler params
    UniVL never consumes."""
    import re as _re

    from univl_tpu.checkpoint.torch_convert import export_torch_state_dict

    cfg = UniVLConfig.tiny(stage_two=True, do_pretrain=True, use_mil=True)
    sd = synth_reference_state_dict(cfg, rng)
    tree, _ = convert_torch_state_dict(sd)
    out = export_torch_state_dict(tree)

    expected = {
        k: v for k, v in sd.items()
        if not _re.match(r"^(bert|visual)\.pooler\.", k)
    }
    assert set(out) == set(expected), (
        set(out) ^ set(expected)
    )
    for k, v in expected.items():
        np.testing.assert_array_equal(out[k], v, err_msg=k)


def test_export_torch_inverse_of_convert(rng):
    """flax -> torch -> flax is the identity on the full model tree
    (every initialized leaf survives the roundtrip bit-for-bit, so no
    module is silently dropped by the export patterns)."""
    from univl_tpu.checkpoint.torch_convert import export_torch_state_dict

    cfg = UniVLConfig.tiny(stage_two=True, do_pretrain=True, use_mil=True)
    model = UniVL(cfg)
    batch = make_batch(cfg, rng, with_caption=True, with_pretrain=True)
    params = model.init(jax.random.key(0), batch, deterministic=True)["params"]

    sd = export_torch_state_dict(params)
    tree, report = convert_torch_state_dict(sd)
    assert not report["unknown"], report["unknown"]
    merged, missing = merge_params(params, tree)
    assert not missing, missing
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(merged),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(path))


def test_export_torch_from_scan_layout(rng):
    """A scan_layers (stacked) tree exports identically to its loop-layout
    twin — export_torch_state_dict converts the layout internally."""
    from univl_tpu.checkpoint.layout import to_scan_layout
    from univl_tpu.checkpoint.torch_convert import export_torch_state_dict

    cfg = UniVLConfig.tiny(stage_two=True, do_pretrain=True, use_mil=True)
    sd = synth_reference_state_dict(cfg, rng)
    tree, _ = convert_torch_state_dict(sd)
    a = export_torch_state_dict(tree)
    b = export_torch_state_dict(to_scan_layout(tree))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_save_restore_roundtrip(tmp_path, rng):
    cfg = UniVLConfig.tiny()
    model = UniVL(cfg)
    batch = make_batch(cfg, rng)
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, variables["params"], metadata={"epoch": 3, "global_step": 77})
    zeros = jax.tree.map(jnp.zeros_like, variables["params"])
    restored, meta = restore_checkpoint(path, zeros)
    assert meta == {"epoch": 3, "global_step": 77}
    for a, b in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_roundtrip(tmp_path, rng):
    from univl_tpu.checkpoint.io import (
        restore_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    cfg = UniVLConfig.tiny()
    model = UniVL(cfg)
    batch = make_batch(cfg, rng)
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, variables["params"], metadata={"epoch": 1})
    zeros = jax.tree.map(jnp.zeros_like, variables["params"])
    restored, meta = restore_checkpoint_orbax(path, zeros)
    assert meta == {"epoch": 1}
    for a, b in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_restore_stage1_to_stage2(tmp_path, rng):
    """Stage-II init from a stage-I checkpoint: encoders overlaid,
    cross/decoder/heads left at init (reference init_preweight tolerance)."""
    cfg1 = UniVLConfig.tiny()  # stage one: no cross/decoder
    m1 = UniVL(cfg1)
    b1 = make_batch(cfg1, rng)
    v1 = m1.init(jax.random.key(0), b1, deterministic=True)
    path = str(tmp_path / "stage1.msgpack")
    save_checkpoint(path, v1["params"], metadata={"epoch": 0})

    cfg2 = cfg1.replace(stage_two=True, do_pretrain=True, use_mil=True,
                        task_type="caption")
    m2 = UniVL(cfg2)
    b2 = make_batch(cfg2, rng, with_caption=True, with_pretrain=True)
    v2 = m2.init(jax.random.key(1), b2, deterministic=True)

    merged, meta, missing = restore_checkpoint(path, v2["params"], partial=True)
    assert meta == {"epoch": 0}
    # encoders came from stage one
    np.testing.assert_array_equal(
        np.asarray(merged["word_embed"]["embedding"]),
        np.asarray(v1["params"]["word_embed"]["embedding"]),
    )
    # new modules were left at stage-two init
    assert any(m == "cross" or m.startswith("cross/") for m in missing)
    assert any(m == "decoder" or m.startswith("decoder/") for m in missing)
    out = m2.apply({"params": merged}, b2, deterministic=True)
    assert np.isfinite(float(out["loss"]))


def test_restore_adapts_old_zero1_states(tmp_path):
    """Old --zero1 checkpoints upgrade transparently on restore
    (checkpoint/layout.py _adapt_zero1_moments), like scan layouts:

      - pre-v2: m/v stored as ONE flat 1-D [T_pad] vector -> rechunked to
        [T_pad // 8192, 8192] (prefix-copy + zero-fill; padding is
        zero-moment in both layouts).
      - pre-v3: no flat fp32 master ``p`` -> synthesized from the
        checkpoint's own params (master == params bitwise by the v3
        invariant, train/zero1.py)."""
    import numpy as np
    from univl_tpu.checkpoint.io import restore_checkpoint, save_checkpoint
    from univl_tpu.train.zero1 import _CHUNK, Zero1State

    params = {
        "a": np.arange(2 * _CHUNK + 70, dtype=np.float32) * 0.5,
        "b": np.arange(_CHUNK + 30, dtype=np.float32) + 3.0,
    }
    total = sum(v.size for v in params.values())
    moments = np.arange(total, dtype=np.float32)
    old_pad = total + 412  # old 1-D padding granularity (whatever it was)
    old_flat = np.zeros(old_pad, np.float32)
    old_flat[:total] = moments
    # pre-v3 states had no ``p`` field — emulate the old 3-field NamedTuple
    # with the dict flax.serialization would have written for it
    old = {
        "step": np.asarray(7, np.int32), "m": old_flat, "v": old_flat * 2.0
    }
    path = str(tmp_path / "old_zero1.msgpack")
    save_checkpoint(path, {"params": params, "opt": old})

    rows = -(-total // _CHUNK) + 2  # new padding differs from the old one
    tmpl = {
        "params": {k: np.zeros_like(v) for k, v in params.items()},
        "opt": Zero1State(
            step=np.asarray(0, np.int32),
            m=np.zeros((rows, _CHUNK), np.float32),
            v=np.zeros((rows, _CHUNK), np.float32),
            p=np.zeros((rows, _CHUNK), np.float32),
        ),
    }
    restored, _ = restore_checkpoint(path, tmpl)
    got = restored["opt"]
    assert np.asarray(got.m).shape == (rows, _CHUNK)
    np.testing.assert_array_equal(
        np.asarray(got.m).reshape(-1)[:total], moments
    )
    np.testing.assert_array_equal(
        np.asarray(got.v).reshape(-1)[:total], moments * 2.0
    )
    assert np.all(np.asarray(got.m).reshape(-1)[total:] == 0.0)
    assert int(got.step) == 7
    # the synthesized master equals the checkpoint's params, flattened in
    # jax.tree.leaves order, zero-padded
    flat_p = np.asarray(got.p).reshape(-1)
    np.testing.assert_array_equal(
        flat_p[:total], np.concatenate([params["a"], params["b"]])
    )
    assert np.all(flat_p[total:] == 0.0)

    # current-layout checkpoints still roundtrip untouched
    save_checkpoint(path, {"params": params, "opt": got})
    again, _ = restore_checkpoint(path, tmpl)
    np.testing.assert_array_equal(np.asarray(again["opt"].m), np.asarray(got.m))
    np.testing.assert_array_equal(np.asarray(again["opt"].p), np.asarray(got.p))

"""Standalone checkpoint converter: torch univl.pretrained.bin <-> flax msgpack.

    python -m univl_tpu.cli.convert_checkpoint \
        --torch_bin weight/univl.pretrained.bin \
        --output univl.pretrained.msgpack \
        [--stage_two] [--do_pretrain] [--train_sim_after_cross] \
        [--text_num_hidden_layers 12 ...]

The module set in the flax tree depends on the config flags (stage-one
models have no cross/decoder, matching reference modeling.py:148), so pass
the same flags you will train/eval with. Conversion happens lazily at
--init_model time anyway; this tool is for one-time conversion + inspection.

Reverse direction (export a trained flax checkpoint back to the reference's
torch .bin layout, e.g. to evaluate with the original codebase):

    python -m univl_tpu.cli.convert_checkpoint \
        --export_torch --flax_params ckpt/params.msgpack.4 \
        --output univl_exported.bin
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="torch <-> flax checkpoint converter")
    p.add_argument("--export_torch", action="store_true",
                   help="reverse direction: flax params msgpack -> torch .bin "
                        "(reference layout, tied duplicates materialized)")
    p.add_argument("--flax_params", type=str, default=None,
                   help="with --export_torch: the params msgpack to export "
                        "(a params.msgpack.<epoch> / best.msgpack file)")
    p.add_argument("--torch_bin", required=False)
    p.add_argument("--output", required=True)
    p.add_argument("--stage_two", action="store_true")
    p.add_argument("--do_pretrain", action="store_true")
    p.add_argument("--train_sim_after_cross", action="store_true")
    p.add_argument("--text_num_hidden_layers", type=int, default=12)
    p.add_argument("--visual_num_hidden_layers", type=int, default=6)
    p.add_argument("--cross_num_hidden_layers", type=int, default=2)
    p.add_argument("--decoder_num_hidden_layers", type=int, default=3)
    p.add_argument("--max_words", type=int, default=48)
    p.add_argument("--max_frames", type=int, default=48)
    p.add_argument("--video_dim", type=int, default=1024)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_attention_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    p.add_argument("--vocab_size", type=int, default=30522)
    args = p.parse_args(argv)

    if args.export_torch:
        assert args.flax_params, "--export_torch requires --flax_params"
        from flax import serialization

        from univl_tpu.checkpoint.torch_convert import save_torch_bin

        with open(args.flax_params, "rb") as f:
            params = serialization.msgpack_restore(f.read())
        save_torch_bin(args.output, params)
        print("wrote", args.output)
        return

    assert args.torch_bin, "--torch_bin required (or use --export_torch)"
    import jax

    from univl_tpu.checkpoint.io import save_checkpoint
    from univl_tpu.checkpoint.torch_convert import (
        convert_torch_state_dict,
        load_torch_bin,
        merge_params,
    )
    from univl_tpu.config import UniVLConfig
    from univl_tpu.models.univl import UniVL

    cfg = UniVLConfig.base(
        text_num_hidden_layers=args.text_num_hidden_layers,
        visual_num_hidden_layers=args.visual_num_hidden_layers,
        cross_num_hidden_layers=args.cross_num_hidden_layers,
        decoder_num_hidden_layers=args.decoder_num_hidden_layers,
        max_words=args.max_words,
        max_frames=args.max_frames,
        video_dim=args.video_dim,
        stage_two=args.stage_two,
        do_pretrain=args.do_pretrain,
        train_sim_after_cross=args.train_sim_after_cross,
        use_mil=args.do_pretrain,
        batch_size_per_device=2,
    )
    if (args.hidden_size, args.num_attention_heads, args.intermediate_size,
            args.vocab_size) != (768, 12, 3072, 30522):
        arch = dict(
            hidden_size=args.hidden_size,
            num_attention_heads=args.num_attention_heads,
            intermediate_size=args.intermediate_size,
        )
        cfg = cfg.replace(
            bert=cfg.bert.replace(vocab_size=args.vocab_size, **arch),
            visual=cfg.visual.replace(vocab_size=args.video_dim, **arch),
            cross=cfg.cross.replace(**arch),
            decoder=cfg.decoder.replace(vocab_size=args.vocab_size, **arch),
        )
    model = UniVL(cfg)
    batch = {
        "input_ids": np.zeros((2, cfg.max_words), np.int32),
        "token_type_ids": np.zeros((2, cfg.max_words), np.int32),
        "attention_mask": np.ones((2, cfg.max_words), np.int32),
        "video": np.zeros((2, cfg.max_frames, cfg.video_dim), np.float32),
        "video_mask": np.ones((2, cfg.max_frames), np.int32),
    }
    if cfg.stage_two:
        batch.update(
            input_caption_ids=np.zeros((2, cfg.max_words), np.int32),
            decoder_mask=np.ones((2, cfg.max_words), np.int32),
            output_caption_ids=np.zeros((2, cfg.max_words), np.int32),
        )
        if cfg.do_pretrain:
            batch.update(
                masked_text=batch["input_ids"],
                token_labels=np.full((2, cfg.max_words), -1, np.int32),
                masked_video=batch["video"],
                video_labels_index=np.full((2, cfg.max_frames), -1, np.int32),
            )
    variables = jax.jit(lambda r: model.init(r, batch, deterministic=True))(
        jax.random.key(0)
    )

    sd = load_torch_bin(args.torch_bin)
    tree, report = convert_torch_state_dict(sd)
    params, missing = merge_params(variables["params"], tree)
    print(
        f"converted={len(report['converted'])} skipped/tied={len(report['skipped'])} "
        f"unknown={len(report['unknown'])} left-at-init={len(missing)}"
    )
    for name in report["unknown"]:
        print("  unknown torch param:", name)
    for name in missing:
        print("  left at random init:", name)
    save_checkpoint(args.output, params, metadata={"source": args.torch_bin})
    print("wrote", args.output)


if __name__ == "__main__":
    main()

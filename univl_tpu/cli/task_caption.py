"""Caption finetune/eval driver (reference: main_task_caption.py).

Usage example (YouCook2 with transcript, reference README.md:140-150):
    python -m univl_tpu.cli.task_caption \
        --do_train --datatype youcook --stage_two --vocab_file vocab.txt \
        --train_csv ... --val_csv ... --data_path ... --features_path ... \
        --init_model univl.pretrained.bin --output_dir ckpt \
        --lr 3e-5 --epochs 5 --batch_size 16 --max_words 128 --max_frames 96

Eval: beam-5 decode (static-shape, jitted) + BLEU/METEOR/ROUGE-L/CIDEr;
best model selected by BLEU-4 (reference main_task_caption.py:663-679);
hyp/ref dumps written to output_dir (reference :577-597).
"""

from __future__ import annotations

import os

import numpy as np

from univl_tpu.cli import common


def build_datasets(args, tokenizer):
    if args.datatype == "youcook":
        from univl_tpu.data.youcook import YoucookCaptionDataset

        mk = lambda csv: YoucookCaptionDataset(
            csv, args.data_path, args.features_path, tokenizer,
            feature_framerate=args.feature_framerate,
            max_words=args.max_words, max_frames=args.max_frames, seed=args.seed,
        )
        return (mk(args.train_csv) if args.do_train else None), mk(args.val_csv)
    if args.datatype == "msrvtt":
        from univl_tpu.data.msrvtt import MsrvttCaptionDataset

        mk = lambda split: MsrvttCaptionDataset(
            args.train_csv, args.data_path, args.features_path, tokenizer,
            split_type=split, max_words=args.max_words,
            max_frames=args.max_frames, seed=args.seed,
        )
        return (mk("train") if args.do_train else None), mk("test")
    raise ValueError(f"unknown datatype {args.datatype}")


def references_for(dataset, idx):
    if hasattr(dataset, "references"):
        return list(dataset.references(idx))
    return [dataset.reference_caption(idx)]


def main(argv=None):
    args = common.base_parser("UniVL-TPU on Caption Task").parse_args(argv)
    args.task_type = "caption"
    args = common.finalize_args(args)
    logger = common.get_logger(args.output_dir)
    assert args.vocab_file, "--vocab_file required"

    import jax

    from univl_tpu.data.batching import Batcher, pad_rows
    from univl_tpu.data.tokenization import WordPieceTokenizer
    from univl_tpu.evals.beam import CaptionGenerator
    from univl_tpu.evals.caption_metrics import compute_caption_metrics
    from univl_tpu.models.univl import UniVL

    tokenizer = WordPieceTokenizer(args.vocab_file, do_lower_case=args.do_lower_case)
    cfg = common.build_config(args, stage_two=True, task_type="caption", vocab_size=len(tokenizer))
    model = UniVL(cfg)
    train_ds, test_ds = build_datasets(args, tokenizer)

    example = {k: v for k, v in test_ds[0].items()}
    example_batch = {k: np.stack([v] * cfg.batch_size_per_device) for k, v in example.items()}
    params = common.load_init_params(args, model, example_batch, logger)

    eval_bs = min(args.batch_size_val, 32)

    # built ONCE, outside eval_fn: the generator's jitted encode + beam
    # decode take params as ARGUMENTS; per-epoch construction re-traced +
    # recompiled the full bucketed decode program every eval
    generator = CaptionGenerator(
        model, None, tokenizer,
        beam_size=5, max_len=args.max_words, batch_size=eval_bs,
        fused_decode=args.fused_decode,
        fused_vocab=getattr(args, "fused_vocab", None),
    )

    def eval_fn(p, epoch=None):
        gen = generator
        gen.params = {"params": p}
        hyps, refs = [], []
        b = Batcher(test_ds, eval_bs, shuffle=False, drop_last=False)
        keys = ("input_ids", "token_type_ids", "attention_mask", "video", "video_mask")

        def host_iter():
            for batch in b.epoch(0):
                n = next(iter(batch.values())).shape[0]
                yield n, {k: pad_rows(batch[k], eval_bs) for k in keys}

        # The eval loop is transfer-bound on slow links (docs/PERF.md
        # caption e2e): generate() blocks fetching the decoded tokens, so
        # without a prefetch thread the NEXT batch's host->device upload
        # cannot start until the current decode round-trips. Worker-side
        # device_put overlaps batch-building + upload with the running
        # decode (put_in_worker=False would not: the consumer thread is
        # blocked inside generate() for the whole step).
        stream = host_iter()
        if not getattr(args, "no_prefetch", False):
            from univl_tpu.data.batching import prefetch_to_device

            stream = prefetch_to_device(
                stream,
                put=lambda t: (t[0], jax.device_put(t[1])),
                put_in_worker=True,
            )
        idx = 0
        for n, padded in stream:
            texts = gen.generate(padded)[:n]
            hyps.extend(texts)
            for i in range(n):
                refs.append(references_for(test_ds, idx + i))
            idx += n
        metrics = compute_caption_metrics(refs, hyps)
        tag = f".{epoch}" if epoch is not None else ""
        with open(os.path.join(args.output_dir, f"hyp{tag}.txt"), "w") as f:
            f.write("\n".join(hyps))
        with open(os.path.join(args.output_dir, f"ref{tag}.txt"), "w") as f:
            f.write("\n".join(r[0] for r in refs))
        return metrics

    if args.do_train:
        batcher = Batcher(
            train_ds, args.batch_size, shuffle=True, seed=args.seed,
            grad_accum=args.gradient_accumulation_steps,
            num_workers=args.num_thread_reader,
        )
        trainer = common.make_trainer(args, model, len(batcher), logger)
        state = trainer.init_state(jax.random.key(args.seed), example_batch,
                                   params=params)
        state, best = common.run_train_epochs(
            args, trainer, state, batcher, logger,
            eval_fn=eval_fn if args.do_eval else None,
            select_key="Bleu_4", select_sign=1.0,
        )
        return best
    if args.do_eval:
        metrics = eval_fn(params)
        logger.info("Caption eval: %s", metrics)
        return metrics


if __name__ == "__main__":
    main()

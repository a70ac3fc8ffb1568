"""Retrieval finetune/eval driver (reference: main_task_retrieval.py).

Usage example (YouCook2 FT-Joint, reference README.md:80-89):
    python -m univl_tpu.cli.task_retrieval \
        --do_train --datatype youcook --vocab_file vocab.txt \
        --train_csv ... --val_csv ... --data_path ... --features_path ... \
        --init_model univl.pretrained.bin --output_dir ckpt \
        --lr 3e-5 --epochs 5 --batch_size 32 --max_words 48 --max_frames 48

FT-Align: add --train_sim_after_cross (reference README.md:93-95).
"""

from __future__ import annotations

import numpy as np

from univl_tpu.cli import common


DATATYPES = ("youcook", "msrvtt")


def build_datasets(args, tokenizer):
    if args.datatype == "youcook":
        from univl_tpu.data.youcook import YoucookRetrievalDataset

        train = YoucookRetrievalDataset(
            args.train_csv, args.data_path, args.features_path, tokenizer,
            feature_framerate=args.feature_framerate,
            max_words=args.max_words, max_frames=args.max_frames, seed=args.seed,
        ) if args.do_train else None
        test = YoucookRetrievalDataset(
            args.val_csv, args.data_path, args.features_path, tokenizer,
            feature_framerate=args.feature_framerate,
            max_words=args.max_words, max_frames=args.max_frames, seed=args.seed,
        )
        return train, test
    if args.datatype == "msrvtt":
        from univl_tpu.data.msrvtt import (
            MsrvttRetrievalEvalDataset,
            MsrvttRetrievalTrainDataset,
        )

        train = MsrvttRetrievalTrainDataset(
            args.train_csv, args.data_path, args.features_path, tokenizer,
            max_words=args.max_words, max_frames=args.max_frames,
            unfold_sentences=args.expand_msrvtt_sentences, seed=args.seed,
        ) if args.do_train else None
        test = MsrvttRetrievalEvalDataset(
            args.val_csv, args.features_path, tokenizer,
            max_words=args.max_words, max_frames=args.max_frames, seed=args.seed,
        )
        return train, test
    raise ValueError(f"unknown datatype {args.datatype}; choose from {DATATYPES}")


def eval_batches(dataset, batch_size):
    from univl_tpu.data.batching import Batcher

    b = Batcher(dataset, batch_size, shuffle=False, drop_last=False,
                grad_accum=1)
    keys = ("input_ids", "token_type_ids", "attention_mask", "video", "video_mask")
    for batch in b.epoch(0):
        yield {k: batch[k] for k in keys}


def main(argv=None):
    args = common.base_parser("UniVL-TPU on Retrieval Task").parse_args(argv)
    args = common.finalize_args(args)
    logger = common.get_logger(args.output_dir)
    assert args.task_type == "retrieval"
    assert args.vocab_file, "--vocab_file required"

    import jax

    from univl_tpu.data.batching import Batcher
    from univl_tpu.data.tokenization import WordPieceTokenizer
    from univl_tpu.evals.retrieval import RetrievalEvaluator
    from univl_tpu.models.univl import UniVL

    tokenizer = WordPieceTokenizer(args.vocab_file, do_lower_case=args.do_lower_case)
    cfg = common.build_config(args, task_type="retrieval", vocab_size=len(tokenizer))
    model = UniVL(cfg)
    train_ds, test_ds = build_datasets(args, tokenizer)

    example = test_ds[0]
    example_batch = {k: np.stack([v] * cfg.batch_size_per_device) for k, v in example.items()}
    params = common.load_init_params(args, model, example_batch, logger)

    mode = "cross" if (cfg.train_sim_after_cross or cfg.stage_two) else "joint"

    # built ONCE, outside eval_fn: the evaluator's jitted encode/pool/
    # cross programs take params as ARGUMENTS, so constructing a fresh
    # evaluator per epoch re-traced + recompiled identical programs every
    # eval (~20-60s each over the tunnel, docs/PERF.md compile table)
    evaluator = RetrievalEvaluator(model, None, batch_size=args.batch_size_val)

    def eval_fn(p, epoch=None):
        ev = evaluator
        ev.params = {"params": p}
        batches = eval_batches(test_ds, args.batch_size_val)
        if not getattr(args, "no_prefetch", False):
            # Overlap disk reads + tokenization with the device encode
            # loop (host-thread only: encode_dataset pads and downloads
            # host-side, so batches must stay numpy — put=identity).
            from univl_tpu.data.batching import prefetch_to_device

            batches = prefetch_to_device(
                batches, put=lambda b: b, put_in_worker=True
            )
        return ev.evaluate(batches, mode=mode)

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
            select_key="R1", select_sign=1.0,
        )
        return best
    if args.do_eval:
        metrics = eval_fn(params)
        logger.info("Retrieval eval (%s): %s", mode, metrics)
        return metrics


if __name__ == "__main__":
    main()

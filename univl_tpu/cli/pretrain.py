"""HowTo100M pretraining driver (reference: main_pretrain.py).

Stage I (reference README.md:212-223):
    python -m univl_tpu.cli.pretrain --do_pretrain --vocab_file vocab.txt \
        --train_csv HowTo100M.csv --data_path caption.pickle \
        --features_path features_dir --output_dir ckpt \
        --batch_size 1920 --gradient_accumulation_steps 16 --n_pair 3 \
        --lr 1e-4 --max_words 48 --max_frames 64 --sampled_use_mil

Stage II adds: --stage_two --pretrain_enhance_vmodal (README.md:233-247).

Checkpoint/resume: saves {params, opt_state, epoch, global_step} each epoch
(reference main_pretrain.py:258-308); resume with --load_checkpoint.
Preemption (SIGTERM) additionally records the in-epoch offset, so a
resumed run continues EXACTLY where it stopped — bit-identical to an
uninterrupted run — instead of replaying the interrupted epoch (the
reference loses all mid-epoch progress; epoch-granular restarts replay
up to a full epoch of work, hours at HowTo100M scale).
"""

from __future__ import annotations

import os
import pickle
import time

import numpy as np

from univl_tpu.cli import common


def add_pretrain_args(p):
    p.add_argument("--min_words", type=int, default=0)
    p.add_argument("--min_time", type=float, default=5.0)
    p.add_argument("--use_data_replicate", type=int, default=0)  # parity, unused
    p.add_argument("--pretrain_enhance_vmodal", action="store_true")
    p.add_argument("--checkpoint_model", type=str, default="pytorch_model.bin.checkpoint")
    p.add_argument("--checkpoint_backend", type=str, default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="orbax = rotating per-step directories with "
                        "keep-last-N policy (for long pretrains)")
    p.add_argument("--keep_checkpoints", type=int, default=3,
                   help="orbax backend: how many checkpoints to keep")
    p.add_argument("--async_checkpointing", action="store_true",
                   help="orbax backend: overlap the checkpoint disk write "
                        "with training (save returns after the device->host "
                        "copy; restore/close wait for pending writes)")
    p.add_argument("--checkpoint_every_steps", type=int, default=0,
                   help="also checkpoint the full train state every N "
                        "update-steps WITHIN an epoch (HowTo100M epochs are "
                        "~1M clips; per-epoch-only saves lose everything to "
                        "an unclean kill). Resume replays at most N-1 steps, "
                        "bit-identically (global_step-keyed rng + seeded "
                        "batcher order).")
    p.add_argument("--inject_crash_after", type=int, default=0,
                   help="fault injection: raise (NO checkpoint, simulating "
                        "an unclean kill) after N steps — tests the "
                        "periodic-checkpoint resume path")
    # --load_checkpoint / --no_preempt_checkpoint / --inject_preempt_after
    # come from common.base_parser (shared with the finetune drivers).
    return p


def main(argv=None):
    parser = add_pretrain_args(common.base_parser("UniVL-TPU Pretrain"))
    args = parser.parse_args(argv)
    args.do_pretrain = True
    args = common.finalize_args(args)
    logger = common.get_logger(args.output_dir)
    assert args.vocab_file, "--vocab_file required"

    import jax

    from univl_tpu.checkpoint.io import restore_checkpoint, save_checkpoint
    from univl_tpu.data.batching import Batcher
    from univl_tpu.data.howto100m import HowTo100MPretrainDataset
    from univl_tpu.data.tokenization import WordPieceTokenizer
    from univl_tpu.models.univl import UniVL

    tokenizer = WordPieceTokenizer(args.vocab_file, do_lower_case=args.do_lower_case)
    cfg = common.build_config(args, task_type="retrieval", vocab_size=len(tokenizer))
    model = UniVL(cfg)

    with open(args.data_path, "rb") as f:
        data_dict = pickle.load(f)
    ds = HowTo100MPretrainDataset(
        args.train_csv, data_dict, args.features_path, tokenizer,
        feature_framerate=args.feature_framerate,
        max_words=args.max_words, max_frames=args.max_frames,
        min_words=args.min_words, min_time=args.min_time,
        n_pair=args.n_pair, only_sim=not args.stage_two,
        use_mil=args.use_mil, sampled_use_mil=args.sampled_use_mil,
        pretrain_enhance_vmodal=args.pretrain_enhance_vmodal,
        video_dim=args.video_dim, seed=args.seed,
    )

    # per-sample arrays already carry the n_pair leading dim; the model
    # flattens, so the loader batch size stays in samples.
    example = ds[0]
    example_batch = {k: np.stack([v] * cfg.batch_size_per_device) for k, v in example.items()}
    params = common.load_init_params(args, model, example_batch, logger)

    batcher = Batcher(
        ds, args.batch_size, shuffle=True, seed=args.seed,
        grad_accum=args.gradient_accumulation_steps,
        num_workers=args.num_thread_reader,
    )
    trainer = common.make_trainer(args, model, len(batcher), logger)
    state = trainer.init_state(jax.random.key(args.seed), example_batch,
                               params=params)

    start_epoch, global_step, start_step_in_epoch = 0, 0, 0
    ckpt_path = os.path.join(args.output_dir, "train_state.msgpack")
    manager = None
    if args.checkpoint_backend == "orbax":
        from univl_tpu.checkpoint.manager import RotatingCheckpointManager

        manager = RotatingCheckpointManager(
            os.path.join(args.output_dir, "checkpoints"),
            max_to_keep=args.keep_checkpoints,
            async_save=bool(getattr(args, "async_checkpointing", False)),
        )
    if args.load_checkpoint:
        if manager is not None:
            restored, meta, step = manager.restore_latest(state)
            if restored is not None:
                state, start_epoch = restored, int(meta["epoch"]) + 1
                global_step = int(meta["global_step"])
                start_step_in_epoch = int(meta.get("in_epoch_step", 0))
                logger.info("resumed from orbax step %d (epoch %d, global_step %d)",
                            step, start_epoch, global_step)
            else:
                logger.warning(
                    "--load_checkpoint: no orbax checkpoint in %s — "
                    "starting from scratch", args.output_dir,
                )
        elif os.path.exists(ckpt_path):
            state, meta = restore_checkpoint(ckpt_path, state)
            start_epoch = int(meta["epoch"]) + 1
            global_step = int(meta["global_step"])
            start_step_in_epoch = int(meta.get("in_epoch_step", 0))
            logger.info("resumed from epoch %d, global_step %d", start_epoch, global_step)
        else:
            logger.warning(
                "--load_checkpoint: no checkpoint in %s — starting from "
                "scratch", args.output_dir,
            )
        if start_step_in_epoch:
            logger.info("exact mid-epoch resume: skipping %d completed "
                        "update-batches of epoch %d",
                        start_step_in_epoch, start_epoch + 1)

    # Preemption handling (no reference equivalent — the reference loses
    # any mid-epoch progress on kill): SIGTERM sets a flag; the step loop
    # saves a full train-state checkpoint and exits cleanly. Resume with
    # --load_checkpoint continues EXACTLY where the run stopped: the
    # checkpoint records the in-epoch offset, the batcher skips exactly
    # that many update-batches (deterministic seeded order), and the step
    # rng is keyed on global_step — so interrupted + resumed is
    # bit-identical to an uninterrupted run (tests/test_cli.py).
    # --inject_preempt_after N simulates the signal.
    preempt = common.make_preempt_flag(args)

    def _save_midtrain(epoch, in_epoch_step, preempted):
        # "epochs before `epoch` are complete" + the exact in-epoch offset
        # -> resume continues this epoch at the next update-batch
        meta = {"epoch": epoch - 1 if in_epoch_step else epoch,
                "global_step": global_step,
                "in_epoch_step": in_epoch_step, "preempted": preempted}
        if manager is not None:
            manager.save(global_step, state, metrics=meta)
        else:
            save_checkpoint(ckpt_path, state, metadata=meta)

    def _preempt_save(epoch, in_epoch_step):
        _save_midtrain(epoch, in_epoch_step, True)
        logger.info("preempted at epoch %d step %d: checkpoint saved, exiting",
                    epoch + 1, global_step)

    mw = common.MetricsWriter(args.output_dir)
    base_key = jax.random.key(args.seed)  # hoisted: ~3 ms host cost per key
    steps_at_start = global_step
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        # device-side loss accumulation; host sync only at n_display
        # boundaries (see common.run_train_epochs)
        loss_sum, n_steps = None, 0
        epoch_offset = start_step_in_epoch if epoch == start_epoch else 0
        it = common.make_input_iter(args, trainer, batcher, epoch,
                                    start_batch=epoch_offset)
        for batch in it:
            state, metrics = trainer.train_step(
                state, batch,
                jax.random.fold_in(base_key, global_step),
            )
            global_step += 1
            n_steps += 1
            loss_sum = metrics["loss"] if loss_sum is None else loss_sum + metrics["loss"]
            if common.preempt_hit(args, preempt, global_step - steps_at_start):
                _preempt_save(epoch, epoch_offset + n_steps)
                mw.close()
                if manager is not None:
                    manager.close()
                return state
            if (
                args.inject_crash_after
                and global_step - steps_at_start >= args.inject_crash_after
            ):
                raise RuntimeError("injected crash (no checkpoint)")
            if (
                args.checkpoint_every_steps
                and n_steps % args.checkpoint_every_steps == 0
            ):
                _save_midtrain(epoch, epoch_offset + n_steps, False)
                logger.info("periodic checkpoint at epoch %d step %d",
                            epoch + 1, global_step)
            if global_step % args.n_display == 0:
                sub = {k: round(float(v), 4) for k, v in metrics.items() if k != "loss"}
                logger.info(
                    "Epoch %d Step %d Loss %.6f (%s) Time/step %.3f",
                    epoch + 1, global_step, float(metrics["loss"]), sub,
                    (time.time() - t0) / n_steps,
                )
                mw.write("train", epoch=epoch, step=global_step,
                         loss=float(metrics["loss"]), **sub)
        total_loss = float(loss_sum) if loss_sum is not None else 0.0
        logger.info("Epoch %d done: mean loss %.6f", epoch + 1,
                    total_loss / max(n_steps, 1))
        mw.write("epoch", epoch=epoch, mean_loss=total_loss / max(n_steps, 1),
                 seconds=time.time() - t0, steps=n_steps)
        # full train-state checkpoint incl optimizer (main_pretrain.py:258-276)
        if manager is not None:
            manager.save(global_step, state,
                         metrics={"epoch": epoch, "global_step": global_step,
                                  "mean_loss": total_loss / max(n_steps, 1)})
        else:
            save_checkpoint(ckpt_path, state,
                            metadata={"epoch": epoch, "global_step": global_step})
            save_checkpoint(
                os.path.join(args.output_dir, f"params.msgpack.{epoch}"), state.params,
                metadata={"epoch": epoch, "global_step": global_step},
            )
        # SIGTERM between the last step and here: the epoch-end save above
        # already recorded the completed epoch — exit now rather than start
        # the next epoch inside a 30-90s preemption grace window
        if preempt["hit"]:
            logger.info("preempted at epoch %d end: checkpoint saved, exiting",
                        epoch + 1)
            mw.close()
            if manager is not None:
                manager.close()
            return state
    mw.close()
    if manager is not None:
        manager.close()
    return state


if __name__ == "__main__":
    main()

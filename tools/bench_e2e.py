"""End-to-end headline bench: flagship FT-Joint step WITH the real input path.

bench.py times the device step on one device-resident batch stack (a device
benchmark by design). This tool times the same flagship YouCook2-retrieval
FT-Joint configuration end to end — features read from disk (fixture-
generated at full shapes: 1024-dim features, max_words/max_frames 48),
tokenized + masked on host threads, transferred and dispatched every step
through the SAME pipeline the CLI drivers use (Batcher -> optional bf16
cast -> prefetch thread -> trainer.shard_batch -> train_step).

The gap between this number and bench.py's is the input pipeline + the
host->device link (a ~30 MB/s 25 ms-RTT tunnel here; PCIe on a local TPU
host). Reference being compared: the torch DataLoader(num_workers) feeding
DDP ranks (main_task_retrieval.py:213-222).

Usage: python tools/bench_e2e.py [--transfer_dtype float32|bfloat16]
           [--no_prefetch] [--steps N] [--warm_steps N]
Prints one summary line per run; docs/PERF.md records the results.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transfer_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--no_prefetch", action="store_true")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--warm_steps", type=int, default=8)
    args = ap.parse_args()

    import jax

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        jax.config.update("jax_default_prng_impl", "rbg")

    from univl_tpu.config import UniVLConfig
    from univl_tpu.data import fixtures
    from univl_tpu.data.batching import Batcher, cast_floats, prefetch_to_device
    from univl_tpu.data.tokenization import WordPieceTokenizer
    from univl_tpu.data.youcook import YoucookRetrievalDataset
    from univl_tpu.models.univl import UniVL
    from univl_tpu.parallel.mesh import make_mesh
    from univl_tpu.train.optimization import make_univl_optimizer
    from univl_tpu.train.trainer import Trainer

    batch = 32
    need = (args.steps + args.warm_steps + 2) * batch
    tmp = tempfile.mkdtemp(prefix="univl_e2e_")
    vocab = fixtures.make_vocab(os.path.join(tmp, "vocab.txt"))
    n_videos = -(-need // 8)
    csv_path, data_path, feat_path = fixtures.make_youcook(
        tmp, n_videos=n_videos, clips_per_video=8, video_dim=1024,
    )
    tok = WordPieceTokenizer(vocab)
    ds = YoucookRetrievalDataset(
        csv_path, data_path, feat_path, tok,
        max_words=48, feature_framerate=1.0, max_frames=48,
    )
    print(f"dataset: {len(ds)} clips, features {1024}-dim "
          f"(~{batch * 48 * 1024 * 4 / 1e6:.1f} MB/step fp32)", flush=True)

    cfg = UniVLConfig.base(
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=False,
        use_train_pallas=on_tpu,
        batch_size_per_device=batch,
    )
    model = UniVL(cfg)
    mesh = make_mesh()
    tx = make_univl_optimizer(
        lr=3e-5, t_total=1000, warmup_proportion=0.1,
        state_dtype="bfloat16" if on_tpu else None,
    )
    trainer = Trainer(model, tx, mesh, grad_accum_steps=1)

    batcher = Batcher(ds, batch_size=batch, shuffle=True, seed=0,
                      drop_last=True, num_workers=8)

    def host_iter():
        ep = 0
        produced = 0
        while produced < args.warm_steps + args.steps + 1:
            for b in batcher.epoch(ep):
                b = {k: v[None] for k, v in b.items()}
                if args.transfer_dtype != "float32":
                    b = cast_floats(b, args.transfer_dtype)
                yield b
                produced += 1
                if produced >= args.warm_steps + args.steps + 1:
                    return
            ep += 1

    if args.no_prefetch:
        it = (trainer.shard_batch(b) for b in host_iter())
    else:
        it = prefetch_to_device(host_iter(), put=trainer.shard_batch,
                                put_in_worker=False)

    first = next(it)
    state = trainer.init_state(jax.random.key(0), {
        k: v[0, : cfg.batch_size_per_device] for k, v in first.items()
    })
    # compile + warm (float() forces the sync; block_until_ready does not
    # synchronize on the tunneled axon backend)
    state, metrics = trainer.train_step(state, first, jax.random.key(1))
    _ = float(metrics["loss"])
    for i in range(args.warm_steps):
        state, metrics = trainer.train_step(state, next(it), jax.random.key(2 + i))
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = trainer.train_step(
            state, next(it), jax.random.key(100 + i))
    _ = float(metrics["loss"])  # one sync: drains the queued pipeline
    dt = (time.perf_counter() - t0) / args.steps
    print(
        f"e2e transfer={args.transfer_dtype} prefetch={not args.no_prefetch}"
        f" steps={args.steps}: {dt * 1e3:.1f} ms/step = {batch / dt:.0f} clips/s",
        flush=True,
    )


if __name__ == "__main__":
    main()

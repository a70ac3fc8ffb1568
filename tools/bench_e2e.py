"""End-to-end headline bench: flagship steps WITH the real input path.

bench.py times the device step on one device-resident batch stack (a device
benchmark by design). This tool times flagship configurations end to end —
features read from disk (fixture-generated at full shapes: 1024-dim
features, max_words/max_frames 48), tokenized + masked on host threads,
transferred and dispatched every step through the SAME pipeline the CLI
drivers use.

  --task train (default): YouCook2-retrieval FT-Joint training
    (Batcher -> optional bf16 cast -> prefetch thread ->
    trainer.shard_batch -> train_step). Reference being compared: the
    torch DataLoader(num_workers) feeding DDP ranks
    (main_task_retrieval.py:213-222).
  --task caption: the caption EVAL pipeline exactly as cli/task_caption.py
    runs it (Batcher -> pad -> CaptionGenerator encode -> beam-5 KV-cache
    decode -> wordpiece de-tokenize), batch 16 — the same regime as the
    decode-floor device profiles (docs/PERF.md), so the fused decode /
    fused vocab-top-k kernels get a real-input end-to-end number beside
    their device deltas. Reference being compared: beam search in
    main_task_caption.py:406-470.
  --task retrieval: the joint-mode retrieval EVAL exactly as
    cli/task_retrieval.py runs it (Batcher -> RetrievalEvaluator
    encode_dataset -> pooled sim matrix -> R@K), timed per full evaluate()
    pass with the serial vs host-prefetch loop interleaved (--ab_prefetch)
    — the measurement behind the round-4 eval-prefetch change. Reference
    being compared: eval_epoch in main_task_retrieval.py:360-460.

The gap between these numbers and bench.py's is the input pipeline + the
host->device link (a ~30 MB/s 25 ms-RTT tunnel here; PCIe on a local TPU
host).

Usage: python tools/bench_e2e.py [--task train|caption]
           [--transfer_dtype float32|bfloat16] [--no_prefetch] [--steps N]
           [--warm_steps N] [--no_fused_decode] [--no_fused_vocab]
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


def run_retrieval(args):
    """Joint-mode retrieval eval e2e: disk features -> Batcher ->
    encode_dataset -> pooled sim matrix -> R@K, whole evaluate() passes,
    serial vs host-prefetch loop interleaved in one process (the round-4
    eval-prefetch A/B)."""
    import jax

    on_tpu = jax.default_backend() == "tpu"

    from univl_tpu.config import UniVLConfig
    from univl_tpu.data import fixtures
    from univl_tpu.data.batching import Batcher, cast_floats, prefetch_to_device
    from univl_tpu.data.tokenization import WordPieceTokenizer
    from univl_tpu.data.youcook import YoucookRetrievalDataset
    from univl_tpu.evals.retrieval import RetrievalEvaluator
    from univl_tpu.models.univl import UniVL

    tmp = tempfile.mkdtemp(prefix="univl_e2e_ret_")
    vocab = fixtures.make_vocab(os.path.join(tmp, "vocab.txt"))
    csv_path, data_path, feat_path = fixtures.make_youcook(
        tmp, n_videos=64, clips_per_video=8, video_dim=1024,
    )
    tok = WordPieceTokenizer(vocab)
    ds = YoucookRetrievalDataset(
        csv_path, data_path, feat_path, tok,
        max_words=48, feature_framerate=1.0, max_frames=48,
    )
    bs = 32
    cfg = UniVLConfig.base(
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=False, batch_size_per_device=bs,
    )
    model = UniVL(cfg)
    example = {k: np.stack([v] * bs) for k, v in ds[0].items()}
    params = jax.jit(
        lambda r: model.init(r, example, deterministic=True)
    )(jax.random.key(0))
    keys = ("input_ids", "token_type_ids", "attention_mask", "video",
            "video_mask")

    def host_iter():
        b = Batcher(ds, bs, shuffle=False, drop_last=False, grad_accum=1)
        for batch in b.epoch(0):
            out = {k: batch[k] for k in keys}
            if args.transfer_dtype != "float32":
                out = cast_floats(out, args.transfer_dtype)
            yield out

    ev = RetrievalEvaluator(model, params, batch_size=bs)

    def one_pass(prefetch):
        it = host_iter()
        if prefetch:
            # the driver's shape (cli/task_retrieval.py): host-thread only,
            # batches stay numpy (encode_dataset pads/downloads host-side)
            it = prefetch_to_device(it, put=lambda b: b, put_in_worker=True)
        t0 = time.perf_counter()
        m = ev.evaluate(it, mode="joint")
        return time.perf_counter() - t0, m

    dt, m = one_pass(False)  # compile + warm
    print(f"dataset: {len(ds)} clips; batch {bs}; joint mode; warm pass "
          f"{dt:.1f}s R@1={m['R1']:.3f} (transfer={args.transfer_dtype})",
          flush=True)
    best = {"serial  ": float("inf"), "prefetch": float("inf")}
    for trial in range(3):
        for name in best:
            dt, _ = one_pass(name == "prefetch")
            best[name] = min(best[name], dt)
            print(f"  {name} pass{trial}: {dt * 1e3:.0f} ms "
                  f"({len(ds) / dt:.0f} clips/s)", flush=True)
    for name, dt in best.items():
        print(f"e2e retrieval eval A/B {name.strip()}: best {dt * 1e3:.0f} "
              f"ms = {len(ds) / dt:.0f} clips/s "
              f"(transfer={args.transfer_dtype})", flush=True)


def run_caption(args):
    """Caption-eval e2e: disk features -> Batcher -> encode -> beam decode
    -> text, timed over whole eval batches (the cli/task_caption.py eval_fn
    loop at its real batch size)."""
    import jax

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        jax.config.update("jax_default_prng_impl", "rbg")

    from univl_tpu.config import UniVLConfig
    from univl_tpu.data import fixtures
    from univl_tpu.data.batching import Batcher
    from univl_tpu.data.tokenization import WordPieceTokenizer
    from univl_tpu.data.youcook import YoucookCaptionDataset
    from univl_tpu.evals.beam import CaptionGenerator
    from univl_tpu.models.univl import UniVL

    batch = 16  # the decode-floor profile regime (docs/PERF.md batch16)
    need = (args.steps + args.warm_steps + 1) * batch
    tmp = tempfile.mkdtemp(prefix="univl_e2e_cap_")
    # FULL-size 30,522-token vocab: the decode floor is dominated by the
    # vocab classifier + top-k, so the bench must run the real vocab; the
    # fixture tokens keep ids 0..~120 and filler [unusedN] rows make the
    # de-tokenizer total onto every decodable id.
    base = open(fixtures.make_vocab(os.path.join(tmp, "vb.txt"))).read().split()
    vocab = os.path.join(tmp, "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(
            base + [f"[unused{i}]" for i in range(30522 - len(base))]) + "\n")
    csv_path, data_path, feat_path = fixtures.make_youcook(
        tmp, n_videos=-(-need // 8), clips_per_video=8, video_dim=1024,
    )
    tok = WordPieceTokenizer(vocab)
    assert len(tok) == 30522, len(tok)
    ds = YoucookCaptionDataset(
        csv_path, data_path, feat_path, tok,
        max_words=48, feature_framerate=1.0, max_frames=48,
    )
    cfg = UniVLConfig.base(
        stage_two=True, task_type="caption",
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=False, batch_size_per_device=batch,
    )
    model = UniVL(cfg)
    params = jax.jit(
        lambda r: model.init(
            r,
            {k: np.stack([v] * batch) for k, v in ds[0].items()},
            deterministic=True,
        )
    )(jax.random.key(0))["params"]
    fused = None if on_tpu else False  # serving default: fused on TPU
    if args.no_fused_decode:
        fused = False
    fused_v = None if on_tpu else False
    if args.no_fused_vocab:
        fused_v = False
    keys = ("input_ids", "token_type_ids", "attention_mask", "video",
            "video_mask")

    def make_gen(fd, fv):
        return CaptionGenerator(
            model, {"params": params}, tok, beam_size=5, max_len=48,
            batch_size=batch, fused_decode=fd, fused_vocab=fv,
        )

    def batches(limit):
        from univl_tpu.data.batching import cast_floats

        ep, produced = 0, 0
        while True:
            b = Batcher(ds, batch, shuffle=True, seed=ep, drop_last=True,
                        num_workers=8)
            for bt in b.epoch(ep):
                out = {k: bt[k] for k in keys}
                if args.transfer_dtype != "float32":
                    # bf16 features on the wire (the e2e caption run is
                    # transfer-bound on this tunnel: 3.1 MB f32/batch16);
                    # the model computes in bf16 on TPU anyway, so only
                    # input fidelity changes — same contract as the train
                    # task's --transfer_dtype.
                    out = cast_floats(out, args.transfer_dtype)
                yield out
                produced += 1
                if produced >= limit:
                    return
            ep += 1

    if args.ab:
        # Tunnel throughput drifts 20%+ between PROCESSES (measured
        # round 4: the same fused config gave 140.6 then >25 min for
        # the identical run an hour later), so the fused-vs-unfused
        # comparison is only meaningful INTERLEAVED in one process —
        # the same protocol as tools/bench_fused_vocab.py. Each variant
        # decodes the SAME batch sequence; per-window ms and best-of
        # are reported per variant.
        print(f"dataset: {len(ds)} clips; beam 5, max_len 48, "
              f"batch {batch}; A/B fused(both) vs unfused", flush=True)
        gens = {"fused  ": make_gen(fused, fused_v),
                "unfused": make_gen(False, False)}
        warm = list(batches(args.warm_steps))
        for name, g in gens.items():
            texts = [g.generate(b) for b in warm][-1]
            assert len(texts) == batch
        timed = list(batches(args.steps))
        win = max(1, args.steps // 3)
        best = {k: float("inf") for k in gens}
        for trial in range(3):
            chunk = timed[trial * win:(trial + 1) * win]
            if not chunk:
                break
            for name, g in gens.items():
                t0 = time.perf_counter()
                for b in chunk:
                    g.generate(b)
                dt = (time.perf_counter() - t0) / len(chunk)
                best[name] = min(best[name], dt)
                print(f"  {name} window{trial}: {dt * 1e3:.1f} "
                      f"ms/batch{batch}", flush=True)
        for name, dt in best.items():
            print(f"e2e caption A/B {name.strip()}: best {dt * 1e3:.1f} "
                  f"ms/batch{batch} = {batch / dt:.1f} clips/s", flush=True)
        return

    if args.ab_prefetch:
        # Interleave no-prefetch / prefetch windows in ONE process (same
        # compiled fns, same protocol as --ab: tunnel drift between
        # processes swamps loop-structure deltas). Both variants consume
        # freshly-built host batches — prefetch overlaps building + upload
        # with the decode the consumer thread is blocked in.
        from univl_tpu.data.batching import prefetch_to_device

        gen = make_gen(fused, fused_v)
        print(f"dataset: {len(ds)} clips; beam 5, max_len 48, batch "
              f"{batch}; A/B prefetch vs serial "
              f"(transfer={args.transfer_dtype})", flush=True)
        for b in batches(args.warm_steps):
            texts = gen.generate(b)
        assert len(texts) == batch
        win = max(1, args.steps // 3)
        best = {"serial  ": float("inf"), "prefetch": float("inf")}
        for trial in range(3):
            for name in best:
                it = batches(win)
                if name == "prefetch":
                    it = prefetch_to_device(
                        it, put=jax.device_put, put_in_worker=True)
                t0 = time.perf_counter()
                for b in it:
                    gen.generate(b)
                dt = (time.perf_counter() - t0) / win
                best[name] = min(best[name], dt)
                print(f"  {name} window{trial}: {dt * 1e3:.1f} "
                      f"ms/batch{batch}", flush=True)
        for name, dt in best.items():
            print(f"e2e caption A/B {name.strip()}: best {dt * 1e3:.1f} "
                  f"ms/batch{batch} = {batch / dt:.1f} clips/s "
                  f"(transfer={args.transfer_dtype})", flush=True)
        return

    gen = make_gen(fused, fused_v)
    prefetch = not args.no_prefetch
    print(f"dataset: {len(ds)} clips; beam 5, max_len 48, batch {batch}, "
          f"fused_decode={fused} fused_vocab={fused_v} prefetch={prefetch}",
          flush=True)
    it = batches(args.warm_steps + args.steps)
    if prefetch:
        # same shape as cli/task_caption.py's eval loop: worker-side
        # device_put overlaps batch-building + upload with the decode the
        # consumer thread is blocked in
        from univl_tpu.data.batching import prefetch_to_device

        it = prefetch_to_device(it, put=jax.device_put, put_in_worker=True)
    texts = []
    for _ in range(args.warm_steps):  # compile + warm
        texts = gen.generate(next(it))
    assert len(texts) == batch
    t0 = time.perf_counter()
    n_out = 0
    for _ in range(args.steps):
        n_out += len(gen.generate(next(it)))
    dt = (time.perf_counter() - t0) / args.steps
    print(
        f"e2e caption eval steps={args.steps}: {dt * 1e3:.1f} ms/batch{batch}"
        f" = {n_out / (dt * args.steps):.1f} clips/s "
        f"(transfer={args.transfer_dtype} prefetch={prefetch})",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="train", choices=["train", "caption", "retrieval"])
    ap.add_argument("--transfer_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--no_prefetch", action="store_true")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--warm_steps", type=int, default=8)
    ap.add_argument("--no_fused_decode", action="store_true")
    ap.add_argument("--no_fused_vocab", action="store_true")
    ap.add_argument("--ab_prefetch", action="store_true",
                    help="caption only: interleave prefetch vs serial eval "
                         "loop windows in ONE process")
    ap.add_argument("--ab", action="store_true",
                    help="caption only: interleave fused vs unfused in ONE "
                         "process (tunnel drift between processes swamps "
                         "the kernel delta)")
    args = ap.parse_args()
    if args.task == "caption":
        return run_caption(args)
    if args.task == "retrieval":
        return run_retrieval(args)

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

"""Capture an xplane trace of N flagship train steps (bench.py config).

Usage: python tools/profile_train_step.py <out_dir> [n_steps=3] [variant]

variant: 'default' (bench config: fused train attention + bf16 Adam),
         'xla' (no Pallas), 'stage2' (stage-II pretrain micro-step,
         VERDICT round-1 item 8), 'ftalign' (train_sim_after_cross bs 32,
         both Pallas kernels — the docs/PERF.md 113 ms step),
         'zero1' (--zero1 dp=1: isolates the sharded optimizer's
         structural overhead vs 'default').
Then: python tools/hlo_top.py <out_dir> 25 <n_steps>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from univl_tpu.utils.profiling import trace


def main():
    out_dir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    variant = sys.argv[3] if len(sys.argv) > 3 else "default"

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from univl_tpu.config import UniVLConfig
    from univl_tpu.models.univl import UniVL
    from univl_tpu.parallel.mesh import make_mesh
    from univl_tpu.train.optimization import make_univl_optimizer
    from univl_tpu.train.trainer import Trainer
    from __graft_entry__ import _make_batch

    on_tpu = jax.default_backend() == "tpu"
    if variant == "stage2":
        # reference stage-II micro config: 2 samples x 3 pairs, L=48/64
        cfg = UniVLConfig.base(
            compute_dtype="bfloat16" if on_tpu else "float32",
            use_pallas=False,
            use_train_pallas=False,  # auto threshold keeps these towers XLA
            stage_two=True,
            do_pretrain=True,
            use_mil=True,
            batch_size_per_device=6,
            max_frames=64,
        )
        batch_kw = dict(with_caption=True, with_pretrain=True)
    elif variant == "ftalign":
        cfg = UniVLConfig.base(
            compute_dtype="bfloat16" if on_tpu else "float32",
            use_pallas=False,
            use_train_pallas=on_tpu,
            use_fused_ffn=on_tpu,
            train_sim_after_cross=True,
            batch_size_per_device=32,
        )
        batch_kw = {}
    else:
        cfg = UniVLConfig.base(
            compute_dtype="bfloat16" if on_tpu else "float32",
            use_pallas=False,
            use_train_pallas=(variant in ("default", "zero1")) and on_tpu,
            batch_size_per_device=32,
        )
        batch_kw = {}
    model = UniVL(cfg)
    mesh = make_mesh()
    if variant == "zero1":
        from univl_tpu.train.zero1 import make_univl_zero1_optimizer

        tx = make_univl_zero1_optimizer(
            lr=3e-5, t_total=1000, dp=1, warmup_proportion=0.1,
        )
        trainer = Trainer(model, tx, mesh, zero1=True)
    else:
        tx = make_univl_optimizer(
            lr=3e-5, t_total=1000, warmup_proportion=0.1,
            state_dtype="bfloat16" if on_tpu else None,
        )
        trainer = Trainer(model, tx, mesh)

    per_dev = _make_batch(cfg, cfg.batch_size_per_device, **batch_kw)
    print("init_state...", flush=True)
    state = trainer.init_state(jax.random.key(0), per_dev)
    batch = {k: jax.numpy.stack([v]) for k, v in per_dev.items()}
    batch = trainer.shard_batch(batch)
    print("compiling + warmup...", flush=True)

    # warmup/compile outside the trace
    for i in range(3):
        state, metrics = trainer.train_step(state, batch, jax.random.key(i))
        print(f"  step {i} dispatched", flush=True)
    print("warm loss:", float(metrics["loss"]), flush=True)

    with trace(out_dir):
        for i in range(n_steps):
            state, metrics = trainer.train_step(state, batch, jax.random.key(100 + i))
        print("traced loss:", float(metrics["loss"]))  # sync inside the trace


if __name__ == "__main__":
    main()

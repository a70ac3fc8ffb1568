"""A/B: fused q/k/v projection GEMM vs three separate Dense calls.

Measures the flagship FT-Joint train step (bench.py configuration: B=32,
bf16, rbg PRNG, fused train attention) and, with --ft_align, the FT-Align
step, with config.fused_qkv off vs on. Reference being contested:
module_bert.py:149-197 (three separate Linear projections); the repo's MFU
accounting (docs/PERF.md) shows the [1536,768]x[768,768|3072] GEMM sink at
~60% MXU, which a 3x-wider N dimension should improve.

Timing per CLAUDE.md: chained train_steps dispatches + ONE host fetch
(block_until_ready does not sync on the axon backend).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_variant(fused_qkv: bool, ft_align: bool) -> float:
    import jax

    from univl_tpu.config import UniVLConfig
    from univl_tpu.models.univl import UniVL
    from univl_tpu.parallel.mesh import make_mesh
    from univl_tpu.train.optimization import make_univl_optimizer
    from univl_tpu.train.trainer import Trainer
    from __graft_entry__ import _make_batch

    on_tpu = jax.default_backend() == "tpu"
    n_dev = len(jax.devices())
    batch_per_dev = 32 if not ft_align else 24
    cfg = UniVLConfig.base(
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=False,
        use_train_pallas=on_tpu,
        batch_size_per_device=batch_per_dev,
        fused_qkv=fused_qkv,
    )
    if ft_align:
        cfg = cfg.replace(
            train_sim_after_cross=True,
            use_fused_ffn="auto_block" if on_tpu else False,
        )
    model = UniVL(cfg)
    mesh = make_mesh()
    tx = make_univl_optimizer(
        lr=3e-5, t_total=1000, warmup_proportion=0.1,
        state_dtype="bfloat16" if on_tpu else None,
    )
    trainer = Trainer(model, tx, mesh, grad_accum_steps=1)

    per_dev = _make_batch(cfg, batch_per_dev)
    state = trainer.init_state(jax.random.key(0), per_dev)
    gb = _make_batch(cfg, batch_per_dev * n_dev, seed=1)
    batch = trainer.shard_batch({k: v[None] for k, v in gb.items()})
    K = 5 if on_tpu else 2
    batches = jax.tree.map(lambda x: jax.numpy.stack([x] * K), batch)

    state, metrics = trainer.train_steps(state, batches, jax.random.key(1))
    loss = float(metrics["loss"][-1])

    calls = 4 if on_tpu else 2
    dt = float("inf")
    for rep in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        for i in range(calls):
            state, metrics = trainer.train_steps(
                state, batches, jax.random.key(2 + rep * calls + i)
            )
        _ = float(metrics["loss"][-1])
        dt = min(dt, (time.perf_counter() - t0) / (calls * K))
    clips = batch_per_dev * n_dev / dt
    print(json.dumps({
        "variant": "fused_qkv" if fused_qkv else "separate_qkv",
        "ft_align": ft_align,
        "ms_per_step": round(dt * 1e3, 2),
        "clips_per_sec": round(clips, 1),
        "warmup_loss": round(loss, 4),
    }))
    return clips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ft_align", action="store_true")
    ap.add_argument("--only", choices=["off", "on"], default=None,
                    help="run a single variant (for isolated processes)")
    args = ap.parse_args()
    if args.only != "on":
        bench_variant(False, args.ft_align)
    if args.only != "off":
        bench_variant(True, args.ft_align)


if __name__ == "__main__":
    main()

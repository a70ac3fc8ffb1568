"""Eval-mode encode throughput (both towers, deterministic), bs 64.

Guards the docs/PERF.md eval number (~45k clips/s) when the compute path
changes (e.g. the fused LayerNorm forward, round 2).

Usage: python tools/bench_encode.py [batches=40]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    import jax
    import jax.numpy as jnp

    from univl_tpu.config import UniVLConfig
    from univl_tpu.models.univl import UniVL

    on_tpu = jax.default_backend() == "tpu"
    bs = 64
    cfg = UniVLConfig.base(
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=False,
        batch_size_per_device=bs,
    )
    model = UniVL(cfg)

    @jax.jit
    def gen(key):
        ki, kv = jax.random.split(key)
        return (
            jax.random.randint(ki, (bs, cfg.max_words), 0, cfg.bert.vocab_size, jnp.int32),
            jnp.zeros((bs, cfg.max_words), jnp.int32),
            jnp.ones((bs, cfg.max_words), jnp.int32),
            jax.random.normal(kv, (bs, cfg.max_frames, cfg.video_dim), jnp.float32),
            jnp.ones((bs, cfg.max_frames), jnp.int32),
        )

    args = gen(jax.random.key(0))
    params = jax.jit(
        lambda r: model.init(
            r,
            {"input_ids": args[0], "token_type_ids": args[1],
             "attention_mask": args[2], "video": args[3], "video_mask": args[4]},
            deterministic=True,
        )
    )(jax.random.key(1))

    @jax.jit
    def encode(params, ids, tt, am, video, vm):
        seq, vis = model.apply(params, ids, tt, am, video, vm, method=UniVL.encode)
        return seq[:, 0, 0] + vis[:, 0, 0]  # small fetchable dependency

    out = encode(params, *args)
    _ = float(out[0])  # compile + sync

    t0 = time.perf_counter()
    for _ in range(nb):
        out = encode(params, *args)
    _ = float(out[0])
    dt = (time.perf_counter() - t0) / nb
    print(json.dumps({
        "ms_per_batch64": round(dt * 1000, 2),
        "clips_per_sec": round(bs / dt),
    }))


if __name__ == "__main__":
    main()

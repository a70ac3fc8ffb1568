"""Profile the KV-cache beam decode step (docs/PERF.md open item).

Captures an xplane trace of full-length (no-EOS ceiling) beam decodes at the
YouCook2 caption eval config (B=16, beam 5, max_words=128, 3-layer decoder)
and times the ceiling by chaining N decodes with ONE host fetch (the axon
tunnel does not synchronize on block_until_ready — docs/PERF.md).

Usage: python tools/profile_decode.py <out_dir> [n_timed=5] [max_len=128] [fused|unfused]
Then:  python tools/hlo_top.py <out_dir> 25 1   (totals = one decode batch)

max_len=32 + fused profiles the production FLOOR regime (the bucket-32
phase real captions exit inside) with both decode kernels ON — the
config behind docs/PERF.md's 21.9 ms/batch16 number.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else None
    n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    req_max_len = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    fused = len(sys.argv) > 4 and sys.argv[4] == "fused"

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from univl_tpu.config import UniVLConfig
    from univl_tpu.models.univl import UniVL
    from univl_tpu.evals.beam import make_fast_beam_decode_fn

    on_tpu = jax.default_backend() == "tpu"
    B, K, max_len = 16, 5, req_max_len
    cfg = UniVLConfig.base(
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=False,
        stage_two=True,
        task_type="caption",
        batch_size_per_device=B,
    )
    model = UniVL(cfg)

    rng = np.random.RandomState(0)
    Lw, Lf, D = cfg.max_words, cfg.max_frames, cfg.video_dim
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 30000, (B, Lw)), jnp.int32),
        "token_type_ids": jnp.zeros((B, Lw), jnp.int32),
        "attention_mask": jnp.ones((B, Lw), jnp.int32),
        "video": jnp.asarray(rng.randn(B, Lf, D), jnp.float32),
        "video_mask": jnp.ones((B, Lf), jnp.int32),
    }
    # caption keys so init creates the decoder params
    init_batch = dict(
        batch,
        input_caption_ids=jnp.asarray(rng.randint(1, 30000, (B, Lw)), jnp.int32),
        decoder_mask=jnp.ones((B, Lw), jnp.int32),
        output_caption_ids=jnp.asarray(rng.randint(1, 30000, (B, Lw)), jnp.int32),
    )
    params = jax.jit(lambda k: model.init(k, init_batch, deterministic=True))(
        jax.random.key(0)
    )

    seq_out, vis_out = jax.jit(
        lambda p, b: model.apply(
            p, b["input_ids"], b["token_type_ids"], b["attention_mask"],
            b["video"], b["video_mask"], method=UniVL.encode,
        )
    )(params, batch)

    # eos_id=-1 never matches a sampled token -> every decode runs the full
    # 128-step ceiling (the worst case; real captions exit at ~20-30 steps).
    decode = make_fast_beam_decode_fn(
        model, beam_size=K, max_len=max_len, bos_id=101, eos_id=-1, pad_id=0,
        fused_decode=fused or None, fused_vocab=fused or None,
    )
    print(f"max_len={max_len} fused={fused}", flush=True)

    args = (params, seq_out, vis_out, batch["attention_mask"], batch["video_mask"])
    t0 = time.time()
    seqs, scores = decode(*args)
    _ = np.asarray(scores)
    print(f"compile+first decode: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    for _ in range(n_timed):
        seqs, scores = decode(*args)
    _ = np.asarray(scores)
    dt = (time.time() - t0) / n_timed
    print(
        f"ceiling decode: {dt * 1000:.1f} ms/batch{B} "
        f"({dt / B * 1000:.1f} ms/caption)", flush=True,
    )

    if out_dir:
        from univl_tpu.utils.profiling import trace

        with trace(out_dir):
            seqs, scores = decode(*args)
            _ = np.asarray(scores)
        print(f"trace written to {out_dir}")


if __name__ == "__main__":
    main()

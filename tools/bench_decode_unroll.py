"""A/B UNIVL_TPU_DECODE_UNROLL for the production beam decode.

The round-4 floor profile left a ~6 ms wall-minus-self gap (~0.2 ms per
decode step of while_loop scheduling bubbles, docs/PERF.md) as the filed
next lever. Unrolling U decode steps per while_loop iteration
(evals/beam.py) pays that per-iteration bubble once per U steps.

Measures full beam decodes at the caption eval config (B=16, beam 5,
3-layer decoder) with BOTH fused kernels on (the production floor
configuration) for unroll in {1, 2, 4}, floor (max_len=32) and ceiling
(max_len=128) regimes. eos_id=-1 never matches so every decode runs its
full max_len. Timing: chained decodes + ONE host fetch (axon does not
sync on block_until_ready). Token trajectories are asserted identical
across unroll factors.

Usage: python tools/bench_decode_unroll.py [unrolls=1,2,4] [batch=16] [fused=1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from univl_tpu.config import UniVLConfig
    from univl_tpu.models.univl import UniVL
    from univl_tpu.evals.beam import make_fast_beam_decode_fn

    unrolls = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4").split(",")]

    on_tpu = jax.default_backend() == "tpu"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    fused = (sys.argv[3] if len(sys.argv) > 3 else "1") == "1"
    K = 5
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
    args = (params, seq_out, vis_out, batch["attention_mask"], batch["video_mask"])

    results = {}
    for max_len, regime in [(32, "floor"), (128, "ceiling")]:
        ref_tokens = None
        for u in unrolls:
            os.environ["UNIVL_TPU_DECODE_UNROLL"] = str(u)
            decode = make_fast_beam_decode_fn(
                model, beam_size=K, max_len=max_len,
                bos_id=101, eos_id=-1, pad_id=0,
                fused_decode=on_tpu and fused, fused_vocab=on_tpu and fused,
            )
            seqs, scores = decode(*args)
            toks = np.asarray(seqs)
            if ref_tokens is None:
                ref_tokens = toks
            else:
                np.testing.assert_array_equal(
                    ref_tokens, toks,
                    err_msg=f"unroll={u} changed the {regime} trajectory",
                )
            n = 8 if max_len == 32 else 3
            best = float("inf")
            for _rep in range(3):
                t0 = time.perf_counter()
                for _ in range(n):
                    seqs, scores = decode(*args)
                _ = np.asarray(scores)
                best = min(best, (time.perf_counter() - t0) / n)
            key = f"{regime}_u{u}"
            results[key] = round(best * 1e3, 2)
            print(json.dumps({
                "regime": regime, "unroll": u,
                "ms_per_batch16": results[key], "batch": B, "fused": fused,
            }), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

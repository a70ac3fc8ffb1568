"""Corpus-scale FT-Align rescoring wall-clock on the real chip.

Round-1 VERDICT item 5: the quadratic T x V cross-encoder rescoring
(evals/retrieval.py) was only exercised on tiny fixtures; YouCook2
validation is ~3.3k clips -> ~11M cross pairs. This measures the
device-resident path (cross_sim_matrix_device) at that scale.

The synthetic corpus is generated ON DEVICE (jax.random): the measurement
targets the encode + rescore device pipeline, not this environment's
~30 MB/s tunnel upload (a local TPU host moves the 0.65 GB of features at
PCIe rates; docs/PERF.md's input-pipeline section covers transfer costs).

Usage: python tools/bench_ftalign_rescore.py [N=3328] [tb=8] [vb=64]
Prints one JSON line with pairs/s and projected minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3328
    tb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    vb = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from univl_tpu.config import UniVLConfig
    from univl_tpu.evals.retrieval import RetrievalEvaluator
    from univl_tpu.models.univl import UniVL

    on_tpu = jax.default_backend() == "tpu"
    bs = 64
    fused_ffn = os.environ.get("FTA_FUSED_FFN", "")
    cfg = UniVLConfig.base(
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_pallas=False,
        use_fused_ffn=fused_ffn or False,  # FTA_FUSED_FFN=pallas opts in
        train_sim_after_cross=True,
        batch_size_per_device=bs,
    )
    model = UniVL(cfg)

    @jax.jit
    def gen_batch(key):
        ki, kv = jax.random.split(key)
        return {
            "input_ids": jax.random.randint(
                ki, (bs, cfg.max_words), 0, cfg.bert.vocab_size, jnp.int32
            ),
            "token_type_ids": jnp.zeros((bs, cfg.max_words), jnp.int32),
            "attention_mask": jnp.ones((bs, cfg.max_words), jnp.int32),
            "video": jax.random.normal(
                kv, (bs, cfg.max_frames, cfg.video_dim), jnp.float32
            ),
            "video_mask": jnp.ones((bs, cfg.max_frames), jnp.int32),
        }

    batch0 = gen_batch(jax.random.key(0))
    params = jax.jit(lambda r: model.init(r, batch0, deterministic=True))(
        jax.random.key(1)
    )

    ev = RetrievalEvaluator(model, params, batch_size=bs,
                            cross_text_block=tb, cross_video_block=vb)

    assert n % bs == 0, (n, bs)
    batches = [gen_batch(jax.random.key(10 + i)) for i in range(n // bs)]

    # warm both compiled programs (encode + stripe) outside the timing
    warm = ev.encode_dataset_device(iter(batches[:1]))
    _ = ev.cross_sim_matrix_device(warm)

    t0 = time.perf_counter()
    enc = ev.encode_dataset_device(iter(batches))
    _ = float(enc["text_emb"][0, 0])  # pooled embeddings land on host
    t_encode = time.perf_counter() - t0

    t0 = time.perf_counter()
    sim = ev.cross_sim_matrix_device(enc)
    t_rescore = time.perf_counter() - t0

    pairs = n * n
    print(json.dumps({
        "n_clips": n, "tb": tb, "vb": vb,
        "encode_s": round(t_encode, 2),
        "rescore_s": round(t_rescore, 2),
        "pairs": pairs,
        "pairs_per_sec": round(pairs / t_rescore),
        "total_min": round((t_encode + t_rescore) / 60, 2),
        "sim_checksum": float(np.asarray(sim).mean()),
    }))


if __name__ == "__main__":
    main()

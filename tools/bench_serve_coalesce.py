"""Measure caption-request coalescing under concurrent serving load.

N concurrent single-clip /v1/caption-style requests, flagship caption
config, real chip. Two servers' worth of dispatch policy, same model:
  - direct: each request decodes as its own padded batch behind the
    device lock (the --no-coalesce_captions path in cli/serve.py)
  - coalesced: CoalescingCaptionService merges queued requests into
    shared decode batches (the default path)

A beam decode costs the same for 1 clip as for batch_size clips (the
generator always runs its fixed-shape program), so direct serving pays
~N full decodes where coalesced pays ~N/batch_size. Results are asserted
identical between the two policies.

Usage: python tools/bench_serve_coalesce.py [n_requests=16] [trials=3]
"""

from __future__ import annotations

import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)

    from univl_tpu.config import UniVLConfig
    from univl_tpu.data import fixtures
    from univl_tpu.data.tokenization import WordPieceTokenizer
    from univl_tpu.models.univl import UniVL
    from univl_tpu.serving import CaptionService, CoalescingCaptionService

    import tempfile

    tmp = tempfile.mkdtemp(prefix="univl_serve_bench_")
    vocab = fixtures.make_vocab(os.path.join(tmp, "vocab.txt"))
    tok = WordPieceTokenizer(vocab)
    cfg = UniVLConfig.base(
        compute_dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
        stage_two=True,
        task_type="caption",
    )
    cfg = cfg.replace(
        bert=cfg.bert.replace(vocab_size=len(tok)),
        decoder=cfg.decoder.replace(vocab_size=len(tok)),
    )
    model = UniVL(cfg)
    B = 2
    batch = {
        "input_ids": np.ones((B, cfg.max_words), np.int32),
        "token_type_ids": np.zeros((B, cfg.max_words), np.int32),
        "attention_mask": np.ones((B, cfg.max_words), np.int32),
        "video": np.zeros((B, cfg.max_frames, cfg.video_dim), np.float32),
        "video_mask": np.ones((B, cfg.max_frames), np.int32),
        "input_caption_ids": np.ones((B, cfg.max_words), np.int32),
        "decoder_mask": np.ones((B, cfg.max_words), np.int32),
        "output_caption_ids": np.ones((B, cfg.max_words), np.int32),
    }
    params = {
        "params": jax.jit(
            lambda r: model.init(r, batch, deterministic=True)
        )(jax.random.key(0))["params"]
    }
    svc = CaptionService(model, params, tok, beam_size=5, batch_size=16)
    print(f"fused_decode resolved: {svc.fused_decode}", flush=True)

    rng = np.random.default_rng(0)
    clips = [
        rng.standard_normal((12, cfg.video_dim)).astype(np.float32)
        for _ in range(n_req)
    ]

    # warm/compile (one full-batch decode)
    t0 = time.perf_counter()
    svc.caption(clips[:16] if len(clips) >= 16 else clips)
    print(f"warm decode: {time.perf_counter() - t0:.1f}s", flush=True)

    lock = threading.Lock()

    def direct_one(c):
        with lock:
            return svc.caption([c])[0]

    co = CoalescingCaptionService(svc, device_lock=lock)

    def run(fn, label):
        best = None
        outs = None
        for t in range(trials):
            with ThreadPoolExecutor(max_workers=n_req) as ex:
                t0 = time.perf_counter()
                outs = list(ex.map(fn, clips))
                dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"{label} trial{t}: {dt * 1e3:.0f} ms "
                  f"({n_req / dt:.1f} req/s)", flush=True)
        return best, outs

    d_best, d_outs = run(direct_one, "direct   ")
    c_best, c_outs = run(lambda c: co.caption([c])[0], "coalesced")
    co.close()
    assert c_outs == d_outs, "coalesced captions differ from direct"
    print(f"speedup: {d_best / c_best:.2f}x "
          f"({n_req} concurrent single-clip requests)", flush=True)


if __name__ == "__main__":
    main()

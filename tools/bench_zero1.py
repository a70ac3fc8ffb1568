"""A/B the ZeRO-1 optimizer against the replicated BertAdam on ONE chip.

ZeRO-1 is a multi-chip feature (update time and moments divide by dp);
on dp=1 the collectives degenerate and what remains is its structural
overhead: the flat concat of ~300 gradient leaves + the slice-free
gather-free flat update vs the per-leaf fused update. This script
quantifies that single-chip cost for docs/PERF.md.

Timing per CLAUDE.md: chain N steps inside the driver loop and fetch ONE
scalar; block_until_ready does not sync on the axon backend.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from univl_tpu.config import UniVLConfig
from univl_tpu.models.univl import UniVL
from univl_tpu.parallel.mesh import make_mesh
from univl_tpu.train.optimization import make_univl_optimizer
from univl_tpu.train.zero1 import make_univl_zero1_optimizer
from univl_tpu.train.trainer import Trainer

B = 32
cfg = UniVLConfig.base(compute_dtype="bfloat16", batch_size_per_device=B,
                       use_train_pallas=True)
rng = np.random.RandomState(0)
Lw, Lf, D = cfg.max_words, cfg.max_frames, cfg.video_dim
batch = {
    "input_ids": jnp.asarray(rng.randint(0, cfg.bert.vocab_size, (B, Lw)), jnp.int32),
    "token_type_ids": jnp.zeros((B, Lw), jnp.int32),
    "attention_mask": jnp.ones((B, Lw), jnp.int32),
    "video": jnp.asarray(rng.randn(B, Lf, D), jnp.float32),
    "video_mask": jnp.ones((B, Lf), jnp.int32),
}
model = UniVL(cfg)
mesh = make_mesh(1)


def run(name, tr):
    state = tr.init_state(jax.random.key(0), batch)
    sb = tr.shard_batch({k: v[None] for k, v in batch.items()})
    # warm + compile
    state, m = tr.train_step(state, sb, jax.random.key(0))
    _ = float(m["loss"])
    for trial in range(3):
        t0 = time.time()
        N = 50
        for i in range(N):
            state, m = tr.train_step(state, sb, jax.random.key(i))
        loss = float(m["loss"])  # single host sync
        dt = (time.time() - t0) / N
        print(f"{name} trial{trial}: {dt*1e3:.2f} ms/step "
              f"({B/dt:.0f} clips/s) loss={loss:.4f}", flush=True)


tx_r = make_univl_optimizer(lr=1e-4, t_total=10000, warmup_proportion=0.1)
run("replicated", Trainer(model, tx_r, mesh))
tx_z = make_univl_zero1_optimizer(lr=1e-4, t_total=10000, dp=1, warmup_proportion=0.1)
run("zero1     ", Trainer(model, tx_z, mesh, zero1=True))

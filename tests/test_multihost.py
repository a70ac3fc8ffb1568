"""Multi-host data-parallel smoke: 2 real processes, 4 CPU devices each.

Round-1 VERDICT item 9: the `jax.process_count() > 1` branch of
`Trainer.shard_batch` (make_array_from_process_local_data assembly) and the
process-sharded `Batcher(process_count=2)` had no test at all. Here two
subprocesses form a real jax.distributed cluster (Gloo collectives over
localhost), each materializes only its half of the global batch, and both
run one identical train step over the global 8-device mesh — the losses
must agree exactly (they are pmean'd over the global dp axis, so any
assembly/placement mistake desynchronizes them).

Reference equivalent: single-node torch.distributed.launch DDP only
(SURVEY §5); this covers the multi-host scaling path the reference lacks.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{{port}}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2 and len(jax.devices()) == 8

import numpy as np

sys.path.insert(0, {repo!r})
from univl_tpu.config import UniVLConfig
from univl_tpu.data.batching import Batcher
from univl_tpu.models.univl import UniVL
from univl_tpu.parallel.mesh import make_mesh
from univl_tpu.train.optimization import make_univl_optimizer
from univl_tpu.train.trainer import Trainer

cfg = UniVLConfig.tiny()  # batch_size_per_device=4 -> global batch 32


class SyntheticDS:
    def __len__(self):
        return 64

    def __getitem__(self, i):
        r = np.random.RandomState(1000 + i)
        return {{
            "input_ids": r.randint(
                0, cfg.bert.vocab_size, (cfg.max_words,)
            ).astype(np.int32),
            "token_type_ids": np.zeros((cfg.max_words,), np.int32),
            "attention_mask": np.ones((cfg.max_words,), np.int32),
            "video": r.randn(cfg.max_frames, cfg.video_dim).astype(np.float32),
            "video_mask": np.ones((cfg.max_frames,), np.int32),
        }}


mesh = make_mesh()
model = UniVL(cfg)
tx = make_univl_optimizer(lr=1e-3, t_total=10)
trainer = Trainer(model, tx, mesh)

batcher = Batcher(
    SyntheticDS(), batch_size=32, shuffle=True, seed=0, num_workers=2,
    process_index=pid, process_count=2,
)
local = next(iter(batcher.epoch(0)))
assert local["input_ids"].shape[0] == 16, local["input_ids"].shape  # half
local = {{k: np.stack([v]) for k, v in local.items()}}  # accum axis
batch = trainer.shard_batch(local)
assert batch["input_ids"].shape == (1, 32, cfg.max_words)  # global assembly

# Known-answer assembly check: the assembled global batch must equal the
# single-process (process_count=1) Batcher order at every addressable
# position. Cross-process loss equality alone is true by construction of
# the pmean and cannot see a duplicated or misplaced half.
ref = next(iter(Batcher(
    SyntheticDS(), batch_size=32, shuffle=True, seed=0, num_workers=2,
).epoch(0)))
arr = batch["input_ids"]
checked = 0
for shard in arr.addressable_shards:
    sl = shard.index[1]
    lo = 0 if sl.start is None else sl.start
    np.testing.assert_array_equal(
        np.asarray(shard.data)[0],
        ref["input_ids"][lo : lo + shard.data.shape[1]],
    )
    checked += 1
assert checked == 4, checked
print("ASSEMBLY", pid, "OK", flush=True)

example = {{k: v[0][: cfg.batch_size_per_device] for k, v in local.items()}}
state = trainer.init_state(jax.random.key(0), example)
state, metrics = trainer.train_step(state, batch, jax.random.key(1))
print("LOSS", pid, repr(float(metrics["loss"])), flush=True)

# ZeRO-1 across processes: the m/v shards span BOTH hosts (P('dp') over
# the global 8-device mesh) and the psum_scatter/all_gather ride the
# cross-process collectives.
from univl_tpu.train.zero1 import make_univl_zero1_optimizer

txz = make_univl_zero1_optimizer(lr=1e-3, t_total=10, dp=8)
trz = Trainer(model, txz, mesh, zero1=True)
statez = trz.init_state(jax.random.key(0), example)
assert not statez.opt_state.m.sharding.is_fully_replicated
statez, mz = trz.train_step(statez, batch, jax.random.key(1))
print("ZLOSS", pid, repr(float(mz["loss"])), flush=True)

# ---- multi-host checkpointing (round-3 VERDICT item 7): the three things
# a preempted 2-host run needs are step (above), SAVE, and RESUME.
out_dir = sys.argv[3]
import os
from univl_tpu.checkpoint.io import restore_checkpoint, save_checkpoint

# (a) msgpack: the zero1 m/v shards span BOTH processes — save gathers
# them collectively, process 0 writes, the barrier orders the write
# before either process's restore.
ck = os.path.join(out_dir, "mh_state.msgpack")
save_checkpoint(ck, statez, metadata={{"global_step": 1}})
assert os.path.exists(ck)  # shared fs in this test
fresh = trz.init_state(jax.random.key(42), example)
restored, meta = restore_checkpoint(ck, fresh)
assert meta["global_step"] == 1
# numpy leaves re-shard on entry to the next step; it must continue
# exactly where the saved state would
statez, mz2 = trz.train_step(statez, batch, jax.random.key(2))
restored, mr2 = trz.train_step(restored, batch, jax.random.key(2))
print("RLOSS", pid, repr(float(mz2["loss"])), repr(float(mr2["loss"])),
      flush=True)

# (b) orbax manager: cross-host sharded save (each process writes its own
# shards; process 0 coordinates) and restore to the SAME shardings.
from univl_tpu.checkpoint.manager import RotatingCheckpointManager

mgr = RotatingCheckpointManager(os.path.join(out_dir, "ckpts"), max_to_keep=2)
mgr.save(1, statez, metrics={{"epoch": 0, "global_step": 2}})
tmpl = trz.init_state(jax.random.key(43), example)
ostate, ometa, ostep = mgr.restore_latest(tmpl)
assert ostep == 1 and ometa["global_step"] == 2
assert not ostate.opt_state.m.sharding.is_fully_replicated  # shardings kept
statez, mz3 = trz.train_step(statez, batch, jax.random.key(3))
ostate, mo3 = trz.train_step(ostate, batch, jax.random.key(3))
mgr.close()
print("OLOSS", pid, repr(float(mz3["loss"])), repr(float(mo3["loss"])),
      flush=True)

# (c) sharded retrieval eval assembly: encode over the 2-process mesh,
# device-side sim matrix, host metrics — every process must see the full
# matrix (the all-gathering _host fetch) and identical R@K.
from univl_tpu.evals.retrieval import RetrievalEvaluator

ev = RetrievalEvaluator(model, {{"params": statez.params}}, batch_size=16,
                        mesh=mesh)
ds = SyntheticDS()
eval_batches = [
    {{k: np.stack([ds[i][k] for i in range(b, b + 16)]) for k in ds[0]}}
    for b in range(0, 32, 16)
]
metrics = ev.evaluate(iter(eval_batches), mode="joint")
print("EVAL", pid, repr(metrics["R1"]), repr(metrics["R5"]),
      repr(metrics["MR"]), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(repo=REPO))
    out_dir = tmp_path / "mh"
    out_dir.mkdir()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid), str(out_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"child failed:\n{out}"

    losses, zlosses, rlosses, olosses, evals = {}, {}, {}, {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                _, pid, val = line.split(maxsplit=2)
                losses[int(pid)] = float(eval(val))
            elif line.startswith("ZLOSS "):
                _, pid, val = line.split(maxsplit=2)
                zlosses[int(pid)] = float(eval(val))
            elif line.startswith("RLOSS "):
                _, pid, a, b = line.split(maxsplit=3)
                rlosses[int(pid)] = (float(eval(a)), float(eval(b)))
            elif line.startswith("OLOSS "):
                _, pid, a, b = line.split(maxsplit=3)
                olosses[int(pid)] = (float(eval(a)), float(eval(b)))
            elif line.startswith("EVAL "):
                _, pid, r1, r5, medr = line.split(maxsplit=4)
                evals[int(pid)] = (float(eval(r1)), float(eval(r5)),
                                   float(eval(medr)))
    assert set(losses) == {0, 1}, outs
    assert np.isfinite(losses[0])
    # both processes verified their shards against the known-answer order
    for pid in (0, 1):
        assert any(f"ASSEMBLY {pid} OK" in out for out in outs), outs
    # pmean'd over the global mesh -> every process sees the same loss
    assert losses[0] == losses[1], losses
    # zero1 runs cross-process too, on the same data -> same loss
    assert set(zlosses) == {0, 1}, outs
    assert zlosses[0] == zlosses[1] == losses[0], (zlosses, losses)
    # msgpack save of the CROSS-HOST-sharded zero1 state + restore + step:
    # the restored run continues bit-identically to the uninterrupted one
    assert set(rlosses) == {0, 1}, outs
    for pid in (0, 1):
        cont, resumed = rlosses[pid]
        assert cont == resumed, rlosses
    assert rlosses[0] == rlosses[1]
    # orbax manager: sharded save + restore_latest keeps shardings and
    # continues identically
    assert set(olosses) == {0, 1}, outs
    for pid in (0, 1):
        cont, resumed = olosses[pid]
        assert cont == resumed, olosses
    assert olosses[0] == olosses[1]
    # sharded retrieval eval: both processes assemble the SAME full sim
    # matrix and metrics
    assert set(evals) == {0, 1}, outs
    assert evals[0] == evals[1], evals
    assert 0.0 <= evals[0][0] <= 1.0 and evals[0][2] >= 1.0

    # True known answer: the SAME global batch + step on THIS process's
    # own 8-device mesh (single process) must produce the identical loss —
    # the multi-host assembly path is value-equivalent to single-host, not
    # merely internally consistent.
    expected = _single_process_loss()
    np.testing.assert_allclose(losses[0], expected, rtol=1e-6)


def _single_process_loss() -> float:
    """The oracle for the child computation: same dataset, same Batcher
    seed, same mesh shape (8 devices), same init/step keys — but one
    process. The child's CHILD script must mirror any change here."""
    import jax
    import numpy as np

    from univl_tpu.config import UniVLConfig
    from univl_tpu.data.batching import Batcher
    from univl_tpu.models.univl import UniVL
    from univl_tpu.parallel.mesh import make_mesh
    from univl_tpu.train.optimization import make_univl_optimizer
    from univl_tpu.train.trainer import Trainer

    cfg = UniVLConfig.tiny()

    class SyntheticDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            r = np.random.RandomState(1000 + i)
            return {
                "input_ids": r.randint(
                    0, cfg.bert.vocab_size, (cfg.max_words,)
                ).astype(np.int32),
                "token_type_ids": np.zeros((cfg.max_words,), np.int32),
                "attention_mask": np.ones((cfg.max_words,), np.int32),
                "video": r.randn(cfg.max_frames, cfg.video_dim).astype(np.float32),
                "video_mask": np.ones((cfg.max_frames,), np.int32),
            }

    mesh = make_mesh(8)
    trainer = Trainer(UniVL(cfg), make_univl_optimizer(lr=1e-3, t_total=10),
                      mesh)
    local = next(iter(Batcher(
        SyntheticDS(), batch_size=32, shuffle=True, seed=0, num_workers=2,
    ).epoch(0)))
    local = {k: np.stack([v]) for k, v in local.items()}
    batch = trainer.shard_batch(local)
    example = {k: v[0][: cfg.batch_size_per_device] for k, v in local.items()}
    state = trainer.init_state(jax.random.key(0), example)
    _, metrics = trainer.train_step(state, batch, jax.random.key(1))
    return float(metrics["loss"])

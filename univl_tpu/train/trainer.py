"""shard_map data-parallel trainer.

Replaces the reference's NCCL DDP train loop (main_task_retrieval.py:318-365,
main_pretrain.py:310-357) with a single compiled program per step:

  - batch sharded over the 'dp' mesh axis (DistributedSampler equivalent)
  - loss computed PER DEVICE on the local shard — this preserves the
    reference's per-GPU-negatives semantics for the similarity losses
    (mask shapes baked from batch_size // n_gpu, until_module.py:202-204)
  - gradients pmean'd over ICI (DDP all-reduce equivalent)
  - gradient accumulation via lax.scan over a leading micro-batch axis
    (reference divides loss by gradient_accumulation_steps and steps every
    N micro-batches, main_task_retrieval.py:339-353)
  - params replicated; optimizer update identical on every device

With a 2-D (dp, tp) mesh (parallel/tp.py, --tensor_parallel) the shard_map
stays manual over dp only and tp is an auto axis: GSPMD partitions the model
body along Megatron param shardings and the optimizer moments shard with the
params. tests/test_tp.py pins dp×tp ≡ dp-only equivalence.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from univl_tpu.parallel.mesh import DP_AXIS
from univl_tpu.parallel.tp import mesh_tp_size, state_shardings


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # global optimizer steps taken


def xla_options_from_env() -> Dict[str, str] | None:
    """Parse UNIVL_TPU_XLA_OPTIONS ("opt=val,opt2=val2") into per-jit XLA
    compiler options — the A/B surface for backend scheduling knobs (e.g.
    xla_tpu_enable_latency_hiding_scheduler; measured A/Bs in docs/PERF.md).
    Unknown names fail loudly at compile time, so a typo can't no-op."""
    import os

    raw = os.environ.get("UNIVL_TPU_XLA_OPTIONS", "").strip()
    if not raw:
        return None
    out: Dict[str, str] = {}
    for item in raw.split(","):
        if not item.strip():  # tolerate trailing/doubled commas
            continue
        k, _, v = item.partition("=")
        if not k.strip() or not v.strip():
            raise ValueError(
                f"UNIVL_TPU_XLA_OPTIONS: bad entry {item!r} "
                "(expected comma-separated opt=val pairs)"
            )
        out[k.strip()] = v.strip()
    return out or None


class Trainer:
    """Data-parallel trainer for any flax module whose apply returns a dict
    with key 'loss'."""

    def __init__(
        self,
        model,
        tx: optax.GradientTransformation,
        mesh: Mesh,
        grad_accum_steps: int = 1,
        donate: bool = True,
        zero1: bool = False,
        compiler_options: Dict[str, str] | None = None,
    ):
        self.model = model
        self.tx = tx
        self.mesh = mesh
        self.grad_accum_steps = grad_accum_steps
        # Tensor parallelism: with a 2-D (dp, tp) mesh the shard_map stays
        # manual over dp only (preserving per-device-negatives loss
        # semantics) and tp is an auto axis — GSPMD partitions the model
        # along the Megatron param shardings (parallel/tp.py).
        self.tp_size = mesh_tp_size(mesh)
        # ZeRO-1 (train/zero1.py): tx must be a zero1_bert_adam — grads are
        # reduce-scattered and the optimizer state/update sharded over dp
        # inside the step (no pmean of the full gradient tree). With tp > 1
        # tx must be a zero1_tp_bert_adam (train/zero1_tp.py): tp-sharded
        # leaves run per-leaf adam (moments GSPMD-sharded over tp),
        # tp-replicated leaves keep the flat dp-scattered path.
        self.zero1 = zero1
        # The zero1 transforms return the NEW param tree from update()
        # (Zero1Transformation.applies_params, train/zero1.py) and the
        # zero1 branch below consumes it directly; a mismatched pairing
        # would silently double-apply params — fail loudly instead.
        tx_applies = getattr(tx, "applies_params", False)
        if zero1 and not tx_applies:
            raise ValueError(
                "Trainer(zero1=True) requires a Zero1Transformation "
                "(make_univl_zero1_optimizer / make_univl_zero1_tp_optimizer); "
                f"got a standard optax transform {type(tx).__name__}"
            )
        if not zero1 and tx_applies:
            raise ValueError(
                "tx is a Zero1Transformation (update() returns the new param "
                "tree) but Trainer(zero1=False) would optax.apply_updates it "
                "— pass zero1=True"
            )
        # Per-step XLA overrides (e.g. the latency-hiding scheduler A/B in
        # docs/PERF.md); defaults from UNIVL_TPU_XLA_OPTIONS so bench.py and
        # every CLI driver can A/B scheduling knobs without code changes.
        if compiler_options is None:
            compiler_options = xla_options_from_env()
        self.compiler_options = dict(compiler_options) if compiler_options else None
        self._train_step, self._train_steps = self._build_train_step(donate)

    # ------------------------------------------------------------ #
    def init_state(self, rng: jax.Array, example_batch: Dict[str, jax.Array],
                   params=None) -> TrainState:
        """Initialize params/opt_state replicated over the mesh.

        ``example_batch`` should be a per-device-shaped batch (no accum axis).

        ``params``: use this pre-built tree (e.g. from
        common.load_init_params) instead of tracing model.init a second
        time (~20-60s of duplicate full-model compile over the tunnel).
        CRITICAL for zero1 + --init_model: the optimizer state must be
        built FROM the loaded params — the old driver pattern
        ``init_state(...).replace(params=loaded)`` left the zero1 fp32
        MASTER flattened from the discarded random init, silently
        corrupting the first update (the master, not state.params, is
        the authority the update adds into; train/zero1.py).
        """
        if params is None:
            variables = jax.jit(
                lambda r: self.model.init(r, example_batch, deterministic=True)
            )(rng)
            params = variables["params"]
        opt_state = self.tx.init(params)
        state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros([], jnp.int32))
        if self.zero1:
            repl = NamedSharding(self.mesh, P())
            row_sh = NamedSharding(self.mesh, P(DP_AXIS))
            if self.tp_size > 1:
                from univl_tpu.parallel.tp import param_pspecs
                from univl_tpu.train.zero1_tp import Zero1TpState

                pspecs = param_pspecs(params, self.tp_size)
                p_sh = jax.tree.map(lambda sp: NamedSharding(self.mesh, sp), pspecs)
                # leaf moments mirror the param tp shardings; flat-subset
                # placeholders (shape ()) are replicated
                lm_sh = jax.tree.map(
                    lambda sh, mom: sh if mom.ndim else repl,
                    p_sh, opt_state.leaf_m,
                )
                o_sh = Zero1TpState(
                    step=repl, m=row_sh, v=row_sh,
                    leaf_m=lm_sh, leaf_v=lm_sh,
                )
                return jax.device_put(
                    state, TrainState(params=p_sh, opt_state=o_sh, step=repl)
                )
            from univl_tpu.train.zero1 import Zero1State

            o_sh = Zero1State(step=repl, m=row_sh, v=row_sh, p=row_sh)
            return jax.device_put(
                state, TrainState(params=repl, opt_state=o_sh, step=repl)
            )
        if self.tp_size > 1:
            p_sh, o_sh = state_shardings(self.tx, params, opt_state, self.mesh)
            shardings = TrainState(
                params=p_sh, opt_state=o_sh,
                step=NamedSharding(self.mesh, P()),
            )
            return jax.device_put(state, shardings)
        # Pure DP: replicate across the mesh.
        repl = NamedSharding(self.mesh, P())
        return jax.device_put(state, repl)

    # ------------------------------------------------------------ #
    def _build_train_step(self, donate: bool):
        accum = self.grad_accum_steps
        model = self.model
        tx = self.tx

        def per_device_step(params, opt_state, step, batch, rng):
            """Runs on each device with its local batch shard.

            batch arrays: [accum, B_local, ...].
            """
            my_rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))

            def micro(carry, xs):
                grads_acc, loss_acc, metrics_acc = carry
                mb, i = xs
                r = jax.random.fold_in(my_rng, i)

                def loss_fn(p):
                    out = model.apply(
                        {"params": p}, mb, deterministic=False, rngs={"dropout": r}
                    )
                    return out["loss"], out

                (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                metrics = {k: v for k, v in out.items()}
                metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
                return (grads_acc, loss_acc + loss, metrics_acc), None

            zero_grads = jax.tree.map(lambda p: jnp.zeros_like(p), params)
            mb0 = jax.tree.map(lambda x: x[0], batch)
            # Trace once to get the metrics structure.
            zero_metrics = jax.eval_shape(
                lambda p: model.apply(
                    {"params": p}, mb0, deterministic=True
                ),
                params,
            )
            zero_metrics = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), zero_metrics
            )

            idx = jnp.arange(accum)
            (grads, loss_sum, metrics_sum), _ = jax.lax.scan(
                micro, (zero_grads, 0.0, zero_metrics), (batch, idx)
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = jax.tree.map(lambda m: m / accum, metrics_sum)

            # DDP equivalent: average grads over the dp axis (ICI psum).
            # Under ZeRO-1 the optimizer does the reduction itself
            # (psum_scatter of the flat gradient, train/zero1.py).
            if not self.zero1:
                grads = jax.lax.pmean(grads, DP_AXIS)
            metrics = jax.lax.pmean(metrics, DP_AXIS)

            updates, new_opt_state = tx.update(grads, opt_state, params)
            if self.zero1:
                # zero1 v3 contract (train/zero1.py): update_fn returns the
                # NEW parameter tree (unflatten(all_gather(master))) — an
                # apply_updates pass here would double-apply AND re-add the
                # full-size read-read-write pass the redesign removed.
                new_params = updates
            else:
                new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, metrics

        if self.zero1 and self.tp_size > 1:
            from univl_tpu.train.zero1_tp import zero1_tp_state_pspecs

            o_spec = zero1_tp_state_pspecs()
        elif self.zero1:
            from univl_tpu.train.zero1 import zero1_state_pspecs

            o_spec = zero1_state_pspecs()
        else:
            o_spec = P()
        mapped = shard_map(
            per_device_step,
            mesh=self.mesh,
            in_specs=(P(), o_spec, P(), P(None, DP_AXIS), P()),
            out_specs=(P(), o_spec, P()),
            check_vma=False,
            # With a (dp, tp) mesh only dp is manual; tp stays an auto axis
            # so GSPMD partitions the model body along the param shardings.
            **({"axis_names": frozenset({DP_AXIS})} if self.tp_size > 1 else {}),
        )

        @functools.partial(
            jax.jit,
            donate_argnums=(0,) if donate else (),
            compiler_options=self.compiler_options,
        )
        def train_step(state: TrainState, batch, rng):
            new_params, new_opt_state, metrics = mapped(
                state.params, state.opt_state, state.step, batch, rng
            )
            new_state = TrainState(
                params=new_params, opt_state=new_opt_state, step=state.step + 1
            )
            return new_state, metrics

        @functools.partial(
            jax.jit,
            donate_argnums=(0,) if donate else (),
            compiler_options=self.compiler_options,
        )
        def train_steps(state: TrainState, batches, rng):
            """K optimizer steps in ONE dispatch (lax.scan over the leading
            axis of ``batches``). On remote/tunneled hosts each dispatch
            costs ~wall-step time in host work (docs/PERF.md round 2:
            20.2 ms wall vs 17.4 ms device self time), so scanning K steps
            amortizes it and the chip runs back-to-back. Step i uses
            fold_in(rng, i)."""

            def body(st, xs):
                b, i = xs
                new_params, new_opt_state, metrics = mapped(
                    st.params, st.opt_state, st.step, b,
                    jax.random.fold_in(rng, i),
                )
                return (
                    TrainState(
                        params=new_params,
                        opt_state=new_opt_state,
                        step=st.step + 1,
                    ),
                    metrics,
                )

            n = jax.tree.leaves(batches)[0].shape[0]
            state, metrics = jax.lax.scan(
                body, state, (batches, jnp.arange(n))
            )
            return state, metrics

        return train_step, train_steps

    # ------------------------------------------------------------ #
    def train_step(self, state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        """One optimizer step.

        batch arrays must be [accum, global_batch, ...] with global_batch
        divisible by the mesh size.
        """
        return self._train_step(state, batch, rng)

    def train_steps(self, state: TrainState, batches, rng: jax.Array):
        """K optimizer steps in one dispatch.

        ``batches`` arrays are [n_steps, accum, global_batch, ...] (stack K
        sharded batches with shard_batch + tree stack, or upload them
        prefetched). Step i draws dropout from fold_in(rng, i) — equivalent
        to K train_step calls with those folded keys
        (tests/test_trainer.py::test_train_steps_scan_matches_sequential).
        Returns (state, metrics stacked [n_steps, ...])."""
        return self._train_steps(state, batches, rng)

    def shard_batch(self, batch: Dict[str, Any]):
        """Place a host batch onto the mesh, sharded over axis 1 (global batch).

        Multi-host: each process passes its LOCAL slice (from a
        process-sharded Batcher); the global array is assembled from the
        per-process shards without any cross-host copy."""
        sharding = NamedSharding(self.mesh, P(None, DP_AXIS))
        if jax.process_count() > 1:
            import numpy as _np

            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, _np.asarray(x)
                ),
                batch,
            )
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

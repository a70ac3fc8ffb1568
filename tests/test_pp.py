"""GPipe pipeline-parallel primitive tests (parallel/pp.py) on the
virtual 8-device CPU mesh.

Contract: the pipelined stack is the SAME function as the sequential
layer loop — forward values and parameter gradients — with the stacked
layer params sharded over the pp axis (stage s holds layers
[s*L/S, (s+1)*L/S)).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from univl_tpu.nn.layers import TransformerLayer, TransformerStack
from univl_tpu.parallel.pp import (
    make_mesh_pp,
    pipelined_stack_fn,
    place_stacked_params,
)


def _toy_body(lp, h):
    # residual dense block; finite on zero buffers (fill/drain ticks)
    return h + jnp.tanh(h @ lp["w"] + lp["b"])


def _toy_params(L, H, seed=0):
    r = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(r.randn(L, H, H) * 0.3, jnp.float32),
        "b": jnp.asarray(r.randn(L, H) * 0.1, jnp.float32),
    }


def _sequential(body, params_stacked, x):
    def step(h, lp):
        return body(lp, h), None

    y, _ = jax.lax.scan(step, x, params_stacked)
    return y


def test_pipeline_matches_sequential_fwd_and_grad():
    """(dp=2, pp=4) pipeline of an 8-layer toy stack == sequential scan:
    forward AND the full parameter gradient (AD through scan + ppermute
    gives the reverse pipeline)."""
    L, H, B, M = 8, 16, 8, 2
    mesh = make_mesh_pp(2, 4)
    params = _toy_params(L, H)
    x = jnp.asarray(np.random.RandomState(1).randn(B, H), jnp.float32)

    fn = jax.jit(pipelined_stack_fn(_toy_body, mesh, n_microbatches=M))
    pp_params = place_stacked_params(params, mesh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("dp")))

    y_pp = fn(pp_params, x_sh)
    y_seq = _sequential(_toy_body, params, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq),
                               rtol=1e-6, atol=1e-6)

    def loss_pp(p):
        return jnp.mean(fn(p, x_sh) ** 2)

    def loss_seq(p):
        return jnp.mean(_sequential(_toy_body, p, x) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(pp_params)
    g_seq = jax.grad(loss_seq)(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_pp[k]), np.asarray(g_seq[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def test_pipeline_real_transformer_layers():
    """Pipelining REAL TransformerLayer blocks (the scan_layers stacked
    param layout) reproduces TransformerStack's forward exactly."""
    L, H, B, M = 4, 32, 8, 4
    heads, inter = 4, 64
    kw = dict(hidden_size=H, num_heads=heads, intermediate_size=inter,
              dropout_rate=0.0, attn_dropout_rate=0.0)
    stack = TransformerStack(num_layers=L, scan_layers=True, **kw)
    x = jnp.asarray(np.random.RandomState(0).randn(B, 6, H), jnp.float32)
    bias = jnp.zeros((B, 1, 1, 6), jnp.float32)
    variables = stack.init(jax.random.key(0), x, bias, True)
    y_ref = stack.apply(variables, x, bias, True)

    layer = TransformerLayer(**kw)
    mesh = make_mesh_pp(2, 4)

    def body(lp, h):
        # zero bias => softmax well-defined on the zero fill/drain buffers
        b = jnp.zeros((h.shape[0], 1, 1, h.shape[1]), jnp.float32)
        return layer.apply({"params": lp}, h, b, True)

    fn = jax.jit(pipelined_stack_fn(body, mesh, n_microbatches=M))
    pp_params = place_stacked_params(variables["params"]["layers"], mesh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("dp")))
    y_pp = fn(pp_params, x_sh)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_param_memory_is_sharded():
    """Each stage holds exactly L/S layers' worth of parameters."""
    L, H = 8, 16
    mesh = make_mesh_pp(2, 4)
    pp_params = place_stacked_params(_toy_params(L, H), mesh)
    w = pp_params["w"]
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(L // 4, H, H)}

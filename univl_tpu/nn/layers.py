"""Core transformer building blocks (flax), TPU-first.

One parametric post-LN encoder block replaces the reference's three
copy-pasted towers (reference: modules/module_bert.py:149-281,
modules/module_visual.py:133-265, modules/module_cross.py:140-272 are
byte-identical apart from class names).

Numerical contract with the reference:
  - erf-GELU                       (reference: modules/until_module.py:28-33)
  - TF-style LayerNorm, eps=1e-12 inside the sqrt
                                   (reference: modules/until_module.py:40-53)
  - additive attention-mask bias (1 - mask) * -10000
                                   (reference: modules/module_bert.py:429-437)
  - post-LN residual blocks        (reference: modules/module_bert.py:200-264)

TPU-first details: matmuls run in ``compute_dtype`` (bf16 on TPU) with fp32
accumulation via ``preferred_element_type``; LayerNorm statistics are always
fp32; the attention core can be swapped for the fused Pallas kernel.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU, matching reference modules/until_module.py:28-33."""
    return jax.nn.gelu(x, approximate=False)


ACT2FN = {
    "gelu": gelu_erf,
    "relu": jax.nn.relu,
    "swish": jax.nn.swish,
}

MASK_BIAS = -10000.0
LN_EPS = 1e-12


def additive_mask_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, L] 0/1 mask -> [B, 1, 1, L] additive bias (0 keep, -10000 drop).

    Reference: modules/module_bert.py:429-437.
    """
    m = mask.astype(dtype)
    return ((1.0 - m) * MASK_BIAS)[:, None, None, :]


def _fused_ln_enabled() -> bool:
    """Opt-in gate (UNIVL_TPU_FUSED_LN=1) for the Pallas LayerNorm.

    Measured and REJECTED as a default in round 2 (docs/PERF.md): the
    train-step profile shows ~1.9 ms/step of LN stat fusions, but both the
    bwd-only and fwd+bwd Pallas variants land within noise of the XLA path
    end-to-end (1591 / 1575 vs 1586 clips/s) — XLA's LN work is already
    fused into neighboring ops, and the kernel's fusion breaks give the
    savings right back. Kept opt-in for future configs with fatter rows."""
    import os

    return bool(os.environ.get("UNIVL_TPU_FUSED_LN"))


class LayerNormTF(nn.Module):
    """TF-style LayerNorm: epsilon inside the sqrt, eps=1e-12.

    Reference: modules/until_module.py:40-53. Statistics are computed in
    fp32 regardless of input dtype; output is cast back to the input dtype.
    UNIVL_TPU_FUSED_LN=1 swaps in the Pallas custom-VJP version
    (kernels/layernorm.py, identical math) — opt-in only; measured a wash
    at UniVL shapes (docs/PERF.md round 2).
    """

    epsilon: float = LN_EPS

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        if _fused_ln_enabled():
            from univl_tpu.kernels.layernorm import fused_layer_norm

            return fused_layer_norm(x, scale, bias, self.epsilon)
        xf = x.astype(jnp.float32)
        u = jnp.mean(xf, axis=-1, keepdims=True)
        s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
        y = (xf - u) * jax.lax.rsqrt(s + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype)


def _dense(features: int, init_range: float, name: str, dtype) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=nn.initializers.normal(stddev=init_range),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def sdpa_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Scaled dot-product attention, XLA path.

    q,k,v: [B, H, L, D]; bias broadcastable to [B, H, Lq, Lk] additive.
    Softmax and score accumulation in fp32 (MXU fp32 accumulation).
    """
    head_dim = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(head_dim)
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


class MultiHeadAttention(nn.Module):
    """Multi-head attention with separate q/k/v inputs.

    Covers both the encoder self-attention (reference:
    modules/module_bert.py:149-197) and the decoder's generalized attention
    (reference: modules/module_decoder.py:195-247): pass ``kv`` for
    cross-attention.
    """

    num_heads: int
    head_dim: int
    dropout_rate: float = 0.1
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32
    # False: XLA; True: fused Pallas kernel; "auto": Pallas only in its
    # measured-winning regime — large batch AND short key length
    # (B*Lk >= 16384 and Lk <= 64; at longer Lk or small batch XLA's fused
    # attention wins end-to-end — docs/PERF.md).
    use_pallas: object = False
    # Training-mode fused attention (kernels/train_attention.py): custom VJP
    # with in-kernel prob dropout; the [B,H,Lq,Lk] fp32 scores/probs and the
    # u32 dropout bits never exist in HBM. "auto" = only at B*Lk >= 16384
    # (the pair-expanded FT-Align regime where that traffic dominates).
    use_train_pallas: object = False
    # Issue q/k/v as ONE [H, 3H] GEMM (self-attn; [H, 2H] k/v GEMM for
    # cross-attn) by concatenating the kernels at apply time. The reference
    # runs three separate Linear projections (module_bert.py:149-197); at
    # UniVL's [rows,768]x[768,768] shapes each small GEMM runs at ~60% MXU
    # (docs/PERF.md MFU accounting), so batching the N dimension 3x is the
    # standard fix. Param tree is UNCHANGED (query/key/value declared
    # individually — checkpoint contract intact); numerics are per-output-
    # column identical math, but XLA may retile, so equality is tolerance-
    # level, not bitwise.
    fused_qkv: bool = False

    @nn.compact
    def __call__(
        self,
        q_in: jax.Array,
        kv_in: Optional[jax.Array],
        bias: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        if kv_in is None:
            kv_in = q_in
        all_head = self.num_heads * self.head_dim
        if self.fused_qkv:
            wq, bq = _LinearParams(
                q_in.shape[-1], all_head, self.initializer_range, name="query"
            )()
            wk, bk = _LinearParams(
                kv_in.shape[-1], all_head, self.initializer_range, name="key"
            )()
            wv, bv = _LinearParams(
                kv_in.shape[-1], all_head, self.initializer_range, name="value"
            )()
            dt = self.dtype
            if kv_in is q_in:
                w = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
                b = jnp.concatenate([bq, bk, bv]).astype(dt)
                q, k, v = jnp.split(jnp.dot(q_in.astype(dt), w) + b, 3, axis=-1)
            else:
                q = jnp.dot(q_in.astype(dt), wq.astype(dt)) + bq.astype(dt)
                wkv = jnp.concatenate([wk, wv], axis=1).astype(dt)
                bkv = jnp.concatenate([bk, bv]).astype(dt)
                k, v = jnp.split(jnp.dot(kv_in.astype(dt), wkv) + bkv, 2, axis=-1)
        else:
            q = _dense(all_head, self.initializer_range, "query", self.dtype)(q_in)
            k = _dense(all_head, self.initializer_range, "key", self.dtype)(kv_in)
            v = _dense(all_head, self.initializer_range, "value", self.dtype)(kv_in)

        key_mask_bias = bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1

        train_impl = self.use_train_pallas
        if train_impl == "auto":
            train_impl = q.shape[0] * k.shape[1] >= 16384
        if (
            bool(train_impl)
            and not deterministic
            and key_mask_bias
            and jax.default_backend() == "tpu"
        ):
            from univl_tpu.kernels.train_attention import fused_train_attention

            seed = _kernel_dropout_seed(self, float(self.dropout_rate))
            key_mask = (bias[:, 0, 0, :] >= -1.0).astype(jnp.float32)
            # dense layout in/out: the [B,L,H,D] head-split transposes never
            # materialize in HBM (they cost ~0.9 ms EACH at FT-Align scale)
            return fused_train_attention(
                q, k, v, key_mask, seed, float(self.dropout_rate),
                self.num_heads,
            )

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)

        impl = self.use_pallas
        if impl == "auto":
            # measured-winning regime only (docs/PERF.md)
            impl = q.shape[0] * k.shape[2] >= 16384 and k.shape[2] <= 64
        use_fused = (
            bool(impl)
            and deterministic  # fused kernel has no attention-prob dropout
            and jax.default_backend() == "tpu"
        )
        if use_fused:
            from univl_tpu.kernels.attention import fused_attention

            ctx = fused_attention(q, k, v, bias)
        else:
            rng = (
                self.make_rng("dropout")
                if (self.dropout_rate > 0.0 and not deterministic)
                else None
            )
            ctx = sdpa_xla(
                q,
                k,
                v,
                bias,
                dropout_rate=self.dropout_rate,
                dropout_rng=rng,
                deterministic=deterministic,
            )
        b, h, l, d = ctx.shape
        return ctx.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _kernel_dropout_seed(mod: nn.Module, rate: float) -> jax.Array:
    """Scalar int32 seed for a Pallas-kernel dropout, drawn from the
    module's 'dropout' rng stream. rate == 0 draws no bits so callers in
    deterministic/eval traces don't have to provide the stream. Single
    source of truth for the seeding scheme (the kernels regenerate the
    mask from seed + program_id in fwd AND bwd — changing this draw must
    change every fused call site identically)."""
    if rate > 0.0:
        return jax.random.randint(
            mod.make_rng("dropout"), (), 0,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
        )
    return jnp.int32(0)


class _LinearParams(nn.Module):
    """Declares nn.Dense-compatible params without computing x @ W.

    Used by the fused-FFN path so the param tree stays byte-identical to the
    unfused path (checkpoint/layout contract, models/univl.py docstring)
    while the matmul itself runs inside the Pallas kernel.
    """

    in_features: int
    features: int
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.normal(stddev=self.initializer_range),
            (self.in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class ResidualOutput(nn.Module):
    """dense -> dropout -> add residual -> LayerNorm (post-LN).

    Covers BertSelfOutput and BertOutput (reference:
    modules/module_bert.py:200-211,239-250).
    """

    features: int
    dropout_rate: float = 0.1
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32
    # Fold dense -> dropout -> residual -> LN into one Pallas kernel
    # (kernels/ffn.py:fused_dense_block) — set by TransformerLayer in
    # --fused_ffn block mode at large row counts. Same param tree.
    fold_epilogue: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, residual: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        if self.fold_epilogue:
            from univl_tpu.kernels.ffn import fused_dense_block

            in_f = x.shape[-1]
            k, bb = _LinearParams(
                in_f, self.features, self.initializer_range, name="dense"
            )()
            scale, bias = _LNParams(self.features, name="ln")()
            rate = 0.0 if deterministic else float(self.dropout_rate)
            seed = _kernel_dropout_seed(self, rate)
            dt = self.dtype
            b_, l_, _ = x.shape
            return fused_dense_block(
                x.reshape(-1, in_f).astype(dt),
                residual.reshape(-1, self.features).astype(dt),
                k.astype(dt), bb.astype(dt), scale, bias, seed, rate, LN_EPS,
            ).reshape(b_, l_, self.features)
        h = _dense(self.features, self.initializer_range, "dense", self.dtype)(x)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return LayerNormTF(name="ln")(h + residual)


class _LNParams(nn.Module):
    """Declares LayerNormTF-compatible params without applying the norm
    (fused-FFN-block path: the LN runs inside the Pallas kernel)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class FusedFFNOutput(nn.Module):
    """Fused-FFN replacement for the (intermediate dense -> GELU ->
    ResidualOutput) pair. Declares the same param tree as ResidualOutput
    (``dense``, ``ln``) so checkpoints are interchangeable with the unfused
    path; the two matmuls + GELU run inside one Pallas kernel
    (kernels/ffn.py) and the [N, intermediate] activation never exists in
    HBM.

    ``fold_epilogue`` additionally folds dropout + residual + LayerNorm
    into the kernel (kernels/ffn.py:fused_ffn_block): the FFN output, the
    dropout mask and the pre-LN sum never round-trip HBM either. Dropout
    bits then come from the TPU PRNG (same stream-divergence caveat as the
    fused training attention, docs/PERF.md)."""

    in_features: int  # intermediate size
    features: int  # hidden size
    dropout_rate: float = 0.1
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32
    fold_epilogue: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, L, H] FFN input (attention block output)
        k1: jax.Array,
        b1: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        from univl_tpu.kernels.ffn import fused_ffn, fused_ffn_block

        k2, b2 = _LinearParams(
            self.in_features, self.features, self.initializer_range, name="dense"
        )()
        dt = self.dtype
        b, l, h = x.shape
        if self.fold_epilogue:
            scale, bias = _LNParams(self.features, name="ln")()
            rate = 0.0 if deterministic else float(self.dropout_rate)
            seed = _kernel_dropout_seed(self, rate)
            return fused_ffn_block(
                x.reshape(-1, h).astype(dt),
                k1.astype(dt), b1.astype(dt), k2.astype(dt), b2.astype(dt),
                scale, bias, seed, rate, LN_EPS,
            ).reshape(b, l, h)
        y = fused_ffn(
            x.reshape(-1, h).astype(dt),
            k1.astype(dt), b1.astype(dt), k2.astype(dt), b2.astype(dt),
        ).reshape(b, l, h)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return LayerNormTF(name="ln")(y + x)


class TransformerLayer(nn.Module):
    """Post-LN encoder block: self-attn + FFN (reference: module_bert.py:253-264)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str = "gelu"
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32
    use_pallas: object = False  # False | True | "auto"
    use_train_pallas: object = False  # False | True | "auto" (training attn)
    fused_qkv: bool = False  # single [H,3H] q/k/v GEMM (see MultiHeadAttention)
    # False | True | "auto": route dense -> GELU -> dense through the fused
    # Pallas kernel (kernels/ffn.py). "auto" fuses only when the flattened
    # row count is large enough for the [N, intermediate] activations to
    # dominate HBM traffic (the FT-Align / rescoring regime; docs/PERF.md).
    use_fused_ffn: object = False
    # Megatron sequence parallelism (parallel/sp.py): constrain the residual
    # stream to be sequence-sharded over the auto 'tp' mesh axis at both
    # block boundaries, so GSPMD turns the tp all-reduces into
    # reduce-scatter + all-gather and the LN/dropout/residual regions run
    # on 1/tp of the sequence. Trace-time no-op without a tp axis.
    seq_shard: bool = False
    # When used as an nn.scan body, __call__ must return (carry, per-step
    # output); the layer then returns (x, None) instead of x.
    scan_form: bool = False

    def _fused_ffn_active(self, rows: int) -> bool:
        impl = self.use_fused_ffn
        if impl in ("auto", "auto_block"):
            impl = rows >= 16384
        return (
            bool(impl)
            and self.hidden_act == "gelu"
            and self.hidden_size % 128 == 0
            and self.intermediate_size % 128 == 0
            and jax.default_backend() == "tpu"
        )

    def _fold_epilogue(self) -> bool:
        # "block"/"auto_block": also fold dropout+residual+LN into the
        # kernel (kernels/ffn.py:fused_ffn_block)
        return self.use_fused_ffn in ("block", "auto_block")

    @nn.compact
    def __call__(
        self, x: jax.Array, bias: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        attn = MultiHeadAttention(
            num_heads=self.num_heads,
            head_dim=self.hidden_size // self.num_heads,
            dropout_rate=self.attn_dropout_rate,
            initializer_range=self.initializer_range,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            use_train_pallas=self.use_train_pallas,
            fused_qkv=self.fused_qkv,
            name="attention",
        )(x, None, bias, deterministic=deterministic)
        rows = x.shape[0] * x.shape[1]
        attn_out = ResidualOutput(
            self.hidden_size,
            self.dropout_rate,
            self.initializer_range,
            self.dtype,
            fold_epilogue=(
                self._fold_epilogue() and self._fused_ffn_active(rows)
            ),
            name="attention_output",
        )(attn, x, deterministic=deterministic)
        if self.seq_shard:
            from univl_tpu.parallel.sp import seq_constrain

            attn_out = seq_constrain(attn_out)

        if self._fused_ffn_active(attn_out.shape[0] * attn_out.shape[1]):
            k1, b1 = _LinearParams(
                self.hidden_size,
                self.intermediate_size,
                self.initializer_range,
                name="intermediate",
            )()
            out = FusedFFNOutput(
                self.intermediate_size,
                self.hidden_size,
                self.dropout_rate,
                self.initializer_range,
                self.dtype,
                fold_epilogue=self._fold_epilogue(),
                name="output",
            )(attn_out, k1, b1, deterministic=deterministic)
        else:
            inter = _dense(
                self.intermediate_size, self.initializer_range, "intermediate",
                self.dtype,
            )(attn_out)
            inter = ACT2FN[self.hidden_act](inter)
            out = ResidualOutput(
                self.hidden_size,
                self.dropout_rate,
                self.initializer_range,
                self.dtype,
                name="output",
            )(inter, attn_out, deterministic=deterministic)
        if self.seq_shard:
            from univl_tpu.parallel.sp import seq_constrain

            out = seq_constrain(out)
        if self.scan_form:
            return out, None
        return out


class TransformerStack(nn.Module):
    """N identical post-LN blocks (reference: modules/module_bert.py:267-281).

    Optionally rematerialized (jax.checkpoint) to trade FLOPs for HBM.

    ``scan_layers=True`` rolls the N layers into one ``nn.scan`` over stacked
    parameters (param subtree ``layers`` with a leading [N] axis on every
    leaf, instead of ``layer_0..layer_{N-1}``). Same math, one traced layer:
    trace+compile time stops scaling with depth. Convert between the two
    parameter layouts with ``univl_tpu.checkpoint.layout``.
    """

    num_layers: int
    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str = "gelu"
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32
    use_pallas: object = False  # False | True | "auto"
    use_train_pallas: object = False  # False | True | "auto"
    use_fused_ffn: object = False  # False | True | "auto"
    fused_qkv: bool = False  # single [H,3H] q/k/v GEMM (see MultiHeadAttention)
    # remat: False | True (full layer) | "dots" (save matmul outputs,
    # recompute elementwise — cheaper than full; helps HBM-bound configs
    # like FT-Align where the saved GELU activations dominate traffic)
    remat: object = False
    scan_layers: bool = False
    seq_shard: bool = False  # sequence parallelism over tp (parallel/sp.py)

    @nn.compact
    def __call__(
        self, x: jax.Array, bias: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        layer_cls = TransformerLayer
        if self.remat == "dots":
            layer_cls = nn.remat(
                TransformerLayer, static_argnums=(3,),
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif self.remat:
            layer_cls = nn.remat(TransformerLayer, static_argnums=(3,))
        kw = dict(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            hidden_act=self.hidden_act,
            dropout_rate=self.dropout_rate,
            attn_dropout_rate=self.attn_dropout_rate,
            initializer_range=self.initializer_range,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            use_train_pallas=self.use_train_pallas,
            use_fused_ffn=self.use_fused_ffn,
            fused_qkv=self.fused_qkv,
            seq_shard=self.seq_shard,
        )
        if self.seq_shard:
            from univl_tpu.parallel.sp import seq_constrain

            x = seq_constrain(x)
        if self.scan_layers:
            scanned = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_layers,
            )
            x, _ = scanned(scan_form=True, name="layers", **kw)(
                x, bias, deterministic
            )
            return x
        for i in range(self.num_layers):
            x = layer_cls(name=f"layer_{i}", **kw)(x, bias, deterministic)
        return x


class Pooler(nn.Module):
    """First-token pooler: dense + tanh (reference: modules/module_bert.py:284-296)."""

    hidden_size: int
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        first = x[:, 0]
        return jnp.tanh(
            _dense(self.hidden_size, self.initializer_range, "dense", self.dtype)(first)
        )


class PredictionHeadTransform(nn.Module):
    """dense -> act -> LayerNorm (reference: modules/module_bert.py:299-311)."""

    hidden_size: int
    hidden_act: str = "gelu"
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _dense(self.hidden_size, self.initializer_range, "dense", self.dtype)(x)
        h = ACT2FN[self.hidden_act](h)
        return LayerNormTF(name="ln")(h)

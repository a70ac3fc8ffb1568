"""Configuration dataclasses for the UniVL-TPU framework.

Mirrors the knob surface of the reference configs:
  - BERT text encoder config    (reference: modules/module_bert.py:54-116)
  - Visual encoder config       (reference: modules/module_visual.py:45-102,
                                 modules/visual-base/visual_config.json)
  - Cross fusion encoder config (reference: modules/module_cross.py:45-106,
                                 modules/cross-base/cross_config.json)
  - Caption decoder config      (reference: modules/module_decoder.py:45-109,
                                 modules/decoder-base/decoder_config.json)

The reference loads per-module JSON files and then overrides ``num_hidden_layers``
from CLI flags via ``update_attr`` (reference: modules/modeling.py:98-104,133-158).
Here each config is an immutable dataclass with ``from_json`` + ``replace``.
"""

from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Shared transformer-encoder hyperparameters.

    All three reference towers (bert/visual/cross) share this exact block
    structure; only the embeddings differ.
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02

    @classmethod
    def from_json(cls, path: str, **overrides):
        with open(path, "r", encoding="utf-8") as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        d.update(overrides)
        return cls(**d)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclasses.dataclass(frozen=True)
class BertConfig(EncoderConfig):
    """Text encoder (BERT-base defaults, reference bert_config.json)."""


@dataclasses.dataclass(frozen=True)
class VisualConfig(EncoderConfig):
    """Visual encoder over S3D features.

    ``vocab_size`` doubles as the input feature dim (1024 = S3D dim); the
    "word embedding" is a Linear(1024 -> hidden) (reference:
    modules/module_visual.py:110).
    """

    vocab_size: int = 1024
    num_hidden_layers: int = 1


@dataclasses.dataclass(frozen=True)
class CrossConfig(EncoderConfig):
    """Fusion encoder over concatenated [text ; video] features.

    No token embedding: inputs are pre-computed features; position + type
    embeddings are added (reference: modules/module_cross.py:109-138).
    """

    vocab_size: int = 768
    num_hidden_layers: int = 2
    max_position_embeddings: int = 1024


@dataclasses.dataclass(frozen=True)
class DecoderConfig(EncoderConfig):
    """Autoregressive caption decoder (reference: modules/module_decoder.py)."""

    num_decoder_layers: int = 1
    max_target_embeddings: int = 512

    @property
    def num_layers(self) -> int:
        return self.num_decoder_layers


@dataclasses.dataclass(frozen=True)
class UniVLConfig:
    """Assembles the four module configs plus task-level knobs.

    Task knobs mirror the reference CLI surface
    (reference: main_task_retrieval.py:27-107, main_pretrain.py:26-113).
    """

    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    visual: VisualConfig = dataclasses.field(default_factory=VisualConfig)
    cross: CrossConfig = dataclasses.field(default_factory=CrossConfig)
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)

    # --- task config (reference args namespace) ---
    max_words: int = 48
    max_frames: int = 48
    video_dim: int = 1024
    margin: float = 0.1
    hard_negative_rate: float = 0.5
    negative_weighting: bool = False  # reference flag --negative_weighting (int 0/1)
    n_pair: int = 1
    use_mil: bool = False
    sampled_use_mil: bool = False
    stage_two: bool = False
    train_sim_after_cross: bool = False
    do_pretrain: bool = False
    pretrain_enhance_vmodal: bool = False
    task_type: str = "retrieval"  # retrieval | caption
    # per-device batch size; the losses bake this in (reference
    # modules/until_module.py:202-204,238-243 use batch_size // n_gpu)
    batch_size_per_device: int = 32

    # --- TPU-native knobs (no reference equivalent) ---
    compute_dtype: str = "float32"  # "bfloat16" for TPU speed
    # Fused Pallas attention (univl_tpu/kernels/attention.py): measured
    # ~parity with XLA at finetune shapes but 1.29x at pretrain-scale
    # batches (docs/PERF.md). False = always XLA (default, bit-parity
    # path), True = always Pallas, "auto" = Pallas only in its winning
    # regime (B*Lk >= 16384, deterministic mode).
    use_pallas: object = False
    # Training-mode fused attention (kernels/train_attention.py): custom VJP
    # + in-kernel prob dropout; kills the fp32 [B,H,L,L] score/prob/mask HBM
    # round-trips. "auto" = only at B*Lk >= 16384 (FT-Align's pair-expanded
    # cross tower). Dropout bits come from the TPU PRNG — same Bernoulli
    # distribution, different stream than the XLA path (docs/PERF.md).
    use_train_pallas: object = False
    # Fused Pallas FFN (univl_tpu/kernels/ffn.py): keeps the [N, 3072] GELU
    # activations in VMEM with a recompute backward. Wins only when the
    # flattened row count is large (FT-Align pair-expanded cross tower /
    # eval rescoring); False = XLA (default), True = always, "auto" = only
    # at >= 16384 rows. "block"/"auto_block" additionally fold the
    # dropout + residual + LayerNorm epilogue into the kernel (dropout
    # bits then come from the TPU PRNG, like use_train_pallas)
    # (docs/PERF.md).
    use_fused_ffn: object = False
    # Issue each encoder layer's q/k/v projections as ONE [768, 2304] GEMM
    # (kernel concat at apply time; param tree unchanged — see
    # nn/layers.py:MultiHeadAttention). The reference runs three separate
    # [768,768] Linears (module_bert.py:149-197) which the MFU accounting
    # profiled at ~60% MXU each. Encoder towers only; the caption decoder
    # keeps separate projections (the KV-cache fast decoder's bitwise
    # parity contract reads them individually).
    fused_qkv: bool = False
    remat: bool = False  # jax.checkpoint on encoder layers
    # Roll the tower layers into one nn.scan (stacked params, one traced
    # layer): cuts trace+compile time for deep towers at identical math.
    # Parameter layout changes from encoder/layer_i/... to encoder/layers/...
    # with a leading [num_layers] axis; checkpoint.layout converts both ways,
    # and checkpoint loading adapts automatically. The decoder stays unrolled
    # (3 layers; the KV-cache fast decoder reads its raw param paths).
    scan_layers: bool = False
    # Megatron sequence parallelism (parallel/sp.py): with tensor
    # parallelism, shard the encoder residual stream over the sequence dim
    # in the LN/dropout regions (reduce-scatter + all-gather replace the tp
    # all-reduces). Trace-time no-op without an auto tp mesh axis.
    sequence_parallel: bool = False

    @property
    def stage_one(self) -> bool:
        return not self.stage_two

    def validate(self):
        # Reference asserts at modules/modeling.py:115-118.
        assert self.max_words <= self.bert.max_position_embeddings
        assert self.max_words <= self.decoder.max_target_embeddings
        assert self.max_frames <= self.visual.max_position_embeddings
        assert (
            self.max_words + self.max_frames <= self.cross.max_position_embeddings
        )
        return self

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @classmethod
    def base(
        cls,
        text_num_hidden_layers: int = 12,
        visual_num_hidden_layers: int = 6,
        cross_num_hidden_layers: int = 2,
        decoder_num_hidden_layers: int = 3,
        **kw,
    ) -> "UniVLConfig":
        """Default run configuration matching reference CLI defaults
        (reference: main_task_retrieval.py:86-92)."""
        return cls(
            bert=BertConfig(num_hidden_layers=text_num_hidden_layers),
            visual=VisualConfig(num_hidden_layers=visual_num_hidden_layers),
            cross=CrossConfig(num_hidden_layers=cross_num_hidden_layers),
            decoder=DecoderConfig(num_decoder_layers=decoder_num_hidden_layers),
            **kw,
        ).validate()

    @classmethod
    def tiny(cls, **kw) -> "UniVLConfig":
        """Small config for tests: 2-layer towers, hidden 64."""
        enc = dict(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
        )
        defaults = dict(
            bert=BertConfig(vocab_size=512, **enc),
            visual=VisualConfig(vocab_size=32, **enc),
            cross=CrossConfig(vocab_size=64, max_position_embeddings=1024, **enc),
            decoder=DecoderConfig(
                vocab_size=512,
                num_decoder_layers=2,
                max_target_embeddings=512,
                **enc,
            ),
            max_words=16,
            max_frames=8,
            video_dim=32,
            batch_size_per_device=4,
            use_pallas=False,
        )
        defaults.update(kw)
        return cls(**defaults).validate()

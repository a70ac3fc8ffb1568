"""UniVL-TPU: a TPU-native (JAX/Flax/Pallas/pjit) rebuild of the capabilities
of microsoft/UniVL (reference mounted at /root/reference, arXiv:2002.06353).

Layout:
    config.py      configs (dataclasses mirroring the reference JSON + CLI knobs)
    nn/            parametric transformer towers + caption decoder (flax)
    kernels/       Pallas TPU kernels (fused attention, layernorm)
    models/        UniVL assembly + losses
    checkpoint/    torch state_dict -> flax pytree converter; orbax save/resume
    data/          WordPiece tokenizer, dataset readers, fixed-shape batching
    train/         BertAdam-clone optimizer (optax), shard_map DP trainer
    evals/         retrieval metrics/eval, jitted beam search, caption metrics
    cli/           drivers: pretrain / task_retrieval / task_caption
"""

__version__ = "0.1.0"

from univl_tpu.config import (
    BertConfig,
    CrossConfig,
    DecoderConfig,
    UniVLConfig,
    VisualConfig,
)

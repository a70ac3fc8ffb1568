from univl_tpu.nn.layers import (
    LayerNormTF,
    MultiHeadAttention,
    TransformerLayer,
    TransformerStack,
    Pooler,
    PredictionHeadTransform,
    gelu_erf,
    additive_mask_bias,
)
from univl_tpu.nn.towers import (
    TextEncoder,
    VisualEncoder,
    CrossEncoder,
    FeatureProjection,
)
from univl_tpu.nn.decoder import CaptionDecoder

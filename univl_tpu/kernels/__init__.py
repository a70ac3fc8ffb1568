from univl_tpu.kernels.attention import fused_attention

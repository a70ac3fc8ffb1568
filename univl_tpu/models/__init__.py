from univl_tpu.models.losses import (
    cross_en_loss,
    milnce_loss,
    max_margin_ranking_loss,
    masked_cross_entropy,
    mfm_nce_loss,
)
from univl_tpu.models.univl import UniVL

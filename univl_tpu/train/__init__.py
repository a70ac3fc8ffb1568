from univl_tpu.train.optimization import (
    bert_adam,
    make_univl_optimizer,
    warmup_linear,
    warmup_constant,
    warmup_cosine,
)
from univl_tpu.train.trainer import Trainer, TrainState
from univl_tpu.train.zero1 import (
    Zero1State,
    Zero1Transformation,
    make_univl_zero1_optimizer,
    zero1_bert_adam,
)

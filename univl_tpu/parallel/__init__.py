from univl_tpu.parallel.mesh import make_mesh, DP_AXIS
from univl_tpu.parallel.tp import make_mesh_2d, TP_AXIS
from univl_tpu.parallel.sp import seq_constrain
from univl_tpu.parallel.pp import (
    PP_AXIS,
    make_mesh_pp,
    pipeline_apply,
    pipelined_stack_fn,
    place_stacked_params,
)

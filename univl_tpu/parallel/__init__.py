from univl_tpu.parallel.mesh import make_mesh, DP_AXIS
from univl_tpu.parallel.tp import make_mesh_2d, TP_AXIS

from univl_tpu.parallel.mesh import make_mesh, DP_AXIS

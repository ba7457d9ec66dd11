from paramugsy_tpu.parallel.mesh import make_mesh

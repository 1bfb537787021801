from gfnet_tpu.parallel.mesh import create_mesh, batch_sharding, replicated_sharding

from inferbiomechanics_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, batch_sharding, DATA_AXIS,
)

__all__ = ['make_mesh', 'shard_batch', 'replicate', 'batch_sharding', 'DATA_AXIS']

from inferbiomechanics_tpu.parallel.mesh import (
    make_mesh, make_sweep_mesh, shard_batch, replicate, batch_sharding,
    CONFIG_AXIS, DATA_AXIS,
)
from inferbiomechanics_tpu.parallel.pipeline import (
    PIPE_AXIS, create_pipeline_state, make_pipeline_forward,
    make_pipeline_mesh, make_pipeline_train_step, to_canonical_params,
    to_pipeline_params,
)

__all__ = ['make_mesh', 'make_sweep_mesh', 'shard_batch', 'replicate',
           'batch_sharding',
           'CONFIG_AXIS', 'DATA_AXIS', 'PIPE_AXIS', 'make_pipeline_mesh',
           'create_pipeline_state', 'make_pipeline_train_step',
           'make_pipeline_forward', 'to_pipeline_params',
           'to_canonical_params']

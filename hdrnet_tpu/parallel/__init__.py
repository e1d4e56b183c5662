from hdrnet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    spatial_batch_sharding,
    replicated,
)

__all__ = ['make_mesh', 'batch_sharding', 'spatial_batch_sharding',
           'replicated']

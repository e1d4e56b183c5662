from hdrnet_tpu.ops.slice_ops import (
    bilateral_slice,
    bilateral_slice_apply,
    default_backend,
    set_default_backend,
)

__all__ = [
    'bilateral_slice',
    'bilateral_slice_apply',
    'default_backend',
    'set_default_backend',
]

from hdrnet_tpu.data.pipeline import (
    PIPELINES,
    DataPipeline,
    HDRpDataPipeline,
    ImageFilesDataPipeline,
    StyleTransferDataPipeline,
    UnsharpMaskDataPipeline,
    device_prefetch,
    make_pipeline,
)
from hdrnet_tpu.data.records import ShardReader, ShardWriter

__all__ = [
    'PIPELINES', 'DataPipeline', 'ImageFilesDataPipeline',
    'HDRpDataPipeline', 'StyleTransferDataPipeline',
    'UnsharpMaskDataPipeline', 'make_pipeline', 'device_prefetch',
    'ShardReader', 'ShardWriter',
]

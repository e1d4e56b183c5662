from hdrnet_tpu.utils import image, metadata, upgrade  # noqa: F401

"""hdrnet_tpu — a TPU-native deep bilateral learning framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the
reference HDRNet implementation (google/hdrnet, SIGGRAPH 2017):
real-time image enhancement via a low-res coefficient network, a learned
bilateral grid of local affine color transforms, and a fused
full-resolution slice-apply op — here a Pallas TPU kernel with custom
VJPs instead of the reference's C++/CUDA TensorFlow op.
"""

__version__ = '0.1.0'

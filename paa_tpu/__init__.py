"""paa_tpu: a TPU-native (JAX / Flax / pjit / Pallas) object-detection
framework with the capabilities of the PAA reference implementation
(Probabilistic Anchor Assignment with IoU Prediction, ECCV 2020).

Design stance (not a port): fixed-shape batched tensors end-to-end, the
GMM anchor assignment as vectorized on-device EM, post-processing as
static-shape masked top-k + on-device NMS, and data parallelism via
jax.sharding meshes instead of DDP/NCCL.
"""

__version__ = "0.1.0"

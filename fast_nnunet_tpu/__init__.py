"""Fast-nnUNet-TPU: a TPU-native (JAX/XLA/Pallas/pjit) medical 3D segmentation framework.

Re-implements the capability surface of 77even/Fast-nnUNet (nnUNetv2 pipeline +
knowledge distillation + fast inference engine) with a TPU-first design:

- functional JAX models (Flax linen) in channels-last layout feeding the MXU
- jit-compiled sliding-window inference with gaussian-weighted accumulation
  (the XLA answer to the reference's TensorRT engine, ref engine/fast_nnunet.cpp)
- pjit/shard_map data- and space-parallelism over a ``jax.sharding.Mesh``
  (replaces torch DDP/NCCL, ref distillation/nnunetv2/run/run_training.py:101-113)
- host-side numpy preprocessing with scipy parity to the reference
  (ref distillation/nnunetv2/preprocessing/*)
"""

__version__ = "0.1.0"

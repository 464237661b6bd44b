"""Lite student architecture construction for distillation.

Parity: nnUNetDistillationTrainer.build_network_architecture
(ref distillation/nnunetv2/training/nnUNetTrainer/variants/
nnUNetDistillationTrainer.py:605-758): students are the same UNet families with
- feature reduction: f -> max(f // reduction_factor, 8) per stage (ref :678)
- ResEnc block strategies reduce/keep/increase/adaptive mapping teacher block
  counts to student block counts (ref :688-708)
"""
from typing import Optional, Sequence

import jax.numpy as jnp

from .factory import get_network_from_plans

MIN_STUDENT_FEATURES = 8


def reduce_features(features_per_stage: Sequence[int], reduction_factor: int) -> tuple:
    return tuple(max(int(f) // reduction_factor, MIN_STUDENT_FEATURES)
                 for f in features_per_stage)


def apply_block_strategy(n_blocks_per_stage: Sequence[int], strategy: str) -> tuple:
    """Map teacher residual block counts to the student's.

    - 'reduce'  : halve (min 1) — default; cheapest student
    - 'keep'    : unchanged
    - 'increase': +1 per stage — trades capacity for width
    - 'adaptive': shallow stages keep blocks, deep stages halve (deep stages are
      cheap spatially but parameter-heavy, where distilled students can thin out)
    """
    blocks = [int(b) for b in n_blocks_per_stage]
    if strategy == "reduce":
        return tuple(max(1, b // 2) for b in blocks)
    if strategy == "keep":
        return tuple(blocks)
    if strategy == "increase":
        return tuple(b + 1 for b in blocks)
    if strategy == "adaptive":
        n = len(blocks)
        return tuple(b if i < n // 2 else max(1, b // 2) for i, b in enumerate(blocks))
    raise ValueError(f"Unknown block_reduction_strategy '{strategy}' "
                     "(expected reduce/keep/increase/adaptive)")


def build_student_arch_kwargs(teacher_arch_kwargs: dict, reduction_factor: int = 2,
                              block_reduction_strategy: str = "reduce") -> dict:
    kw = dict(teacher_arch_kwargs)
    kw["features_per_stage"] = list(reduce_features(kw["features_per_stage"],
                                                    reduction_factor))
    if "n_blocks_per_stage" in kw and kw.get("n_blocks_per_stage") is not None:
        kw["n_blocks_per_stage"] = list(apply_block_strategy(
            kw["n_blocks_per_stage"], block_reduction_strategy))
    return kw


def build_lite_student(arch_class_name: str, teacher_arch_kwargs: dict,
                       input_channels: int, num_classes: int,
                       reduction_factor: int = 2,
                       block_reduction_strategy: str = "reduce",
                       dtype: Optional[jnp.dtype] = None):
    """Build a LiteNNUNetStudent / LiteResEncStudent as a width-reduced instance
    of the corresponding full architecture."""
    student_kwargs = build_student_arch_kwargs(
        teacher_arch_kwargs, reduction_factor, block_reduction_strategy)
    return get_network_from_plans(arch_class_name, student_kwargs, (),
                                  input_channels, num_classes, dtype=dtype)

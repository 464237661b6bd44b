"""Weight init: He (kaiming) normal for leaky-ReLU, matching the reference's
InitWeights_He(1e-2) (ref distillation/nnunetv2/utilities/network_initialization.py):
std = sqrt(2 / ((1 + a^2) * fan_in)), normal distribution, zero bias."""
from flax import linen as nn


def he_normal_init(negative_slope: float = 1e-2):
    scale = 2.0 / (1.0 + negative_slope ** 2)
    return nn.initializers.variance_scaling(scale, mode="fan_in", distribution="normal")

from .unet import PlainConvUNet, ResidualEncoderUNet
from .factory import get_network_from_plans, build_network_from_arch_dict

__all__ = ["PlainConvUNet", "ResidualEncoderUNet", "get_network_from_plans",
           "build_network_from_arch_dict"]

from .fused_act import FusedLeakyReLU, fused_leaky_relu
from .resampling import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upsample_2d,
    upsample_conv_2d,
)
from .stft import STFT, hann_window, istft, stft
from .upfirdn2d import upfirdn2d, upfirdn2d_ref

__all__ = [
    "STFT",
    "stft",
    "istft",
    "hann_window",
    "upfirdn2d",
    "upfirdn2d_ref",
    "setup_kernel",
    "upsample_2d",
    "downsample_2d",
    "upsample_conv_2d",
    "conv_downsample_2d",
    "naive_upsample_2d",
    "naive_downsample_2d",
    "fused_leaky_relu",
    "FusedLeakyReLU",
]

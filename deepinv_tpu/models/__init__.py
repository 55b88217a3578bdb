from .base import Denoiser, Reconstructor, handle_sigma
from .layers import (
    Conv2d,
    ConvTranspose2d,
    Linear,
    Sequential,
    ReLU,
    LeakyReLU,
    GELU,
    Identity,
    AvgPool2d,
    MaxPool2d,
    UpsampleNearest,
    PixelShuffle,
    BatchNorm2d,
)
from .dncnn import DnCNN
from .drunet import DRUNet
from .unet import UNet
from .classic import (
    TVDenoiser,
    TGVDenoiser,
    WaveletDenoiser,
    WaveletDictDenoiser,
    MedianFilter,
    BilateralFilter,
    AnscombeDenoiser,
)
from .artifactremoval import ArtifactRemoval
from .utils import test_pad, test_onesplit

from .base import Denoiser, Reconstructor, handle_sigma
from .layers import (
    Conv2d,
    Conv3d,
    ConvTranspose2d,
    ConvTranspose3d,
    Linear,
    Sequential,
    ReLU,
    LeakyReLU,
    GELU,
    Identity,
    AvgPool2d,
    MaxPool2d,
    MaxPool3d,
    UpsampleNearest,
    PixelShuffle,
    BatchNorm2d,
    conv_nd,
    fix_dim,
)
from .utils3d import initialize_3d_from_2d
from .dncnn import DnCNN
from .drunet import DRUNet
from .unet import UNet
from .classic import (
    generalized_anscombe_transform,
    inverse_generalized_anscombe_transform,
    TVDenoiser,
    TVL1Denoiser,
    TGVDenoiser,
    WaveletDenoiser,
    WaveletDictDenoiser,
    MedianFilter,
    BilateralFilter,
    AnscombeDenoiser,
)
from .artifactremoval import ArtifactRemoval
from .utils import test_pad, test_onesplit
from .cnns import FFDNet, SRResNet, AutoEncoder, DScCP
from .wrappers_models import (
    GSDRUNet,
    EquivariantDenoiser,
    TimeAgnosticNet,
    TimeAveragingNet,
    ComplexDenoiser,
    to_complex_denoiser,
    ICNN,
    MMSE,
    WaveletNoiseEstimator,
    PatchCovarianceNoiseEstimator,
    GSPnP,
    EquivariantReconstructor,
    DiffusersDenoiserWrapper,
    ComplexDenoiserWrapper,
)
from .unrolled import MoDL, VarNet, VarNetBlock, PDNet, PDNet_PrimalBlock, PDNet_DualBlock, PanNet
from .gan import (
    PatchGANDiscriminator,
    ESRGANDiscriminator,
    DCGANGenerator,
    DCGANDiscriminator,
    CSGMGenerator,
)
from .diffunet import DiffUNet, EDMPrecond, GroupNorm
from .ncsnpp import NCSNpp
from .adm import ADMUNet
from .restormer import Restormer
from .dip import DeepImagePrior, ConvDecoder
from .bm3d import BM3D
from .misc_models import (
    MinusOneOneDenoiserWrapper,
    ScoreModelWrapper,
    EPLLDenoiser,
    Client,
)
from .swinir import SwinIR
from .scunet import SCUNet
from .ram import RAM
from .promptir import PromptIR
from .poisson2sparse import ConvLista, Poisson2Sparse
from .deal import DEAL
from .kernel_network import KernelIdentificationNetwork
from .vgg import VGG16Features
from .precision import AutocastDenoiser, autocast

from .base import (
    Physics,
    LinearPhysics,
    DecomposablePhysics,
    Denoising,
    ComposedPhysics,
    ComposedLinearPhysics,
    StackedPhysics,
    StackedLinearPhysics,
    compose,
    stack,
    adjoint_function,
)
from .noise import (
    NoiseModel,
    ZeroNoise,
    GaussianNoise,
    UniformGaussianNoise,
    PoissonNoise,
    GammaNoise,
    PoissonGaussianNoise,
    UniformNoise,
    LogPoissonNoise,
    SaltPepperNoise,
    FisherTippettNoise,
    RicianNoise,
    LaplaceNoise,
)
from .blur import Blur, BlurFFT, Downsampling, Upsampling, SpaceVaryingBlur, TiledSpaceVaryingBlur, DownsamplingMatlab
from .inpainting import Inpainting, Demosaicing
from .mri import MRI, MultiCoilMRI, DynamicMRI, SequentialMRI, MRIMixin
from .compressed_sensing import CompressedSensing
from .tomography import Tomography, Tomography3D, TomographyWithAstra
from .singlepixel import SinglePixelCamera
from .structured_random import StructuredRandom
from .phase_retrieval import (
    PhaseRetrieval,
    RandomPhaseRetrieval,
    StructuredRandomPhaseRetrieval,
    PtychographyLinearOperator,
    Ptychography,
)
from .misc import (
    Haze,
    SinglePhotonLidar,
    Decolorize,
    SpatialUnwrapping,
    HyperSpectralUnmixing,
    CompressiveSpectralImaging,
)
from .remote_sensing import Pansharpen
from .wrappers import (
    PhysicsMultiScaler,
    LinearPhysicsMultiScaler,
    PhysicsCropper,
    to_multiscale,
    VirtualLinearPhysics,
    BlurMultiScaler,
    BlurFFTMultiScaler,
    InpaintingMultiScaler,
)
from . import generator
from .radio import RadioInterferometry
from .scattering import BornOperator, Scattering
from .pet import PET

from . import functional  # reference-compatible functional namespace

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
from .blur import Blur, BlurFFT, Downsampling, Upsampling
from .inpainting import Inpainting, Demosaicing
from .mri import MRI, MultiCoilMRI, DynamicMRI, SequentialMRI, MRIMixin
from .compressed_sensing import CompressedSensing
from .tomography import Tomography

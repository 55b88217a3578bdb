from .base import PhysicsGenerator, GeneratorMixture, seed_from_string
from .blur import (
    MotionBlurGenerator,
    GaussianBlurGenerator,
    DiffractionBlurGenerator,
    ProductConvolutionBlurGenerator,
    TiledBlurGenerator,
    ConfocalBlurGenerator3D,
    PSFGenerator,
    DiffractionBlurGenerator3D,
    bump_function,
)
from .mri import (
    BaseMaskGenerator,
    GaussianMaskGenerator,
    RandomMaskGenerator,
    EquispacedMaskGenerator,
    PolyOrderMaskGenerator,
)
from .inpainting import (
    BernoulliSplittingMaskGenerator,
    GaussianSplittingMaskGenerator,
    MultiplicativeSplittingMaskGenerator,
    Phase2PhaseSplittingMaskGenerator,
    Artifact2ArtifactSplittingMaskGenerator,
)
from .noise import SigmaGenerator, GainGenerator, DownsamplingGenerator
from .zernike import zernike_basis, Zernike

from .iterators import SamplingIterator, ULAIterator, SKRockIterator, DiffusionIterator
SKROCKIterator = SKRockIterator  # reference spelling alias
from .base import BaseSampling, sampling_builder, ULA, SKRock, DiffusionSampler
from .diffusion import DDRM, DiffPIR, DPS
from .sde import (
    BaseSDE,
    BaseSDESolver,
    EDMDiffusionSDE,
    SongDiffusionSDE,
    NoisyDataFidelity,
    DiffusionSDE,
    VarianceExplodingDiffusion,
    VariancePreservingDiffusion,
    FlowMatching,
    EulerSolver,
    HeunSolver,
    PosteriorDiffusion,
    DPSDataFidelity,
)
from .utils import Welford, SDEOutput, projbox

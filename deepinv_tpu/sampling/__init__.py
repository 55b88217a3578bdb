from .iterators import SamplingIterator, ULAIterator, SKRockIterator
from .base import BaseSampling, sampling_builder, ULA, SKRock
from .diffusion import DDRM, DiffPIR, DPS
from .sde import (
    BaseSDE,
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

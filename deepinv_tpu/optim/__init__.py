from .linear import least_squares, conjugate_gradient, bicgstab, minres, lsqr
from .potential import Potential
from .distance import (
    Distance,
    L2Distance,
    IndicatorL2Distance,
    PoissonLikelihoodDistance,
    L1Distance,
    AmplitudeLossDistance,
    LogPoissonLikelihoodDistance,
    ZeroDistance,
)
from .data_fidelity import (
    DataFidelity,
    StackedPhysicsDataFidelity,
    L2,
    IndicatorL2,
    PoissonLikelihood,
    L1,
    AmplitudeLoss,
    LogPoissonLikelihood,
    ZeroFidelity,
    ItohFidelity,
)
from .prior import (
    Prior,
    Zero,
    PnP,
    RED,
    ScorePrior,
    Tikhonov,
    L1Prior,
    L12Prior,
    TVPrior,
    TVL1Prior,
    WaveletPrior,
)
from .bregman import Bregman, BregmanL2, BurgEntropy, NegEntropy, Bregman_ICNN
from .iterators import (
    OptimIterator,
    GDIteration,
    PGDIteration,
    FISTAIteration,
    HQSIteration,
    ADMMIteration,
    DRSIteration,
    CPIteration,
    MDIteration,
    PMDIteration,
    SMIteration,
    SIRTIteration,
    MLEMIteration,
)
from .fixed_point import FixedPoint
from .optimizers import (
    BaseOptim,
    optim_builder,
    create_iterator,
    ADMM,
    DRS,
    GD,
    HQS,
    PGD,
    FISTA,
    MD,
    CP,
    MLEM,
    SIRT,
    PMD,
    PDCP,
)
from .dpir import DPIR, get_DPIR_params
from .epll import EPLL, GaussianMixtureModel, patch_extractor
from .patch_prior import PatchPrior, PatchNR
from .utils import (
    gradient_descent,
    check_conv,
    objective_function,
    AndersonAccelerationConfig,
    BacktrackingConfig,
    DEQConfig,
)

ZeroPrior = Zero  # reference name alias (prior.py Zero == ZeroPrior)

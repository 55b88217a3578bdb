from .base import Loss, StackedPhysicsLoss
from .metric import (
    Metric,
    QNR,
    MSE,
    NMSE,
    MAE,
    PSNR,
    SNR,
    SSIM,
    LpNorm,
    L1L2,
    SpectralAngleMapper,
    ERGAS,
    cal_psnr,
)
from .losses import (
    SupLoss,
    MCLoss,
    EILoss,
    MOILoss,
    MOEILoss,
    SureGaussianLoss,
    SurePoissonLoss,
    SurePGLoss,
    R2RLoss,
    R2RModel,
    ScoreLoss,
    ScoreModel,
    TVLoss,
    JacobianSpectralNorm,
    FNEJacobianSpectralNorm,
)
from .measplit import SplittingLoss, SplittingModel, Neighbor2Neighbor
from .sure import exact_div, hutch_div, mc_div
from .scheduler import (
    BaseLossScheduler,
    RandomLossScheduler,
    InterleavedLossScheduler,
    StepLossScheduler,
    InterleavedEpochLossScheduler,
)
from .adversarial import (
    DiscriminatorMetric,
    GeneratorLoss,
    DiscriminatorLoss,
    SupAdversarialGeneratorLoss,
    SupAdversarialDiscriminatorLoss,
    UnsupAdversarialGeneratorLoss,
    UnsupAdversarialDiscriminatorLoss,
    UAIRGeneratorLoss,
)
from .mri import (
    WeightedSplittingLoss,
    RobustSplittingLoss,
    Phase2PhaseLoss,
    Artifact2ArtifactLoss,
    ENSURELoss,
)
from .perceptual import (
    HaarPSI,
    GMSD,
    CosineSimilarity,
    RecoveryCoefficient,
    BlurStrength,
    SharpnessIndex,
    NIQE,
    LPIPS,
)
from .augmentation import AugmentConsistencyLoss, EquivariantSplittingLoss, ReducedResolutionLoss
from .metric import cal_mse, cal_mae, signal_noise_ratio

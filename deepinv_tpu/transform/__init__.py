from .base import Transform, Identity, TransformParam
from .geometric import Shift, Rotate, Scale, Reflect, rotate_via_shear
from .projective import (
    Homography,
    Affine,
    Similarity,
    Euclidean,
    PanTiltRotate,
    apply_homography,
    rotation_matrix,
)
from .temporal import ShiftTime, RandomNoise, RandomPhaseError
from .diffeomorphism import CPABDiffeomorphism

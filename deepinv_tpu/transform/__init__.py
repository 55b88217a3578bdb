from .base import Transform, Identity
from .geometric import Shift, Rotate, Scale, Reflect, Homography, rotate_via_shear
from .temporal import ShiftTime, RandomNoise, RandomPhaseError
from .diffeomorphism import CPABDiffeomorphism

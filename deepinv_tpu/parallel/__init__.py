from .context import DistributedContext
from .physics import (
    DistributedStackedPhysics,
    DistributedStackedLinearPhysics,
    stack_homogeneous,
)
from .processing import DistributedProcessing
from .distribute import distribute, DistributedDataFidelity
from .pipeline import pipeline, PipelineParallel

"""Pallas TPU kernels for hot ops where XLA's automatic fusion falls short
(multi-pass loops that should stay VMEM-resident)."""
from .tv import chambolle_prox

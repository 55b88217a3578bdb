from .linear import least_squares, conjugate_gradient, bicgstab, minres, lsqr

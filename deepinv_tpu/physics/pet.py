"""Positron emission tomography physics (reference deepinv/physics/pet.py:519).

The reference wraps the CUDA ``parallelproj`` projectors in custom autograd
Functions (pet.py:355,436). There is no TPU build of parallelproj; this
implementation uses the framework's own parallel-beam projector (the fast
FFT-shear Radon by default) with PET-specific modelling: attenuation
correction factors, detector sensitivity, and Poisson counting noise.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.radon import radon, iradon
from ..ops.radon_fourier import radon_fourier
from .base import LinearPhysics
from .noise import PoissonNoise

__all__ = ["PET"]


class PET(LinearPhysics):
    r"""2D PET forward operator ``y = S . exp(-R mu) . R x`` (line-integral
    projector with attenuation and sensitivity; reference pet.py).

    :param img_width: activity image width (square).
    :param angles: number of projection angles over 180 degrees.
    :param attenuation: optional attenuation map mu (B, 1, W, W).
    :param sensitivity: optional per-bin detector sensitivity.
    :param counts: expected total counts (sets the Poisson gain).
    """

    def __init__(
        self,
        img_width: int,
        angles: int = 90,
        attenuation=None,
        sensitivity=None,
        counts: float = 1e6,
        method: str = "interp",
        noise_model=None,
        **kwargs,
    ):
        if noise_model is None:
            noise_model = PoissonNoise(gain=1.0, clip_positive=True)
        super().__init__(noise_model=noise_model, **kwargs)
        self.img_width = int(img_width)
        theta = np.linspace(0, 180, angles, endpoint=False)
        self.theta = jnp.asarray(theta, jnp.float32)
        self.method = method
        self.counts = counts
        if attenuation is not None:
            att_sino = self._project(jnp.asarray(attenuation))
            self.acf = jnp.exp(-att_sino)
        else:
            self.acf = jnp.ones(())
        self.sensitivity = (
            jnp.asarray(sensitivity) if sensitivity is not None else jnp.ones(())
        )

    def _project(self, x):
        fwd = radon_fourier if self.method == "fourier" else radon
        return fwd(x, self.theta, circle=True)

    def A(self, x, **params):
        return self._project(x) * self.acf * self.sensitivity

    def A_adjoint(self, y, **params):
        yw = y * self.acf * self.sensitivity
        B, C = y.shape[:2]
        x_shape = (B, C, self.img_width, self.img_width)
        fwd = lambda x: self._project(x)
        (xt,) = jax.linear_transpose(
            fwd, jax.ShapeDtypeStruct(x_shape, y.dtype)
        )(yw)
        return xt

    def A_dagger(self, y, **params):
        """FBP of the attenuation-corrected sinogram."""
        yc = y / jnp.clip(self.acf * self.sensitivity, 1e-6, None)
        return iradon(yc, self.theta, circle=True, filtered=True, out_size=self.img_width)

    def osem(self, y, n_iter: int = 4, n_subsets: int = 1):
        """MLEM reconstruction baseline (reference PET examples use OSEM)."""
        x = jnp.ones(
            (y.shape[0], y.shape[1], self.img_width, self.img_width), y.dtype
        )
        ones_y = jnp.ones_like(y)
        sens_img = self.A_adjoint(ones_y)

        def body(_, x):
            ratio = y / jnp.clip(self.A(x), 1e-9, None)
            return x * self.A_adjoint(ratio) / jnp.clip(sens_img, 1e-9, None)

        return jax.lax.fori_loop(0, n_iter, body, x)

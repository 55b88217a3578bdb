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
from ..ops.radon_slice import radon_slice
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
        self._theta_np = theta.astype(np.float32)
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
        fwd = {"fourier": radon_fourier, "slice": radon_slice}.get(self.method, radon)
        th = self._theta_np if self.method in ("fourier", "slice") else self.theta
        return fwd(x, th, circle=True)

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
        # MLEM assumes a nonnegative system matrix; the band-limited 'slice'
        # projector has small negative Gibbs values, so clip measurements and
        # updates, bound the ratio, and freeze pixels outside the scanner's
        # sensitive region (sens ~ 0)
        y_pos = jnp.clip(y, 0.0, None)
        sens_pos = jnp.clip(sens_img, 0.0, None)
        valid = (sens_pos > 1e-3 * jnp.max(sens_pos)).astype(y.dtype)

        def body(_, x):
            pred = jnp.clip(self.A(x), 1e-6, None)
            ratio = jnp.clip(y_pos / pred, 0.0, 1e3)
            upd = jnp.clip(self.A_adjoint(ratio), 0.0, None) / jnp.clip(
                sens_pos, 1e-9, None
            )
            return x * jnp.where(valid > 0, upd, 0.0)

        return jax.lax.fori_loop(0, n_iter, body, x)

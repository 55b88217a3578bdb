"""Positron emission tomography physics (reference deepinv/physics/pet.py:13).

The reference wraps the CUDA ``parallelproj`` projectors in custom autograd
Functions (pet.py:355,436). There is no TPU build of parallelproj; this
implementation uses the framework's own parallel-beam projectors with the
reference's PET modelling surface:

- line-integral projector (2D, or 3D via per-plane projection — the direct
  planes of a multi-ring scanner; oblique LORs are a parallelproj-specific
  geometry and remain out of scope),
- Gaussian resolution model ``g * x`` (reference ``fwhm_data_mm`` /
  ``GaussianFilterOperator``, pet.py:193),
- attenuation correction factors ``c`` applied in sinogram space (an
  image-space ``mu`` map is converted through the projector: c = exp(-R mu)),
- additive expected ``background`` (randoms + scatter) with
  ``A(x, add_background=True)`` and ``generate_background`` (pet.py:304),
- optional operator-norm normalization (pet.py:119 ``normalize``),
- Poisson counting noise, and an MLEM/OSEM reconstruction baseline.
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
    r"""PET forward operator ``y = c . R(g * x) (+ b)`` (reference pet.py:13).

    :param img_size: activity image size — int or (H, W) for 2D (square),
        (D, H, W) for 3D (per-plane projection over D rings).
    :param angles: number of projection angles over 180 degrees.
    :param fwhm: resolution-model FWHM in pixels (Gaussian PSF ``g``; 0
        disables it). Counterpart of the reference's ``fwhm_data_mm``.
    :param attenuation: attenuation map — image-space ``mu`` (converted to
        sinogram factors ``c = exp(-R mu)``) or precomputed sinogram-space
        factors (shape inferred, like the reference's ``update_parameters``).
    :param background: expected additive background sinogram ``b``.
    :param sensitivity: per-bin detector sensitivity.
    :param normalize: scale A and A_adjoint by the operator norm.
    :param gain: Poisson noise gain (reference ``gain``).
    :param img_width: legacy alias for square 2D ``img_size``.
    """

    def __init__(
        self,
        img_size=None,
        angles: int = 90,
        fwhm: float = 0.0,
        attenuation=None,
        background=None,
        sensitivity=None,
        normalize: bool = False,
        gain: float = 1.0,
        counts: float = 1e6,
        method: str = "interp",
        noise_model=None,
        img_width: int = None,
        **kwargs,
    ):
        if noise_model is None:
            noise_model = PoissonNoise(gain=gain, clip_positive=True)
        super().__init__(noise_model=noise_model, **kwargs)
        if img_size is None:
            img_size = img_width
        if img_size is None:
            raise ValueError("img_size (or img_width) is required")
        if isinstance(img_size, int):
            img_size = (img_size, img_size)
        img_size = tuple(int(s) for s in img_size)
        if len(img_size) == 3:
            self.depth = img_size[0]
            self.is_2d = False
        else:
            self.depth = None
            self.is_2d = True
        if img_size[-1] != img_size[-2]:
            raise ValueError("PET images must have square slices (H == W)")
        self.img_width = img_size[-1]
        theta = np.linspace(0, 180, angles, endpoint=False)
        self.theta = jnp.asarray(theta, jnp.float32)
        self._theta_np = theta.astype(np.float32)
        self.method = method
        self.counts = counts
        self.normalize = normalize
        # Gaussian resolution model (host-built separable kernel)
        if fwhm and fwhm > 0:
            sigma = float(fwhm) / 2.3548
            rad = max(1, int(np.ceil(3 * sigma)))
            g = np.exp(-0.5 * (np.arange(-rad, rad + 1) / sigma) ** 2)
            self._psf = jnp.asarray((g / g.sum()).astype(np.float32))
        else:
            self._psf = None
        if attenuation is not None:
            attenuation = jnp.asarray(attenuation)
            if attenuation.shape[-1] == self.img_width:
                # image-space mu map -> sinogram correction factors
                att_sino = self._project(self._fold(attenuation))
                self.acf = jnp.exp(-att_sino)
            else:  # already sinogram-space factors
                self.acf = attenuation
        else:
            self.acf = jnp.ones(())
        self.sensitivity = (
            jnp.asarray(sensitivity) if sensitivity is not None else jnp.ones(())
        )
        self.background = (
            jnp.asarray(background) if background is not None else jnp.zeros(())
        )
        if normalize:
            key = jax.random.key(0)
            shape = (1, 1) + ((self.depth,) if self.depth else ()) + (
                self.img_width, self.img_width)
            x0 = jax.random.uniform(key, shape)
            self.operator_norm = jnp.sqrt(
                jax.jit(lambda p, v: p._norm_unnormalized(v))(self, x0)
            )
        else:
            self.operator_norm = jnp.ones(())

    # -- projector ---------------------------------------------------------
    def _fold(self, v):
        """(B, C, D, H, W) -> (B, C*D, H, W) for per-plane projection."""
        if self.is_2d:
            return v
        B, C, D = v.shape[:3]
        return v.reshape(B, C * D, *v.shape[3:])

    def _unfold(self, v, like):
        if self.is_2d:
            return v
        B, C, D = like[:3]
        return v.reshape(B, C, D, *v.shape[2:])

    def _resolution(self, x):
        """Separable Gaussian PSF g * x (resolution model)."""
        if self._psf is None:
            return x
        g = self._psf
        k = g.shape[0]
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(k // 2, k // 2)] * 2,
                     mode="edge")
        x1 = jax.lax.conv_general_dilated(
            xp.reshape((-1, 1) + xp.shape[-2:]),
            g.reshape(1, 1, k, 1), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        x2 = jax.lax.conv_general_dilated(
            x1, g.reshape(1, 1, 1, k), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return x2.reshape(x.shape)

    def _project(self, x):
        fwd = {"fourier": radon_fourier, "slice": radon_slice}.get(self.method, radon)
        th = self._theta_np if self.method in ("fourier", "slice") else self.theta
        return fwd(x, th, circle=True)

    def _fwd_chain(self, x):
        """R(g * x) on folded (B, C', H, W) input."""
        return self._project(self._resolution(x))

    def _norm_unnormalized(self, x0, n_iter: int = 20):
        def body(_, v):
            w = self._A_core(v)
            u = self._At_core(w)
            return u / jnp.linalg.norm(u)

        v = jax.lax.fori_loop(0, n_iter, body, x0)
        return jnp.vdot(self._A_core(v), self._A_core(v)) / jnp.vdot(v, v)

    def _A_core(self, x):
        y = self._fwd_chain(self._fold(x)) * self.acf * self.sensitivity
        return self._unfold(y, x.shape) if not self.is_2d else y

    def _At_core(self, y):
        yw = y * self.acf * self.sensitivity
        if not self.is_2d:
            yw = self._fold(yw)
        x_shape = (y.shape[0], yw.shape[1], self.img_width, self.img_width)
        (xt,) = jax.linear_transpose(
            self._fwd_chain, jax.ShapeDtypeStruct(x_shape, y.dtype)
        )(yw)
        return self._unfold(xt, y.shape) if not self.is_2d else xt

    # -- public operator ---------------------------------------------------
    def A(self, x, add_background: bool = False, **params):
        out = self._A_core(x) / self.operator_norm
        if add_background:
            out = out + self.background
        return out

    def A_adjoint(self, y, **params):
        return self._At_core(y) / self.operator_norm

    def __call__(self, x, key=None, **params):
        """Generate PET measurements: Poisson(c R(g*x) + b) (pet.py:291)."""
        return self.sensor(
            self.noise(self.A(x, add_background=True, **params), key=key)
        )

    def generate_background(self, expected_background, key=None):
        """Draw a random background realization (reference pet.py:304)."""
        return self.noise_model(expected_background, key=key)

    def A_dagger(self, y, **params):
        """FBP of the attenuation-corrected sinogram."""
        yc = y * self.operator_norm / jnp.clip(self.acf * self.sensitivity, 1e-6, None)
        yc = self._fold(yc) if not self.is_2d else yc
        out = iradon(yc, self.theta, circle=True, filtered=True,
                     out_size=self.img_width)
        return self._unfold(out, y.shape) if not self.is_2d else out

    def osem(self, y, n_iter: int = 4, n_subsets: int = 1):
        """MLEM reconstruction baseline (reference PET examples use OSEM)."""
        shape = y.shape[:2] + (() if self.is_2d else (self.depth,)) + (
            self.img_width, self.img_width)
        x = jnp.ones(shape, y.dtype)
        ones_y = jnp.ones_like(y)
        sens_img = self.A_adjoint(ones_y)
        # MLEM assumes a nonnegative system matrix; the band-limited 'slice'
        # projector has small negative Gibbs values, so clip measurements and
        # updates, bound the ratio, and freeze pixels outside the scanner's
        # sensitive region (sens ~ 0)
        y_pos = jnp.clip(y - self.background, 0.0, None)
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

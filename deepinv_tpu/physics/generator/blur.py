"""Random PSF generators (reference deepinv/physics/generator/blur.py, 1731
LoC: MotionBlurGenerator, GaussianBlurGenerator, DiffractionBlurGenerator).

All samplers are jit-compatible: trajectories and pupil phases are computed
with fixed-shape scans/FFTs; PSFs come out normalized (sum 1) with shape
(batch, 1, psf_size, psf_size) ready for ``physics.update(filter=...)``.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .base import PhysicsGenerator
from .zernike import zernike_basis, Zernike

__all__ = [
    "MotionBlurGenerator",
    "GaussianBlurGenerator",
    "DiffractionBlurGenerator",
    "ProductConvolutionBlurGenerator",
    "TiledBlurGenerator",
    "ConfocalBlurGenerator3D",
]


class MotionBlurGenerator(PhysicsGenerator):
    r"""Random-walk motion blur PSFs (reference generator/blur.py
    MotionBlurGenerator): a Gaussian-process 2D trajectory rasterized onto
    the PSF grid.

    :param psf_size: (h, w) of the PSF.
    :param length: trajectory samples.
    :param sigma: trajectory smoothness.

    :Examples:

        Generators feed physics directly: ``physics(x, **gen.step(B))``
        applies a fresh random PSF per call:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.physics.generator import MotionBlurGenerator
        >>> from deepinv_tpu.physics import Blur
        >>> gen = MotionBlurGenerator(psf_size=(9, 9))
        >>> params = gen.step(batch_size=2, key=jax.random.key(0))
        >>> params["filter"].shape  # normalized PSFs
        (2, 1, 9, 9)
        >>> bool(jnp.allclose(params["filter"].sum(axis=(-2, -1)), 1.0,
        ...                   atol=1e-5))
        True
        >>> physics = Blur(padding="circular")
        >>> x = jax.random.uniform(jax.random.key(1), (2, 1, 16, 16))
        >>> physics.A(x, **params).shape
        (2, 1, 16, 16)
    """

    def __init__(self, psf_size=(31, 31), l: float = 0.3,
                 sigma: float = 0.25, n_steps: int = 1000, seed: int = 0,
                 length: int = None):
        super().__init__(seed=seed)
        self.psf_size = tuple(psf_size) if not isinstance(psf_size, int) else (psf_size, psf_size)
        self.l = l
        self.sigma = sigma
        self.n_steps = length if length is not None else n_steps

    def matern_kernel(self, diff, sigma=None, l=None):
        """Matern 5/2 covariance (reference generator/blur.py:275)."""
        sigma = self.sigma if sigma is None else sigma
        l = self.l if l is None else l
        frac = 5**0.5 * jnp.abs(diff) / l
        return sigma**2 * (1 + frac + frac**2 / 3) * jnp.exp(-frac)

    def f_matern(self, key, batch_size, sigma=None, l=None):
        """Stationary GP draws by spectral filtering of white noise
        (reference generator/blur.py:290): rfft of the Matern kernel over
        t in [-pi, pi], multiply white noise spectrum by sqrt(kernel_fft),
        keep the first n_steps/(2 pi) samples."""
        n = self.n_steps
        vec = jax.random.normal(key, (batch_size, n))
        time = jnp.linspace(-jnp.pi, jnp.pi, n)[None]
        kernel = self.matern_kernel(time, sigma, l)
        kernel_fft = jnp.fft.rfft(kernel)
        vec_fft = jnp.fft.rfft(vec)
        full = jnp.fft.irfft(vec_fft * jnp.sqrt(kernel_fft.astype(jnp.complex64))).real
        keep = int(n / (2 * jnp.pi))
        return full[:, :keep]

    def sample(self, batch_size, key, sigma=None, l=None, **kwargs):
        from ...ops import histogramdd

        kx, ky = jax.random.split(key)
        f_x = self.f_matern(kx, batch_size, sigma, l)
        f_y = self.f_matern(ky, batch_size, sigma, l)
        traj = jnp.stack(
            [f_x - f_x.mean(axis=1, keepdims=True),
             f_y - f_y.mean(axis=1, keepdims=True)], axis=-1
        )  # (B, T, 2)

        def one(tr):
            k, _ = histogramdd(tr, bins=list(self.psf_size), low=[-1, -1],
                               upp=[1, 1])
            return k / (jnp.sum(k) + 1e-6)

        psfs = jax.vmap(one)(traj)
        return {"filter": psfs[:, None]}


class PSFGenerator(PhysicsGenerator):
    r"""Base class for point-spread-function generators
    (reference generator/blur.py:17): holds the PSF size; subclasses
    implement ``sample`` returning ``{"filter": (B, C, *psf_size)}``."""

    def __init__(self, psf_size=(31, 31), num_channels: int = 1, seed: int = 0):
        super().__init__(seed=seed)
        self.psf_size = (psf_size, psf_size) if isinstance(psf_size, int) else tuple(psf_size)
        self.shape = self.psf_size
        self.num_channels = num_channels


def _as_range_tuple(vals, dim, name):
    """Broadcast a scalar or length-``dim`` sequence to a ``dim``-tuple."""
    if isinstance(vals, (int, float)):
        vals = (float(vals),) * dim
    else:
        vals = tuple(float(v) for v in vals)
        if len(vals) == 1:
            vals = vals * dim
    if len(vals) != dim:
        raise ValueError(f"Length of {name} should be either 1 or {dim}, got {len(vals)}.")
    return vals


class GaussianBlurGenerator(PSFGenerator):
    r"""Random 1D/2D/3D Gaussian kernels with random standard deviations and
    rotation angles (reference generator/blur.py:40).

    :param psf_size: PSF shape; its length sets the kernel dimension (1-3).
    :param sigma_min: minimum standard deviation(s) — scalar or per-dim tuple.
    :param sigma_max: maximum standard deviation(s).
    :param isotropic: if True, one sigma shared across all dimensions.
    :param angle_min: minimum rotation angle(s) in degrees (1 value for 2D,
        up to 3 for 3D).
    :param angle_max: maximum rotation angle(s) in degrees.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import GaussianBlurGenerator
        >>> g = GaussianBlurGenerator((7, 7), isotropic=False)
        >>> params = g.step(batch_size=4, key=jax.random.key(0))
        >>> params["filter"].shape
        (4, 1, 7, 7)
    """

    def __init__(
        self,
        psf_size=(31, 31),
        sigma_min=0.5,
        sigma_max=5.0,
        isotropic: bool = True,
        angle_min=0.0,
        angle_max=360.0,
        num_channels: int = 1,
        seed: int = 0,
    ):
        super().__init__(psf_size=psf_size, num_channels=num_channels, seed=seed)
        dim = len(self.psf_size)
        if dim not in (1, 2, 3):
            raise ValueError("Only 1D, 2D, and 3D kernels are supported.")
        self.dim = dim
        self.isotropic = isotropic
        self.sigma_min = _as_range_tuple(sigma_min, dim, "sigma_min")
        self.sigma_max = _as_range_tuple(sigma_max, dim, "sigma_max")
        # 2D has a single in-plane angle; 3D has (gamma, beta, alpha)
        adim = 3 if dim == 3 else 1
        self.angle_min = _as_range_tuple(angle_min, adim, "angle_min")
        self.angle_max = _as_range_tuple(angle_max, adim, "angle_max")
        for lo, hi, nm in ((self.sigma_min, self.sigma_max, "sigma"),
                           (self.angle_min, self.angle_max, "angle")):
            if any(a > b for a, b in zip(lo, hi)):
                raise ValueError(f"{nm}_min must be <= {nm}_max")

    def _uniform(self, key, batch_size, lo, hi, isotropic):
        if isotropic:
            u = jax.random.uniform(key, (batch_size, 1), minval=lo[0], maxval=hi[0])
            return jnp.tile(u, (1, len(lo)))
        keys = jax.random.split(key, len(lo))
        cols = [
            jax.random.uniform(k, (batch_size,), minval=a, maxval=b)
            for k, a, b in zip(keys, lo, hi)
        ]
        return jnp.stack(cols, axis=-1)

    def sample(self, batch_size, key, sigma=None, angle=None, **kwargs):
        from ...ops.conv import gaussian_blur

        ks, ka = jax.random.split(key)
        if sigma is None:
            sigma = self._uniform(ks, batch_size, self.sigma_min, self.sigma_max,
                                  self.isotropic)
        if angle is None:
            angle = self._uniform(ka, batch_size, self.angle_min, self.angle_max, False)
        if self.dim == 2:
            angle = jnp.reshape(jnp.asarray(angle), (-1,))
        filters = gaussian_blur(sigma=jnp.asarray(sigma), angle=angle,
                                psf_size=self.psf_size)
        return {"filter": filters}


class DiffractionBlurGenerator(PSFGenerator):
    r"""Diffraction-limited optical PSFs from a Zernike decomposition of the
    pupil phase (reference generator/blur.py:358):
    ``h = |F[1_{|rho|<=1} exp(-2i pi sum_k theta_k z_k(rho))]|^2`` on a
    super-resolved pupil grid, cropped to ``psf_size`` and sum-normalized.

    Multi-channel (multi-colour) imaging follows the reference chromatic
    model: base coefficients (in waves at the channel-0 cutoff) are rescaled
    per channel by ``fc_c / fc_0`` and perturbed by Gaussian noise of
    amplitude ``zernike_perturbation_amplitude``.

    :param psf_size: (H, W) of the generated PSF.
    :param zernike_index: active Zernike modes — ints in the
        ``index_convention`` ('noll' default, or 'ansi'), or (n, m) tuples.
        Defaults to Noll 4-11 (defocus ... primary spherical).
    :param fc: cutoff frequency ``NA * pixel_size / wavelength``; scalar or
        length-C sequence at construction, additionally (B, C) at step time.
    :param max_zernike_amplitude: base coefficients are drawn uniformly in
        ``[-max/2, max/2]`` waves.
    :param zernike_perturbation_amplitude: chromatic perturbation scale.
    :param pupil_size: super-resolved pupil grid (default (256, 256)).
    :param apodize: smoothly mask the PSF borders to reduce ringing.
    :param random_rotate: additionally rotate each PSF by a random angle.
    :param index_convention: 'noll' or 'ansi' for int indices.

    :Examples:

        >>> from deepinv_tpu.physics.generator import DiffractionBlurGenerator
        >>> g = DiffractionBlurGenerator((5, 5))
        >>> print("\n".join(g.zernike_polynomials))
        Zernike(n = 2, m = 0) -- Defocus
        Zernike(n = 2, m = -2) -- Oblique Astigmatism
        Zernike(n = 2, m = 2) -- Vertical Astigmatism
        Zernike(n = 3, m = -1) -- Vertical Coma
        Zernike(n = 3, m = 1) -- Horizontal Coma
        Zernike(n = 3, m = -3) -- Vertical Trefoil
        Zernike(n = 3, m = 3) -- Oblique Trefoil
        Zernike(n = 4, m = 0) -- Primary Spherical
        >>> blur = g.step()  # dict_keys(['filter', 'coeff', 'pupil', 'fc'])
        >>> blur["filter"].shape
        (1, 1, 5, 5)
        >>> g3 = DiffractionBlurGenerator((5, 5), fc=(0.18, 0.20, 0.22))
        >>> g3.step(batch_size=2)["filter"].shape
        (2, 3, 5, 5)
    """

    def __init__(
        self,
        psf_size=(31, 31),
        zernike_index=tuple(range(4, 12)),
        fc=0.2,
        max_zernike_amplitude: float = 0.15,
        zernike_perturbation_amplitude: float = 0.0,
        pupil_size=(256, 256),
        apodize: bool = False,
        random_rotate: bool = False,
        index_convention: str = "noll",
        seed: int = 0,
        list_param=None,
        num_channels: int = 1,
    ):
        super().__init__(psf_size=psf_size, num_channels=num_channels, seed=seed)
        if list_param is not None:  # legacy alias (reference blur.py:476)
            zernike_index = list_param
        if isinstance(fc, (int, float)):
            self.fc = float(fc)
        else:
            self.fc = jnp.asarray(fc, jnp.float32)
            if self.fc.ndim != 1:
                raise ValueError(
                    f"fc must be a scalar or 1D tensor/list/tuple at construction time, got {self.fc.ndim}D."
                )

        zernike_index = list(zernike_index)
        for i, index in enumerate(zernike_index):
            if isinstance(index, str):  # legacy "Z4"-style names
                if not index.upper().startswith("Z"):
                    raise ValueError(f"Zernike index must start with 'Z', got {index}")
                zernike_index[i] = int(index[1:])
        self.zernike_index = sorted(
            zernike_index, key=lambda v: (v,) if isinstance(v, int) else tuple(v)
        )
        self.max_zernike_amplitude = max_zernike_amplitude
        self.zernike_perturbation_amplitude = zernike_perturbation_amplitude
        self.apodize = apodize
        self.random_rotate = random_rotate
        self.index_convention = index_convention
        self.n_zernike = len(self.zernike_index)

        if isinstance(pupil_size, int):
            pupil_size = (pupil_size, pupil_size)
        self.pupil_size = (
            max(pupil_size[0], self.psf_size[0]),
            max(pupil_size[1], self.psf_size[1]),
        )
        self.lin_x = jnp.linspace(-0.5, 0.5, self.pupil_size[0], dtype=jnp.float32)
        self.lin_y = jnp.linspace(-0.5, 0.5, self.pupil_size[1], dtype=jnp.float32)
        self.step_rho = float(self.lin_x[1] - self.lin_x[0])

        self.pad_pre = (
            math.ceil((self.pupil_size[0] - self.psf_size[0]) / 2),
            math.ceil((self.pupil_size[1] - self.psf_size[1]) / 2),
        )
        self.pad_post = (
            math.floor((self.pupil_size[0] - self.psf_size[0]) / 2),
            math.floor((self.pupil_size[1] - self.psf_size[1]) / 2),
        )

        if apodize:
            l0 = jnp.linspace(-(self.psf_size[0] // 2), self.psf_size[0] // 2,
                              self.psf_size[0], dtype=jnp.float32)
            l1 = jnp.linspace(-(self.psf_size[1] // 2), self.psf_size[1] // 2,
                              self.psf_size[1], dtype=jnp.float32)
            X0, X1 = jnp.meshgrid(l0, l1, indexing="ij")
            dist = jnp.sqrt(X0**2 + X1**2)
            radius = min(self.psf_size) / 2
            ap_len = min(10, radius)
            self.apodize_mask = bump_function(dist, radius - ap_len, ap_len)
        else:
            self.apodize_mask = None

        self._nm_list = self._zernike_index_to_nm_list(
            self.zernike_index, index_convention
        )
        self._basis_cache = {}

    @staticmethod
    def _zernike_index_to_nm_list(zernike_index, index_convention="noll"):
        """Convert ints (via the convention) or (n, m) tuples to (n, m) pairs
        (reference blur.py:577)."""
        nm_list = []
        for index in zernike_index:
            if isinstance(index, (int, np.integer)):
                nm_list.append(Zernike.index_conversion(int(index), convention=index_convention))
            elif isinstance(index, (tuple, list)) and len(index) == 2:
                nm_list.append((int(index[0]), int(index[1])))
            else:
                raise ValueError(
                    f"Zernike index must be either int or tuple of (n, m), got {index!r}"
                )
        return nm_list

    @property
    def zernike_polynomials(self):
        """Names of the active Zernike modes (reference blur.py:855)."""
        return [Zernike.get_name(n, m) for n, m in self._nm_list]

    def _format_fc(self, fc, batch_size):
        """Normalize fc into a (B, C) array (reference blur.py:601)."""
        t = jnp.asarray(fc, jnp.float32)
        if t.ndim == 2:
            return t
        if t.ndim == 0:
            return jnp.broadcast_to(t.reshape(1, 1), (batch_size, 1))
        if t.ndim == 1:
            return jnp.broadcast_to(t[None], (batch_size, t.shape[0]))
        raise ValueError(f"fc must be 0D, 1D or 2D, got {t.ndim}D.")

    def _zernike_basis(self, fc, nm_list=None):
        """Zernike stack and pupil indicator for cutoffs ``fc`` of shape
        (Bf, Cf): returns ``(Z (Bf,Cf,H,W,K), indicator (Bf,Cf,H,W))``
        (reference blur.py:631)."""
        if nm_list is None:
            nm_list = self._nm_list
        cache_key = None
        if not isinstance(fc, jax.core.Tracer):
            cache_key = (np.asarray(fc).tobytes(), fc.shape, tuple(nm_list))
            hit = self._basis_cache.get(cache_key)
            if hit is not None:
                return hit

        Bf, Cf = fc.shape
        fc_r = fc.reshape(Bf, Cf, 1, 1)
        XX, YY = jnp.meshgrid(self.lin_x, self.lin_y, indexing="ij")
        XX = XX[None, None] / fc_r
        YY = YY[None, None] / fc_r
        rho = jnp.sqrt(XX**2 + YY**2)
        # pupil-edge transition width must live in the rescaled rho
        # coordinates (reference blur.py:654)
        step_rho_eff = self.step_rho / fc_r
        indicator = bump_function(rho, 1 - step_rho_eff / 2, step_rho_eff / 2)
        Z = jnp.stack(
            [Zernike.cartesian_evaluate(n, m, XX, YY) for n, m in nm_list], axis=-1
        )
        if cache_key is not None:
            self._basis_cache[cache_key] = (Z, indicator)
        return Z, indicator

    def generate_coeff(self, batch_size, key, fc=None, max_zernike_amplitude=None,
                       zernike_perturbation_amplitude=None, n_zernike=None):
        """Random Zernike coefficients with the chromatic rescaling model
        (reference blur.py:862): (B, K) if single-channel else (B, C, K)."""
        if max_zernike_amplitude is None:
            max_zernike_amplitude = self.max_zernike_amplitude
        if zernike_perturbation_amplitude is None:
            zernike_perturbation_amplitude = self.zernike_perturbation_amplitude
        if fc is None:
            fc = self._format_fc(self.fc, batch_size)
        if n_zernike is None:
            n_zernike = self.n_zernike

        kb, kd = jax.random.split(key)
        C = fc.shape[1]
        coeff_base = (
            jax.random.uniform(kb, (batch_size, n_zernike)) - 0.5
        ) * max_zernike_amplitude
        if C == 1:
            return coeff_base
        color_scale = fc / fc[:, 0:1]
        coeff_delta = (
            jax.random.normal(kd, (batch_size, C, n_zernike))
            * zernike_perturbation_amplitude
        )
        return coeff_base[:, None] * color_scale[..., None] + coeff_delta

    def generate_angles(self, batch_size, key):
        """Random PSF rotation angles in degrees (reference blur.py:922)."""
        return jax.random.uniform(key, (batch_size,)) * 360.0

    def sample(self, batch_size, key, coeff=None, angle=None,
               max_zernike_amplitude=None, zernike_perturbation_amplitude=None,
               fc=None, used_zernike_index=None, **kwargs):
        kc, ka = jax.random.split(key)

        if used_zernike_index is not None:
            nm_list_used = self._zernike_index_to_nm_list(
                used_zernike_index, self.index_convention
            )
            invalid = [nm for nm in nm_list_used if nm not in self._nm_list]
            if invalid:
                raise ValueError(
                    f"used_zernike_index contains (n, m) entries {invalid} that are not "
                    f"in self.zernike_index. Initialise with a larger zernike_index set."
                )
        else:
            nm_list_used = self._nm_list
        n_zernike_used = len(nm_list_used)

        fc = self.fc if fc is None else fc
        if coeff is not None:
            coeff = jnp.asarray(coeff)
            if coeff.shape[-1] != n_zernike_used:
                raise ValueError(
                    f"The number of Zernike coefficients {coeff.shape[-1]} "
                    f"in input coeff does not match n_zernike_used={n_zernike_used}"
                )
            fc_used = self._format_fc(fc, coeff.shape[0])
            B, C = fc_used.shape
            if coeff.ndim == 2:
                if coeff.shape[0] != B:
                    raise ValueError(
                        f"coeff shape {tuple(coeff.shape)} does not match fc inferred shape (B={B}, K)."
                    )
            elif coeff.ndim == 3:
                if coeff.shape[0] != B or coeff.shape[1] != C:
                    raise ValueError(
                        f"coeff shape {tuple(coeff.shape)} does not match fc inferred shape (B={B}, C={C}, K)."
                    )
            else:
                raise ValueError(
                    f"coeff must be 2D (B, K) or 3D (B, C, K), got {coeff.ndim}D."
                )
        else:
            fc_used = self._format_fc(fc, batch_size)
            B, C = fc_used.shape
            coeff = self.generate_coeff(
                B, kc, fc=fc_used,
                max_zernike_amplitude=max_zernike_amplitude,
                zernike_perturbation_amplitude=zernike_perturbation_amplitude,
                n_zernike=n_zernike_used,
            )

        if coeff.ndim == 2:
            coeff = jnp.broadcast_to(coeff[:, None], (coeff.shape[0], C, coeff.shape[1]))

        Z, indicator = self._zernike_basis(fc_used, nm_list=nm_list_used)
        if Z.shape[1] == 1 and coeff.shape[1] > 1:
            Z = jnp.broadcast_to(Z, (Z.shape[0], coeff.shape[1], *Z.shape[2:]))
            indicator = jnp.broadcast_to(
                indicator, (indicator.shape[0], coeff.shape[1], *indicator.shape[2:])
            )

        pupil = jnp.einsum("bchwk,bck->bchw", Z, coeff.astype(Z.dtype))
        pupil = jnp.exp(-2.0j * jnp.pi * pupil) * indicator

        psf = jnp.fft.ifftshift(
            jnp.fft.fft2(jnp.fft.fftshift(pupil, axes=(-2, -1)), axes=(-2, -1)),
            axes=(-2, -1),
        )
        psf = jnp.abs(psf) ** 2
        psf = psf[
            ...,
            self.pad_pre[0] : self.pupil_size[0] - self.pad_post[0],
            self.pad_pre[1] : self.pupil_size[1] - self.pad_post[1],
        ]
        psf = psf / jnp.sum(psf, axis=(-2, -1), keepdims=True)

        if self.random_rotate:
            from ...transform.geometric import rotate_via_shear

            if angle is None:
                angle = self.generate_angles(psf.shape[0], ka)
            psf = rotate_via_shear(psf, angle)

        if self.apodize:
            psf = self.apodize_mask * psf
            psf = psf / jnp.sum(psf, axis=(-2, -1), keepdims=True)

        params = {"filter": psf, "coeff": coeff, "pupil": pupil, "fc": fc_used}
        if self.random_rotate:
            params["angle"] = angle
        return params


class ProductConvolutionBlurGenerator(PhysicsGenerator):
    r"""Space-varying blur parameters for :class:`SpaceVaryingBlur`
    (reference generator/blur.py:982): PSFs are sampled on a coarse spatial
    grid, compressed to ``n_eigen_psf`` eigen-PSFs by SVD, and the
    per-grid-point expansion coefficients are interpolated to the full image
    with thin-plate splines, yielding smooth multiplier fields.

    :param psf_generator: PSF generator sampled at each grid point.
    :param img_size: (H, W) of the image.
    :param n_eigen_psf: number of eigen-PSFs kept (default 10).
    :param spacing: grid spacing (defaults to ``(H//8, W//8)``).

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import (
        ...     DiffractionBlurGenerator, ProductConvolutionBlurGenerator)
        >>> pc = ProductConvolutionBlurGenerator(
        ...     DiffractionBlurGenerator((7, 7), fc=0.25),
        ...     img_size=(64, 64), n_eigen_psf=8)
        >>> params = pc.step(1, key=jax.random.key(0))
        >>> sorted(params)
        ['filters', 'multipliers']
        >>> params["filters"].shape, params["multipliers"].shape
        ((1, 1, 8, 7, 7), (1, 1, 8, 64, 64))
    """

    def __init__(self, psf_generator=None, img_size=(32, 32), n_eigen_psf: int = 10,
                 spacing=None, seed: int = 0):
        super().__init__(seed=seed)
        self.psf_generator = (
            psf_generator if psf_generator is not None else DiffractionBlurGenerator(psf_size=(15, 15))
        )
        if isinstance(img_size, int):
            img_size = (img_size, img_size)
        self.img_size = tuple(img_size)[-2:]
        if isinstance(spacing, int):
            spacing = (spacing, spacing)
        self.spacing = (
            tuple(spacing) if spacing is not None
            else (self.img_size[0] // 8, self.img_size[1] // 8)
        )
        self.n_eigen_psf = n_eigen_psf
        self.n_psf_grid = (self.img_size[0] // self.spacing[0]) * (
            self.img_size[1] // self.spacing[1]
        )
        if self.n_psf_grid < self.n_eigen_psf:
            raise ValueError(
                f"n_eigen_psf={n_eigen_psf} must be smaller than the number "
                f"of PSF grid points = {self.n_psf_grid}"
            )
        # control points (coarse grid) and query points (full image), both in
        # [0, 1]^2 (reference blur.py:1049)
        t0 = np.linspace(0, 1, self.img_size[0] // self.spacing[0])
        t1 = np.linspace(0, 1, self.img_size[1] // self.spacing[1])
        yy, xx = np.meshgrid(t0, t1, indexing="ij")
        self._X = jnp.asarray(np.stack([yy.ravel(), xx.ravel()], 1), jnp.float32)
        T0 = np.linspace(0, 1, self.img_size[0])
        T1 = np.linspace(0, 1, self.img_size[1])
        YY, XX = np.meshgrid(T0, T1, indexing="ij")
        self._XX = jnp.asarray(np.stack([YY.ravel(), XX.ravel()], 1), jnp.float32)

    def sample(self, batch_size, key, **kwargs):
        from ...ops.misc import ThinPlateSpline

        psf_grid = self.psf_generator.sample(
            self.n_psf_grid * batch_size, key, **kwargs
        )["filter"]
        ph, pw = psf_grid.shape[-2:]
        C = psf_grid.shape[1]
        psf_grid = psf_grid.reshape(batch_size, self.n_psf_grid, C, ph, pw)
        # (B, C, n_grid, h*w) design matrix; top-K right singular vectors are
        # the eigen-PSFs (reference blur.py:1090)
        M = jnp.swapaxes(psf_grid.reshape(batch_size, self.n_psf_grid, C, ph * pw), 1, 2)
        _, _, Vh = jnp.linalg.svd(M, full_matrices=False)
        K = min(self.n_eigen_psf, Vh.shape[-2])
        Vh = Vh[..., :K, :]
        coeffs = jnp.einsum("bcnp,bckp->bcnk", M, Vh)  # (B, C, n_grid, K)
        eigen_psf = Vh.reshape(batch_size, C, K, ph, pw)

        tps = ThinPlateSpline(0.0).fit(self._X, coeffs)
        w = jnp.swapaxes(tps.transform(self._XX), -1, -2)  # (B, C, K, H*W)
        w = w.reshape(batch_size, C, K, *self.img_size)
        return {"filters": eigen_psf, "multipliers": w}


class TiledBlurGenerator(PhysicsGenerator):
    r"""Per-tile PSFs for :class:`TiledSpaceVaryingBlur`
    (reference generator/blur.py:1669): the image is divided into
    (overlapping) patches and each patch gets its own PSF drawn from
    ``psf_generator``.

    :param psf_generator: PSF generator sampled once per tile.
    :param patch_size: tile size (int or (ph, pw)).
    :param stride: stride between tiles; defaults to ``patch_size``.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import (MotionBlurGenerator,
        ...     TiledBlurGenerator)
        >>> g = TiledBlurGenerator(MotionBlurGenerator((5, 5)), patch_size=16)
        >>> g.step(2, key=jax.random.key(0), img_size=(32, 32))["filters"].shape
        (2, 1, 4, 5, 5)
    """

    def __init__(self, psf_generator=None, patch_size=16, stride=None, seed: int = 0,
                 img_size=None, tiles=None):
        super().__init__(seed=seed)
        self.psf_generator = (
            psf_generator if psf_generator is not None else DiffractionBlurGenerator(psf_size=(15, 15))
        )
        if tiles is not None and img_size is not None:
            # legacy surface: an explicit (ty, tx) tile grid over img_size
            img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)[-2:]
            patch_size = (img_size[0] // tiles[0], img_size[1] // tiles[1])
        self.patch_size = (
            (patch_size, patch_size) if isinstance(patch_size, int) else tuple(patch_size)
        )
        self.stride = (
            self.patch_size if stride is None
            else ((stride, stride) if isinstance(stride, int) else tuple(stride))
        )
        self.psf_size = getattr(self.psf_generator, "psf_size", None)
        self.img_size = img_size

    def get_needed_pad(self, img_size):
        """Padding making ``img_size`` tile-compatible (reference
        TiledMixin2d, utils/mixins.py:416)."""
        from ...utils.mixins import _compute_needed_pad

        return _compute_needed_pad(tuple(img_size)[-2:], self.patch_size,
                                   self.stride)

    def get_compatible_img_size(self, img_size):
        """Smallest tile-compatible size >= ``img_size`` (reference
        utils/mixins.py:425)."""
        from ...utils.mixins import _compute_compatible_img_size

        return _compute_compatible_img_size(tuple(img_size)[-2:],
                                            self.patch_size, self.stride)

    def image_to_patches(self, image, pad=(0, 0, 0, 0)):
        """Split an image into this generator's tiles (reference
        utils/mixins.py:366)."""
        from ...utils.mixins import image_to_patches

        return image_to_patches(image, self.patch_size, self.stride, pad=pad)

    def patches_to_image(self, patches, img_size=None, reduce_overlap="sum"):
        """Reassemble tiles (reference utils/mixins.py:391)."""
        from ...utils.mixins import patches_to_image

        return patches_to_image(patches, self.stride, img_size=img_size,
                                reduce_overlap=reduce_overlap)

    def get_num_patches(self, img_size):
        """(n_h, n_w) tiles covering ``img_size`` (reference mixins
        get_num_patches with pad_if_needed)."""
        H, W = img_size[-2:]
        ph, pw = self.patch_size
        sh, sw = self.stride
        ny = -(-max(H - ph, 0) // sh) + 1
        nx = -(-max(W - pw, 0) // sw) + 1
        return ny, nx

    def sample(self, batch_size, key, img_size=None, **kwargs):
        img_size = img_size if img_size is not None else self.img_size
        if img_size is None:
            raise ValueError("img_size must be given at construction or step time")
        if isinstance(img_size, int):
            img_size = (img_size, img_size)
        ny, nx = self.get_num_patches(img_size)
        K = ny * nx
        psf = self.psf_generator.sample(batch_size * K, key, **kwargs)["filter"]
        h, w = psf.shape[-2:]
        psf = jnp.swapaxes(psf.reshape(batch_size, K, -1, h, w), 1, 2)
        return {"filters": psf}


class DiffractionBlurGenerator3D(PSFGenerator):
    r"""3D diffraction-limited PSF stacks (reference generator/blur.py:1112):
    the 2D Zernike pupil (delegated to
    :class:`DiffractionBlurGenerator`) is propagated to each defocus plane
    by the angular-spectrum phase ``exp(-2i pi k_z z)`` with
    ``k_z = sqrt(kb^2 - k_lateral^2)``; the PSF at depth ``z`` is
    ``|FFT(pupil_z)|^2``, normalized over the whole volume.

    :param psf_size: (depth, H, W) of the generated 3D PSF.
    :param zernike_index: active Zernike modes (see 2D generator).
    :param fc: lateral cutoff frequency; scalar or per-channel sequence.
    :param kb: total wave number ``NI/wavelength * pixel_size``; must exceed
        ``fc``. Scalar or per-channel.
    :param stepz_pixel: axial / lateral voxel-size ratio.
    :param pupil_size: super-resolved pupil grid (default (512, 512)).

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import DiffractionBlurGenerator3D
        >>> g = DiffractionBlurGenerator3D((5, 17, 17), stepz_pixel=2,
        ...                                zernike_index=(3,),
        ...                                index_convention='ansi')
        >>> g.zernike_polynomials
        ['Zernike(n = 2, m = -2) -- Oblique Astigmatism']
        >>> out = g.step(2, key=jax.random.key(0))
        >>> out["filter"].shape
        (2, 1, 5, 17, 17)
    """

    def __init__(self, psf_size=(9, 31, 31), zernike_index=tuple(range(4, 12)),
                 fc=0.2, kb=0.25, max_zernike_amplitude: float = 0.15,
                 zernike_perturbation_amplitude: float = 0.0,
                 pupil_size=(512, 512), apodize: bool = False,
                 random_rotate: bool = False, stepz_pixel: float = 1.0,
                 index_convention: str = "noll", seed: int = 0,
                 num_channels: int = 1, n_zernike=None, **kwargs):
        if len(psf_size) != 3:
            raise ValueError("You should provide a tuple of len == 3 to generate 3D PSFs.")
        super().__init__(psf_size=psf_size[1:], num_channels=num_channels, seed=seed)
        if n_zernike is not None:  # legacy count-based surface
            zernike_index = tuple(range(4, 4 + n_zernike))
        self.generator2d = DiffractionBlurGenerator(
            psf_size=psf_size[1:], zernike_index=zernike_index, fc=fc,
            max_zernike_amplitude=max_zernike_amplitude,
            zernike_perturbation_amplitude=zernike_perturbation_amplitude,
            pupil_size=pupil_size, apodize=apodize,
            index_convention=index_convention, seed=seed, **kwargs,
        )
        self.psf_size = tuple(psf_size)
        self.shape = self.psf_size
        self.fc = self.generator2d.fc
        self.kb = kb
        self.apodize = apodize
        self.random_rotate = random_rotate
        self.stepz_pixel = stepz_pixel
        self.nzs = psf_size[0]
        self.zernike_index = self.generator2d.zernike_index
        self.n_zernike = len(self.zernike_index)
        self._defocus = (
            jnp.linspace(-self.nzs / 2, self.nzs / 2, self.nzs)[:, None, None]
            * self.stepz_pixel
        )

    @property
    def zernike_polynomials(self):
        return self.generator2d.zernike_polynomials

    def sample(self, batch_size, key, coeff=None, angle=None, fc=None, kb=None,
               max_zernike_amplitude=None, zernike_perturbation_amplitude=None,
               **kwargs):
        k2d, ka = jax.random.split(key)
        gen_dict = self.generator2d.sample(
            batch_size, k2d, coeff=coeff, fc=fc,
            max_zernike_amplitude=max_zernike_amplitude,
            zernike_perturbation_amplitude=zernike_perturbation_amplitude,
            **kwargs,
        )
        pupil = gen_dict["pupil"]  # (B, C, P, P) complex
        fc_used = gen_dict["fc"]  # (B, C)

        kb_val = self.kb if kb is None else kb
        kb_used = self.generator2d._format_fc(kb_val, batch_size=fc_used.shape[0])
        kb_used = jnp.broadcast_to(kb_used, fc_used.shape)

        XXn, YYn = jnp.meshgrid(self.generator2d.lin_x, self.generator2d.lin_y,
                                indexing="ij")
        k_lat = jnp.sqrt(XXn**2 + YYn**2)
        B, C = fc_used.shape
        kb_hw = kb_used.reshape(B, C, 1, 1)
        # complex sqrt keeps the evanescent branch (reference blur.py:1335)
        d = jnp.sqrt((kb_hw**2 - k_lat**2).astype(jnp.complex64))
        prop = jnp.exp(
            -1j * 2 * jnp.pi * d[:, :, None] * self._defocus[None, None]
        )  # (B, C, D, P, P)
        p = jnp.nan_to_num(pupil[:, :, None] * prop, nan=0.0)

        psf = jnp.fft.ifftshift(
            jnp.fft.fft2(jnp.fft.fftshift(p, axes=(-2, -1)), axes=(-2, -1)),
            axes=(-2, -1),
        )
        psf = jnp.abs(psf) ** 2
        g2 = self.generator2d
        psf = psf[
            ...,
            g2.pad_pre[0] : g2.pupil_size[0] - g2.pad_post[0],
            g2.pad_pre[1] : g2.pupil_size[1] - g2.pad_post[1],
        ]  # (B, C, D, h, w)

        if self.random_rotate:
            from ...transform.geometric import rotate_via_shear

            if angle is None:
                angle = g2.generate_angles(B, ka)
            D = psf.shape[2]
            flat = psf.reshape(B, C * D, *psf.shape[-2:])
            psf = rotate_via_shear(flat, angle).reshape(psf.shape)

        if self.apodize:
            psf = g2.apodize_mask[None, None, None] * psf

        psf = psf / jnp.sum(psf, axis=(-3, -2, -1), keepdims=True)

        params = {"filter": psf, "pupil": pupil, "coeff": gen_dict["coeff"],
                  "fc": fc_used}
        if self.random_rotate:
            params["angle"] = angle
        return params


class ConfocalBlurGenerator3D(PSFGenerator):
    r"""3D confocal laser-scanning-microscope PSFs
    (reference generator/blur.py:1388): the product of an illumination PSF
    and a collection PSF convolved with the pinhole aperture, each computed
    from physical optics parameters via :class:`DiffractionBlurGenerator3D`.

    :param psf_size: (depth, height, width).
    :param zernike_index: active Zernike modes.
    :param NI: refractive index of the immersion medium (default 1.51, oil).
    :param NA: numerical aperture (< NI; default 1.37).
    :param lambda_ill: illumination wavelength(s) in meters; a list of C
        values makes C-channel PSFs.
    :param lambda_coll: collection wavelength(s), same length as lambda_ill.
    :param pixelsize_XY: lateral pixel size (m).
    :param pixelsize_Z: axial pixel size (m).
    :param pinhole_radius: pinhole radius in Airy units.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import ConfocalBlurGenerator3D
        >>> g = ConfocalBlurGenerator3D((5, 17, 17), zernike_index=(3,))
        >>> g.zernike_polynomials
        ['Zernike(n = 1, m = -1) -- Vertical Tilt']
        >>> out = g.step(1, key=jax.random.key(0))
        >>> sorted(out)
        ['coeff_coll', 'coeff_ill', 'fc_coll', 'fc_ill', 'filter', 'pupil_coll', 'pupil_ill']
        >>> out["filter"].shape
        (1, 1, 5, 17, 17)
    """

    def __init__(self, psf_size=(9, 15, 15), zernike_index=tuple(range(4, 12)),
                 NI: float = 1.51, NA: float = 1.37,
                 lambda_ill=489e-9, lambda_coll=395e-9,
                 pixelsize_XY: float = 50e-9, pixelsize_Z: float = 100e-9,
                 pinhole_radius: float = 1,
                 max_zernike_amplitude: float = 0.1,
                 zernike_perturbation_amplitude: float = 0.0,
                 pupil_size=(512, 512), index_convention: str = "noll",
                 seed: int = 0, **kwargs):
        if len(psf_size) != 3:
            raise ValueError("You should provide a tuple of len == 3 to generate 3D PSFs.")
        if isinstance(lambda_ill, (int, float)):
            lambda_ill = [lambda_ill]
        if isinstance(lambda_coll, (int, float)):
            lambda_coll = [lambda_coll]
        if len(lambda_ill) != len(lambda_coll):
            raise ValueError(
                f"lambda_ill and lambda_coll must have the same length, "
                f"got {len(lambda_ill)} and {len(lambda_coll)}."
            )
        super().__init__(psf_size=psf_size[1:], seed=seed)
        self.psf_size = tuple(psf_size)
        self.shape = self.psf_size

        fc_ill = [NA / lam * pixelsize_XY for lam in lambda_ill]
        kb_ill = [NI / lam * pixelsize_XY for lam in lambda_ill]
        fc_coll = [NA / lam * pixelsize_XY for lam in lambda_coll]
        kb_coll = [NI / lam * pixelsize_XY for lam in lambda_coll]
        self.fc_ill = fc_ill[0] if len(fc_ill) == 1 else fc_ill
        self.kb_ill = kb_ill[0] if len(kb_ill) == 1 else kb_ill
        self.fc_coll = fc_coll[0] if len(fc_coll) == 1 else fc_coll
        self.kb_coll = kb_coll[0] if len(kb_coll) == 1 else kb_coll

        self.pinhole_radius = pinhole_radius
        self.pixelsize_XY = pixelsize_XY
        self.pixel_size_Z = pixelsize_Z
        self.lambda_ill = lambda_ill
        self.lambda_coll = lambda_coll
        self.NI = NI
        self.NA = NA

        common = dict(
            psf_size=psf_size, zernike_index=zernike_index,
            stepz_pixel=pixelsize_Z / pixelsize_XY,  # float: int() truncated 1.5 -> 1, compressing the defocus axis
            max_zernike_amplitude=max_zernike_amplitude,
            zernike_perturbation_amplitude=zernike_perturbation_amplitude,
            pupil_size=pupil_size, index_convention=index_convention,
            seed=seed, **kwargs,
        )
        self.generator_ill = DiffractionBlurGenerator3D(
            fc=self.fc_ill, kb=self.kb_ill, **common
        )
        self.generator_coll = DiffractionBlurGenerator3D(
            fc=self.fc_coll, kb=self.kb_coll, **common
        )

        # per-channel pinhole discs (host-side constants)
        self._pinholes = []
        for lam_c in self.lambda_coll:
            airy_unit = 0.61 * lam_c / self.NA
            ph_radius = self.pinhole_radius * airy_unit
            n = int(3 * ph_radius / self.pixelsize_XY)
            lin = np.linspace(-1.5 * ph_radius, 1.5 * ph_radius, n)
            step = lin[1] - lin[0]
            XX, YY = np.meshgrid(lin, lin, indexing="ij")
            rho = jnp.asarray(np.sqrt(XX**2 + YY**2), jnp.float32)
            self._pinholes.append(
                bump_function(rho, ph_radius - step / 2, step / 2)
            )

    @property
    def zernike_polynomials(self):
        return self.generator_ill.zernike_polynomials

    def sample(self, batch_size, key, coeff_ill=None, coeff_coll=None,
               fc_ill=None, kb_ill=None, fc_coll=None, kb_coll=None, **kwargs):
        from ...ops.conv import conv2d

        ki, kc = jax.random.split(key)
        dict_ill = self.generator_ill.sample(
            batch_size, ki, coeff=coeff_ill, fc=fc_ill, kb=kb_ill
        )
        dict_coll = self.generator_coll.sample(
            batch_size, kc, coeff=coeff_coll, fc=fc_coll, kb=kb_coll
        )
        psf_ill = dict_ill["filter"]
        psf_coll = dict_coll["filter"]

        # collection PSF seen through the pinhole: 2D convolution with the
        # aperture disc in every z plane, per channel (reference blur.py:1637)
        B, C, D, H, W = psf_coll.shape
        chans = []
        for c, pin in enumerate(self._pinholes):
            planes = psf_coll[:, c].reshape(B * D, 1, H, W)
            conv = conv2d(planes, pin[None, None], padding="constant")
            chans.append(conv.reshape(B, D, H, W))
        psf_coll_conv = jnp.stack(chans, axis=1)

        psf = psf_ill * psf_coll_conv
        psf = psf / jnp.sum(psf, axis=(-3, -2, -1), keepdims=True)
        return {
            "filter": psf,
            "pupil_ill": dict_ill["pupil"],
            "pupil_coll": dict_coll["pupil"],
            "coeff_ill": dict_ill["coeff"],
            "coeff_coll": dict_coll["coeff"],
            "fc_ill": dict_ill["fc"],
            "fc_coll": dict_coll["fc"],
        }


def bump_function(x, a=1.0, b=1.0):
    r"""Smooth compactly-supported bump (reference generator/blur.py:946):
    1 on ``[-a, a]``, decays to 0 over ``[a, a+b]`` via
    ``exp(-1/(1-t^2))/exp(-1)``; ``a``/``b`` broadcast against ``x``."""
    x = jnp.asarray(x)
    abs_x = jnp.abs(x)
    t = jnp.clip((abs_x - a) / b, 0.0, 1.0 - 1e-6)
    transition = jnp.exp(-1.0 / (1.0 - t**2)) / math.exp(-1.0)
    return jnp.where(
        abs_x <= a, 1.0, jnp.where(abs_x < a + b, transition, 0.0)
    )

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
    r"""Space-varying blur parameters (reference generator/blur.py
    ProductConvolutionBlurGenerator): K random PSFs + smooth partition-of-
    unity multipliers for :class:`SpaceVaryingBlur`."""

    def __init__(self, psf_generator=None, img_size=(32, 32), n_eigen_psf: int = 4, seed: int = 0):
        super().__init__(seed=seed)
        self.psf_generator = (
            psf_generator if psf_generator is not None else DiffractionBlurGenerator(psf_size=(15, 15))
        )
        self.img_size = tuple(img_size)[-2:]
        self.K = n_eigen_psf

    def sample(self, batch_size, key, **kwargs):
        kf, kw = jax.random.split(key)
        filters = self.psf_generator.sample(self.K * batch_size, kf)["filter"]
        h, w = filters.shape[-2:]
        filters = filters.reshape(batch_size, 1, self.K, h, w)
        # smooth random multipliers, softmax-normalized across K
        H, W = self.img_size
        coarse = jax.random.normal(kw, (batch_size, 1, self.K, 8, 8))
        up = jax.image.resize(coarse, (batch_size, 1, self.K, H, W), "bilinear")
        mult = jax.nn.softmax(up * 3.0, axis=2)
        return {"filters": filters, "multipliers": mult}


class TiledBlurGenerator(ProductConvolutionBlurGenerator):
    r"""Tile-piecewise-constant multipliers (reference TiledBlurGenerator):
    the image is split into a grid of tiles, each with its own PSF."""

    def __init__(self, psf_generator=None, img_size=(32, 32), tiles=(2, 2), seed: int = 0):
        super().__init__(psf_generator, img_size, n_eigen_psf=tiles[0] * tiles[1], seed=seed)
        self.tiles = tuple(tiles)

    def sample(self, batch_size, key, **kwargs):
        out = super().sample(batch_size, key, **kwargs)
        H, W = self.img_size
        th, tw = self.tiles
        # hard tile assignment instead of smooth softmax
        ys = jnp.minimum(jnp.arange(H) * th // H, th - 1)
        xs = jnp.minimum(jnp.arange(W) * tw // W, tw - 1)
        tile_id = ys[:, None] * tw + xs[None, :]
        mult = jax.nn.one_hot(tile_id, th * tw, axis=-1)  # (H, W, K)
        mult = jnp.moveaxis(mult, -1, 0)[None, None]  # (1,1,K,H,W)
        out["multipliers"] = jnp.broadcast_to(
            mult, (batch_size, 1, th * tw, H, W)
        )
        return out


class ConfocalBlurGenerator3D(PhysicsGenerator):
    r"""3D confocal microscopy PSFs (reference ConfocalBlurGenerator3D):
    separable lateral Airy-like x axial Gaussian profiles with random
    numerical aperture / wavelength jitter."""

    def __init__(self, psf_size=(9, 15, 15), NA: float = 1.2, seed: int = 0):
        super().__init__(seed=seed)
        self.psf_size = tuple(psf_size)
        self.NA = NA

    def sample(self, batch_size, key, **kwargs):
        D, H, W = self.psf_size
        kna, kwl = jax.random.split(key)
        na = self.NA * (1 + 0.1 * jax.random.normal(kna, (batch_size,)))
        wl = 0.5 * (1 + 0.1 * jax.random.normal(kwl, (batch_size,)))

        z = jnp.arange(D) - (D - 1) / 2
        yx = jnp.arange(H) - (H - 1) / 2
        yy, xx = jnp.meshgrid(yx, yx, indexing="ij")
        r2 = yy**2 + xx**2

        def one(na_i, wl_i):
            sig_lat = wl_i / (2 * na_i) * 2.0
            sig_ax = 2 * wl_i / (na_i**2) * 1.5
            lat = jnp.exp(-r2 / (2 * sig_lat**2))
            ax = jnp.exp(-(z**2) / (2 * sig_ax**2))
            psf = ax[:, None, None] * lat[None]
            return psf / jnp.sum(psf)

        psfs = jax.vmap(one)(na, wl)
        return {"filter": psfs[:, None]}


class DiffractionBlurGenerator3D(PSFGenerator):
    r"""3D diffraction-limited PSF stacks (reference generator/blur.py:1112):
    the 2D Zernike pupil is propagated to each defocus plane by the angular
    spectrum phase ``exp(-2i pi k_z z)`` with
    ``k_z = sqrt(kb^2 - k_lateral^2)``; the PSF at depth z is
    ``|FFT(pupil_z)|^2``, normalized over the whole volume.

    :param psf_size: (D, H, W) size of the generated 3D PSF.
    :param fc: lateral cutoff frequency (pupil radius fraction).
    :param kb: total wavenumber over sampling frequency (default 0.25).
    :param stepz_pixel: axial/lateral voxel size ratio.
    """

    def __init__(self, psf_size=(9, 31, 31), fc: float = 0.2, kb: float = 0.25,
                 stepz_pixel: float = 2.0, num_channels: int = 1,
                 max_zernike_amplitude: float = 0.15, n_zernike: int = 8,
                 seed: int = 0):
        if len(psf_size) != 3:
            raise ValueError("psf_size must be (D, H, W)")
        super().__init__(psf_size=psf_size[1:], num_channels=num_channels, seed=seed)
        self.depth = psf_size[0]
        self.fc = fc
        self.kb = kb
        self.stepz_pixel = stepz_pixel
        self.max_amp = max_zernike_amplitude
        self.n_zernike = n_zernike
        h, w = self.psf_size
        g = max(h, w)
        self._basis, self._pupil_mask = zernike_basis(
            n_modes=n_zernike + 3, grid_size=g, radius=fc * g
        )
        # lateral frequency grid (cycles/pixel) and axial wavevector
        fx = np.fft.fftshift(np.fft.fftfreq(g))
        FX, FY = np.meshgrid(fx, fx, indexing="ij")
        k_lat2 = FX**2 + FY**2
        kz = np.sqrt(np.clip(kb**2 - k_lat2, 0.0, None))
        self._kz = jnp.asarray(kz, jnp.float32)

    def sample(self, batch_size, key, **kwargs):
        D = self.depth
        h, w = self.psf_size
        basis = self._basis[3 : 3 + self.n_zernike]
        coeffs = jax.random.uniform(
            key, (batch_size, self.n_zernike), minval=-self.max_amp, maxval=self.max_amp
        )
        zs = (jnp.arange(D) - (D - 1) / 2.0) * self.stepz_pixel

        def one(c):
            phase = jnp.tensordot(c, basis, axes=1)
            pupil0 = self._pupil_mask * jnp.exp(2j * jnp.pi * phase)

            def plane(z):
                pupil = pupil0 * jnp.exp(-2j * jnp.pi * self._kz * z)
                field = jnp.fft.fftshift(jnp.fft.fft2(jnp.fft.ifftshift(pupil)))
                return jnp.abs(field) ** 2

            psf = jax.vmap(plane)(zs)  # (D, g, g)
            g = psf.shape[-1]
            top, left = (g - h) // 2, (g - w) // 2
            psf = psf[:, top : top + h, left : left + w]
            return psf / jnp.sum(psf)

        psfs = jax.vmap(one)(coeffs)  # (B, D, h, w)
        return {"filter": psfs[:, None], "coeff": coeffs}


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

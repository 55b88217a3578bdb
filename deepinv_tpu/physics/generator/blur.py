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
from .zernike import zernike_basis

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


class GaussianBlurGenerator(PhysicsGenerator):
    r"""Random anisotropic Gaussian PSFs (reference GaussianBlurGenerator)."""

    def __init__(self, psf_size=(31, 31), sigma_min: float = 0.01, sigma_max: float = 4.0, num_channels: int = 1, seed: int = 0):
        super().__init__(seed=seed)
        self.psf_size = tuple(psf_size) if not isinstance(psf_size, int) else (psf_size, psf_size)
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.num_channels = num_channels

    def sample(self, batch_size, key, **kwargs):
        h, w = self.psf_size
        ks, ka = jax.random.split(key)
        sig = jax.random.uniform(
            ks, (batch_size, 2), minval=self.sigma_min, maxval=self.sigma_max
        )
        ang = jax.random.uniform(ka, (batch_size,), minval=0.0, maxval=180.0)

        ax_y = jnp.arange(h) - (h - 1) / 2
        ax_x = jnp.arange(w) - (w - 1) / 2
        yy, xx = jnp.meshgrid(ax_y, ax_x, indexing="ij")

        def one(s, a):
            th = -jnp.deg2rad(a)
            xr = jnp.cos(th) * xx + jnp.sin(th) * yy
            yr = -jnp.sin(th) * xx + jnp.cos(th) * yy
            k = jnp.exp(-0.5 * ((xr / s[1]) ** 2 + (yr / s[0]) ** 2))
            return k / jnp.sum(k)

        psfs = jax.vmap(one)(sig, ang)
        return {"filter": psfs[:, None], "sigma": sig, "angle": ang}


class PSFGenerator(PhysicsGenerator):
    r"""Base class for point-spread-function generators
    (reference generator/blur.py:17): holds the PSF size; subclasses
    implement ``sample`` returning ``{"filter": (B, C, h, w)}``."""

    def __init__(self, psf_size=(31, 31), num_channels: int = 1, seed: int = 0):
        super().__init__(seed=seed)
        self.psf_size = (psf_size, psf_size) if isinstance(psf_size, int) else tuple(psf_size)
        self.num_channels = num_channels


class DiffractionBlurGenerator(PhysicsGenerator):
    r"""Optical diffraction PSFs from random Zernike aberrations
    (reference DiffractionBlurGenerator): pupil phase = sum_i c_i Z_i,
    PSF = |FFT(pupil)|^2, normalized.

    :param psf_size: output PSF size.
    :param fc: cutoff frequency (pupil radius fraction, default 0.2).
    :param list_param: Zernike mode names to randomize.
    """

    def __init__(self, psf_size=(31, 31), fc: float = 0.2, num_channels: int = 1,
                 max_zernike_amplitude: float = 0.15, seed: int = 0,
                 n_zernike: int = 8):
        super().__init__(seed=seed)
        self.psf_size = tuple(psf_size) if not isinstance(psf_size, int) else (psf_size, psf_size)
        self.fc = fc
        self.num_channels = num_channels
        self.max_amp = max_zernike_amplitude
        self.n_zernike = n_zernike
        # pupil grid + Zernike basis (host-side constants)
        h, w = self.psf_size
        pupil_diam = int(2 * round(fc * max(h, w)) + 1)
        self._basis, self._pupil_mask = zernike_basis(
            n_modes=n_zernike + 3, grid_size=max(h, w), radius=fc * max(h, w)
        )

    def sample(self, batch_size, key, **kwargs):
        h, w = self.psf_size
        n = self._basis.shape[0]
        coeffs = jax.random.uniform(
            key, (batch_size, self.n_zernike), minval=-self.max_amp, maxval=self.max_amp
        )
        # skip piston/tip/tilt (first 3 modes)
        basis = self._basis[3 : 3 + self.n_zernike]

        def one(c):
            phase = jnp.tensordot(c, basis, axes=1)
            pupil = self._pupil_mask * jnp.exp(2j * jnp.pi * phase)
            field = jnp.fft.fftshift(jnp.fft.fft2(jnp.fft.ifftshift(pupil)))
            psf = jnp.abs(field) ** 2
            psf = psf / jnp.sum(psf)
            g = psf.shape[0]
            top = (g - h) // 2
            left = (g - w) // 2
            return psf[top : top + h, left : left + w]

        psfs = jax.vmap(one)(coeffs)
        psfs = psfs / jnp.sum(psfs, axis=(-2, -1), keepdims=True)
        return {"filter": psfs[:, None], "coeff": coeffs}


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


def bump_function(x, a: float = 1.0, b: float = 1.0):
    r"""Smooth compactly-supported bump (reference functional/convolution.py
    bump_function): 1 on [-a, a], smooth decay to 0 over width ``b``."""
    x = jnp.asarray(x)
    v = jnp.zeros_like(x)
    v = jnp.where(jnp.abs(x) <= a, 1.0, v)
    mid = (jnp.abs(x) > a) & (jnp.abs(x) < a + b)
    t = jnp.clip((jnp.abs(x) - a) / b, 1e-7, 1 - 1e-7)
    decay = jnp.exp(-1.0 / (1 - t**2)) / (
        jnp.exp(-1.0 / (1 - t**2)) + jnp.exp(-1.0 / jnp.clip(t**2, 1e-7, None))
    )
    return jnp.where(mid, decay, v)

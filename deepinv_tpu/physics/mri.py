"""MRI physics family (reference deepinv/physics/mri.py, 695 LoC, built on
MRIMixin utils/mixins.py:118-289).

Conventions preserved from the reference:

- images/measurements are real arrays of shape (B, 2, ..., H, W): channel 0 =
  real part, channel 1 = imaginary part;
- k-space transform is the centered orthonormal FFT
  ``fftshift . fftn(norm='ortho') . ifftshift``;
- :class:`MRI` is a :class:`DecomposablePhysics` (mask = singular values), so
  prox / dagger are closed-form — the hot path of MoDL/VarNet-style unrolled
  recon compiles to pure FFT + elementwise XLA ops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import mixins as _mixins
TimeMixin = _mixins.TimeMixin
from .base import DecomposablePhysics, LinearPhysics

__all__ = ["MRI", "MultiCoilMRI", "DynamicMRI", "SequentialMRI", "MRIMixin"]


class MRIMixin:
    """FFT helpers shared by MRI physics and models (utils/mixins.py:118)."""

    @staticmethod
    def to_complex(x):
        """(B, 2, ..., H, W) real -> (B, 1, ..., H, W) complex."""
        return x[:, 0:1] + 1j * x[:, 1:2]

    @staticmethod
    def from_complex(x):
        """(B, 1, ..., H, W) complex -> (B, 2, ..., H, W) real."""
        return jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=1)

    @staticmethod
    def fft(x, axes=(-2, -1)):
        return jnp.fft.fftshift(
            jnp.fft.fftn(jnp.fft.ifftshift(x, axes=axes), axes=axes, norm="ortho"),
            axes=axes,
        )

    @staticmethod
    def ifft(x, axes=(-2, -1)):
        return jnp.fft.fftshift(
            jnp.fft.ifftn(jnp.fft.ifftshift(x, axes=axes), axes=axes, norm="ortho"),
            axes=axes,
        )

    @classmethod
    def im_to_kspace(cls, x, three_d: bool = False):
        axes = (-3, -2, -1) if three_d else (-2, -1)
        return cls.from_complex(cls.fft(cls.to_complex(x), axes=axes))

    @classmethod
    def kspace_to_im(cls, y, three_d: bool = False):
        axes = (-3, -2, -1) if three_d else (-2, -1)
        return cls.from_complex(cls.ifft(cls.to_complex(y), axes=axes))

    @staticmethod
    def rss(x, multicoil: bool = True, keepdim: bool = True):
        """Root-sum-of-squares magnitude (utils/mixins.py:250)."""
        mag = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=keepdim))
        if multicoil and mag.ndim >= 5:
            mag = jnp.sqrt(jnp.sum(mag**2, axis=2, keepdims=keepdim))
        return mag

    @staticmethod
    def crop_center(x, shape):
        """Center-crop last two dims to ``shape`` (utils/mixins.py:208)."""
        H, W = x.shape[-2:]
        h, w = shape
        top, left = (H - h) // 2, (W - w) // 2
        return x[..., top : top + h, left : left + w]

    # --- reference-named API (utils/mixins.py:118-289) ---

    @staticmethod
    def to_torch_complex(x):
        """(B, 2, ..., H, W) real -> (B, ..., H, W) complex — the reference's
        channel-dropping convention (utils/mixins.py:149)."""
        return x[:, 0] + 1j * x[:, 1]

    @staticmethod
    def from_torch_complex(x):
        """(B, ..., H, W) complex -> (B, 2, ..., H, W) real
        (utils/mixins.py:154)."""
        return jnp.stack([jnp.real(x), jnp.imag(x)], axis=1)

    @staticmethod
    def check_mask(mask=None, three_d: bool = False):
        """Normalize an MRI mask to (B, 2, ..., H, W) with duplicated
        real/imag channels (utils/mixins.py:127)."""
        if mask is None:
            return None
        return _check_mask(mask, three_d=three_d)

    def crop(self, x, crop: bool = True, shape=None, rescale: bool = False):
        """Center-crop (or rescale) the trailing 2D dims to ``shape`` /
        ``self.img_size``, with the reference's odd-height adjustment
        (utils/mixins.py:208)."""
        crop_size = tuple(shape[-2:]) if shape is not None else tuple(
            self.img_size[-2:])
        odd_h = crop_size[0] % 2 == 1
        if odd_h:
            crop_size = (crop_size[0] + 1, crop_size[1])
        if rescale and crop:
            raise ValueError("Only one of rescale or crop can be used.")
        elif rescale:
            lead = x.shape[:-2]
            flat = x.reshape((-1,) + x.shape[-2:])
            out = jax.image.resize(flat, (flat.shape[0],) + crop_size,
                                   method="bilinear")
            out = out.reshape(lead + crop_size)
        elif crop:
            out = MRIMixin.crop_center(x, crop_size)
        else:
            return x
        if odd_h:
            out = out[..., :-1, :]
        return out


def _check_mask(mask, img_size=None, three_d=False):
    if mask is None:
        mask = jnp.ones(img_size)
    mask = jnp.asarray(mask, dtype=jnp.float32)
    # normalize to (B, C, ..., H, W)
    target_nd = 5 if three_d else 4
    while mask.ndim < target_nd:
        mask = mask[None]
    if mask.shape[1] == 1:
        mask = jnp.concatenate([mask, mask], axis=1)
    return mask


class MRI(MRIMixin, DecomposablePhysics):
    r"""Single-coil accelerated MRI ``y = M F x`` (reference mri.py:11).

    :param mask: sampling mask (H,W), (C,H,W), (B,C,H,W) or (B,C,D,H,W).
    :param img_size: used to build an all-ones mask when ``mask`` is None.
    :param three_d: FFT over 3 dims for (B,C,D,H,W) data.

    :Examples:

        Images are (B, 2, H, W) real/imag pairs; the adjoint of the masked
        FFT is the zero-filled reconstruction:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.physics import MRI
        >>> mask = (jax.random.uniform(jax.random.key(0), (16, 16)) < 0.4)
        >>> physics = MRI(mask=mask.astype(jnp.float32), img_size=(16, 16))
        >>> x = jax.random.normal(jax.random.key(1), (1, 2, 16, 16))
        >>> y = physics.A(x)
        >>> zero_filled = physics.A_adjoint(y)
        >>> zero_filled.shape
        (1, 2, 16, 16)
    """

    def __init__(self, mask=None, img_size=(320, 320), three_d: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.three_d = three_d
        self.mask = _check_mask(mask, img_size, three_d)

    def update(self, **params):
        if "mask" in params and params["mask"] is not None:
            m = _check_mask(params.pop("mask"), three_d=self.three_d)
            new = self.replace(mask=m)
            return new.update(**params) if params else new
        return super().update(**params)

    def V_adjoint(self, x):
        return self.im_to_kspace(x, three_d=self.three_d)

    def V(self, y):
        return self.kspace_to_im(y, three_d=self.three_d)

    def A_adjoint(self, y, mask=None, mag: bool = False, crop=None, **kwargs):
        phys = self.update(mask=mask)
        x = DecomposablePhysics.A_adjoint(phys, y)
        if mag:
            x = self.rss(x, multicoil=False)
        if crop is not None:
            x = self.crop_center(x, crop)
        return x

    def noise(self, y, key=None):
        if self.noise_model is None:
            return y
        return self.noise_model(y, key=key) * self.mask


class MultiCoilMRI(MRIMixin, LinearPhysics):
    r"""Multi-coil Cartesian MRI ``y_n = M F (s_n . x)`` (reference mri.py:166).

    :param mask: sampling mask, see :class:`MRI`.
    :param coil_maps: complex coil sensitivity maps of shape (B, N, H, W) (or
        int N for simulated constant maps).
    :param img_size: used when mask is None.
    """

    def __init__(self, mask=None, coil_maps=1, img_size=(320, 320), three_d: bool = False, kspace_trajectory=None, fast_normal: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.three_d = three_d
        # non-Cartesian mode (reference: torchkbnufft path, mri.py:166):
        # sample k-space at arbitrary (2, M) radian coordinates via NUFFT
        self.kspace_trajectory = (
            jnp.asarray(kspace_trajectory) if kspace_trajectory is not None else None
        )
        self.img_size = tuple(img_size)[-2:]
        self.mask = _check_mask(mask, img_size, three_d)
        if isinstance(coil_maps, int):
            H, W = self.mask.shape[-2:]
            coil_maps = jnp.ones((1, coil_maps, H, W), dtype=jnp.complex64)
        self.coil_maps = jnp.asarray(coil_maps)
        # non-Cartesian Toeplitz-embedded normal operator (shared across
        # coils): A^H A = sum_c S_c^H (F^H F) S_c runs as two FFTs per coil
        # instead of a NUFFT forward/adjoint pair (the same trick
        # torchkbnufft exposes as calc_toeplitz_kernel)
        if self.kspace_trajectory is not None and fast_normal:
            from ..ops.nufft import nufft2_toeplitz_spec

            self._normal_spec = nufft2_toeplitz_spec(
                self.kspace_trajectory, self.img_size
            )
        else:
            self._normal_spec = None

    @property
    def fast_normal(self) -> bool:
        return self._normal_spec is not None

    @staticmethod
    def check_coil_maps(coil_maps, three_d: bool = False):
        """Normalize coil maps to (B, N, H, W) (or (B, N, D, H, W)) complex
        (reference mri.py:383)."""
        coil_maps = jnp.asarray(coil_maps)
        while coil_maps.ndim < (4 if not three_d else 5):
            coil_maps = coil_maps[None]
        if not jnp.iscomplexobj(coil_maps):
            raise ValueError("coil_maps should be of complex dtype.")
        return coil_maps

    def A_adjoint_A(self, x, **params):
        if self._normal_spec is not None:
            from ..ops.nufft import nufft2_normal

            phys = self.update(**params) if params else self
            xc = self.to_complex(x)  # (B,1,H,W)
            sx = xc * phys.coil_maps[:, :, ...]  # (B,N,H,W)
            imgs = nufft2_normal(sx, self._normal_spec)
            out = jnp.sum(jnp.conj(phys.coil_maps) * imgs, axis=1, keepdims=True)
            return jnp.concatenate([jnp.real(out), jnp.imag(out)], axis=1)
        return self.A_adjoint(self.A(x, **params), **params)

    def A(self, x, mask=None, coil_maps=None, **params):
        phys = self.update(mask=mask, coil_maps=coil_maps)
        xc = self.to_complex(x)  # (B,1,H,W)
        sx = xc * phys.coil_maps[:, :, ...]  # (B,N,H,W)
        if self.kspace_trajectory is not None:
            from ..ops.nufft import nufft2

            yk = nufft2(sx, self.kspace_trajectory)  # (B,N,M)
            return jnp.stack([jnp.real(yk), jnp.imag(yk)], axis=1)
        axes = (-3, -2, -1) if self.three_d else (-2, -1)
        y = self.fft(sx, axes=axes)
        # mask: (B,2,H,W) -> use channel 0 for complex masking
        m = phys.mask[:, 0:1]
        yk = y * m
        # to real channels: (B,2,N,H,W)
        return jnp.stack([jnp.real(yk), jnp.imag(yk)], axis=1)

    def A_adjoint(self, y, mask=None, coil_maps=None, rss: bool = False, crop=None, **params):
        phys = self.update(mask=mask, coil_maps=coil_maps)
        if self.kspace_trajectory is not None:
            from ..ops.nufft import nufft2_adjoint

            yk = y[:, 0] + 1j * y[:, 1]  # (B,N,M)
            imgs = nufft2_adjoint(yk, self.kspace_trajectory, self.img_size)
            out = jnp.sum(jnp.conj(phys.coil_maps) * imgs, axis=1, keepdims=True)
            x = jnp.concatenate([jnp.real(out), jnp.imag(out)], axis=1)
            if rss:
                x = jnp.sqrt(jnp.sum(jnp.abs(imgs) ** 2, axis=1, keepdims=True))
            return x
        yk = y[:, 0] + 1j * y[:, 1]  # (B,N,H,W)
        m = phys.mask[:, 0:1]
        axes = (-3, -2, -1) if self.three_d else (-2, -1)
        imgs = self.ifft(yk * m, axes=axes)  # (B,N,H,W)
        out = jnp.sum(jnp.conj(phys.coil_maps) * imgs, axis=1, keepdims=True)
        x = jnp.concatenate([jnp.real(out), jnp.imag(out)], axis=1)
        if rss:
            x = jnp.sqrt(jnp.sum(jnp.abs(imgs) ** 2, axis=1, keepdims=True))
        if crop is not None:
            x = self.crop_center(x, crop)
        return x

    def noise(self, y, key=None):
        if self.noise_model is None:
            return y
        if self.kspace_trajectory is not None:
            # non-Cartesian: y is (B, 2, N, M) NUFFT samples — there is no
            # Cartesian mask to zero; noise applies to every sample
            return self.noise_model(y, key=key)
        return self.noise_model(y, key=key) * self.mask[:, :, None]

    # -- coil-map utilities (reference mri.py:399,419 — via sigpy there;
    # implemented natively here, no external dependency) -------------------
    def simulate_birdcage_csm(self, n_coils: int):
        """Analytic birdcage coil sensitivity maps (N, H, W) complex64:
        each coil is an inverse-distance field from a point on a circle of
        radius 1.5 FOV around the image, with a rotating phase — the
        standard birdcage phantom model (reference mri.py:399)."""
        return birdcage_maps(n_coils, self.img_size)

    @staticmethod
    def estimate_coil_maps(y, calib_size: int = 24, kernel_size: int = 6,
                           thresh: float = 0.02, espirit_crop: float = 0.95):
        """ESPIRiT coil-map estimation (Uecker et al. 2014; reference
        mri.py:419 wraps sigpy — this is a native batched JAX
        implementation). Calibration-matrix nullspace kernels are
        eigen-decomposed per pixel; the top eigenvector (phase-aligned to
        coil 0) is the sensitivity, cropped where the eigenvalue falls
        below ``espirit_crop``.

        :param y: multicoil k-space, complex (B, N, H, W) or real-pair
            (B, 2, N, H, W).
        :return: complex coil maps (B, N, H, W).
        """
        y = jnp.asarray(y)
        if not jnp.iscomplexobj(y):
            y = y[:, 0] + 1j * y[:, 1]
        B, N, H, W = y.shape
        k = kernel_size
        cs = min(calib_size, H, W)

        def cfft2(a):  # centered forward FFT over the trailing two axes
            return jnp.fft.fftshift(
                jnp.fft.fft2(jnp.fft.ifftshift(a, axes=(-2, -1))),
                axes=(-2, -1),
            )

        def one(yk):
            # central auto-calibration block of the centered k-space
            calib = yk[:, (H - cs) // 2:(H + cs) // 2,
                       (W - cs) // 2:(W + cs) // 2]
            # block-Hankel calibration matrix: sliding k x k windows
            p = jax.lax.conv_general_dilated_patches(
                calib[None], (k, k), (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )[0]  # (N*k*k, L)
            A = p.reshape(N * k * k, -1).T  # (L, N*k*k)
            _, s, vh = jnp.linalg.svd(A, full_matrices=False)
            keep = (s > thresh * s[0]).astype(yk.real.dtype)  # (R,)
            # signal-space kernels -> image domain: flip, center-place in
            # the full grid, centered forward DFT, sqrt(HW)/k scaling so
            # the per-pixel top eigenvalue is ~1 inside the support
            kernels = vh.reshape(-1, N, k, k)[..., ::-1, ::-1]
            pad = jnp.zeros(kernels.shape[:2] + (H, W), kernels.dtype)
            r0, c0 = (H - k) // 2, (W - k) // 2
            pad = pad.at[..., r0:r0 + k, c0:c0 + k].set(kernels)
            M = cfft2(pad) * (jnp.sqrt(H * W) / k)  # (R, N, H, W)
            M = M * keep[:, None, None, None]
            # per-pixel N x N Gram M M^H and its leading eigenpair
            Mp = jnp.transpose(M, (2, 3, 1, 0)).reshape(H * W, N, -1)
            gram = jnp.einsum("pnr,pmr->pnm", Mp, jnp.conj(Mp))
            evals, evecs = jnp.linalg.eigh(gram)
            lam = evals[:, -1]
            v = evecs[:, :, -1]  # (HW, N)
            phase = jnp.exp(-1j * jnp.angle(v[:, :1]))
            v = v * phase
            v = v * (lam[:, None] > espirit_crop)
            return v.T.reshape(N, H, W)

        return jnp.stack([one(y[b]) for b in range(B)])


def birdcage_maps(n_coils: int, shape, r: float = 1.5):
    """(N, H, W) complex64 birdcage coil sensitivities (the sigpy model
    the reference depends on, computed analytically)."""
    H, W = shape[-2:]
    c = np.arange(n_coils)
    yy, xx = np.mgrid[0:H, 0:W]
    x_co = (xx - W / 2.0) / W * 2
    y_co = (yy - H / 2.0) / H * 2
    coilx = r * np.cos(c * 2 * np.pi / n_coils)[:, None, None]
    coily = r * np.sin(c * 2 * np.pi / n_coils)[:, None, None]
    coil_phs = (-c * 2 * np.pi / n_coils)[:, None, None]
    rr = np.sqrt((x_co[None] - coilx) ** 2 + (y_co[None] - coily) ** 2)
    phi = np.arctan2(x_co[None] - coilx, -(y_co[None] - coily)) + coil_phs
    out = (1.0 / rr) * np.exp(1j * phi)
    rss = np.sqrt(np.sum(np.abs(out) ** 2, axis=0))
    return jnp.asarray((out / rss).astype(np.complex64))


class DynamicMRI(TimeMixin, MRI):
    r"""k-t dynamic MRI: per-frame masked FFT (reference mri.py:499).

    Data shape (B, C, T, H, W); the mask may vary over time (B, C, T, H, W).
    """

    def __init__(self, mask=None, img_size=(8, 320, 320), **kwargs):
        super().__init__(mask=mask, img_size=img_size, three_d=False, **kwargs)

    def V_adjoint(self, x):
        # FFT over spatial dims only, applied per time frame
        return self.im_to_kspace(x, three_d=False)

    def V(self, y):
        return self.kspace_to_im(y, three_d=False)

    def to_static(self, mask=None) -> "MRI":
        """Static MRI with the time-collapsed mask (reference mri.py:612):
        the union (clipped sum) of the per-frame masks, or ``mask``."""
        if mask is None:
            m = self.mask
            mask = jnp.clip(jnp.sum(m, axis=-3), 0.0, 1.0) if m is not None else None
        img_size = tuple(mask.shape[-2:]) if mask is not None else (320, 320)
        return MRI(mask=mask, img_size=img_size,
                   noise_model=self.noise_model)


class SequentialMRI(DynamicMRI):
    r"""Sequential sampling MRI: time-varying masks whose union gives a single
    static image (reference mri.py:627)."""

    def average(self, y, mask=None):
        """Average the time dim weighted by the mask (TimeMixin.average).

        Time is axis -3 in both the (B, C, T, H, W) measurements and the
        (possibly batchless) stored mask."""
        m = self.mask if mask is None else mask
        num = jnp.sum(y, axis=-3)
        den = jnp.clip(jnp.sum(m, axis=-3), 1e-6, None)
        return num / den

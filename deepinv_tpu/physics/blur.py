"""Blur / super-resolution physics (reference deepinv/physics/blur.py, 1300 LoC).

Operators: :class:`Blur` (spatial conv, 5 padding modes), :class:`BlurFFT`
(circular blur diagonalized in Fourier — a :class:`DecomposablePhysics` with
closed-form prox/dagger), :class:`Downsampling` (filter + decimate, with the
Zhu-2014 FFT polyphase closed-form prox), :class:`Upsampling`.

All filters are pytree leaves: a batch of blurs is just a physics with a
batched filter leaf (the reference needs generator machinery + buffer
mutation for this), and ``jax.vmap`` over the physics gives per-sample PSFs.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import (
    conv2d,
    conv_transpose2d,
    conv2d_fft,
    conv_transpose2d_fft,
    conv3d,
    conv_transpose3d,
    filter_fft_2d,
    gaussian_blur,
    bilinear_filter,
    bicubic_filter,
    sinc_filter,
)
from .base import LinearPhysics, DecomposablePhysics
from ..core.linalg import transpose_primal
from ..utils.mixins import TiledMixin2d

__all__ = ["Blur", "BlurFFT", "Downsampling", "Upsampling", "SpaceVaryingBlur", "TiledSpaceVaryingBlur", "DownsamplingMatlab"]

# Backends where BlurFFT's half-spectrum (rfft) closed forms beat the full
# complex-FFT path (see the measurement note in BlurFFT).
_RFFT_BACKENDS = ("cpu",)


def _resolve_filter(filter, factor: int = 2):
    """Map a filter name to its kernel (reference Downsampling.get_filter_parameters)."""
    if isinstance(filter, str):
        if filter == "gaussian":
            return gaussian_blur(sigma=(factor, factor))
        if filter == "bilinear":
            return bilinear_filter(factor)
        if filter == "bicubic":
            return bicubic_filter(factor)
        if filter == "sinc":
            # length scales with the factor (reference blur.py:143)
            return sinc_filter(factor, length=4 * factor)
        raise ValueError(f"unknown filter {filter!r}")
    if filter is None:
        return None
    return jnp.asarray(filter)


class Blur(LinearPhysics):
    r"""Blur operator ``y = h * x`` (reference blur.py:443).

    :param filter: kernel of shape (b, c, h, w) with b in {1, B}, c in {1, C}
    :param padding: 'valid', 'circular', 'replicate', 'reflect', 'constant'
    """

    def __init__(self, filter=None, padding: str = "circular", **kwargs):
        super().__init__(**kwargs)
        self.filter = _resolve_filter(filter)
        self.padding = padding

    def A(self, x, filter=None, **params):
        f = self.filter if filter is None else jnp.asarray(filter)
        if f.ndim == 5:  # (b, c, d, h, w) volumetric PSF (reference blur.py:443)
            return conv3d(x, f, padding=self.padding)
        return conv2d(x, f, padding=self.padding)

    def A_adjoint(self, y, filter=None, **params):
        f = self.filter if filter is None else jnp.asarray(filter)
        if f.ndim == 5:
            return conv_transpose3d(y, f, padding=self.padding)
        return conv_transpose2d(y, f, padding=self.padding)


class BlurFFT(DecomposablePhysics):
    r"""Circular blur diagonalized by the FFT (reference blur.py:564).

    ``A = F^* diag(Fh) F`` with orthonormal FFTs, so prox_l2 / A_dagger are
    closed-form elementwise operations in Fourier space — the fast path used
    by DPIR-style PnP on deblurring.

    :param img_size: (C, H, W) image size (needed to embed the PSF).
    :param filter: PSF kernel (b, c, h, w).

    :Examples:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.physics import BlurFFT, GaussianNoise
        >>> from deepinv_tpu.ops import gaussian_blur
        >>> physics = BlurFFT(img_size=(1, 16, 16),
        ...                   filter=gaussian_blur(sigma=1.0),
        ...                   noise_model=GaussianNoise(0.05))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> y = physics(x, key=jax.random.key(1))  # blur + noise
        >>> xhat = physics.prox_l2(jnp.zeros_like(x), y, gamma=10.0)  # closed form
        >>> y.shape == xhat.shape == x.shape
        True
    """

    def __init__(self, img_size, filter=None, **kwargs):
        super().__init__(**kwargs)
        self.img_size = tuple(img_size)
        self.filter = _resolve_filter(filter)
        self.mask = self._compute_mask(self.filter)

    def _compute_mask(self, filt):
        if filt is None:
            return 1.0
        # run under jit: the axon TPU backend cannot execute fft/roll eagerly
        return jax.jit(lambda f: filter_fft_2d(f, self.img_size, real_fft=False))(filt)

    def update(self, **params):
        if "filter" in params and params["filter"] is not None:
            f = jnp.asarray(params.pop("filter"))
            new = self.replace(filter=f, mask=self._compute_mask(f))
            return new.update(**params) if params else new
        return super().update(**params)

    def get_filter_parameters(self, img_size=None, filter=None, **kwargs) -> dict:
        """``{"filter", "mask"}`` parameters for a given PSF (reference
        blur.py:660; the mask here is the complex FFT of the embedded
        PSF rather than the reference's (abs, angle) split)."""
        if filter is None:
            return {"filter": None, "mask": None}
        f = _resolve_filter(filter)
        size = tuple(img_size) if img_size is not None else self.img_size
        mask = jax.jit(lambda ff: filter_fft_2d(ff, size, real_fft=False))(f)
        return {"filter": f, "mask": mask}

    def V_adjoint(self, x):
        return jnp.fft.fft2(x, norm="ortho")

    def V(self, x):
        return jnp.real(jnp.fft.ifft2(x, norm="ortho"))

    def U(self, x):
        return jnp.real(jnp.fft.ifft2(x, norm="ortho"))

    def U_adjoint(self, x):
        return jnp.fft.fft2(x, norm="ortho")

    # -- rfft fast paths ----------------------------------------------------
    # The PSF is real, so its transfer function is Hermitian: the first
    # W//2+1 columns of the stored full-spectrum mask ARE its rfft2. For real
    # images the half-spectrum closed forms below are exact and do half the
    # FFT flops with half the spectrum HBM traffic of the generic
    # DecomposablePhysics SVD path — this prox is the per-iteration data step
    # of DPIR-style PnP deblurring (BASELINE.md config #1).
    #
    # Backend gate: measured on the v5e (2026-08-18), the TPU FFT lowering
    # runs the half-spectrum rfft2/irfft2 pair at 0.076 ms vs 0.038 ms for
    # the plain complex fft2/ifft2 — real FFTs decompose into full complex
    # FFTs plus Hermitian reassembly there. On CPU (pocketfft) rfft is the
    # genuine ~2x win, so the fast path is enabled per-backend.

    def _mask_r(self):
        m = self.mask
        if isinstance(m, (int, float)):
            return None
        return m[..., : self.img_size[-1] // 2 + 1]

    def _rfft_ok(self, *arrs):
        if jax.default_backend() not in _RFFT_BACKENDS:
            return False
        return self._mask_r() is not None and all(
            not jnp.iscomplexobj(a) for a in arrs
        )

    def A(self, x, **params):
        phys = self.update(**params) if params else self
        if not phys._rfft_ok(x):
            return super(BlurFFT, phys).A(x)
        H, W = phys.img_size[-2:]
        return jnp.fft.irfft2(jnp.fft.rfft2(x) * phys._mask_r(), s=(H, W))

    def A_adjoint(self, y, **params):
        phys = self.update(**params) if params else self
        if not phys._rfft_ok(y):
            return super(BlurFFT, phys).A_adjoint(y)
        H, W = phys.img_size[-2:]
        return jnp.fft.irfft2(jnp.fft.rfft2(y) * jnp.conj(phys._mask_r()),
                              s=(H, W))

    def prox_l2(self, z, y, gamma, **kwargs):
        """Closed-form prox of ``gamma/2 ||Ax-y||^2`` about ``z`` (reference
        forward.py:1212), solved per-rfft-bin: exact for real images and
        ~2x cheaper than the full-spectrum path."""
        if (z is None or isinstance(z, (int, float))
                or not self._rfft_ok(z, y)):
            return super().prox_l2(z, y, gamma, **kwargs)
        from .base import _add_inv_gamma, _inv_gamma_mul

        H, W = self.img_size[-2:]
        mr = self._mask_r()
        bf = jnp.conj(mr) * jnp.fft.rfft2(y) + _inv_gamma_mul(
            gamma, jnp.fft.rfft2(z))
        scaling = _add_inv_gamma(jnp.real(jnp.conj(mr) * mr), gamma, bf.ndim)
        return jnp.fft.irfft2(bf / scaling, s=(H, W))


class Downsampling(LinearPhysics):
    r"""``y = S(h * x)``: anti-aliasing filter then decimation
    (reference blur.py:15).

    :param img_size: (C, H, W) high-resolution image size.
    :param filter: None | 'gaussian' | 'bilinear' | 'bicubic' | 'sinc' | kernel
    :param factor: integer decimation factor.
    :param padding: conv padding mode.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics import Downsampling
        >>> physics = Downsampling(img_size=(1, 16, 16), filter="gaussian",
        ...                        factor=2)
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> physics.A(x).shape
        (1, 1, 8, 8)
    """

    def __init__(
        self,
        img_size=None,
        filter=None,
        factor: int = 2,
        padding: str = "circular",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.factor = int(factor)
        self.imsize = tuple(img_size) if img_size is not None else None
        self.padding = padding
        self.filter = _resolve_filter(filter, self.factor)

    @staticmethod
    def check_factor(factor) -> int:
        """Validate and cast a downsampling factor to int (reference
        blur.py:366): 1D arrays must be constant."""
        if isinstance(factor, (int, float)):
            return int(factor)
        arr = jnp.asarray(factor)
        if arr.ndim > 1:
            raise ValueError("Factor tensor must be 1D.")
        flat = jnp.ravel(arr)
        import numpy as _np

        vals = _np.asarray(flat)
        if vals.size == 0 or not (_np.all(vals == vals[0])):
            raise ValueError(
                "Downsampling only supports one factor per batch.")
        return int(vals[0])

    @staticmethod
    def get_filter_parameters(img_size=None, filter=None, factor=None,
                              **kwargs) -> dict:
        """Build the ``{"filter", "factor"}`` parameter dict for a given
        factor (reference blur.py:93)."""
        f = Downsampling.check_factor(factor) if factor is not None else None
        filt = _resolve_filter(filter, f if f is not None else 2)
        out = {"filter": filt}
        if f is not None:
            out["factor"] = f
        return out

    def A(self, x, filter=None, factor=None, **params):
        # honor a factor override like the reference (blur.py:366 via
        # update/generator params — DownsamplingGenerator emits both
        # 'filter' and 'factor'); it must be a static int (it changes the
        # output shape)
        fac = self.factor if factor is None else self.check_factor(factor)
        f = self.filter if filter is None else _resolve_filter(filter, fac)
        if f is not None:
            x = conv2d(x, f, padding=self.padding)
        return x[:, :, ::fac, ::fac]

    def A_adjoint(self, y, filter=None, factor=None, **params):
        fac = self.factor if factor is None else self.check_factor(factor)
        f = self.filter if filter is None else _resolve_filter(filter, fac)
        if self.imsize is not None:
            C, H, W = self.imsize
        else:
            C = y.shape[1]
            H, W = y.shape[-2] * fac, y.shape[-1] * fac
        if f is not None and self.padding == "valid":
            Hc, Wc = H - f.shape[-2] + 1, W - f.shape[-1] + 1
        else:
            Hc, Wc = H, W
        x = jnp.zeros((y.shape[0], C, Hc, Wc), dtype=y.dtype)
        x = x.at[:, :, ::fac, ::fac].set(y)
        if f is not None:
            x = conv_transpose2d(x, f, padding=self.padding)
        return x

    def prox_l2(self, z, y, gamma, use_fft: bool = True, **kwargs):
        r"""Closed-form FFT polyphase prox for circular padding
        (Zhu & Milanfar 2014; reference blur.py:336-360)."""
        if not (use_fft and self.padding == "circular" and self.filter is not None):
            return LinearPhysics.prox_l2(self, z, y, gamma, **kwargs)

        if z is None or isinstance(z, (int, float)):
            fill = 0.0 if z is None else float(z)
            z = jnp.full_like(self.A_adjoint(y), fill)

        if z.shape[-2] % self.factor or z.shape[-1] % self.factor:
            # FFT polyphase split needs H, W divisible by the factor
            return LinearPhysics.prox_l2(self, z, y, gamma, **kwargs)

        sf = self.factor
        H, W = z.shape[-2:]
        Fh = filter_fft_2d(self.filter, (z.shape[1], H, W), real_fft=False)
        Fhc = jnp.conj(Fh)
        Fh2 = jnp.real(Fhc * Fh)

        g = jnp.asarray(gamma)
        if g.ndim > 0:
            g = g.reshape(g.shape + (1,) * (z.ndim - g.ndim))

        z_hat = self.A_adjoint(y) + z / g
        Fz_hat = jnp.fft.fft2(z_hat)

        def splits(a):
            # (B, C, H, W) -> (B, C, H/sf, W/sf, sf*sf) distinct polyphase blocks
            B, C, Hh, Ww = a.shape
            b = a.reshape(B, C, sf, Hh // sf, Ww)
            b = jnp.moveaxis(b, 2, -1)  # (B,C,H/sf,W,sf)
            b = b.reshape(B, C, Hh // sf, sf, Ww // sf, b.shape[-1])
            b = jnp.moveaxis(b, 3, -1)  # (B,C,H/sf,W/sf,sf,sf)
            return b.reshape(B, C, Hh // sf, Ww // sf, sf * sf)

        top = jnp.mean(splits(Fh * Fz_hat), axis=-1)
        below = jnp.mean(splits(jnp.broadcast_to(Fh2, Fz_hat.shape)), axis=-1) + 1.0 / g
        ratio = top / below
        rc = Fhc * jnp.tile(ratio, (1, 1, sf, sf))
        r = jnp.real(jnp.fft.ifft2(rc))
        return (z_hat - r) * g


class Upsampling(Downsampling):
    r"""Adjoint roles of :class:`Downsampling` swapped (reference blur.py:392):
    ``A`` = zero-fill upsample + transpose filter; ``A_adjoint`` = filter +
    decimate."""

    def A(self, x, **params):
        return Downsampling.A_adjoint(self, x, **params)

    def A_adjoint(self, y, **params):
        return Downsampling.A(self, y, **params)

    def prox_l2(self, z, y, gamma, **kwargs):
        return LinearPhysics.prox_l2(self, z, y, gamma, **kwargs)


class SpaceVaryingBlur(LinearPhysics):
    r"""Space-varying blur via product convolution (reference blur.py:740):
    ``y = sum_k h_k * (w_k . x)``.

    :param filters: (b, c, K, h, w) PSF branches.
    :param multipliers: (b, c, K, H, W) spatial weights.
    :param padding: conv padding mode.
    """

    def __init__(self, filters=None, multipliers=None, padding: str = "valid", **kwargs):
        super().__init__(**kwargs)
        self.filters = jnp.asarray(filters) if filters is not None else None
        self.multipliers = jnp.asarray(multipliers) if multipliers is not None else None
        self.padding = padding

    def A(self, x, filters=None, multipliers=None, **params):
        from ..ops.product_convolution import product_convolution2d

        h = self.filters if filters is None else filters
        w = self.multipliers if multipliers is None else multipliers
        return product_convolution2d(x, w, h, padding=self.padding)

    def A_adjoint(self, y, filters=None, multipliers=None, **params):
        from ..ops.product_convolution import product_convolution2d_adjoint

        h = self.filters if filters is None else filters
        w = self.multipliers if multipliers is None else multipliers
        return product_convolution2d_adjoint(y, w, h, padding=self.padding)


class DownsamplingMatlab(LinearPhysics):
    r"""MATLAB-imresize downsampling physics (reference blur.py:1195):
    ``A`` = antialiased bicubic resize by 1/factor; adjoint via
    linear_transpose of the (matmul-based) resize."""

    def __init__(self, img_size=None, factor: int = 2, **kwargs):
        super().__init__(**kwargs)
        self.factor = self.check_factor(factor)
        self.imsize = tuple(img_size) if img_size is not None else None

    @staticmethod
    def check_factor(factor) -> int:
        """Validate / cast a downsampling factor (reference blur.py:366,
        inherited from ``Downsampling``): arrays must be 1D with one unique
        value."""
        return Downsampling.check_factor(factor)

    @staticmethod
    def get_filter_parameters(img_size=None, filter=None, factor=None,
                              **kwargs) -> dict:
        """Filter/factor parameter dict (reference blur.py:93, inherited
        from ``Downsampling``)."""
        return Downsampling.get_filter_parameters(
            img_size=img_size, filter=filter, factor=factor, **kwargs)

    def A(self, x, **params):
        from ..ops.imresize import imresize_matlab

        return imresize_matlab(x, scale=1.0 / self.factor)

    def A_adjoint(self, y, **params):
        from ..ops.imresize import imresize_matlab

        if self.imsize is not None:
            C, H, W = self.imsize
        else:
            H, W = y.shape[-2] * self.factor, y.shape[-1] * self.factor
        B, C = y.shape[:2]
        fwd = lambda x: imresize_matlab(x, scale=1.0 / self.factor)
        (xt,) = jax.linear_transpose(
            fwd, transpose_primal(y, (B, C, H, W))
        )(y)
        return xt


class TiledSpaceVaryingBlur(TiledMixin2d, LinearPhysics):
    r"""Space-varying blur via tiled convolution (reference blur.py:871):
    ``y = sum_k h_k * (m_k . x)`` with blending masks ``m_k`` forming a
    partition of unity over overlapping patches, 'valid' convolution.

    Inherits the reference's :class:`TiledMixin2d` patch-geometry surface
    (``image_to_patches`` / ``patches_to_image`` / ``get_needed_pad`` /
    ``get_compatible_img_size`` / ``get_num_patches``).

    :param filters: (B, C, K, h, w) per-tile PSFs (K = number of tiles, row
        major); may also be passed at call time.
    :param patch_size: tile size (int or (ph, pw)).
    :param stride: tile stride (overlap = patch - stride).
    :param blending_mode: 'bump' (smooth) or 'linear' (triangle) windows.
    """

    def __init__(self, filters=None, patch_size=None, stride=None,
                 blending_mode: str = "bump", **kwargs):
        super().__init__(patch_size=patch_size, stride=stride, **kwargs)
        self.filters = filters
        if blending_mode not in ("bump", "linear"):
            raise ValueError("blending_mode must be 'bump' or 'linear'")
        self.blending_mode = blending_mode

    @staticmethod
    def num_filters(img_size, patch_size, stride):
        """Number of tiles K for an image size (reference blur.py:888)."""
        H, W = img_size[-2:]
        ph, pw = (patch_size, patch_size) if isinstance(patch_size, int) else patch_size
        sh, sw = (stride, stride) if isinstance(stride, int) else stride
        ny = -(-(max(H - ph, 0)) // sh) + 1
        nx = -(-(max(W - pw, 0)) // sw) + 1
        return ny * nx

    def _masks(self, H, W, dtype):
        """(K, Hp, Wp) partition-of-unity blending masks (host-side)."""
        ph, pw = self.patch_size
        sh, sw = self.stride

        def wins(L, p, s):
            n = -(-(max(L - p, 0)) // s) + 1
            Lp = (n - 1) * s + p
            t = np.linspace(-1, 1, p)
            if self.blending_mode == "linear":
                w = 1.0 - np.abs(t)
            else:  # smooth bump, nonzero on the open tile
                w = np.exp(-1.0 / np.clip(1 - t**2, 1e-9, None))
            w = np.clip(w, 1e-12, None)
            W_ = np.zeros((n, Lp))
            for i in range(n):
                W_[i, i * s : i * s + p] = w
            W_ /= W_.sum(0, keepdims=True)
            return W_, Lp

        Wy, Hp = wins(H, ph, sh)
        Wx, Wp = wins(W, pw, sw)
        masks = (Wy[:, None, :, None] * Wx[None, :, None, :]).reshape(-1, Hp, Wp)
        return jnp.asarray(masks, dtype), Hp, Wp

    def A(self, x, filters=None, **params):
        h = filters if filters is not None else self.filters
        if h is None:
            raise ValueError("filters must be provided")
        B, C, H, W = x.shape
        masks, Hp, Wp = self._masks(H, W, x.dtype)
        K = masks.shape[0]
        if h.shape[2] != K:
            raise ValueError(f"expected {K} filters for this image size, got {h.shape[2]}")
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
        z = xp[:, :, None] * masks[None, None]  # (B, C, K, Hp, Wp)
        kh, kw = h.shape[-2:]

        def conv_one(zk, hk):  # (B, C, Hp, Wp), (B, C, kh, kw) -> valid conv
            # depthwise: each (b, c) channel with its own filter. Flip the
            # kernel: lax conv is CORRELATION, but SpaceVaryingBlur /
            # conv2d implement true convolution — without the flip an
            # asymmetric PSF was applied mirrored relative to the same
            # PSF in the untiled operator.
            flat = zk.reshape(1, B * C, Hp, Wp)
            filt = hk.reshape(B * C, 1, kh, kw)[..., ::-1, ::-1]
            out = jax.lax.conv_general_dilated(
                flat, filt, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=B * C,
            )
            return out.reshape(B, C, Hp - kh + 1, Wp - kw + 1)

        hb = jnp.broadcast_to(h, (B, C) + h.shape[2:])  # (B, C, K, kh, kw)
        y = jnp.sum(
            jax.vmap(conv_one, in_axes=(2, 2), out_axes=0)(z, hb), axis=0
        )
        # crop to the valid region of the ORIGINAL image
        return y[..., : H - kh + 1, : W - kw + 1]

    def A_adjoint(self, y, filters=None, **params):
        h = filters if filters is not None else self.filters
        kh, kw = h.shape[-2:]
        Ho, Wo = y.shape[-2:]
        H, W = Ho + kh - 1, Wo + kw - 1
        B, C = y.shape[:2]
        fwd = lambda x: self.A(x, filters=h)
        (xt,) = jax.linear_transpose(
            fwd, transpose_primal(y, (B, C, H, W))
        )(y)
        return xt

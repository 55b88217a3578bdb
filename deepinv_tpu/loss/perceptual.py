"""Perceptual / no-reference metrics
(reference deepinv/loss/metric/{perceptual.py, distortion.py}: LPIPS:13,
NIQE:111, BlurStrength:552, SharpnessIndex:688, HaarPSI:643, GMSD:997,
CosineSimilarity:945, RecoveryCoefficient:1101).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .metric import Metric, _flatten_batch

__all__ = [
    "HaarPSI",
    "GMSD",
    "CosineSimilarity",
    "RecoveryCoefficient",
    "BlurStrength",
    "SharpnessIndex",
    "NIQE",
    "LPIPS",
]


def _to_gray(x):
    if x.shape[1] == 3:
        w = jnp.asarray([0.299, 0.587, 0.114])
        return jnp.sum(x * w[None, :, None, None], axis=1, keepdims=True)
    return x


def _conv(x, k):
    C = x.shape[1]
    k = jnp.broadcast_to(k, (C, 1) + k.shape[-2:])
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )


_PREWITT_X = jnp.asarray([[1, 0, -1], [1, 0, -1], [1, 0, -1]], jnp.float32) / 3
_PREWITT_Y = _PREWITT_X.T


class GMSD(Metric):
    r"""Gradient-magnitude similarity deviation (distortion.py:997):
    Prewitt gradient magnitudes with replicate padding, per-channel GMS
    population std over space, mean over channels (Xue et al. 2013)."""

    def __init__(self, c: float = 0.0026, **kwargs):
        super().__init__(**kwargs)
        self.c = c

    def metric(self, x_net, x, *args, **kwargs):
        from ..ops.conv import conv2d

        if x_net.shape != x.shape:
            raise ValueError(
                f"x_net and x must be same shape, got {tuple(x_net.shape)} "
                f"and {tuple(x.shape)}")
        if x_net.ndim != 4:
            raise ValueError(
                f"GMSD requires (B, C, H, W) tensors, got {tuple(x_net.shape)}")
        B, C, H, W = x.shape
        a = x.reshape(B * C, 1, H, W)
        b = x_net.reshape(B * C, 1, H, W)
        hx = _PREWITT_X[None, None]
        hy = _PREWITT_Y[None, None]
        ga = jnp.hypot(conv2d(a, hx, padding="replicate"),
                       conv2d(a, hy, padding="replicate"))
        gb = jnp.hypot(conv2d(b, hx, padding="replicate"),
                       conv2d(b, hy, padding="replicate"))
        gms = (2 * ga * gb + self.c) / (ga**2 + gb**2 + self.c)
        gms = gms.reshape(B, C, -1)
        gmsd = jnp.std(gms, axis=-1)  # population std per (batch, channel)
        return jnp.mean(gmsd, axis=-1)


class HaarPSI(Metric):
    r"""Haar-wavelet perceptual similarity (distortion.py:643, Reisenhofer
    et al. 2016 with the tuned medical-image parameters of Karner et al.):
    local similarities of scale-1/2 Haar magnitudes weighted by scale-3
    magnitudes, logistic pooling, YIQ chroma similarity for color images.

    Inputs must be in [0, 1] (use ``norm_inputs="clip"`` or ``"min_max"``).

    :param C: stability constant (natural images 30, medical 5; default 5).
    :param alpha: logistic slope (natural 4.2, medical 4.9; default 4.9).
    :param preprocess_with_subsampling: 2x mean subsampling first.
    """

    lower_better = False

    def __init__(self, C: float = 5.0, alpha: float = 4.9,
                 preprocess_with_subsampling: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.C = C
        self.alpha = alpha
        self.preprocess_with_subsampling = preprocess_with_subsampling

    @staticmethod
    def _convolve2d(data, kernel):
        """The reference's rot180-conv-rot180 with trailing-row crop
        (distortion.py:895: conv with pad k//2 then nearest-resize back,
        which for even kernels keeps the first H rows / W cols)."""
        kh, kw = kernel.shape
        d = jnp.rot90(data, 2, axes=(2, 3))
        res = lax.conv_general_dilated(
            d, kernel[None, None], (1, 1),
            padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        res = res[:, :, :data.shape[2], :data.shape[3]]
        return jnp.rot90(res, 2, axes=(2, 3))

    @staticmethod
    def _haar_filter(scale):
        size = 2**scale
        f = np.full((size, size), 2.0**-scale, np.float32)
        f[: size // 2] *= -1.0
        return jnp.asarray(f)

    def _subsample(self, image, factor: int = 2):
        kernel = jnp.ones((factor, factor), jnp.float32) / factor**2
        return self._convolve2d(image, kernel)[:, :, ::factor, ::factor]

    def _haar_decompose(self, image, n_scales):
        coeffs = []
        for scale in range(1, n_scales + 1):
            f = self._haar_filter(scale)
            coeffs.append(self._convolve2d(image, f))
        for scale in range(1, n_scales + 1):
            f = self._haar_filter(scale)
            coeffs.append(self._convolve2d(image, f.T))
        return jnp.stack(coeffs)  # (2*n_scales, B, 1, H, W)

    def metric(self, x_net, x, *args, **kwargs):
        if x.shape != x_net.shape or x.shape[1] not in (1, 3):
            raise ValueError(
                "x and x_net must be of same shape with 1 or 3 channels.")
        try:
            in_range = bool(
                (x >= 0).all() & (x <= 1).all()
                & (x_net >= 0).all() & (x_net <= 1).all())
            if not in_range:
                raise ValueError("x and x_net must be in the range [0, 1]")
        except jax.errors.TracerBoolConversionError:
            pass

        x = 255.0 * x
        x_net = 255.0 * x_net
        is_color = x.shape[1] == 3

        if is_color:
            mix = lambda v, a, b, c: (
                a * v[:, :1] + b * v[:, 1:2] + c * v[:, 2:3])
            ref_y, deg_y = (mix(v, 0.299, 0.587, 0.114) for v in (x, x_net))
            ref_i, deg_i = (mix(v, 0.596, -0.274, -0.322) for v in (x, x_net))
            ref_q, deg_q = (mix(v, 0.211, -0.523, 0.312) for v in (x, x_net))
        else:
            ref_y, deg_y = x, x_net

        if self.preprocess_with_subsampling:
            ref_y, deg_y = self._subsample(ref_y), self._subsample(deg_y)
            if is_color:
                ref_i, deg_i = self._subsample(ref_i), self._subsample(deg_i)
                ref_q, deg_q = self._subsample(ref_q), self._subsample(deg_q)

        n_scales = 3
        cr = self._haar_decompose(ref_y, n_scales)
        cd = self._haar_decompose(deg_y, n_scales)

        sims, weights = [], []
        for o in (0, 1):
            rm = jnp.abs(cr[(o * n_scales, 1 + o * n_scales), ...])
            dm = jnp.abs(cd[(o * n_scales, 1 + o * n_scales), ...])
            frac = (2 * rm * dm + self.C) / (rm**2 + dm**2 + self.C)
            sims.append((frac[0] + frac[1]) / 2)
            weights.append(jnp.maximum(jnp.abs(cr[2 + o * n_scales]),
                                       jnp.abs(cd[2 + o * n_scales])))

        if is_color:
            k22 = jnp.ones((2, 2), jnp.float32) / 4.0
            ci_r = jnp.abs(self._convolve2d(ref_i, k22))
            ci_d = jnp.abs(self._convolve2d(deg_i, k22))
            cq_r = jnp.abs(self._convolve2d(ref_q, k22))
            cq_d = jnp.abs(self._convolve2d(deg_q, k22))
            sim_i = (2 * ci_r * ci_d + self.C) / (ci_r**2 + ci_d**2 + self.C)
            sim_q = (2 * cq_r * cq_d + self.C) / (cq_r**2 + cq_d**2 + self.C)
            sims.append((sim_i + sim_q) / 2)
            weights.append((weights[0] + weights[1]) / 2)

        ls = jnp.stack(sims)       # (n_ch, B, 1, H, W)
        w = jnp.stack(weights)
        pre_logit = (jnp.sum(_logistic(ls, self.alpha) * w, axis=(0, 3, 4))
                     / jnp.sum(w, axis=(0, 3, 4)))
        similarity = (jnp.log(pre_logit / (1 - pre_logit)) / self.alpha) ** 2
        return similarity[:, 0]


def _logistic(v, a):
    return 1.0 / (1.0 + jnp.exp(-a * v))


def _inv_logistic(v, a):
    return jnp.log(v / (1 - v + 1e-12) + 1e-12) / a


class CosineSimilarity(Metric):
    r"""Cosine similarity (distortion.py:945): plain (signed) normalized
    inner product per batch element; ``invert_metric`` is ``1 - m``."""

    lower_better = False

    def metric(self, x_net, x, *args, **kwargs):
        a = _flatten_batch(x_net)
        b = _flatten_batch(x)
        num = jnp.sum(a * b, axis=1)
        den = jnp.clip(jnp.sqrt(jnp.sum(a**2, axis=1)), 1e-8, None) * \
            jnp.clip(jnp.sqrt(jnp.sum(b**2, axis=1)), 1e-8, None)
        return num / den

    def invert_metric(self, m):
        return 1.0 - m


class RecoveryCoefficient(Metric):
    r"""Recovery coefficient for emission tomography (distortion.py:1101):
    ratio of total reconstructed to ground-truth activity inside a region of
    interest, ``sum(x_net * mask) / (sum(x * mask) + eps)``. Requires a
    ``mask`` keyword; optimal value is 1, so ``invert_metric`` is
    ``|m - 1|``."""

    lower_better = False

    def __init__(self, eps: float = None, **kwargs):
        super().__init__(**kwargs)
        self.eps = eps

    def metric(self, x_net, x, *args, **kwargs):
        mask = kwargs.get("mask", None)
        if mask is None:
            raise ValueError("Recovery Coefficient requires a mask argument.")
        mask = jnp.asarray(mask, x.dtype)
        axes = tuple(range(1, x.ndim))
        recon = jnp.sum(x_net * mask, axis=axes)
        gt = jnp.sum(x * mask, axis=axes)
        eps_per_dtype = {jnp.float16: 1e-4, jnp.float32: 1e-7,
                         jnp.float64: 1e-12}
        eps = self.eps if self.eps is not None else \
            eps_per_dtype.get(x_net.dtype.type, 1e-7)
        return recon / (gt + eps)

    def invert_metric(self, m):
        return jnp.abs(m - 1)


def _filter1d(x, kernel, axis, pad):
    """Reflect-padded 1D correlation along an arbitrary axis
    (reference perceptual.py:636,665 uniform_filter1d/sobel1d)."""
    xp = jnp.moveaxis(x, axis, -1)
    shape = xp.shape
    flat = xp.reshape(-1, 1, shape[-1])
    flat = jnp.pad(flat, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    out = lax.conv_general_dilated(
        flat, kernel[None, None], (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return jnp.moveaxis(out.reshape(shape), -1, axis)


class BlurStrength(Metric):
    r"""No-reference blur strength in (0, 1) (reference perceptual.py:552,
    Crete et al. 2007): compares Sobel gradients before and after a 1D
    uniform blur along each spatial axis; higher = blurrier.

    :param h_size: size of the uniform blur filter (default 11).
    """

    def __init__(self, h_size: int = 11, **kwargs):
        super().__init__(**kwargs)
        self.h_size = h_size
        self.lower_better = True

    @staticmethod
    def uniform_filter1d(x, size: int, axis: int):
        """Batched 1D uniform filter along ``axis`` (reference
        perceptual.py:635)."""
        return _filter1d(
            x, jnp.ones((size,), jnp.float32) / size, axis, size // 2
        )

    @staticmethod
    def sobel1d(x, axis: int):
        """Batched 1D Sobel derivative along ``axis`` (reference
        perceptual.py:662)."""
        return _filter1d(x, jnp.asarray([-1.0, 0.0, 1.0], jnp.float32), axis, 1)

    def metric(self, x_net, x=None, *args, **kwargs):
        if x_net.shape[1] not in (1, 3):
            raise ValueError("Input must have 1 or 3 channels.")
        v = x_net
        if v.shape[1] == 3:
            v = 0.2989 * v[:, :1] + 0.5870 * v[:, 1:2] + 0.1140 * v[:, 2:3]
        spatial = v.shape[2:]
        slices = (slice(None), slice(None)) + tuple(
            slice(2, s - 1) for s in spatial)
        uni = jnp.ones((self.h_size,), jnp.float32) / self.h_size
        sob = jnp.asarray([-1.0, 0.0, 1.0], jnp.float32)
        results = []
        for ax in range(2, 2 + len(spatial)):
            filt = _filter1d(v, uni, ax, self.h_size // 2)
            sharp = jnp.abs(_filter1d(v, sob, ax, 1))
            blur = jnp.abs(_filter1d(filt, sob, ax, 1))
            t = jnp.clip(sharp - blur, 0.0, None)
            m1 = _flatten_batch(sharp[slices]).sum(axis=1)
            m2 = _flatten_batch(t[slices]).sum(axis=1)
            results.append(jnp.abs(m1 - m2) / (m1 + 1e-12))
        return jnp.max(jnp.stack(results, axis=1), axis=1)


class SharpnessIndex(Metric):
    r"""No-reference sharpness index (reference perceptual.py:688, Blanchet
    & Moisan 2012 / Leclaire & Moisan 2015): ``-log10 Phi`` of the
    standardized total-variation drop under Gaussian-noise convolution,
    computed in Fourier domain with periodic-component extraction and
    dequantization preprocessing. Higher = sharper.

    :param periodic_component: extract the periodic component first.
    :param dequantize: (1/2, 1/2) Fourier translation dequantization.
    """

    lower_better = False

    def __init__(self, periodic_component: bool = True,
                 dequantize: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.periodic_component = periodic_component
        self.dequantize = dequantize
        if not periodic_component and not dequantize:
            raise ValueError(
                "At least one of periodic_component or dequantize must be "
                "True.")

    @staticmethod
    def per_decomp(u):
        """Periodic + smooth decomposition (Moisan)."""
        B, C, H, W = u.shape
        v = jnp.zeros_like(u)
        d_h = u[..., 0, :] - u[..., H - 1, :]
        d_w = u[..., :, 0] - u[..., :, W - 1]
        v = v.at[..., 0, :].add(d_h).at[..., H - 1, :].add(-d_h)
        v = v.at[..., :, 0].add(d_w).at[..., :, W - 1].add(-d_w)
        fx = jnp.cos(2 * jnp.pi * jnp.arange(W) / W)[None, None, None, :]
        fy = jnp.cos(2 * jnp.pi * jnp.arange(H) / H)[None, None, :, None]
        denom = 2.0 - fx - fy
        denom = denom.at[..., 0, 0].set(2.0)
        s = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(v) * (0.5 / denom)))
        return u - s

    @staticmethod
    def dequant(u):
        """(1/2, 1/2) Fourier-domain translation."""
        B, C, H, W = u.shape
        mx, my = W // 2, H // 2
        x_mod = (jnp.arange(mx, mx + W) % W) - mx
        y_mod = (jnp.arange(my, my + H) % H) - my
        tx = jnp.exp(-1j * jnp.pi / W * x_mod)
        ty = jnp.exp(-1j * jnp.pi / H * y_mod)
        shift = ty[:, None] * tx[None, :]
        return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(u) * shift))

    @staticmethod
    def logerfc(t):
        """log(erfc(t)) with the asymptotic expansion for large t."""
        from jax.scipy.special import erfc

        z = jnp.where(t > 20, t, 21.0) ** -2.0
        s = jnp.ones_like(t)
        for k in range(8, 0, -1):
            s = 1 - (k - 0.5) * z * s
        big = (-0.5 * math.log(math.pi) - t**2
               + jnp.log(s / jnp.where(t > 20, t, 1.0)))
        small = jnp.log(jnp.clip(erfc(jnp.where(t > 20, 0.0, t)), 1e-38, None))
        return jnp.where(t > 20, big, small)

    def metric(self, x_net, x=None, *args, **kwargs):
        if x_net.ndim != 4:
            raise ValueError(
                "Sharpness index metric only supports (B, C, H, W) images.")
        B, C, H, W = x_net.shape
        v = x_net
        if self.periodic_component:
            v = self.per_decomp(v)
        if self.dequantize:
            v = self.dequant(v)

        gx = jnp.roll(v, -1, axis=3) - v
        gy = jnp.roll(v, -1, axis=2) - v
        tv = (jnp.abs(gx) + jnp.abs(gy)).sum(axis=(2, 3))

        fu = jnp.fft.fft2(v)
        p = (jnp.arange(W) * (2 * jnp.pi / W))[None, None, None, :]
        q = (jnp.arange(H) * (2 * jnp.pi / H))[None, None, :, None]
        zx = fu * jnp.sin(p / 2)
        fgx2 = 4 * (zx.real**2 + zx.imag**2)
        zy = fu * jnp.sin(q / 2)
        fgy2 = 4 * (zy.real**2 + zy.imag**2)

        fgxx2 = (fgx2**2).sum(axis=(2, 3))
        fgyy2 = (fgy2**2).sum(axis=(2, 3))
        fgxy2 = (fgx2 * fgy2).sum(axis=(2, 3))

        axx = (gx * gx).sum(axis=(2, 3))
        ayy = (gy * gy).sum(axis=(2, 3))
        axy = jnp.sqrt(axx * ayy)

        vara = jnp.where(axx > 0, fgxx2 / jnp.clip(axx, 1e-12, None), 0.0)
        vara += jnp.where(ayy > 0, fgyy2 / jnp.clip(ayy, 1e-12, None), 0.0)
        vara += jnp.where(axy > 0, 2 * fgxy2 / jnp.clip(axy, 1e-12, None), 0.0)
        vara = vara / (jnp.pi * W * H)

        scale = math.sqrt(2 * W * H / math.pi)
        t = ((jnp.sqrt(axx) + jnp.sqrt(ayy)) * scale - tv) / jnp.sqrt(
            jnp.clip(vara, 1e-12, None))
        s = jnp.where(
            vara > 0,
            -self.logerfc(t / math.sqrt(2)) / math.log(10) + math.log10(2),
            0.0,
        )
        return s.mean(axis=1)


# AGGD shape-parameter lookup grid (Mittal et al. 2012): gamma in
# [0.2, 10] step 1e-3 and the corresponding r(gamma) ratio. Static host
# constants so the per-patch fit is a single argmin against the table.
_NIQE_GAM = np.arange(0.2, 10.0 + 1e-9, 0.001)
_NIQE_LGAMMA = np.vectorize(math.lgamma)
_NIQE_RGAM = np.exp(
    2 * _NIQE_LGAMMA(2.0 / _NIQE_GAM)
    - _NIQE_LGAMMA(1.0 / _NIQE_GAM)
    - _NIQE_LGAMMA(3.0 / _NIQE_GAM)
)

_NIQE_LUMA = (0.29893602, 0.58704307, 0.11402090)  # MATLAB rgb2gray weights


def _gammaf(x):
    return jnp.exp(jax.scipy.special.gammaln(x))


class NIQE(Metric):
    r"""Natural image quality evaluator (reference perceptual.py:111;
    Mittal et al. 2012, "Making a 'completely blind' image quality
    analyzer").

    Full NSS pipeline matching the original MATLAB release: MSCN
    coefficients, per-patch asymmetric-generalized-Gaussian (AGGD) fits of
    the coefficients and their four pairwise products (18 features), two
    scales (36 features), a per-image multivariate Gaussian fit over
    patches, and the pooled-covariance Mahalanobis distance to a pristine
    MVG model.

    The pristine parameters are NOT downloaded (no egress): pass
    ``weights_path`` to a local ``.npz``/``.pt`` file with ``mu``/``cov``
    entries, pass ``params={'mu':..., 'cov':...}`` directly, or fit your
    own on distortion-free images with :meth:`create_weights` (the
    reference's ``create_weights``, perceptual.py:413).

    :param weights_path: local path to saved pristine parameters
        (``.npz`` via numpy or ``.pt`` via torch). ``None`` leaves the
        model unfitted.
    :param params: dict with ``mu`` (36,) and ``cov`` (36, 36) pristine
        statistics (alternative to ``weights_path``).
    :param denominator: stabilizer added to sigma in the MSCN normalization
        (the original code uses 1 on [0, 255]-scaled data).
    :param round_tensor: round inputs like the original MATLAB pipeline
        (expects [0, 255] inputs).
    :param patch_size: NSS patch size at scale 1 (96 in the original).
    :param patch_overlap: pixels of overlap between adjacent patches.
    """

    lower_better = True

    def __init__(self, weights_path=None, params=None, denominator: float = 1.0,
                 round_tensor: bool = False, patch_size: int = 96,
                 patch_overlap: int = 0, **kwargs):
        super().__init__(**kwargs)
        self.patch_size = patch_size
        self.patch_overlap = patch_overlap
        self.denominator = denominator
        self.round = round_tensor
        self.n_scales = 2
        if weights_path is not None:
            params = self._load_weights(weights_path)
        self.params = (
            {"mu": jnp.asarray(params["mu"]).ravel(),
             "cov": jnp.asarray(params["cov"])}
            if params is not None else None
        )

    @staticmethod
    def _load_weights(path):
        path = str(path)
        if path == "download":
            raise ValueError(
                "no network access in this environment: pass a local "
                "weights_path (.npz/.pt) or fit with create_weights()"
            )
        if path.endswith(".npz"):
            d = np.load(path)
            return {"mu": d["mu"], "cov": d["cov"]}
        import torch

        d = torch.load(path, map_location="cpu", weights_only=True)
        return {"mu": np.asarray(d["mu"]), "cov": np.asarray(d["cov"])}

    # -- NSS feature pipeline ----------------------------------------------
    def _mscn_pair(self, a):
        """Local mean/std normalization; returns (structdis, sigma)."""
        from ..ops.conv import conv2d

        ax = np.arange(-3, 4, dtype=np.float64)
        g = np.exp(-(ax[:, None] ** 2 + ax[None] ** 2) / (2 * (7 / 6) ** 2))
        g = jnp.asarray((g / g.sum()).astype(np.float32))
        mu = conv2d(a, g, padding="replicate")
        sigma = jnp.sqrt(
            jnp.abs(conv2d(a * a, g, padding="replicate") - mu * mu)
        )
        return (a - mu) / (sigma + self.denominator), sigma

    @staticmethod
    def _aggd(v, eps=1e-12):
        """AGGD (alpha, beta_left, beta_right) fits for rows of ``v``.

        ``v`` is (L, n); entries of exactly 0 belong to neither side, and a
        side with no samples yields NaN (MATLAB ``mean([])`` semantics) so
        the patch is later dropped by the nan-row filter.
        """
        neg = (v < 0).astype(v.dtype)
        pos = (v > 0).astype(v.dtype)
        cnt_neg = jnp.sum(neg, axis=1)
        cnt_pos = jnp.sum(pos, axis=1)
        left_ms = jnp.where(
            cnt_neg > 0,
            jnp.sum(v * v * neg, axis=1) / jnp.maximum(cnt_neg, 1.0),
            jnp.nan,
        )
        right_ms = jnp.where(
            cnt_pos > 0,
            jnp.sum(v * v * pos, axis=1) / jnp.maximum(cnt_pos, 1.0),
            jnp.nan,
        )
        leftstd = jnp.sqrt(left_ms)
        rightstd = jnp.sqrt(right_ms)
        gammahat = leftstd / jnp.maximum(rightstd, eps)
        rhat = jnp.mean(jnp.abs(v), axis=1) ** 2 / jnp.maximum(
            jnp.mean(v * v, axis=1), eps
        )
        rhatnorm = (rhat * (gammahat**3 + 1.0) * (gammahat + 1.0)) / jnp.maximum(
            (gammahat**2 + 1.0) ** 2, eps
        )
        r_gam = jnp.asarray(_NIQE_RGAM, v.dtype)
        idx = jnp.argmin(
            (r_gam[None] - rhatnorm[:, None]) ** 2, axis=1
        )
        alpha = jnp.asarray(_NIQE_GAM, v.dtype)[idx]
        beta_factor = jnp.sqrt(_gammaf(1.0 / alpha) / _gammaf(3.0 / alpha))
        return alpha, leftstd * beta_factor, rightstd * beta_factor

    @staticmethod
    def _patches(img, k, stride):
        """(B, 1, H, W) -> (B, L, k, k) valid patches."""
        p = lax.conv_general_dilated_patches(
            img, (k, k), (stride, stride), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )  # (B, k*k, Lh, Lw)
        B = img.shape[0]
        p = p.reshape(B, k * k, -1)
        return jnp.transpose(p, (0, 2, 1)).reshape(B, -1, k, k)

    def _patch_features(self, structdis, k, stride):
        """(B, 1, H, W) -> (B, L, 18) per-patch AGGD feature vectors."""
        patches = self._patches(structdis, k, stride)
        B, L = patches.shape[:2]
        flat = patches.reshape(B * L, k * k)
        a0, bl0, br0 = self._aggd(flat)
        cols = [a0, 0.5 * (bl0 + br0)]
        for sh in ((0, 1), (1, 0), (1, 1), (1, -1)):
            pair = patches.reshape(B * L, k, k)
            pair = pair * jnp.roll(pair, sh, axis=(1, 2))
            a, bl, br = self._aggd(pair.reshape(B * L, k * k))
            cols += [a, (br - bl) * (_gammaf(2.0 / a) / _gammaf(1.0 / a)), bl, br]
        return jnp.stack(cols, axis=1).reshape(B, L, 18)

    def _multiscale_features(self, img, with_sharpness=False):
        """(B, 1, H, W) -> (B, L, 36) features (+ per-patch sharpness)."""
        from ..ops import imresize_matlab

        feats, sharp = [], None
        for scale in (1, 2):
            structdis, sigma = self._mscn_pair(img)
            k = max(1, self.patch_size // scale)
            stride = max(1, k - self.patch_overlap // scale)
            feats.append(self._patch_features(structdis, k, stride))
            if scale == 1 and with_sharpness:
                sharp = jnp.mean(
                    self._patches(sigma, k, stride), axis=(-2, -1)
                )  # (B, L)
            if scale < self.n_scales:
                img = imresize_matlab(img, scale=0.5)
        X = jnp.concatenate(feats, axis=2)
        return (X, sharp) if with_sharpness else X

    def _prepare(self, x):
        """Gray conversion + crop to whole patches, like the reference."""
        if x.shape[1] == 3:
            w = jnp.asarray(_NIQE_LUMA, x.dtype)
            x = jnp.sum(x * w[None, :, None, None], axis=1, keepdims=True)
        if x.shape[1] != 1:
            raise ValueError("NIQE operates on 1- or 3-channel images")
        if self.round:
            x = jnp.round(x)
        H, W = x.shape[-2:]
        k = self.patch_size
        if H < k or W < k:
            raise ValueError(
                f"NIQE needs images of at least patch_size={k}, got {(H, W)}"
            )
        return x[..., : (H // k) * k, : (W // k) * k]

    @staticmethod
    def _nanstats(X):
        """Per-item mean/cov over patch rows, dropping non-finite rows."""
        valid = jnp.all(jnp.isfinite(X), axis=-1)  # (B, L)
        Xz = jnp.where(valid[..., None], X, 0.0)
        n = jnp.sum(valid, axis=1).astype(X.dtype)  # (B,)
        mu = jnp.sum(Xz, axis=1) / jnp.maximum(n, 1.0)[:, None]
        Xc = jnp.where(valid[..., None], X - mu[:, None], 0.0)
        cov = jnp.einsum("blf,blg->bfg", Xc, Xc) / jnp.maximum(
            n - 1.0, 1.0
        )[:, None, None]
        return mu, cov

    def estimate_aggd_param(self, vecs, eps: float = 1e-12):
        """AGGD ``(alpha, beta_left, beta_right)`` fits for each row of
        ``vecs`` (reference perceptual.py:199)."""
        return self._aggd(vecs, eps=eps)

    def niqe(self, x_net):
        """Per-image NIQE score (reference perceptual.py:281) — the raw
        pipeline on an already gray/prepared batch."""
        return self.metric(x_net)

    def metric(self, x_net, x=None, *args, **kwargs):
        if self.params is None:
            raise RuntimeError(
                "NIQE weights not loaded: pass weights_path/params at init "
                "or fit them with create_weights() (no download here)"
            )
        img = self._prepare(x_net)
        X = self._multiscale_features(img)
        mu_d, cov_d = self._nanstats(X)
        if isinstance(X, jax.core.Tracer):
            # in-graph (jit) path: f32 pinv; the original computes this
            # step in float64, so eager calls take the host path below
            mu_p = self.params["mu"].astype(X.dtype)
            cov_p = self.params["cov"].astype(X.dtype)
            invcov = jnp.linalg.pinv(0.5 * (cov_d + cov_p[None]))
            d = mu_p[None] - mu_d  # (B, 36)
            return jnp.sqrt(
                jnp.clip(jnp.einsum("bf,bfg,bg->b", d, invcov, d), 0.0, None)
            )
        mu_d = np.asarray(mu_d, np.float64)
        cov_d = np.asarray(cov_d, np.float64)
        mu_p = np.asarray(self.params["mu"], np.float64)
        cov_p = np.asarray(self.params["cov"], np.float64)
        invcov = np.linalg.pinv(0.5 * (cov_d + cov_p[None]))
        d = mu_p[None] - mu_d
        s = np.sqrt(np.clip(np.einsum("bf,bfg,bg->b", d, invcov, d), 0.0, None))
        return jnp.asarray(s, jnp.float32)

    def create_weights(self, dataset, sharpness_threshold: float = 0.75,
                       save_path=None):
        """Fit the pristine MVG (mu, cov) on distortion-free images
        (reference perceptual.py:413): two-scale AGGD features from the
        sharpest patches (per-image sigma >= threshold x peak), pooled over
        the dataset.

        ``dataset`` yields (C, H, W) arrays with C in {1, 3}. Returns the
        params dict and stores it on ``self``; ``save_path`` (``.npz``)
        persists it for ``weights_path=`` reloading.
        """
        rows = []
        for item in dataset:
            img = jnp.asarray(item)
            if img.ndim == 2:
                img = img[None]
            if img.ndim != 3 or img.shape[0] not in (1, 3):
                raise ValueError(
                    f"expected (C, H, W) with C in {{1, 3}}, got {img.shape}"
                )
            if min(img.shape[-2:]) < self.patch_size:
                continue  # too small to contribute patches
            img = self._prepare(img[None])
            X, sharp = self._multiscale_features(img, with_sharpness=True)
            X, sharp = np.asarray(X[0]), np.asarray(sharp[0])
            keep = sharp > sharpness_threshold * sharp.max()
            keep &= np.isfinite(X).all(axis=1)
            if keep.any():
                rows.append(X[keep])
        if not rows:
            raise RuntimeError(
                "no usable patches: lower sharpness_threshold or check "
                "the dataset images are at least patch_size wide"
            )
        feats = np.concatenate(rows, axis=0).astype(np.float64)
        mu = feats.mean(axis=0)
        xc = feats - mu
        cov = xc.T @ xc / max(1, feats.shape[0] - 1)
        self.params = {"mu": jnp.asarray(mu, jnp.float32),
                       "cov": jnp.asarray(cov, jnp.float32)}
        if save_path is not None:
            np.savez(save_path, mu=mu, cov=cov)
        return self.params


class LPIPS(Metric):
    r"""Learned perceptual similarity (reference perceptual.py:13, via the
    pyiqa package; Zhang et al. 2018).

    Full native pipeline: inputs scaled to [-1, 1] and shifted/scaled with
    the LPIPS normalization, VGG16 features at relu{1_2,2_2,3_3,4_3,5_3}
    (:class:`deepinv_tpu.models.VGG16Features`), per-layer channel-unit
    normalization, learned 1x1 linear weights, spatial + layer sum.

    Learned weights are not downloadable offline: pass local checkpoint
    paths (``vgg_pretrained`` = torchvision ``vgg16`` state dict,
    ``lin_pretrained`` = an ``lpips`` package ``vgg.pth`` with
    ``lin{k}.model.1.weight`` entries) to reproduce the published metric;
    with ``allow_random_weights=True`` the pipeline runs with random
    features (useful for smoke tests, not calibrated). Alternatively pass
    ``feature_fn`` to supply custom features like before.
    """

    lower_better = True

    def __init__(self, feature_fn=None, vgg_pretrained=None, lin_pretrained=None,
                 allow_random_weights: bool = False, key=None, **kwargs):
        super().__init__(**kwargs)
        self.feature_fn = feature_fn
        self.lins = None
        self.backbone = None
        if feature_fn is not None and lin_pretrained is not None:
            raise ValueError(
                "lin_pretrained calibrates the built-in VGG16 features and "
                "cannot be combined with a custom feature_fn (channel "
                "layouts would not match)"
            )
        if feature_fn is None:
            if vgg_pretrained is None and not allow_random_weights:
                raise ValueError(
                    "LPIPS needs pretrained VGG weights (no egress in this "
                    "environment): pass vgg_pretrained=<path to torchvision "
                    "vgg16 .pth> (and optionally lin_pretrained=<lpips "
                    "vgg.pth>), a custom feature_fn, or "
                    "allow_random_weights=True for an uncalibrated pipeline."
                )
            from ..models.vgg import VGG16Features

            # LPIPS 'scaling layer' operates on [-1, 1] inputs; fold it into
            # the backbone's ImageNet normalization equivalently
            self.backbone = VGG16Features(
                pretrained=vgg_pretrained, requires_input_norm=True,
                key=key if key is not None else jax.random.key(0),
            )
            if lin_pretrained is not None:
                from ..models.convert import load_torch_checkpoint

                sd = load_torch_checkpoint(lin_pretrained)
                self.lins = [
                    jnp.asarray(sd[f"lin{k}.model.1.weight"]).reshape(-1)
                    for k in range(5)
                ]

    def _features(self, v):
        if self.feature_fn is not None:
            return self.feature_fn(v)
        return self.backbone(v)

    def metric(self, x_net, x, *args, **kwargs):
        fa = self._features(x_net)
        fb = self._features(x)
        total = 0.0
        for k, (a, b) in enumerate(zip(fa, fb)):
            an = a / jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True) + 1e-10)
            bn = b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True) + 1e-10)
            d = (an - bn) ** 2
            if self.lins is not None:
                w = self.lins[k].astype(d.dtype)[None, :, None, None]
                d = jnp.sum(d * w, axis=1, keepdims=True)
            else:
                d = jnp.mean(d, axis=1, keepdims=True)
            total = total + jnp.mean(_flatten_batch(d), axis=1)
        return total

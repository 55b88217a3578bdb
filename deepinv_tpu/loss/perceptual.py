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


class NIQE(Metric):
    r"""Natural image quality evaluator (perceptual.py:111).

    Computes MSCN-domain features (local mean/variance normalized
    coefficients and pairwise products) and the Mahalanobis distance to
    pristine-image statistics. The pristine model parameters (mu, cov) must
    be provided (the reference downloads them); without them this metric
    raises.
    """

    def __init__(self, params=None, patch_size: int = 96, **kwargs):
        super().__init__(**kwargs)
        self.params = params
        self.patch_size = patch_size

    def _mscn(self, a):
        from ..ops.conv import gaussian_blur, conv2d

        g = gaussian_blur(sigma=7 / 6, psf_size=(7, 7))
        mu = conv2d(a, g, padding="replicate")
        sigma = jnp.sqrt(
            jnp.clip(conv2d(a**2, g, padding="replicate") - mu**2, 0.0, None)
        )
        return (a - mu) / (sigma + 1.0)

    def features(self, x):
        a = _to_gray(x) * 255.0
        m = self._mscn(a)
        feats = [
            jnp.mean(_flatten_batch(m**2), axis=1),
            jnp.mean(_flatten_batch(jnp.abs(m)), axis=1) ** 2,
        ]
        for sh in ((0, 1), (1, 0), (1, 1), (1, -1)):
            p = m * jnp.roll(m, sh, axis=(-2, -1))
            feats.append(jnp.mean(_flatten_batch(p), axis=1))
            feats.append(jnp.mean(_flatten_batch(jnp.abs(p)), axis=1))
        return jnp.stack(feats, axis=1)

    def metric(self, x_net, x=None, *args, **kwargs):
        if self.params is None:
            raise ValueError(
                "NIQE requires pristine statistics params={'mu':..., 'cov':...}"
                " (the reference downloads these; no network access here)"
            )
        f = self.features(x_net)
        mu = jnp.asarray(self.params["mu"]).reshape(1, -1)
        cov = jnp.asarray(self.params["cov"])
        d = f - mu
        sol = jnp.linalg.solve(cov + 1e-6 * jnp.eye(cov.shape[0]), d.T).T
        return jnp.sqrt(jnp.clip(jnp.sum(d * sol, axis=1), 0.0, None))


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

"""Metrics (reference deepinv/loss/metric/{metric.py,distortion.py}).

``Metric`` base reproduces the reference preprocessing pipeline
(metric.py:12-130): complex magnitude, normalization, reduction, and the
``train_loss`` sign flip that turns a quality metric into a loss. All
metrics return per-sample values of shape (B,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module

__all__ = [
    "Metric",
    "QNR",
    "MSE",
    "NMSE",
    "MAE",
    "PSNR",
    "SNR",
    "SSIM",
    "LpNorm",
    "L1L2",
    "QNR",
    "SpectralAngleMapper",
    "ERGAS",
    "cal_psnr",
]


def _flatten_batch(v):
    return v.reshape(v.shape[0], -1)


class Metric(Module):
    """Base metric (reference metric.py:12).

    :param metric: optional callable implementing the unreduced metric.
    :param complex_abs: take the complex magnitude first (2-channel or
        complex dtype inputs).
    :param train_loss: invert higher-better metrics (``invert_metric``,
        default ``-m``) so they can train networks.
    :param reduction: None | 'mean' | 'sum' | 'none' | callable over the
        batch dimension.
    :param norm_inputs: None | 'l2' | 'min_max' | 'clip' | 'standardize'
        input normalization (metric.py:31).
    :param center_crop: center crop before computing the metric
        (metric.py:32): int or tuple crops to that size over the trailing
        spatial dims; negative (or zero) values remove ``|c|`` border pixels.
    """

    lower_better = True

    def __init__(self, metric=None, complex_abs=False, train_loss=False,
                 reduction=None, norm_inputs=None, center_crop=None):
        self._metric = metric
        self.complex_abs = complex_abs
        self.train_loss = train_loss
        self.reduction = reduction
        self.norm_inputs = norm_inputs
        self.center_crop = center_crop
        if isinstance(center_crop, tuple) and not (
            all(c > 0 for c in center_crop) or all(c <= 0 for c in center_crop)
        ):
            raise ValueError(
                "If center_crop is a tuple, all values must be either "
                "positive or negative."
            )

    def metric(self, x_net, x, *args, **kwargs):
        if self._metric is not None:
            return self._metric(x_net, x, *args, **kwargs)
        raise NotImplementedError

    def invert_metric(self, m):
        """Inversion used when a higher=better metric trains a network
        (metric.py:187)."""
        return -m

    def _center_crop(self, v):
        if self.center_crop is None or v is None:
            return v
        crops = (
            (self.center_crop,) * (v.ndim - 2)
            if isinstance(self.center_crop, int) else tuple(self.center_crop)
        )
        if v.ndim < 2 + len(crops):
            raise ValueError(
                f"Tensor has {v.ndim} dimensions but center_crop requires at "
                f"least {2 + len(crops)} dimensions"
            )
        idx = [slice(None)] * v.ndim
        for i, c in enumerate(crops):
            ax = v.ndim - len(crops) + i
            n = v.shape[ax]
            if c > 0:
                if c > n:
                    raise ValueError(f"Crop size {c} larger than dim size {n}")
                start = (n - c) // 2
                idx[ax] = slice(start, start + c)
            else:
                b = abs(c)
                if 2 * b >= n:
                    raise ValueError(
                        f"Border removal of {b} px would remove dim of size {n}"
                    )
                idx[ax] = slice(b, n - b)
        return v[tuple(idx)]

    def _normalize(self, v):
        if v is None:
            return None
        if self.norm_inputs is None:
            return v
        mode = self.norm_inputs.lower()
        if mode == "l2":
            # reference functional.py:4: per-spatial-plane l2 norm
            # (root-sum-squares over the last two dims, keepdim)
            n = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=(-2, -1), keepdims=True))
            return v / jnp.clip(n, 1e-12, None)
        if mode == "min_max":
            vmin = jnp.min(_flatten_batch(v), axis=1).reshape(
                (-1,) + (1,) * (v.ndim - 1))
            vmax = jnp.max(_flatten_batch(v), axis=1).reshape(
                (-1,) + (1,) * (v.ndim - 1))
            return (v - vmin) / jnp.clip(vmax - vmin, 1e-12, None)
        if mode == "clip":
            return jnp.clip(v, 0.0, 1.0)
        if mode in ("none", "standardize"):
            return v
        raise ValueError("norm_inputs must be l2, min_max, clip, "
                         "standardize, none or None.")

    def _complex_abs(self, v):
        if v is None or not self.complex_abs:
            return v
        if jnp.iscomplexobj(v):
            return jnp.abs(v)
        if v.shape[1] == 2:
            return jnp.sqrt(jnp.sum(v**2, axis=1, keepdims=True))
        return v

    def __call__(self, x_net=None, x=None, *args, **kwargs):
        # unwrap stacked (TensorList-style) inputs INDEPENDENTLY: indexing
        # a plain array here would silently take batch sample 0
        if isinstance(x_net, (list, tuple)):
            x_net = x_net[0]
        if isinstance(x, (list, tuple)):
            x = x[0]
        x_net = self._center_crop(self._complex_abs(x_net))
        x = self._center_crop(self._complex_abs(x))
        if self.norm_inputs == "standardize":
            if x_net is None or x is None:
                raise ValueError(
                    "Both x and x_net must not be None to use standardize."
                )
            x_net = (x_net - x_net.mean()) / x_net.std() * x.std() + x.mean()
        x_net = self._normalize(x_net)
        x = self._normalize(x)
        if x_net is None:
            return jnp.asarray([jnp.nan])
        m = self.metric(x_net, x, *args, **kwargs)
        if callable(self.reduction):
            m = self.reduction(m)
        elif self.reduction == "mean":
            m = jnp.mean(m)
        elif self.reduction == "sum":
            m = jnp.sum(m)
        if self.train_loss and not self.lower_better:
            return self.invert_metric(m)
        return m

    forward = __call__

    def __add__(self, other):
        return Metric(metric=lambda x_net, x, *a, **k:
                      self(x_net, x, *a, **k) + other(x_net, x, *a, **k))


class MSE(Metric):
    """Mean squared error (distortion.py:61)."""

    def metric(self, x_net, x, *args, **kwargs):
        return jnp.mean(_flatten_batch(jnp.abs(x_net - x) ** 2), axis=1)


class NMSE(MSE):
    """MSE normalized by ||x||^2 (distortion.py:99)."""

    def metric(self, x_net, x, *args, **kwargs):
        num = super().metric(x_net, x)
        den = jnp.mean(_flatten_batch(jnp.abs(x) ** 2), axis=1)
        return num / jnp.clip(den, 1e-12, None)


class MAE(Metric):
    """Mean absolute error (distortion.py:23)."""

    def metric(self, x_net, x, *args, **kwargs):
        return jnp.mean(_flatten_batch(jnp.abs(x_net - x)), axis=1)


def cal_psnr(x_net, x, max_pixel: float = 1.0):
    mse = jnp.mean((x_net - x) ** 2)
    return 10 * jnp.log10(max_pixel**2 / jnp.clip(mse, 1e-12, None))


class PSNR(Metric):
    """Peak signal-to-noise ratio in dB (distortion.py:245).

    :Examples:

        >>> import jax.numpy as jnp
        >>> from deepinv_tpu.loss.metric import PSNR
        >>> x = jnp.zeros((1, 1, 8, 8))
        >>> xhat = jnp.full((1, 1, 8, 8), 0.1)  # mse 0.01
        >>> round(float(PSNR()(xhat, x)[0]), 3)
        20.0
    """

    lower_better = False

    def __init__(self, max_pixel: float = 1.0, **kwargs):
        super().__init__(**kwargs)
        self.max_pixel = max_pixel

    def metric(self, x_net, x, *args, **kwargs):
        maxp = jnp.max(jnp.abs(x)) if self.max_pixel is None else self.max_pixel
        mse = jnp.mean(_flatten_batch(jnp.abs(x_net - x) ** 2), axis=1)
        return 10 * jnp.log10(maxp**2 / jnp.clip(mse, 1e-12, None))


class SNR(Metric):
    """Signal-to-noise ratio in dB (distortion.py:305)."""

    lower_better = False

    def metric(self, x_net, x, *args, **kwargs):
        num = jnp.sum(_flatten_batch(jnp.abs(x) ** 2), axis=1)
        den = jnp.sum(_flatten_batch(jnp.abs(x_net - x) ** 2), axis=1)
        return 10 * jnp.log10(num / jnp.clip(den, 1e-12, None))


def _gaussian_window(size=11, sigma=1.5):
    import numpy as np

    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


class SSIM(Metric):
    """Structural similarity (distortion.py:143), 11x11 Gaussian window;
    ``multiscale=True`` computes MS-SSIM with the standard 5-scale weights.

    :param multiscale: compute MS-SSIM (reference distortion.py:180).
    :param max_pixel: maximum pixel value; ``None`` uses the per-image max.
    :param min_pixel: minimum pixel value; ``None`` uses the per-image min.
    """

    lower_better = False
    _MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)

    def __init__(self, multiscale: bool = False, max_pixel: float = 1.0,
                 min_pixel: float = 0.0, **kwargs):
        kwargs.pop("torchmetric_kwargs", None)
        super().__init__(**kwargs)
        self.multiscale = multiscale
        self.max_pixel = max_pixel
        self.min_pixel = min_pixel
        self.window = _gaussian_window()

    def invert_metric(self, m):
        return 1.0 - m

    def _data_range(self, x):
        mx = (self.max_pixel if self.max_pixel is not None
              else jnp.max(_flatten_batch(x), axis=1).reshape(-1, 1, 1, 1))
        mn = (self.min_pixel if self.min_pixel is not None
              else jnp.min(_flatten_batch(x), axis=1).reshape(-1, 1, 1, 1))
        return mx - mn

    def _ssim_cs(self, x_net, x, L):
        from jax import lax

        C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
        C = x.shape[1]
        w = jnp.broadcast_to(self.window, (C, 1, 11, 11))

        def filt(v):
            return lax.conv_general_dilated(
                v, w, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=C,
            )

        mu1, mu2 = filt(x_net), filt(x)
        mu1s, mu2s, mu12 = mu1**2, mu2**2, mu1 * mu2
        s1 = filt(x_net**2) - mu1s
        s2 = filt(x**2) - mu2s
        s12 = filt(x_net * x) - mu12
        cs_map = (2 * s12 + C2) / (s1 + s2 + C2)
        ssim_map = ((2 * mu12 + C1) / (mu1s + mu2s + C1)) * cs_map
        return (jnp.mean(_flatten_batch(ssim_map), axis=1),
                jnp.mean(_flatten_batch(cs_map), axis=1))

    def metric(self, x_net, x, *args, **kwargs):
        from jax import lax

        # keep the per-image data range (B,1,1,1)-shaped so C1/C2
        # broadcast against the (B,C,H,W) ssim maps (squeezing to (B,)
        # broadcast along W and crashed for B>1 with max_pixel=None)
        L = jnp.asarray(self._data_range(x))
        if not self.multiscale:
            return self._ssim_cs(x_net, x, L)[0]

        min_size = 11 * 2 ** (len(self._MS_WEIGHTS) - 1)
        if x.shape[-2] < min_size or x.shape[-1] < min_size:
            raise ValueError(
                f"MS-SSIM needs images of at least {min_size}x{min_size} "
                f"pixels for {len(self._MS_WEIGHTS)} scales, got "
                f"{x.shape[-2]}x{x.shape[-1]}"
            )

        pool = lambda v: lax.reduce_window(
            v, 0.0, lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / 4
        vals = []
        a, b = x_net, x
        n = len(self._MS_WEIGHTS)
        for i in range(n):
            ssim_i, cs_i = self._ssim_cs(a, b, L)
            vals.append(ssim_i if i == n - 1 else cs_i)
            if i < n - 1:
                a, b = pool(a), pool(b)
        out = jnp.ones_like(vals[0])
        for v, wgt in zip(vals, self._MS_WEIGHTS):
            out = out * jnp.clip(v, 0.0, None) ** wgt
        return out


class LpNorm(Metric):
    """||x_net - x||_p^p (distortion.py:375)."""

    def __init__(self, p: float = 2.0, onesided: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.p = p
        self.onesided = onesided

    def metric(self, x_net, x, *args, **kwargs):
        d = jnp.maximum(x_net - x, 0.0) if self.onesided else x_net - x
        return jnp.sum(_flatten_batch(jnp.abs(d) ** self.p), axis=1)


class L1L2(Metric):
    """alpha*L1 + (1-alpha)*L2 (distortion.py:332)."""

    def __init__(self, alpha: float = 0.5, **kwargs):
        super().__init__(**kwargs)
        self.alpha = alpha

    def metric(self, x_net, x, *args, **kwargs):
        # reference composes MAE + MSE (means, not sums/norms)
        l1 = jnp.mean(_flatten_batch(jnp.abs(x_net - x)), axis=1)
        l2 = jnp.mean(_flatten_batch(jnp.abs(x_net - x) ** 2), axis=1)
        return self.alpha * l1 + (1 - self.alpha) * l2


class SpectralAngleMapper(Metric):
    """Mean spectral angle for multispectral fusion (distortion.py:558)."""

    def metric(self, x_net, x, *args, **kwargs):
        num = jnp.sum(x_net * x, axis=1)
        den = jnp.sqrt(jnp.sum(x_net**2, axis=1)) * jnp.sqrt(jnp.sum(x**2, axis=1))
        ang = jnp.arccos(jnp.clip(num / jnp.clip(den, 1e-12, None), -1.0, 1.0))
        return jnp.mean(_flatten_batch(ang), axis=1)


class ERGAS(Metric):
    """Global relative error for pansharpening (distortion.py:597).

    Matches the torchmetrics convention the reference wraps:
    ``100 * factor * sqrt(mean_b(rmse_b^2 / mean_b^2))``.
    """

    def __init__(self, factor: int, **kwargs):
        super().__init__(**kwargs)
        self.factor = factor

    def metric(self, x_net, x, *args, **kwargs):
        rmse2 = jnp.mean(jnp.abs(x_net - x) ** 2, axis=(-2, -1))
        mean2 = jnp.clip(jnp.mean(x, axis=(-2, -1)) ** 2, 1e-12, None)
        return 100.0 * self.factor * jnp.sqrt(jnp.mean(rmse2 / mean2, axis=-1)).reshape(-1)


class QNR(Metric):
    r"""Quality with No Reference for pansharpening (distortion.py:429):
    ``QNR = (1 - D_lambda)^alpha (1 - D_s)^beta`` with spectral distortion
    D_lambda (inter-band UQI differences vs the low-res multispectral) and
    spatial distortion D_s (band-to-pan UQI differences).

    Call as ``qnr(x_net=fused, x=None, y=TensorList([ms_lr, pan]),
    physics=pansharpen_physics)``.
    """

    lower_better = False

    def __init__(self, alpha: float = 1.0, beta: float = 1.0, **kwargs):
        super().__init__(**kwargs)
        self.alpha = alpha
        self.beta = beta

    def invert_metric(self, m):
        return 1.0 - m

    @staticmethod
    def _uqi(a, b):
        """Universal quality index per-batch over flattened images."""
        af = _flatten_batch(a)
        bf = _flatten_batch(b)
        ma, mb = jnp.mean(af, 1, keepdims=True), jnp.mean(bf, 1, keepdims=True)
        va = jnp.var(af, 1)
        vb = jnp.var(bf, 1)
        cov = jnp.mean((af - ma) * (bf - mb), 1)
        return (4 * cov * ma[:, 0] * mb[:, 0]) / jnp.clip(
            (va + vb) * (ma[:, 0] ** 2 + mb[:, 0] ** 2), 1e-12, None
        )

    def D_lambda(self, hrms, lrms):
        """Spectral distortion index: mean band-pair UQI difference between
        the fused and low-res multispectral images (reference
        distortion.py:487)."""
        C = hrms.shape[1]
        out, n_pairs = 0.0, 0
        for i in range(C):
            for j in range(i + 1, C):
                u_f = self._uqi(hrms[:, i : i + 1], hrms[:, j : j + 1])
                u_l = self._uqi(lrms[:, i : i + 1], lrms[:, j : j + 1])
                out = out + jnp.abs(u_f - u_l)
                n_pairs += 1
        return out / max(n_pairs, 1)

    def D_s(self, hrms, lrms, pan, pan_lr):
        """Spatial distortion index: mean band-to-pan UQI difference at high
        vs low resolution (reference distortion.py:502)."""
        C = hrms.shape[1]
        out = 0.0
        for i in range(C):
            u_h = self._uqi(hrms[:, i : i + 1], pan)
            u_l = self._uqi(lrms[:, i : i + 1], pan_lr)
            out = out + jnp.abs(u_h - u_l)
        return out / C

    def __call__(self, x_net=None, x=None, y=None, physics=None, **kwargs):
        ms_lr, pan = y[0], y[1]
        fused = x_net
        d_lambda = self.D_lambda(fused, ms_lr)
        pan_lr = jax.image.resize(pan, ms_lr[:, :1].shape, "linear")
        d_s = self.D_s(fused, ms_lr, pan, pan_lr)
        return (1 - d_lambda) ** self.alpha * (1 - d_s) ** self.beta


def cal_mse(a, b):
    """Per-sample MSE (reference metric/functional.py:56)."""
    return jnp.mean(jnp.abs(a - b) ** 2, axis=tuple(range(1, a.ndim)))


def cal_mae(a, b):
    """Per-sample MAE (reference metric/functional.py:61)."""
    return jnp.mean(jnp.abs(a - b), axis=tuple(range(1, a.ndim)))


def signal_noise_ratio(x_hat, x):
    """Per-sample SNR in dB (reference metric/functional.py:28)."""
    num = jnp.sum(jnp.abs(x) ** 2, axis=tuple(range(1, x.ndim)))
    den = jnp.sum(jnp.abs(x_hat - x) ** 2, axis=tuple(range(1, x.ndim)))
    return 10.0 * jnp.log10(num / jnp.clip(den, 1e-12, None))


# perceptual/no-reference metrics live in loss.perceptual; mirror them here
# so the namespace matches reference deepinv.loss.metric
from .perceptual import (  # noqa: E402
    HaarPSI,
    GMSD,
    CosineSimilarity,
    RecoveryCoefficient,
    BlurStrength,
    SharpnessIndex,
    NIQE,
    LPIPS,
)

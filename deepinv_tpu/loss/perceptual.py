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
    r"""Gradient-magnitude similarity deviation (distortion.py:997)."""

    def __init__(self, c: float = 0.0026, **kwargs):
        super().__init__(**kwargs)
        self.c = c

    def metric(self, x_net, x, *args, **kwargs):
        a, b = _to_gray(x_net), _to_gray(x)
        # 2x average-pool downsample (standard GMSD preprocessing)
        pool = lambda v: lax.reduce_window(v, 0.0, lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / 4
        a, b = pool(a), pool(b)
        ga = jnp.sqrt(_conv(a, _PREWITT_X) ** 2 + _conv(a, _PREWITT_Y) ** 2 + 1e-12)
        gb = jnp.sqrt(_conv(b, _PREWITT_X) ** 2 + _conv(b, _PREWITT_Y) ** 2 + 1e-12)
        gms = (2 * ga * gb + self.c) / (ga**2 + gb**2 + self.c)
        mean = jnp.mean(_flatten_batch(gms), axis=1, keepdims=True)
        return jnp.sqrt(jnp.mean((_flatten_batch(gms) - mean) ** 2, axis=1))


class HaarPSI(Metric):
    r"""Haar-wavelet perceptual similarity (distortion.py:643)."""

    lower_better = False

    def __init__(self, C: float = 30.0, alpha: float = 4.2, **kwargs):
        super().__init__(**kwargs)
        self.C = C
        self.alpha = alpha

    @staticmethod
    def _haar_filters(scale):
        size = 2**scale
        f = np.zeros((size, size), np.float32)
        f[: size // 2] = 1.0 / (size**2 / 2)
        f[size // 2 :] = -1.0 / (size**2 / 2)
        return jnp.asarray(f)

    def metric(self, x_net, x, *args, **kwargs):
        a = _to_gray(x_net) * 255.0
        b = _to_gray(x) * 255.0
        coeffs_a, coeffs_b = [], []
        for scale in (1, 2, 3):
            fh = self._haar_filters(scale)
            coeffs_a.append((_conv(a, fh), _conv(a, fh.T)))
            coeffs_b.append((_conv(b, fh), _conv(b, fh.T)))
        # local similarity from the two finest scales; weight from coarsest
        sims, weights = [], []
        for o in range(2):
            la = [jnp.abs(c[o]) for c in coeffs_a]
            lb = [jnp.abs(c[o]) for c in coeffs_b]
            s = (
                (2 * la[0] * lb[0] + self.C) / (la[0] ** 2 + lb[0] ** 2 + self.C)
                + (2 * la[1] * lb[1] + self.C) / (la[1] ** 2 + lb[1] ** 2 + self.C)
            ) / 2
            w = jnp.maximum(la[2], lb[2])
            sims.append(s)
            weights.append(w)
        sim = jnp.concatenate(sims, axis=1)
        w = jnp.concatenate(weights, axis=1)
        hpsi = jnp.sum(_flatten_batch(_logistic(sim, self.alpha) * w), axis=1) / jnp.clip(
            jnp.sum(_flatten_batch(w), axis=1), 1e-12, None
        )
        return (_inv_logistic(hpsi, self.alpha)) ** 2


def _logistic(v, a):
    return 1.0 / (1.0 + jnp.exp(-a * v))


def _inv_logistic(v, a):
    return jnp.log(v / (1 - v + 1e-12) + 1e-12) / a


class CosineSimilarity(Metric):
    r"""Normalized inner product (distortion.py:945)."""

    lower_better = False

    def metric(self, x_net, x, *args, **kwargs):
        a = _flatten_batch(x_net)
        b = _flatten_batch(x)
        num = jnp.abs(jnp.sum(jnp.conj(a) * b, axis=1))
        den = jnp.sqrt(jnp.sum(jnp.abs(a) ** 2, axis=1) * jnp.sum(jnp.abs(b) ** 2, axis=1))
        return num / jnp.clip(den, 1e-12, None)


class RecoveryCoefficient(Metric):
    r"""Per-sample correlation coefficient of recovery (distortion.py:1101)."""

    lower_better = False

    def metric(self, x_net, x, *args, **kwargs):
        a = _flatten_batch(x_net)
        b = _flatten_batch(x)
        a = a - jnp.mean(a, axis=1, keepdims=True)
        b = b - jnp.mean(b, axis=1, keepdims=True)
        num = jnp.sum(a * b, axis=1)
        den = jnp.sqrt(jnp.sum(a**2, axis=1) * jnp.sum(b**2, axis=1))
        return num / jnp.clip(den, 1e-12, None)


class BlurStrength(Metric):
    r"""No-reference blur estimate (perceptual.py:552): ratio of gradient
    energy after an extra blur to the original gradient energy."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def metric(self, x_net, x=None, *args, **kwargs):
        a = _to_gray(x_net)
        from ..ops.conv import gaussian_blur, conv2d

        blurred = conv2d(a, gaussian_blur(sigma=1.5), padding="replicate")
        ga = jnp.abs(jnp.diff(a, axis=-1)).sum(axis=(1, 2, 3)) + jnp.abs(
            jnp.diff(a, axis=-2)
        ).sum(axis=(1, 2, 3))
        gb = jnp.abs(jnp.diff(blurred, axis=-1)).sum(axis=(1, 2, 3)) + jnp.abs(
            jnp.diff(blurred, axis=-2)
        ).sum(axis=(1, 2, 3))
        return gb / jnp.clip(ga, 1e-12, None)


class SharpnessIndex(Metric):
    r"""No-reference sharpness (perceptual.py:688): variance of the
    Laplacian."""

    lower_better = False

    def metric(self, x_net, x=None, *args, **kwargs):
        a = _to_gray(x_net)
        lap = jnp.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], jnp.float32)
        v = _conv(a, lap)
        return jnp.var(_flatten_batch(v), axis=1)


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

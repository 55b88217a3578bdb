"""Space-varying blur kernel estimation network (reference
deepinv/models/kernel_network.py:9; Carbajal et al. J-MKPD) —
bit-faithful port.

A two-headed UNet: the mask head produces per-kernel spatial multipliers
(softmax over K), and the kernel head pools encoder features globally and
decodes them into K blur kernels (softmax over kernel pixels). The
published ``carbajal_kernel_identification_network.pth`` checkpoint ports
leaf-for-leaf via ``convert.port_kernel_network``
(tests/test_weight_porting.py). Outputs plug straight into
:class:`deepinv_tpu.physics.SpaceVaryingBlur` via ``physics.update(**out)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core import Module
from .layers import Conv2d, ConvTranspose2d, MaxPool2d

__all__ = ["KernelIdentificationNetwork"]


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.01)


class _Down(Module):
    """Double conv then maxpool (reference kernel_network.py:221)."""

    def __init__(self, cin, cout, key):
        k1, k2 = jax.random.split(key)
        self.conv1 = Conv2d(cin, cout, 3, 1, 1, key=k1)
        self.conv2 = Conv2d(cout, cout, 3, 1, 1, key=k2)
        self.pool = MaxPool2d(2)

    def __call__(self, x):
        feat = _lrelu(self.conv2(_lrelu(self.conv1(x))))
        return feat, self.pool(feat)


class _Up(Module):
    """Upscale, double conv, concat skip, fuse (reference kernel_network.py:241)."""

    def __init__(self, cin, feat_channels, cout, bilinear=False, key=None):
        ks = jax.random.split(key if key is not None else jax.random.key(0), 4)
        self.bilinear = bilinear
        if not bilinear:
            self.up = ConvTranspose2d(cin, cin, 2, 2, 0, key=ks[0])
        self.conv1 = Conv2d(cin, cout, 3, 1, 1, key=ks[1])
        self.conv2 = Conv2d(cout, cout, 3, 1, 1, key=ks[2])
        self.feat = Conv2d(feat_channels + cout, cout, 3, 1, 1, key=ks[3])

    def __call__(self, x1, x2=None):
        if self.bilinear:
            B, C, H, W = x1.shape
            # torch Upsample(mode='bilinear', align_corners=True)
            x1 = jax.image.resize(x1, (B, C, 2 * H, 2 * W), "bilinear")
        else:
            x1 = self.up(x1)
        x1 = _lrelu(self.conv2(_lrelu(self.conv1(x1))))
        if x2 is not None:
            dY = x2.shape[2] - x1.shape[2]
            dX = x2.shape[3] - x1.shape[3]
            if dY or dX:
                x1 = jnp.pad(x1, ((0, 0), (0, 0),
                                  (dY // 2, dY - dY // 2),
                                  (dX // 2, dX - dX // 2)))
            x = jnp.concatenate([x2, x1], axis=1)
        else:
            x = x1
        return _lrelu(self.feat(x))


def _pooled_skip(x, size):
    """Global average pool broadcast to size x size (reference :291)."""
    gap = jnp.mean(x, axis=(2, 3), keepdims=True)
    return jnp.broadcast_to(gap, gap.shape[:2] + (size, size))


class KernelIdentificationNetwork(Module):
    """Blind space-varying kernel estimator (reference kernel_network.py:9).

    ``model(y)`` returns ``{"filters": (N,1,K,s,s), "multipliers":
    (N,1,K,H,W)}`` for :class:`SpaceVaryingBlur`. Inputs in [0,1],
    non-gamma-corrected.

    :param filters: number of blur kernels K.
    :param blur_kernel_size: 33 or 65.
    :param bilinear: bilinear upsampling instead of transposed convs.
    :param no_softmax: leaky-relu kernels instead of pixel softmax.
    :param pretrained: path to the reference ``.pth`` checkpoint.
    """

    def __init__(self, filters: int = 25, blur_kernel_size: int = 33,
                 bilinear: bool = False, no_softmax: bool = False,
                 pretrained=None, key=None):
        if blur_kernel_size not in (33, 65):
            raise ValueError("blur_kernel_size must be 33 or 65")
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 32))
        self.K = filters
        self.blur_kernel_size = blur_kernel_size
        self.no_softmax = no_softmax

        self.inc_rgb = Conv2d(3, 64, 3, 1, 1, key=next(ks))
        self.inc_gray = Conv2d(1, 64, 3, 1, 1, key=next(ks))
        self.down1 = _Down(64, 64, next(ks))
        self.down2 = _Down(64, 128, next(ks))
        self.down3 = _Down(128, 256, next(ks))
        self.down4 = _Down(256, 512, next(ks))
        self.down5 = _Down(512, 1024, next(ks))
        self.feat = Conv2d(1024, 1024, 3, 1, 1, key=next(ks))

        self.up1 = _Up(1024, 1024, 512, bilinear, next(ks))
        self.up2 = _Up(512, 512, 256, bilinear, next(ks))
        self.up3 = _Up(256, 256, 128, bilinear, next(ks))
        self.up4 = _Up(128, 128, 64, bilinear, next(ks))
        self.up5 = _Up(64, 64, 64, bilinear, next(ks))

        self.masks_end = [Conv2d(64, 64, 3, 1, 1, key=next(ks)),
                          Conv2d(64, 64, 3, 1, 1, key=next(ks)),
                          Conv2d(64, self.K, 3, 1, 1, key=next(ks))]

        self.kernel_up1 = _Up(1024, 1024, 512, bilinear, next(ks))
        self.kernel_up2 = _Up(512, 512, 256, bilinear, next(ks))
        self.kernel_up3 = _Up(256, 256, 256, bilinear, next(ks))
        self.kernel_up4 = _Up(256, 128, 128, bilinear, next(ks))
        self.kernel_up5 = _Up(128, 64, 64, bilinear, next(ks))
        if blur_kernel_size > 33:
            self.kernel_up6 = _Up(64, 0, 64, bilinear, next(ks))
        # first conv has an even 2x2 kernel with padding 1: 32 -> 33
        self.kernels_end = [Conv2d(64, 64, 2, 1, 1, key=next(ks)),
                            Conv2d(64, 64, 3, 1, 1, key=next(ks)),
                            Conv2d(64, self.K, 3, 1, 1, key=next(ks))]

        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_kernel_network

            ported = port_kernel_network(self, load_torch_checkpoint(pretrained))
            self.__dict__.update(ported.__dict__)

    def __call__(self, x, **kwargs):
        x = x - 0.5
        x1 = _lrelu(self.inc_rgb(x) if x.shape[1] == 3 else self.inc_gray(x))
        x1_feat, x2 = self.down1(x1)
        x2_feat, x3 = self.down2(x2)
        x3_feat, x4 = self.down3(x3)
        x4_feat, x5 = self.down4(x4)
        x5_feat, x6 = self.down5(x5)
        x6_feat = _lrelu(self.feat(x6))

        feat6_gap = jnp.mean(x6_feat, axis=(2, 3), keepdims=True)
        k1 = self.kernel_up1(feat6_gap, _pooled_skip(x5_feat, 2))
        k2 = self.kernel_up2(k1, _pooled_skip(x4_feat, 4))
        k3 = self.kernel_up3(k2, _pooled_skip(x3_feat, 8))
        k4 = self.kernel_up4(k3, _pooled_skip(x2_feat, 16))
        k5 = self.kernel_up5(k4, _pooled_skip(x1_feat, 32))
        kin = self.kernel_up6(k5) if self.blur_kernel_size == 65 else k5

        k = self.kernels_end[0](kin)
        k = self.kernels_end[1](_lrelu(k))
        k = self.kernels_end[2](_lrelu(k))

        N = k.shape[0]
        s = self.blur_kernel_size
        k = k.reshape(N, self.K, s * s)
        k = jax.nn.leaky_relu(k, 0.01) if self.no_softmax \
            else jax.nn.softmax(k, axis=2)
        k = k.reshape(N, self.K, s, s)

        x7 = self.up1(x6_feat, x5_feat)
        x8 = self.up2(x7, x4_feat)
        x9 = self.up3(x8, x3_feat)
        x10 = self.up4(x9, x2_feat)
        x11 = self.up5(x10, x1_feat)
        m = self.masks_end[0](x11)
        m = self.masks_end[1](_lrelu(m))
        m = self.masks_end[2](_lrelu(m))
        logits = jax.nn.softmax(m, axis=1)

        k = k[:, :, ::-1, ::-1]  # corr -> conv orientation
        return {"filters": k[:, None], "multipliers": logits[:, None]}

"""DnCNN denoiser (reference deepinv/models/dncnn.py:14).

20 conv layers, 64 channels, ReLU, residual output ``out_conv(h) + x``
(dncnn.py:121-138; no batch norm, like the reference). Weight tree mirrors
the torch module names (in_conv / conv_list / out_conv) for 1:1 porting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Denoiser
from .layers import Conv2d

__all__ = ["DnCNN"]


class DnCNN(Denoiser):
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        depth: int = 20,
        bias: bool = True,
        nf: int = 64,
        pretrained=None,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        keys = jax.random.split(key, depth)
        self.depth = depth
        self.in_conv = Conv2d(in_channels, nf, 3, 1, 1, bias=bias, key=keys[0])
        self.conv_list = [
            Conv2d(nf, nf, 3, 1, 1, bias=bias, key=keys[i + 1])
            for i in range(depth - 2)
        ]
        self.out_conv = Conv2d(nf, out_channels, 3, 1, 1, bias=bias, key=keys[-1])
        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_dncnn

            ckpt = load_torch_checkpoint(pretrained)
            ported = port_dncnn(self, ckpt)
            self.__dict__.update(ported.__dict__)

    def __call__(self, x, sigma=None, **kwargs):
        h = jax.nn.relu(self.in_conv(x))
        for conv in self.conv_list:
            h = jax.nn.relu(conv(h))
        return self.out_conv(h) + x

"""DnCNN denoiser (reference deepinv/models/dncnn.py:14).

20 conv layers, 64 channels, ReLU, residual output ``out_conv(h) + x``
(dncnn.py:121-138; no batch norm, like the reference). Weight tree mirrors
the torch module names (in_conv / conv_list / out_conv) for 1:1 porting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Denoiser
from .layers import conv_nd, fix_dim

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
        pretrained_2d_isotropic: bool = False,
        dim=2,
        key=None,
    ):
        key = key if key is not None else jax.random.key(0)
        keys = jax.random.split(key, depth)
        self.depth = depth
        dim = fix_dim(dim)
        Conv = conv_nd(dim)
        self.in_conv = Conv(in_channels, nf, 3, 1, 1, bias=bias, key=keys[0])
        self.conv_list = [
            Conv(nf, nf, 3, 1, 1, bias=bias, key=keys[i + 1])
            for i in range(depth - 2)
        ]
        self.out_conv = Conv(nf, out_channels, 3, 1, 1, bias=bias, key=keys[-1])
        if pretrained is not None and dim == 3:
            # 2D weights inflated into the 3D kernels (reference
            # dncnn.py:111 initialize_3d_from_2d)
            from .convert import load_torch_checkpoint
            from .utils3d import initialize_3d_from_2d

            ckpt = load_torch_checkpoint(pretrained)
            initialize_3d_from_2d(self, ckpt,
                                  isotropic=pretrained_2d_isotropic)
        elif pretrained is not None:
            from .convert import load_torch_checkpoint, port_dncnn

            ckpt = load_torch_checkpoint(pretrained)
            ported = port_dncnn(self, ckpt)
            self.__dict__.update(ported.__dict__)

    def __call__(self, x, sigma=None, **kwargs):
        h = jax.nn.relu(self.in_conv(x))
        h = self._hidden_chain(h)
        return self.out_conv(h) + x

    def _hidden_chain(self, h):
        """The 64-channel conv+ReLU middle chain. On TPU with bf16
        activations (the ``models.autocast`` inference path) it runs as one
        fused Pallas kernel — measured 2.9x over the XLA conv chain
        (ops/pallas/conv_chain.py); anywhere else, plain convs."""
        from ..ops.pallas.conv_chain import batched_fused_chain, can_fuse_chain

        convs = self.conv_list
        if (
            h.dtype == jnp.bfloat16
            and len(convs) >= 2
            and all(c.bias is not None for c in convs)
            and can_fuse_chain(h, len(convs))
        ):
            ws = jnp.stack([c.weight for c in convs])
            bs = jnp.stack([c.bias for c in convs])
            return batched_fused_chain(h, ws, bs)
        for conv in convs:
            h = jax.nn.relu(conv(h))
        return h

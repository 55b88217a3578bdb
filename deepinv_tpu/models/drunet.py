"""DRUNet sigma-conditioned denoiser (reference deepinv/models/drunet.py:23).

Architecture (KAIR DRUNet): head conv -> 3 x [4 ResBlocks + strided-conv
down] -> 4-ResBlock body -> 3 x [conv-transpose up + 4 ResBlocks] -> tail
conv, bias-free, with additive long skips (drunet.py:200-210). The noise
level enters as an extra input channel (noise-level map, drunet.py:212-250).

The parameter tree mirrors the torch module names (m_head, m_down1..3,
m_body, m_up3..1, m_tail) so pretrained HuggingFace checkpoints port as a
pure tree mapping (models/convert.py).

Odd input sizes are handled with the reference's ``test_pad`` strategy
(modulo-16 padding, models/utils.py:49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser, handle_sigma
from .layers import Conv2d, ConvTranspose2d, Sequential
from .utils import test_pad

__all__ = ["DRUNet"]


_ACTS = {
    "R": jax.nn.relu,
    "L": lambda x: jax.nn.leaky_relu(x, 1e-2),
    "E": jax.nn.elu,
    "S": jax.nn.softplus,
    "s": jax.nn.softplus,
}

# W-folded scale-0 forward (models/drunet_fold.py): exact layout transform
# that lifts the C=64 convs to 128 folded channels — measured ~1.4x on the
# whole forward on a v5e at batch 1. "auto" = on for TPU backends, off on
# CPU (where XLA's conv path prefers the plain layout). Override with
# DEEPINV_TPU_DRUNET_FOLD=0/1.
FOLD_SCALE0 = "auto"


def _use_folded() -> bool:
    import os

    env = os.environ.get("DEEPINV_TPU_DRUNET_FOLD")
    if env is not None:
        return env not in ("0", "false", "False")
    if FOLD_SCALE0 == "auto":
        return jax.default_backend() == "tpu"
    return bool(FOLD_SCALE0)


class ResBlock(Module):
    """C-act-C residual block (reference drunet.py:310); ``act_mode`` as in
    the reference: R=ReLU, L=LeakyReLU, E=ELU (GSDRUNet), S=Softplus."""

    def __init__(self, nc: int, bias: bool = False, act_mode: str = "R",
                 dim: int = 2, key=None):
        from .layers import conv_nd

        k1, k2 = jax.random.split(key if key is not None else jax.random.key(0))
        Conv = conv_nd(dim)
        self.conv1 = Conv(nc, nc, 3, 1, 1, bias=bias, key=k1)
        self.conv2 = Conv(nc, nc, 3, 1, 1, bias=bias, key=k2)
        self.act_mode = act_mode
        # reference init uses gain 0.2 (weights_init_drunet) so stacked
        # residual blocks stay stable at random init
        self.conv1 = self.conv1.replace(weight=self.conv1.weight * 0.2)
        self.conv2 = self.conv2.replace(weight=self.conv2.weight * 0.2)

    def __call__(self, x):
        return x + self.conv2(_ACTS[self.act_mode](self.conv1(x)))


class DRUNet(Denoiser):
    """Sigma-conditioned UNet-ResNet denoiser (reference drunet.py:23).

    :Examples:

        The noise level enters as an extra channel; odd sizes are handled
        with the reference's modulo-16 ``test_pad``:

        >>> import jax
        >>> from deepinv_tpu.models import DRUNet
        >>> den = DRUNet(nc=(8, 16, 16, 16), nb=1)  # tiny config
        >>> x = jax.random.uniform(jax.random.key(0), (1, 3, 37, 31))
        >>> den(x, 0.05).shape
        (1, 3, 37, 31)
    """

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        nc=(64, 128, 256, 512),
        nb: int = 4,
        act_mode: str = "R",
        pretrained=None,
        pretrained_2d_isotropic: bool = False,
        dim=2,
        key=None,
    ):
        from .layers import conv_nd, conv_transpose_nd, fix_dim

        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 64))
        nc = tuple(nc)
        self.nb = nb
        dim = fix_dim(dim)
        self.dim = dim
        Conv = conv_nd(dim)
        ConvT = conv_transpose_nd(dim)

        self.m_head = Conv(in_channels + 1, nc[0], 3, 1, 1, bias=False, key=next(ks))

        def down_stage(cin, cout):
            blocks = [ResBlock(cin, act_mode=act_mode, dim=dim, key=next(ks))
                      for _ in range(nb)]
            down = Conv(cin, cout, 2, 2, 0, bias=False, key=next(ks))
            return Sequential(*blocks, down)

        def up_stage(cin, cout):
            up = ConvT(cin, cout, 2, 2, 0, bias=False, key=next(ks))
            blocks = [ResBlock(cout, act_mode=act_mode, dim=dim, key=next(ks))
                      for _ in range(nb)]
            return Sequential(up, *blocks)

        self.m_down1 = down_stage(nc[0], nc[1])
        self.m_down2 = down_stage(nc[1], nc[2])
        self.m_down3 = down_stage(nc[2], nc[3])
        self.m_body = Sequential(
            *[ResBlock(nc[3], act_mode=act_mode, dim=dim, key=next(ks))
              for _ in range(nb)])
        self.m_up3 = up_stage(nc[3], nc[2])
        self.m_up2 = up_stage(nc[2], nc[1])
        self.m_up1 = up_stage(nc[1], nc[0])
        self.m_tail = Conv(nc[0], out_channels, 3, 1, 1, bias=False, key=next(ks))

        if pretrained is not None and dim == 3:
            # inflate 2D weights into the cube kernels (reference
            # drunet.py pretrained='download_2d')
            from .convert import load_torch_checkpoint
            from .utils3d import initialize_3d_from_2d

            ckpt = load_torch_checkpoint(pretrained)
            initialize_3d_from_2d(self, ckpt,
                                  isotropic=pretrained_2d_isotropic)
        elif pretrained is not None:
            from .convert import load_torch_checkpoint, port_drunet

            ckpt = load_torch_checkpoint(pretrained)
            ported = port_drunet(self, ckpt)
            self.__dict__.update(ported.__dict__)

    def forward_unet(self, x0):
        if x0.ndim == 4 and _use_folded():
            from .drunet_fold import forward_unet_folded

            return forward_unet_folded(self, x0, _ACTS[self.m_body[0].act_mode])
        x1 = self.m_head(x0)
        x2 = self.m_down1(x1)
        x3 = self.m_down2(x2)
        x4 = self.m_down3(x3)
        x = self.m_body(x4)
        x = self.m_up3(x + x4)
        x = self.m_up2(x + x3)
        x = self.m_up1(x + x2)
        return self.m_tail(x + x1)

    def __call__(self, x, sigma=0.05, **kwargs):
        noise_map = handle_sigma(sigma, x)
        xin = jnp.concatenate([x, noise_map], axis=1)
        spatial = x.shape[2:]
        if all(s % 8 == 0 and s > 31 for s in spatial):
            return self.forward_unet(xin)
        return test_pad(self.forward_unet, xin, modulo=16)

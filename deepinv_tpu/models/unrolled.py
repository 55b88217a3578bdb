"""Unrolled reconstruction networks: MoDL, VarNet, PDNet, PanNet
(reference deepinv/models/{modl.py,varnet.py,PDNet.py,multispectral.py}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from ..optim.optimizers import BaseOptim
from ..optim.data_fidelity import L2
from ..optim.prior import PnP
from .base import Denoiser, Reconstructor
from ..physics.mri import MRIMixin
from .dncnn import DnCNN
from .layers import Conv2d
from .unet import UNet

__all__ = ["MoDL", "VarNet", "VarNetBlock", "PDNet", "PDNet_PrimalBlock", "PDNet_DualBlock", "PanNet"]


class MoDL(BaseOptim):
    r"""Model-based deep learning MRI recon (reference modl.py:73): unrolled
    HQS with a trainable DnCNN prox and learnable stepsizes."""

    def __init__(self, denoiser=None, num_iter: int = 3, key=None):
        if denoiser is None:
            denoiser = DnCNN(in_channels=2, out_channels=2, depth=7, key=key)
        super().__init__(
            "HQS",
            data_fidelity=L2(),
            prior=PnP(denoiser),
            params_algo={"stepsize": [1.0] * num_iter, "lambda": 1.0, "g_param": 0.05},
            max_iter=num_iter,
            unfold=True,
        )


class VarNetBlock(Module):
    r"""One VarNet cascade (reference varnet.py:116):
    ``x <- x - w * A^T(A x - y) - D(x)``."""

    def __init__(self, denoiser, key=None):
        self.denoiser = denoiser
        self.dc_weight = jnp.ones(())

    def __call__(self, x, y, physics):
        dc = physics.A_adjoint(physics.A(x) - y)
        denoised = self.denoiser(x, None)
        return x - self.dc_weight * dc - denoised


class VarNet(MRIMixin, Reconstructor):
    r"""(E2E-)VarNet MRI reconstructor (reference varnet.py:15)."""

    def __init__(self, denoiser=None, num_cascades: int = 8, mode: str = "varnet", key=None):
        key = key if key is not None else jax.random.key(0)
        ks = jax.random.split(key, num_cascades)
        if denoiser is None:
            blocks = [
                VarNetBlock(UNet(2, 2, scales=3, base=16, residual=False, batch_norm=False, key=k))
                for k in ks
            ]
        else:
            blocks = [VarNetBlock(denoiser) for _ in range(num_cascades)]
        self.blocks = blocks
        self.mode = mode

    def backbone_inference(self, tensor_in, physics, y):
        """Run the cascade stack on ``tensor_in`` with (physics, y) data
        consistency (reference varnet.py:79)."""
        x = tensor_in
        for b in self.blocks:
            x = b(x, y, physics)
        return x

    def __call__(self, y, physics, **kwargs):
        return self.backbone_inference(physics.A_adjoint(y), physics, y)


class PDNet_PrimalBlock(Module):
    """Primal update block (reference PDNet.py)."""

    def __init__(self, in_ch: int = 7, out_ch: int = 5, key=None):
        k1, k2, k3 = jax.random.split(key if key is not None else jax.random.key(0), 3)
        self.c1 = Conv2d(in_ch, 32, 3, 1, 1, key=k1)
        self.c2 = Conv2d(32, 32, 3, 1, 1, key=k2)
        self.c3 = Conv2d(32, out_ch, 3, 1, 1, key=k3)

    def __call__(self, h):
        z = jax.nn.relu(self.c1(h))
        z = jax.nn.relu(self.c2(z))
        return self.c3(z)


class PDNet_DualBlock(PDNet_PrimalBlock):
    """Dual update block (reference PDNet.py)."""


class PDNet(Reconstructor):
    r"""Learned primal-dual reconstruction (reference PDNet.py:156):
    unrolled Chambolle-Pock with learned primal/dual updates."""

    def __init__(self, num_iter: int = 5, n_primal: int = 5, n_dual: int = 5, n_channels: int = 1, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 2 * num_iter))
        C = n_channels
        self.primal_blocks = [
            PDNet_PrimalBlock((n_primal + 1) * C, n_primal * C, key=next(ks))
            for _ in range(num_iter)
        ]
        self.dual_blocks = [
            PDNet_DualBlock((n_dual + 2) * C, n_dual * C, key=next(ks))
            for _ in range(num_iter)
        ]
        self.n_primal = n_primal
        self.n_dual = n_dual

    def __call__(self, y, physics, **kwargs):
        x0 = physics.A_adjoint(y)
        B, C = x0.shape[:2]
        primal = jnp.tile(x0, (1, self.n_primal, 1, 1))
        dual = jnp.zeros(y.shape[:1] + (self.n_dual * y.shape[1],) + y.shape[2:], y.dtype)
        for pb, db in zip(self.primal_blocks, self.dual_blocks):
            # dual update: concat(dual, A x_2, y)
            f2 = physics.A(primal[:, C : 2 * C])
            dual = dual + db(jnp.concatenate([dual, f2, y], axis=1))
            # primal update: concat(primal, A^T h_1)
            at = physics.A_adjoint(dual[:, :C])
            primal = primal + pb(jnp.concatenate([primal, at], axis=1))
        return primal[:, :C]


class PanNet(Reconstructor):
    r"""PanNet pansharpening network (reference multispectral.py:170):
    high-pass detail injection with a ResNet on concatenated upsampled
    multispectral + pan inputs."""

    def __init__(self, hrms_shape=(3, 32, 32), nf: int = 32, n_blocks: int = 4,
                 scale_factor: int = 4, highpass_kernel_size: int = 5, key=None):
        key = key if key is not None else jax.random.key(0)
        C = hrms_shape[0]
        ks = iter(jax.random.split(key, n_blocks * 2 + 2))
        self.hrms_shape = tuple(hrms_shape)
        self.scale_factor = scale_factor
        self.highpass_kernel_size = highpass_kernel_size
        self.head = Conv2d(C + 1, nf, 3, 1, 1, key=next(ks))
        self.blocks = [
            (Conv2d(nf, nf, 3, 1, 1, key=next(ks)), Conv2d(nf, nf, 3, 1, 1, key=next(ks)))
            for _ in range(n_blocks)
        ]
        self.tail = Conv2d(nf, C, 3, 1, 1, key=next(ks))

    def highpass(self, x):
        """High-pass with a box filter, per Yang et al. (reference
        multispectral.py:149)."""
        k = self.highpass_kernel_size
        box = jnp.ones((k, k), x.dtype) / (k * k)
        from ..ops.conv import conv2d

        return x - conv2d(x, box, padding="replicate")

    def create_sampler(self, direction: str, hr_shape, noise_gain: float = 0.0):
        """Bicubic down/up sampler for Wald-protocol reduced-resolution
        training (reference multispectral.py:127)."""
        from ..physics import Downsampling, PoissonNoise

        sampler = Downsampling(img_size=hr_shape, factor=self.scale_factor,
                               filter="bicubic")
        if noise_gain > 0:
            sampler = sampler.replace(
                noise_model=PoissonNoise(gain=noise_gain, clip_positive=True))
        return sampler if direction == "down" else sampler.A_adjoint

    def __call__(self, y, physics, **kwargs):
        color_lr, pan = y[0], y[1]
        up = physics.downsampling.A_adjoint(color_lr) * (physics.factor**2)
        # high-pass detail injection (reference multispectral.py:151-169)
        lr_hp_up = physics.downsampling.A_adjoint(
            self.highpass(color_lr)) * (physics.factor**2)
        pan_hp = self.highpass(pan)
        h = jax.nn.relu(self.head(jnp.concatenate([lr_hp_up, pan_hp], axis=1)))
        for c1, c2 in self.blocks:
            h = h + c2(jax.nn.relu(c1(h)))
        return up + self.tail(h)

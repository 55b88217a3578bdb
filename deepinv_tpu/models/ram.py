"""Reconstruct Anything Model (reference deepinv/models/ram.py:20, 1292 LoC).

Measurement-conditioned foundation reconstructor: works both as
``model(y, physics)`` (reconstructor) and ``model(y, sigma=..., gain=...)``
(denoiser). This is a *bit-faithful* port of the reference architecture —
the same blocks (InHead / BaseEncBlock of measurement-conditioned ResBlocks
/ OutTail), the same multiscale Krylov conditioning
(``cat[x, factor^2 A^T A x]`` per scale through a sinc
:class:`LinearPhysicsMultiScaler <deepinv_tpu.physics.LinearPhysicsMultiScaler>`),
the same input rescaling / realignment / padding protocol — so the published
checkpoint (huggingface.co/mterris/ram, ram.py:131) loads directly via
:func:`deepinv_tpu.models.convert.port_ram` and reproduces the reference
outputs to float tolerance (tests/test_weight_porting.py).

Every conditioning branch is static Python control flow over channel counts
and scales, so the whole forward traces into one XLA program per
(shape, physics) signature.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core import Module, TensorList
from ..physics.wrappers import LinearPhysicsMultiScaler, PhysicsCropper
from .base import Denoiser, Reconstructor, handle_sigma
from .layers import Conv2d, ConvTranspose2d

__all__ = ["RAM"]


def krylov_embeddings(y, physics, factor, scale=0, v=None, N=4, x_init=None):
    """Krylov conditioning stack ``cat[x, Kx, K^2x, ...]`` with
    ``K = factor^2 A_s^T A_s`` (reference ram.py:598)."""
    x = y if x_init is None else x_init
    norm = factor**2
    out = x
    x_k = x
    for _ in range(N - 1):
        x_k = physics.A_adjoint_A(x_k, scale=scale) * norm
        if v is not None:
            x_k = x_k - v
        out = jnp.concatenate([out, x_k], axis=1)
    return out


class HeadBlock(Module):
    """Conv block with 1x1-skip branches (reference ram.py:1056)."""

    def __init__(self, in_channels, out_channels, kernel_size=3, bias=True,
                 depth=2, relu_in=False, skip_in=False, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 2 + 3 * max(depth - 1, 1)))
        pad = kernel_size // 2
        c = out_channels if depth < 2 else in_channels
        self.convin = Conv2d(in_channels, c, kernel_size, 1, pad, bias=bias, key=next(ks))
        self.zero_conv_skip = Conv2d(in_channels, c, 1, 1, 0, bias=False, key=next(ks))
        self.depth = depth
        self.relu_in = relu_in
        self.skip_in = skip_in
        self.convs1, self.convs2, self.skipconvs = [], [], []
        for i in range(depth - 1):
            c_in = in_channels
            c_out = in_channels if i < depth - 2 else out_channels
            self.convs1.append(Conv2d(c_in, c_in, kernel_size, 1, pad, bias=bias, key=next(ks)))
            self.convs2.append(Conv2d(c_in, c_out, kernel_size, 1, pad, bias=bias, key=next(ks)))
            self.skipconvs.append(Conv2d(c_in, c_out, 1, 1, 0, bias=False, key=next(ks)))

    def __call__(self, x):
        if self.skip_in and self.relu_in:
            x = jax.nn.relu(self.convin(x)) + self.zero_conv_skip(x)
        elif self.skip_in:
            x = self.convin(x) + self.zero_conv_skip(x)
        else:
            x = self.convin(x)
        for i in range(self.depth - 1):
            aux = jax.nn.relu(self.convs1[i](x))
            x = self.convs2[i](aux) + self.skipconvs[i](x)
        return x


class Heads(Module):
    """Channel-count-dispatched encoding heads (reference ram.py:903)."""

    def __init__(self, in_channels_list, out_channels, depth=2, scale=1,
                 bias=True, mode="bilinear", c_mult=1, c_add=0,
                 relu_in=False, skip_in=False, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, len(in_channels_list)))
        self.in_channels_list = [c * (c_mult + c_add) for c in in_channels_list]
        self.scale = scale
        self.mode = mode
        self.heads = [
            HeadBlock(cin, out_channels, depth=depth, bias=bias,
                      relu_in=relu_in, skip_in=skip_in, key=next(ks))
            for cin in self.in_channels_list
        ]

    def __call__(self, x):
        i = self.in_channels_list.index(x.shape[1])
        if self.scale != 1:
            B, C, H, W = x.shape
            x = jax.image.resize(x, (B, C, H // self.scale, W // self.scale), "bilinear")
        return self.heads[i](x)


class Tails(Module):
    """Channel-count-dispatched decoding tails (reference ram.py:981)."""

    def __init__(self, in_channels, out_channels_list, depth=2, scale=1,
                 bias=True, mode="bilinear", c_mult=1, relu_in=False,
                 skip_in=False, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, len(out_channels_list)))
        self.out_channels_list = list(out_channels_list)
        self.scale = scale
        self.mode = mode
        self.tails = [
            HeadBlock(in_channels, cout * c_mult, depth=depth, bias=bias,
                      relu_in=relu_in, skip_in=skip_in, key=next(ks))
            for cout in self.out_channels_list
        ]

    def __call__(self, x, out_channels):
        i = self.out_channels_list.index(out_channels)
        x = self.tails[i](x)
        if self.scale != 1:
            B, C, H, W = x.shape
            x = jax.image.resize(x, (B, C, H * self.scale, W * self.scale), "bilinear")
        return x


class MeasCondBlock(Module):
    """Measurement-conditioning block (reference ram.py:638): decode the
    features to image space, push them through the (scaled) normal operator
    as Krylov embeddings, concatenate with the measurement embedding, and
    re-encode."""

    def __init__(self, out_channels=64, img_channels=None, decode_upscale=None,
                 N=4, depth_encoding=1, c_mult=1, key=None):
        key = key if key is not None else jax.random.key(0)
        k1, k2 = jax.random.split(key)
        self.separate_head = isinstance(img_channels, list)
        self.N = N
        self.c_mult = c_mult
        self.decode_upscale = decode_upscale  # kept for API parity (unused upstream)
        self.decoding_conv = Tails(out_channels, img_channels, depth=1, scale=1,
                                   bias=False, c_mult=c_mult, key=k1)
        self.encoding_conv = Heads(img_channels, out_channels, depth=depth_encoding,
                                   scale=1, bias=False, c_mult=c_mult * N, c_add=N,
                                   relu_in=False, skip_in=True, key=k2)

    def __call__(self, x, y, physics, img_channels, scale=1):
        dec = self.decoding_conv(x, img_channels)
        factor = 2**scale
        parts = [
            krylov_embeddings(None, physics, factor, scale=scale, N=self.N,
                              x_init=dec[:, img_channels * c: img_channels * (c + 1)])
            for c in range(self.c_mult)
        ]
        meas = jnp.concatenate([y] + parts, axis=1)
        return jax.nn.relu(self.encoding_conv(meas))


class RAMResBlock(Module):
    """Residual block with a parallel measurement-conditioning branch
    (reference ram.py:716): ``x + conv2(relu(conv1 x)) + gain * emb``."""

    def __init__(self, in_channels=64, out_channels=64, bias=True,
                 img_channels=None, decode_upscale=None, N=2, c_mult=2,
                 depth_encoding=2, key=None):
        key = key if key is not None else jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)
        self.conv1 = Conv2d(in_channels, out_channels, 3, 1, 1, bias=bias, key=k1)
        self.conv2 = Conv2d(out_channels, out_channels, 3, 1, 1, bias=bias, key=k2)
        self.gain = jnp.ones((1,))
        self.PhysicsBlock = MeasCondBlock(
            out_channels=out_channels, c_mult=c_mult, img_channels=img_channels,
            decode_upscale=decode_upscale, N=N, depth_encoding=depth_encoding, key=k3)

    def __call__(self, x, physics=None, y=None, img_channels=None, scale=0):
        u = jax.nn.relu(self.conv1(x))
        u_2 = self.conv2(u)
        emb = self.PhysicsBlock(u, y, physics, img_channels=img_channels, scale=scale)
        return x + u_2 + self.gain * emb


class BaseEncBlock(Module):
    """``nb`` measurement-conditioned ResBlocks (reference ram.py:537)."""

    def __init__(self, in_channels, out_channels, bias=False, nb=4,
                 img_channels=None, decode_upscale=None, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = jax.random.split(key, nb)
        self.enc = [
            RAMResBlock(in_channels, out_channels, bias=bias,
                        img_channels=img_channels, decode_upscale=decode_upscale,
                        key=ks[i])
            for i in range(nb)
        ]

    def __call__(self, x, physics=None, y=None, img_channels=None, scale=0):
        for blk in self.enc:
            x = blk(x, physics=physics, y=y, img_channels=img_channels, scale=scale)
        return x


class InHead(Module):
    """Per-channel-count input convs (reference ram.py:823)."""

    def __init__(self, in_channels_list, out_channels, bias=False,
                 input_layer=False, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = jax.random.split(key, len(in_channels_list))
        self.in_channels_list = list(in_channels_list)
        self.input_layer = input_layer
        self.convs = [
            Conv2d(cin, out_channels, 3, 1, 1, bias=bias, key=ks[i])
            for i, cin in enumerate(self.in_channels_list)
        ]

    def __call__(self, x):
        cin = x.shape[1] - 1 if self.input_layer else x.shape[1]
        return self.convs[self.in_channels_list.index(cin)](x)


class OutTail(Module):
    """Per-channel-count output convs (reference ram.py:867)."""

    def __init__(self, in_channels, out_channels_list, bias=False, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = jax.random.split(key, len(out_channels_list))
        self.out_channels_list = list(out_channels_list)
        self.convs = [
            Conv2d(in_channels, cout, 3, 1, 1, bias=bias, key=ks[i])
            for i, cout in enumerate(self.out_channels_list)
        ]

    def __call__(self, x, out_channels):
        return self.convs[self.out_channels_list.index(out_channels)](x)


class RAM(Reconstructor, Denoiser):
    """Reconstruct Anything Model (reference ram.py:20).

    :param in_channels: channel counts served by the separate heads.
    :param nc: UNet widths per scale (reference hardcodes (64,128,256,512)).
    :param nb: ResBlocks per encoder stage (reference: 4).
    :param pretrained: path to the reference ``ram.pth.tar`` checkpoint
        (torch state dict; ported leaf-for-leaf).
    """

    def __init__(self, in_channels: Sequence[int] = (1, 2, 3),
                 nc=(64, 128, 256, 512), nb: int = 4,
                 pretrained=None, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 16))
        nc = tuple(nc)
        in_channels = list(in_channels)
        self.in_channels = in_channels
        self.separate_head = True
        self.nb = nb
        self.fact_realign = jnp.ones((1,))

        self.m_head = InHead([ch + 2 for ch in in_channels], nc[0], key=next(ks))

        def enc(c, upscale):
            return BaseEncBlock(c, c, nb=nb, img_channels=in_channels,
                                decode_upscale=upscale, key=next(ks))

        self.m_down1 = enc(nc[0], 1)
        self.m_down2 = enc(nc[1], 2)
        self.m_down3 = enc(nc[2], 4)
        self.m_body = enc(nc[3], 8)
        self.m_up3 = enc(nc[2], 4)
        self.m_up2 = enc(nc[1], 2)
        self.m_up1 = enc(nc[0], 1)

        self.pool1 = Conv2d(nc[0], nc[1], 2, 2, 0, bias=False, key=next(ks))
        self.pool2 = Conv2d(nc[1], nc[2], 2, 2, 0, bias=False, key=next(ks))
        self.pool3 = Conv2d(nc[2], nc[3], 2, 2, 0, bias=False, key=next(ks))
        self.up3 = ConvTranspose2d(nc[3], nc[2], 2, 2, 0, bias=False, key=next(ks))
        self.up2 = ConvTranspose2d(nc[2], nc[1], 2, 2, 0, bias=False, key=next(ks))
        self.up1 = ConvTranspose2d(nc[1], nc[0], 2, 2, 0, bias=False, key=next(ks))

        self.m_tail = OutTail(nc[0], in_channels, key=next(ks))

        self.sigma_threshold = 5e-3
        self.gain_threshold = 1e-4

        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_ram

            ported = port_ram(self, load_torch_checkpoint(pretrained))
            self.__dict__.update(ported.__dict__)

    # -- conditioning helpers (reference ram.py:139-233) --------------------
    def constant2map(self, value, x):
        """Broadcast a scalar / per-sample value into a ``(B, 1, H, W)``
        conditioning map (reference ram.py:139)."""
        v = jnp.asarray(0.0 if value is None else value, x.dtype).reshape(-1)
        v = jnp.broadcast_to(v[: x.shape[0]] if v.shape[0] > 1 else v,
                             (x.shape[0],))
        return jnp.broadcast_to(v[:, None, None, None],
                                (x.shape[0], 1) + x.shape[-2:])

    def base_conditioning(self, x, sigma, gain):
        nmap = handle_sigma(0.0 if sigma is None else sigma, x)
        gmap = handle_sigma(0.0 if gain is None else gain, x)
        return jnp.concatenate([x, nmap, gmap], axis=1)

    def realign_input(self, x, physics, y, sigma):
        f = getattr(physics, "factor", 1.0)
        y0 = y[0] if isinstance(y, TensorList) else y
        num = jnp.mean(jnp.abs(y0.reshape(y0.shape[0], -1)), axis=1)
        s = jnp.asarray(0.0 if sigma is None else sigma)
        if s.ndim == 4:
            snr = num / (jnp.amax(s, axis=(1, 2, 3)) + 1e-4)
        else:
            snr = num / (s + 1e-4)
        gamma = 1.0 / (1e-4 + 1.0 / (snr * f**2))
        gamma = gamma.reshape((x.shape[0],) + (1,) * (x.ndim - 1)) * self.fact_realign
        gamma = jnp.maximum(gamma, 1e-8)
        return physics.prox_l2(x, y, gamma=gamma)

    def forward_unet(self, x0, sigma=None, gain=None, physics=None, y=None):
        img_channels = x0.shape[1]
        physics = LinearPhysicsMultiScaler(physics, x0.shape[-3:])

        y_list = [
            krylov_embeddings(physics.downsample(x0, scale=s), physics, 2**s,
                              scale=s, N=2)
            for s in range(4)
        ]

        if self.separate_head and img_channels not in self.in_channels:
            raise ValueError(
                f"Input image has {img_channels} channels, but the network only "
                f"has heads for {self.in_channels} channels.")

        if y is not None:
            x0 = self.realign_input(x0, physics, y, sigma)

        x0 = self.base_conditioning(x0, sigma, gain)

        x1 = self.m_head(x0)
        x1_ = self.m_down1(x1, physics, y_list[0], img_channels, 0)
        x2 = self.pool1(x1_)
        x3_ = self.m_down2(x2, physics, y_list[1], img_channels, 1)
        x3 = self.pool2(x3_)
        x4_ = self.m_down3(x3, physics, y_list[2], img_channels, 2)
        x4 = self.pool3(x4_)
        x = self.m_body(x4, physics, y_list[3], img_channels, 3)
        x = self.up3(x + x4)
        x = self.m_up3(x, physics, y_list[2], img_channels, 2)
        x = self.up2(x + x3)
        x = self.m_up2(x, physics, y_list[1], img_channels, 1)
        x = self.up1(x + x2)
        x = self.m_up1(x, physics, y_list[0], img_channels, 0)
        return self.m_tail(x + x1, img_channels)

    def get_pad(self, img_size):
        """Pad amounts to reach the UNet's modulo-16 / min-64 input grid
        (reference ram.py:317)."""
        spatial_pad = 2**4
        pad = (0, -img_size[-2] % spatial_pad, -img_size[-1] % spatial_pad)
        min_size = 64
        if img_size[-2] + pad[1] < min_size:
            pad = (pad[0], min_size - img_size[-2], pad[2])
        if img_size[-1] + pad[2] < min_size:
            pad = (pad[0], pad[1], min_size - img_size[-1])
        return pad

    def obtain_sigma_gain(self, physics, sigma, gain, rescale_val):
        """Resolve sigma/gain from explicit args or the physics' noise model
        (reference ram.py:468)."""
        nm = getattr(physics, "noise_model", None)
        if sigma is None:
            if nm is not None and getattr(nm, "sigma", None) is not None:
                sigma = nm.sigma / rescale_val
            else:
                sigma = self.sigma_threshold * jnp.ones_like(rescale_val)
        else:
            s = jnp.asarray(sigma)
            if s.ndim == 4:
                sigma = s / rescale_val.reshape(-1, 1, 1, 1)
            else:
                sigma = s / rescale_val
        if gain is None:
            if nm is not None and getattr(nm, "gain", None) is not None:
                gain = nm.gain / rescale_val
            else:
                gain = self.gain_threshold * jnp.ones_like(rescale_val)
        else:
            g = jnp.asarray(gain)
            if g.ndim == 4:
                gain = g / rescale_val.reshape(-1, 1, 1, 1)
            else:
                gain = g / rescale_val
        return jnp.asarray(sigma), jnp.asarray(gain)

    # -- entry point (reference ram.py:339) ----------------------------------
    def __call__(self, y, physics=None, sigma=None, gain=None, img_size=None,
                 **kwargs):
        if physics is None and sigma is None and gain is None:
            raise ValueError(
                "Either physics, sigma or gain must be provided to the RAM model.")

        y0 = y[0] if isinstance(y, TensorList) else y
        B = y0.shape[0]
        max_val = jnp.amax(jnp.abs(y0.reshape(B, -1)), axis=1)
        max_val = jnp.where(max_val == 0, 1e-12, max_val)
        rescale_val = jnp.where(max_val > 5 * self.sigma_threshold, 1.0, max_val)

        if isinstance(y, TensorList):
            y = TensorList([
                yi / rescale_val.reshape((B,) + (1,) * (yi.ndim - 1)) for yi in y
            ])
        else:
            y = y / rescale_val.reshape((B,) + (1,) * (y.ndim - 1))

        if physics is None:
            from ..physics import Denoising, ZeroNoise

            physics = Denoising(noise_model=ZeroNoise())

        if img_size is None:
            for attr in ("img_shape", "img_size", "imsize"):
                v = getattr(physics, attr, None)
                if v is not None:
                    img_size = v
                    break
            if img_size is None:
                img_size = physics.A_adjoint(y).shape[1:]

        pad = self.get_pad(img_size)

        sigma, gain = self.obtain_sigma_gain(physics, sigma, gain, rescale_val)

        use_pad = any(p != 0 for p in pad)
        if use_pad:
            physics = PhysicsCropper(physics, pad)

        x_in = physics.A_adjoint(y)

        sigma = jnp.maximum(sigma, self.sigma_threshold)
        if sigma.ndim == 4:
            # QUIRK kept for checkpoint parity: the reference pads the noise
            # map with F.pad(sigma, (pad[1], 0, pad[0], 0)) (ram.py:431),
            # i.e. pad[0] (the channel pad, always 0) lands on the H axis
            # and pad[1] (the H pad) on the W axis — so 4D per-pixel maps
            # are padded on the wrong spatial axes whenever H % 16 != 0.
            # Replicated bug-for-bug so published RAM weights reproduce the
            # reference exactly; worth reporting upstream.
            sigma = jnp.pad(sigma, ((0, 0), (0, 0), (pad[0], 0), (pad[1], 0)),
                            constant_values=self.sigma_threshold)

        gain = jnp.maximum(gain, self.gain_threshold)
        if gain.ndim == 4:
            gain = jnp.pad(gain, ((0, 0), (0, 0), (pad[0], 0), (pad[1], 0)),
                           constant_values=self.gain_threshold)

        out = self.forward_unet(x_in, sigma=sigma, gain=gain, physics=physics, y=y)

        if use_pad:
            out = physics.remove_pad(out)

        return out * rescale_val.reshape((B,) + (1,) * (out.ndim - 1))

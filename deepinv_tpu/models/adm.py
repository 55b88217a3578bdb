"""Faithful guided-diffusion (ADM) UNet (reference deepinv/models/diffunet.py
DiffUNet:16 — the ILVR/DiffPIR architecture of Dhariwal & Nichol).

Unlike ``models.diffunet.DiffUNet`` (a compact TPU-friendly re-design), this
class reproduces the reference network bit-for-bit: parameters are stored in
a flat dict keyed by the torch ``state_dict`` names, so the published
pretrained checkpoints (``diffusion_ffhq_10m.pt``, ``diffusion_openai.pt``)
load directly via :meth:`load_torch_state_dict` with no name mapping.
Verified against the reference to float precision in
``tests/test_weight_porting.py``.

Architecture (reference diffunet.py:59-266): conv stem; per-level residual
blocks with scale-shift GroupNorm(32) time conditioning; BigGAN-style
up/down residual blocks; multi-head attention (64 channels/head) at the
configured resolutions; learned-variance 2C output head. Inference-mode
(dropout inactive), which matches the reference's pretrained usage.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module
from ..core.rng import ensure_key
from .base import Denoiser

__all__ = ["ADMUNet"]


# ---------------------------------------------------------------------------
# functional pieces (all shapes NCHW, params = dict of torch-named arrays)
# ---------------------------------------------------------------------------


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _group_norm(x, w, b, groups: int = 32, eps: float = 1e-5):
    """GroupNorm over channel dim of (B, C, *spatial) (torch GroupNorm)."""
    B, C = x.shape[:2]
    spatial = x.shape[2:]
    xg = x.reshape(B, groups, C // groups, *spatial)
    axes = tuple(range(2, xg.ndim))
    mu = xg.mean(axes, keepdims=True)
    var = xg.var(axes, keepdims=True)
    xg = (xg - mu) / jnp.sqrt(var + eps)
    x = xg.reshape(B, C, *spatial)
    shape = (1, C) + (1,) * len(spatial)
    return x * w.reshape(shape) + b.reshape(shape)


def _conv2d(x, w, b, stride: int = 1, padding: int = 1):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b.reshape(1, -1, 1, 1)


def _linear(x, w, b):
    return x @ w.T + b


def _avg_pool2(x):
    B, C, H, W = x.shape
    return x.reshape(B, C, H // 2, 2, W // 2, 2).mean((3, 5))


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)


def _timestep_embedding(t, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ADMUNet(Denoiser):
    r"""Guided-diffusion UNet, bit-faithful to the reference ``DiffUNet``
    (diffunet.py:16). ``large_model=False``: 128 base channels, 1 res block
    per level, attention at 16x16 (the FFHQ checkpoint);
    ``large_model=True``: 256 channels, 2 blocks, attention at 8/16/32 (the
    ImageNet checkpoint).

    Two forward modes (reference diffunet.py:291):

    - ``model(x, t, type_t='timestep')``: predict the noise map (+ learned
      variance channels) at integer timestep ``t``.
    - ``model(x, sigma, type_t='noise_level')``: denoise an image in [0, 1]
      with noise level sigma (timestep looked up internally).
    """

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        large_model: bool = False,
        pretrained: str = None,
        key=None,
    ):
        if large_model:
            mc, nrb, attn_res = 256, 2, (8, 16, 32)
        else:
            mc, nrb, attn_res = 128, 1, (16,)
        self.model_channels = mc
        self.num_res_blocks = nrb
        self.attn_ds = tuple(256 // r for r in attn_res)
        self.channel_mult = (1, 1, 2, 2, 4, 4)
        self.in_channels = in_channels
        self.out_channels = 6 if out_channels == 3 else out_channels
        self._image_channels = out_channels
        self.num_head_channels = 64

        # static architecture plan + parameter shapes (torch names)
        self._plan = self._build_plan()
        key = ensure_key(key, 0)
        self.p = self._init_params(key)

        # denoising-mode alpha tables (reference get_alpha_prod, :448)
        betas = np.linspace(0.1 / 1000, 20 / 1000, 1000, dtype=np.float32)
        ac = np.cumprod(1.0 - betas)
        self.sqrt_alphas_cumprod = jnp.asarray(np.sqrt(ac))
        self.sqrt_1m_alphas_cumprod = jnp.asarray(np.sqrt(1 - ac))

        if pretrained is not None:
            from .convert import load_torch_checkpoint

            self.load_torch_state_dict(load_torch_checkpoint(pretrained))

    # -- architecture plan ---------------------------------------------------
    def _build_plan(self):
        mc, nrb, cm = self.model_channels, self.num_res_blocks, self.channel_mult
        attn_ds = set(self.attn_ds)
        inp, out = [], []
        ch = mc * cm[0]
        inp.append([("conv", self.in_channels, ch)])
        chans = [ch]
        ds = 1
        for level, mult in enumerate(cm):
            for _ in range(nrb):
                layers = [("res", ch, mult * mc)]
                ch = mult * mc
                if ds in attn_ds:
                    layers.append(("attn", ch, ch))
                inp.append(layers)
                chans.append(ch)
            if level != len(cm) - 1:
                inp.append([("res_down", ch, ch)])
                chans.append(ch)
                ds *= 2
        mid = [("res", ch, ch), ("attn", ch, ch), ("res", ch, ch)]
        for level, mult in reversed(list(enumerate(cm))):
            for i in range(nrb + 1):
                ich = chans.pop()
                layers = [("res", ch + ich, mc * mult)]
                ch = mc * mult
                if ds in attn_ds:
                    layers.append(("attn", ch, ch))
                if level and i == nrb:
                    layers.append(("res_up", ch, ch))
                    ds //= 2
                out.append(layers)
        return {"input": inp, "middle": mid, "output": out, "out_ch": ch}

    def _param_shapes(self):
        mc = self.model_channels
        emb = 4 * mc
        shapes = {
            "time_embed.0.weight": (emb, mc), "time_embed.0.bias": (emb,),
            "time_embed.2.weight": (emb, emb), "time_embed.2.bias": (emb,),
        }

        def res(prefix, cin, cout):
            shapes[f"{prefix}.in_layers.0.weight"] = (cin,)
            shapes[f"{prefix}.in_layers.0.bias"] = (cin,)
            shapes[f"{prefix}.in_layers.2.weight"] = (cout, cin, 3, 3)
            shapes[f"{prefix}.in_layers.2.bias"] = (cout,)
            shapes[f"{prefix}.emb_layers.1.weight"] = (2 * cout, emb)
            shapes[f"{prefix}.emb_layers.1.bias"] = (2 * cout,)
            shapes[f"{prefix}.out_layers.0.weight"] = (cout,)
            shapes[f"{prefix}.out_layers.0.bias"] = (cout,)
            shapes[f"{prefix}.out_layers.3.weight"] = (cout, cout, 3, 3)
            shapes[f"{prefix}.out_layers.3.bias"] = (cout,)
            if cin != cout:
                shapes[f"{prefix}.skip_connection.weight"] = (cout, cin, 1, 1)
                shapes[f"{prefix}.skip_connection.bias"] = (cout,)

        def attn(prefix, ch):
            shapes[f"{prefix}.norm.weight"] = (ch,)
            shapes[f"{prefix}.norm.bias"] = (ch,)
            shapes[f"{prefix}.qkv.weight"] = (3 * ch, ch, 1)
            shapes[f"{prefix}.qkv.bias"] = (3 * ch,)
            shapes[f"{prefix}.proj_out.weight"] = (ch, ch, 1)
            shapes[f"{prefix}.proj_out.bias"] = (ch,)

        def seq(blocks, base):
            for i, layers in enumerate(blocks):
                for j, (kind, cin, cout) in enumerate(layers):
                    prefix = f"{base}.{i}.{j}"
                    if kind == "conv":
                        shapes[f"{prefix}.weight"] = (cout, cin, 3, 3)
                        shapes[f"{prefix}.bias"] = (cout,)
                    elif kind == "attn":
                        attn(prefix, cin)
                    else:
                        res(prefix, cin, cout)

        seq(self._plan["input"], "input_blocks")
        for j, (kind, cin, cout) in enumerate(self._plan["middle"]):
            if kind == "attn":
                attn(f"middle_block.{j}", cin)
            else:
                res(f"middle_block.{j}", cin, cout)
        seq(self._plan["output"], "output_blocks")
        ch = self._plan["out_ch"]
        shapes["out.0.weight"] = (ch,)
        shapes["out.0.bias"] = (ch,)
        shapes["out.2.weight"] = (self.out_channels, ch, 3, 3)
        shapes["out.2.bias"] = (self.out_channels,)
        return shapes

    def _init_params(self, key):
        p = {}
        for name, shape in self._param_shapes().items():
            key, k = jax.random.split(key)
            if name.endswith("bias") or len(shape) == 1:
                p[name] = jnp.zeros(shape, jnp.float32)
            elif "out_layers.3" in name or "proj_out" in name or name == "out.2.weight":
                p[name] = jnp.zeros(shape, jnp.float32)  # zero_module
            else:
                fan_in = int(np.prod(shape[1:]))
                p[name] = jax.random.normal(k, shape) / np.sqrt(max(fan_in, 1))
        # GroupNorm scales start at 1
        for name in p:
            if (".0.weight" in name and len(p[name].shape) == 1) or name.endswith(
                "norm.weight"
            ):
                p[name] = jnp.ones_like(p[name])
        return p

    def load_torch_state_dict(self, sd):
        """Load a reference/guided-diffusion checkpoint (names match 1:1)."""
        for name in self.p:
            if name not in sd:
                raise KeyError(f"checkpoint is missing parameter {name}")
            arr = jnp.asarray(np.asarray(sd[name]), jnp.float32)
            if arr.shape != self.p[name].shape:
                raise ValueError(
                    f"{name}: checkpoint shape {arr.shape} != {self.p[name].shape}"
                )
            self.p[name] = arr
        return self

    # -- forward blocks ------------------------------------------------------
    def _res(self, x, emb, prefix, cin, cout, mode=None):
        p = self.p
        h = _silu(_group_norm(x, p[f"{prefix}.in_layers.0.weight"],
                              p[f"{prefix}.in_layers.0.bias"]))
        if mode == "down":
            h, x = _avg_pool2(h), _avg_pool2(x)
        elif mode == "up":
            h, x = _upsample2(h), _upsample2(x)
        h = _conv2d(h, p[f"{prefix}.in_layers.2.weight"],
                    p[f"{prefix}.in_layers.2.bias"])
        e = _linear(_silu(emb), p[f"{prefix}.emb_layers.1.weight"],
                    p[f"{prefix}.emb_layers.1.bias"])
        scale, shift = jnp.split(e[:, :, None, None], 2, axis=1)
        h = _group_norm(h, p[f"{prefix}.out_layers.0.weight"],
                        p[f"{prefix}.out_layers.0.bias"]) * (1 + scale) + shift
        h = _conv2d(_silu(h), p[f"{prefix}.out_layers.3.weight"],
                    p[f"{prefix}.out_layers.3.bias"])
        if cin != cout:
            x = _conv2d(x, p[f"{prefix}.skip_connection.weight"],
                        p[f"{prefix}.skip_connection.bias"], padding=0)
        return x + h

    def _attn(self, x, prefix):
        p = self.p
        B, C, H, W = x.shape
        nh = C // self.num_head_channels
        d = self.num_head_channels
        xf = x.reshape(B, C, H * W)
        y = _group_norm(xf, p[f"{prefix}.norm.weight"], p[f"{prefix}.norm.bias"])
        qkv = jnp.einsum("oc,bct->bot", p[f"{prefix}.qkv.weight"][:, :, 0], y)
        qkv = qkv + p[f"{prefix}.qkv.bias"][None, :, None]
        qkv = qkv.reshape(B * nh, 3 * d, H * W)
        q, k, v = jnp.split(qkv, 3, axis=1)
        w = jax.nn.softmax(jnp.einsum("bct,bcs->bts", q, k) / math.sqrt(d), axis=-1)
        a = jnp.einsum("bts,bcs->bct", w, v).reshape(B, C, H * W)
        h = jnp.einsum("oc,bct->bot", p[f"{prefix}.proj_out.weight"][:, :, 0], a)
        h = h + p[f"{prefix}.proj_out.bias"][None, :, None]
        return (xf + h).reshape(B, C, H, W)

    def _apply_layers(self, h, emb, layers, base, i):
        for j, (kind, cin, cout) in enumerate(layers):
            prefix = f"{base}.{i}.{j}"
            if kind == "conv":
                h = _conv2d(h, self.p[f"{prefix}.weight"], self.p[f"{prefix}.bias"])
            elif kind == "attn":
                h = self._attn(h, prefix)
            elif kind == "res":
                h = self._res(h, emb, prefix, cin, cout)
            elif kind == "res_down":
                h = self._res(h, emb, prefix, cin, cout, mode="down")
            elif kind == "res_up":
                h = self._res(h, emb, prefix, cin, cout, mode="up")
        return h

    def forward_diffusion(self, x, timesteps):
        """Noise (+ learned variance) prediction at integer timesteps
        (reference diffunet.py:408). x in [-1, 1], sides divisible by 32."""
        t = jnp.atleast_1d(jnp.asarray(timesteps))
        t = jnp.broadcast_to(t, (x.shape[0],))
        emb = _timestep_embedding(t, self.model_channels)
        emb = _linear(emb, self.p["time_embed.0.weight"], self.p["time_embed.0.bias"])
        emb = _linear(_silu(emb), self.p["time_embed.2.weight"],
                      self.p["time_embed.2.bias"])

        hs = []
        h = x
        for i, layers in enumerate(self._plan["input"]):
            h = self._apply_layers(h, emb, layers, "input_blocks", i)
            hs.append(h)
        for j, (kind, cin, cout) in enumerate(self._plan["middle"]):
            prefix = f"middle_block.{j}"
            h = self._attn(h, prefix) if kind == "attn" else self._res(
                h, emb, prefix, cin, cout)
        for i, layers in enumerate(self._plan["output"]):
            h = jnp.concatenate([h, hs.pop()], axis=1)
            h = self._apply_layers(h, emb, layers, "output_blocks", i)
        h = _silu(_group_norm(h, self.p["out.0.weight"], self.p["out.0.bias"]))
        return _conv2d(h, self.p["out.2.weight"], self.p["out.2.bias"])

    def forward_denoise(self, x, sigma):
        """Denoise x in [0, 1] at noise level sigma (diffunet.py:485)."""
        s = jnp.broadcast_to(jnp.asarray(sigma, x.dtype).reshape(-1), (x.shape[0],))
        sigma = s.reshape(-1, 1, 1, 1)
        alpha = 1.0 / (1.0 + 4.0 * sigma**2)
        x = jnp.sqrt(alpha) * (2 * x - 1)
        sigma = sigma * jnp.sqrt(alpha)
        s = sigma.reshape(x.shape[0])  # rescaled per-sample noise level
        t = jnp.argmin(
            jnp.abs(self.sqrt_1m_alphas_cumprod[:, None] - 2 * s[None, :]), axis=0
        )
        out = self.forward_diffusion(x, t)
        noise_est = out[:, : self._image_channels]
        denom = self.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        denoised = jnp.clip((x - noise_est * sigma * 2) / denom, -1.0, 1.0)
        return (denoised + 1) / 2

    def forward_unet(self, x, sigma, class_labels=None, augment_labels=None):
        """Raw UNet application with the noise level as the conditioning
        input (reference guided_diffusion.py:257 ``forward_unet``): the
        conditioning scalar is positionally embedded and drives the
        scale-shift residual blocks. Class/augment labels are accepted for
        signature parity; this unconditional checkpoint family has no label
        embedding table."""
        return self.forward_diffusion(x, jnp.asarray(sigma).reshape(-1))

    def __call__(self, x, sigma, type_t: str = "noise_level", **kwargs):
        # circular-pad sides up to a multiple of 32 (reference diffunet.py:381)
        ph = (-x.shape[-2]) % 32
        pw = (-x.shape[-1]) % 32
        if ph or pw:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(ph, 0), (pw, 0)],
                        mode="wrap")
        if type_t == "timestep":
            out = self.forward_diffusion(x, sigma)
        else:
            out = self.forward_denoise(x, sigma)
        return out[..., ph:, pw:]

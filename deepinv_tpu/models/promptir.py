"""PromptIR all-in-one restoration (reference deepinv/models/third_party/
promptir.py:386).

Restormer backbone with prompt-generation modules: learnable prompt
components are softmax-mixed by a global feature descriptor, resized, and
fused into the decoder features — the degradation-aware conditioning of
PromptIR, built from the Restormer blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser
from .layers import Conv2d, Linear
from .restormer import _TransformerBlock, _Down, _Up
from .utils import test_pad

__all__ = ["PromptIR"]


class _PromptGen(Module):
    """Prompt generation module (PromptIR PGM)."""

    def __init__(self, dim, n_prompts: int = 5, prompt_dim: int = 16, prompt_size: int = 8, key=None):
        k1, k2, k3 = jax.random.split(key if key is not None else jax.random.key(0), 3)
        self.prompts = (
            jax.random.normal(k1, (n_prompts, prompt_dim, prompt_size, prompt_size)) * 0.02
        )
        self.mixer = Linear(dim, n_prompts, key=k2)
        self.fuse = Conv2d(dim + prompt_dim, dim, 3, 1, 1, bias=False, key=k3)

    def __call__(self, x):
        B, C, H, W = x.shape
        desc = jnp.mean(x, axis=(2, 3))  # global descriptor
        w = jax.nn.softmax(self.mixer(desc), axis=-1)  # (B, n_prompts)
        p = jnp.einsum("bn,ndhw->bdhw", w, self.prompts)
        p = jax.image.resize(p, (B, p.shape[1], H, W), "bilinear")
        return self.fuse(jnp.concatenate([x, p], axis=1))


class PromptIR(Denoiser):
    """Compact PromptIR: 3-level Restormer encoder-decoder with prompt
    fusion at each decoder level."""

    def __init__(self, in_channels: int = 3, dim: int = 16, num_blocks=(1, 1, 2), heads=(1, 2, 4), key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 64))
        dims = [dim, dim * 2, dim * 4]
        self.embed = Conv2d(in_channels, dim, 3, 1, 1, bias=False, key=next(ks))
        self.enc = [
            [_TransformerBlock(dims[l], heads[l], 2.0, next(ks)) for _ in range(num_blocks[l])]
            for l in range(3)
        ]
        self.downs = [_Down(dims[l], next(ks)) for l in range(2)]
        self.ups = [_Up(dims[l + 1], next(ks)) for l in reversed(range(2))]
        self.prompts = [
            _PromptGen(dims[1], key=next(ks)),
            _PromptGen(dims[0], key=next(ks)),
        ]
        self.reduce = [
            Conv2d(dims[1] * 2, dims[1], 1, 1, 0, bias=False, key=next(ks)),
            Conv2d(dims[0] * 2, dims[0], 1, 1, 0, bias=False, key=next(ks)),
        ]
        self.dec = [
            [_TransformerBlock(dims[1], heads[1], 2.0, next(ks)) for _ in range(num_blocks[1])],
            [_TransformerBlock(dims[0], heads[0], 2.0, next(ks)) for _ in range(num_blocks[0])],
        ]
        self.out = Conv2d(dims[0], in_channels, 3, 1, 1, bias=False, key=next(ks))

    def _forward(self, x):
        h = self.embed(x)
        skips = []
        for l in range(2):
            for b in self.enc[l]:
                h = b(h)
            skips.append(h)
            h = self.downs[l](h)
        for b in self.enc[2]:
            h = b(h)
        for i in range(2):
            h = self.ups[i](h)
            h = self.reduce[i](jnp.concatenate([h, skips[1 - i]], axis=1))
            h = self.prompts[i](h)
            for b in self.dec[i]:
                h = b(h)
        return x + self.out(h)

    def __call__(self, x, sigma=None, **kwargs):
        H, W = x.shape[-2:]
        if H % 4 or W % 4:
            return test_pad(self._forward, x, modulo=4)
        return self._forward(x)

    def forward_promptir(self, y):
        """Raw PromptIR encoder-decoder forward — sides must be divisible by
        4 (reference third_party/promptir.py:319)."""
        if y.shape[-2] % 4 or y.shape[-1] % 4:
            raise ValueError(
                "Image spatial dim is not divisible by 4. Spatial dim : "
                f"({y.shape[-2]},{y.shape[-1]})")
        return self._forward(y)

    def load_pretrained(self, checkpoint_path: str):
        """Load a checkpoint saved from this module (reference
        third_party/promptir.py:288 loads the authors' ``promptir.ckpt``).
        This implementation is a compact PromptIR, not the authors' exact
        topology, so it loads pickled pytrees saved via
        :func:`deepinv_tpu.utils.io.save_model`; the authors' torch
        checkpoint does not map onto it and is rejected with guidance."""
        if checkpoint_path == "download":
            raise ValueError(
                "no network egress in this environment; pass a local path")
        if str(checkpoint_path).endswith((".ckpt", ".pth", ".pt")):
            raise NotImplementedError(
                "this compact PromptIR is not weight-compatible with the "
                "authors' torch checkpoint; use Restormer(pretrained=...) "
                "for a bit-faithful ported restoration transformer")
        import pickle

        import jax

        with open(checkpoint_path, "rb") as f:
            payload = pickle.load(f)
        loaded = payload["model"] if isinstance(payload, dict) else payload
        leaves = jax.tree_util.tree_leaves(loaded)
        _, treedef = jax.tree_util.tree_flatten(self)
        new = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(v) for v in leaves])
        self.__dict__.update(new.__dict__)
        return self

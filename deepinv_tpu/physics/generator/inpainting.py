"""Inpainting / measurement-splitting mask generators
(reference deepinv/physics/generator/inpainting.py, 652 LoC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..blur import _resolve_filter
from ...ops.conv import conv2d
from .base import PhysicsGenerator

__all__ = [
    "BernoulliSplittingMaskGenerator",
    "GaussianSplittingMaskGenerator",
    "MultiplicativeSplittingMaskGenerator",
    "Phase2PhaseSplittingMaskGenerator",
    "Artifact2ArtifactSplittingMaskGenerator",
]


class BernoulliSplittingMaskGenerator(PhysicsGenerator):
    """iid Bernoulli pixel mask (reference BernoulliSplittingMaskGenerator)."""

    def __init__(self, img_size, split_ratio: float = 0.9, pixelwise: bool = True, seed: int = 0):
        super().__init__(seed=seed)
        self.img_size = tuple(img_size)
        self.split_ratio = split_ratio
        self.pixelwise = pixelwise

    def sample(self, batch_size, key, input_mask=None, **kwargs):
        shape = (batch_size,) + self.img_size
        if self.pixelwise:
            sample_shape = (batch_size, 1) + self.img_size[1:]
        else:
            sample_shape = shape
        m = jax.random.bernoulli(key, self.split_ratio, sample_shape).astype(jnp.float32)
        m = jnp.broadcast_to(m, shape)
        if input_mask is not None:
            m = m * input_mask
        return {"mask": m}


class GaussianSplittingMaskGenerator(BernoulliSplittingMaskGenerator):
    """Smoothed (clustered) splitting mask (reference Gaussian splitting):
    Bernoulli mask blurred then thresholded to keep the split ratio."""

    def __init__(self, img_size, split_ratio: float = 0.9, std_scale: float = 2.0, seed: int = 0):
        super().__init__(img_size, split_ratio=split_ratio, seed=seed)
        self.std_scale = std_scale

    def sample(self, batch_size, key, input_mask=None, **kwargs):
        from ...ops.conv import gaussian_blur

        shape = (batch_size, 1) + self.img_size[1:]
        noise = jax.random.normal(key, shape)
        filt = gaussian_blur(sigma=self.std_scale)
        smooth = conv2d(noise, filt, padding="circular")
        q = jnp.quantile(
            smooth.reshape(batch_size, -1), 1 - self.split_ratio, axis=1
        ).reshape(batch_size, 1, 1, 1)
        m = (smooth > q).astype(jnp.float32)
        m = jnp.broadcast_to(m, (batch_size,) + self.img_size)
        if input_mask is not None:
            m = m * input_mask
        return {"mask": m}


class MultiplicativeSplittingMaskGenerator(PhysicsGenerator):
    """Splitting mask multiplied into an existing acceleration mask
    (reference MultiplicativeSplittingMaskGenerator)."""

    def __init__(self, base_generator, split_generator):
        super().__init__()
        self.base_generator = base_generator
        self.split_generator = split_generator

    def sample(self, batch_size, key, **kwargs):
        k1, k2 = jax.random.split(key)
        base = self.base_generator.sample(batch_size, k1, **kwargs)["mask"]
        split = self.split_generator.sample(batch_size, k2, input_mask=base, **kwargs)["mask"]
        return {"mask": split}


class Phase2PhaseSplittingMaskGenerator(PhysicsGenerator):
    """Odd/even time-frame splitting for dynamic data (reference
    Phase2PhaseSplittingMaskGenerator): mask shape (B, C, T, H, W)."""

    def __init__(self, img_size, seed: int = 0):
        super().__init__(seed=seed)
        self.img_size = tuple(img_size)  # (C, T, H, W)

    def sample(self, batch_size, key, **kwargs):
        C, T, H, W = self.img_size
        t = jnp.arange(T)
        even = (t % 2 == 0).astype(jnp.float32)
        mask = jnp.broadcast_to(even[None, None, :, None, None], (batch_size, C, T, H, W))
        return {"mask": mask}


class Artifact2ArtifactSplittingMaskGenerator(PhysicsGenerator):
    """Random time-chunk splitting (reference Artifact2Artifact)."""

    def __init__(self, img_size, split_size: int = 2, seed: int = 0):
        super().__init__(seed=seed)
        self.img_size = tuple(img_size)
        self.split_size = split_size

    def sample(self, batch_size, key, **kwargs):
        C, T, H, W = self.img_size
        n_chunks = max(T // self.split_size, 1)
        chunk_ids = jnp.repeat(jnp.arange(n_chunks), self.split_size)[:T]
        chosen = jax.random.randint(key, (batch_size,), 0, n_chunks)
        mask_t = (chunk_ids[None, :] == chosen[:, None]).astype(jnp.float32)
        mask = jnp.broadcast_to(
            mask_t[:, None, :, None, None], (batch_size, C, T, H, W)
        )
        return {"mask": mask}

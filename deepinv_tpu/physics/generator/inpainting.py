"""Inpainting / measurement-splitting mask generators
(reference deepinv/physics/generator/inpainting.py, 652 LoC).

Algorithms follow the reference exactly:

- ``BernoulliSplittingMaskGenerator`` (inpainting.py:12): iid uniform
  thresholding when no ``input_mask`` is given; when splitting an existing
  mask, *exactly* ``int(split_ratio * n_nonzero)`` of its nonzero entries are
  kept (random permutation), so SSDU-style splits have deterministic size.
- ``GaussianSplittingMaskGenerator`` (inpainting.py:334, SSDU algorithm of
  Yaman et al. 2020): ``ceil(n * (1 - split_ratio))`` points are drawn
  without replacement from a centered spatial Gaussian pdf (center block
  excluded and always kept) and *removed* from the input mask.
- ``MultiplicativeSplittingMaskGenerator`` (inpainting.py:237): multiplies
  the step-time ``input_mask`` with a mask drawn from ``split_generator``.
- ``Phase2Phase`` / ``Artifact2Artifact`` (inpainting.py:512,571): even-phase
  and random-time-chunk splitting of dynamic (C, T, H, W) data, with the
  reference's ``persist_prev`` re-draw protocol.

Generators run host-side (outside jit), so data-dependent counts and the
Artifact2Artifact ``prev_idx`` state are plain Python, like the reference.
"""

from __future__ import annotations

import math
from warnings import warn

import numpy as np
import jax
import jax.numpy as jnp

from .base import PhysicsGenerator

__all__ = [
    "BernoulliSplittingMaskGenerator",
    "GaussianSplittingMaskGenerator",
    "MultiplicativeSplittingMaskGenerator",
    "Phase2PhaseSplittingMaskGenerator",
    "Artifact2ArtifactSplittingMaskGenerator",
]


class BernoulliSplittingMaskGenerator(PhysicsGenerator):
    """Bernoulli splitting/inpainting masks (reference inpainting.py:12).

    Without ``input_mask``, draws iid Bernoulli(``split_ratio``) pixels;
    with ``input_mask``, keeps exactly ``int(split_ratio * n)`` of its ``n``
    nonzero entries.

    :param img_size: mask shape without batch dim, e.g. (C, H, W), (C, M)
        or (M,).
    :param split_ratio: ratio of entries to keep.
    :param pixelwise: mask all channels of a pixel together.
    :param random_split_ratio: resample ``split_ratio`` uniformly in
        [min_split_ratio, max_split_ratio] at each draw.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import BernoulliSplittingMaskGenerator
        >>> gen = BernoulliSplittingMaskGenerator((1, 3, 3), split_ratio=0.6)
        >>> gen.step(batch_size=2, key=jax.random.key(0))["mask"].shape
        (2, 1, 3, 3)
    """

    def __init__(self, img_size, split_ratio: float, pixelwise: bool = True,
                 random_split_ratio: bool = False, min_split_ratio: float = 0.0,
                 max_split_ratio: float = 1.0, seed: int = 0):
        super().__init__(seed=seed)
        self.img_size = tuple(img_size) if not np.isscalar(img_size) else (img_size,)
        self.split_ratio = split_ratio
        self.pixelwise = pixelwise
        self.random_split_ratio = random_split_ratio
        self.min_split_ratio = min_split_ratio
        self.max_split_ratio = max_split_ratio

    def sample(self, batch_size=1, key=None, input_mask=None, img_size=None,
               **kwargs):
        if input_mask is not None and img_size is not None:
            raise ValueError(
                "Only input_mask or img_size can be passed, but not both."
            )

        batched_input = False
        if input_mask is not None and np.ndim(input_mask) > len(self.img_size):
            if input_mask.shape[0] > 1:
                batch_size = input_mask.shape[0]
                batched_input = True
            else:
                input_mask = input_mask[0]

        if batch_size is not None:
            keys = jax.random.split(key, batch_size)
            outs = []
            for b in range(batch_size):
                inp = input_mask[b] if batched_input else input_mask
                outs.append(self.batch_sample(keys[b], input_mask=inp,
                                              img_size=img_size, **kwargs))
            mask = jnp.stack(outs)
        else:
            mask = self.batch_sample(key, input_mask=input_mask,
                                     img_size=img_size, **kwargs)
        return {"mask": mask}

    def batch_step(self, input_mask=None, img_size=None, key=None) -> dict:
        """One batch-free splitting mask (reference inpainting.py:181):
        like ``step(batch_size=1)`` but without the batch dimension."""
        im = input_mask[None] if input_mask is not None else None
        out = self.step(batch_size=1, key=key, input_mask=im,
                        img_size=img_size)
        return {k: (v[0] if hasattr(v, "ndim") and v.ndim > 0 else v)
                for k, v in out.items()}

    def check_pixelwise(self, input_mask=None) -> bool:
        """Reference inpainting.py:146 pixelwise feasibility checks."""
        pixelwise = self.pixelwise
        if pixelwise and len(self.img_size) == 2:
            warn(
                "Generating pixelwise mask assumes channel in first "
                "dimension. For 2D images ensure img_size is at least 3D."
            )
        elif pixelwise and len(self.img_size) == 1:
            warn("For 1D img_size, pixelwise must be False.")
            pixelwise = False

        if input_mask is not None and np.size(input_mask) > 1 and pixelwise:
            if np.ndim(input_mask) == 1:
                warn("input_mask is only 1D so pixelwise cannot be used.")
                return False
            elif np.ndim(input_mask) == 2 and np.ndim(input_mask) < len(self.img_size):
                return False
            elif isinstance(input_mask, jax.core.Tracer):
                # under jit the channel-equality check is value-dependent;
                # trust the caller (shape checks above still apply)
                pass
            elif not all(
                bool(jnp.array_equal(input_mask[i], input_mask[0]))
                for i in range(1, input_mask.shape[0])
            ):
                warn("To use pixelwise, all channels must be same.")
                return False
        return pixelwise

    def _draw_split_ratio(self, key):
        if self.random_split_ratio:
            u = jax.random.uniform(key)
            return self.min_split_ratio + u * (
                self.max_split_ratio - self.min_split_ratio
            )
        return self.split_ratio

    def batch_sample(self, key, input_mask=None, img_size=None):
        """One unbatched mask (reference inpainting.py:181 batch_step)."""
        pixelwise = self.check_pixelwise(input_mask)
        img_size = (
            self.img_size if img_size is None
            else self.img_size[:-2] + tuple(img_size)[-2:]
        )
        kr, ks = jax.random.split(key)
        split_ratio = self._draw_split_ratio(kr)

        if input_mask is not None and np.size(input_mask) > 1:
            input_mask = jnp.asarray(input_mask)
            src = input_mask[0] if pixelwise else input_mask
            if isinstance(input_mask, jax.core.Tracer) or isinstance(
                split_ratio, jax.core.Tracer
            ):
                # jit-safe exact-count subset of the nonzero support:
                # random scores ranked; keep the floor(ratio * nnz) best
                support = src != 0
                u = jax.random.uniform(ks, src.shape)
                n_keep = jnp.floor(
                    split_ratio * jnp.sum(support)
                ).astype(jnp.int32)
                scores = jnp.where(support, u, -jnp.inf).ravel()
                order = jnp.argsort(-scores)
                ranks = jnp.zeros_like(order).at[order].set(
                    jnp.arange(order.size)
                )
                mask = (ranks < n_keep).reshape(src.shape)
                mask = mask.astype(input_mask.dtype)
            else:
                idx = np.argwhere(np.asarray(src) != 0)
                perm = np.asarray(jax.random.permutation(ks, len(idx)))
                n_keep = int(float(split_ratio) * len(idx))
                keep = idx[perm[:n_keep]]
                mask = jnp.zeros(src.shape, input_mask.dtype)
                if len(keep):
                    mask = mask.at[tuple(keep.T)].set(1)
            if pixelwise:
                mask = jnp.stack([mask] * input_mask.shape[0])
        else:
            mask = jnp.ones(img_size, jnp.float32)
            aux = jax.random.uniform(ks, img_size)
            if not pixelwise:
                mask = jnp.where(aux > split_ratio, 0.0, mask)
            else:
                mask = jnp.where(aux[0][None] > split_ratio,
                                 jnp.zeros_like(mask), mask)
        return mask


class MultiplicativeSplittingMaskGenerator(BernoulliSplittingMaskGenerator):
    """Multiplicative splitting masks (reference inpainting.py:237): the
    step-time ``input_mask`` (an acceleration mask) is multiplied with a
    fresh mask from ``split_generator``; used by
    :class:`deepinv_tpu.loss.mri.WeightedSplittingLoss`.

    :param img_size: mask shape without batch dim.
    :param split_generator: mask generator producing the splitting masks.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import (
        ...     GaussianMaskGenerator, MultiplicativeSplittingMaskGenerator)
        >>> pg = GaussianMaskGenerator((1, 128, 128), acceleration=4)
        >>> orig = pg.step(batch_size=2, key=jax.random.key(0))["mask"]
        >>> sg = GaussianMaskGenerator((1, 128, 128), acceleration=2)
        >>> gen = MultiplicativeSplittingMaskGenerator((1, 128, 128), sg)
        >>> gen.step(2, key=jax.random.key(1), input_mask=orig)["mask"].shape
        (2, 1, 128, 128)
    """

    def __init__(self, img_size, split_generator, seed: int = 0):
        super().__init__(img_size, split_ratio=0.0, pixelwise=True, seed=seed)
        self.split_generator = split_generator

    def batch_sample(self, key, input_mask=None, img_size=None):
        if input_mask is not None and np.size(input_mask) > 1:
            mask = self.split_generator.step(
                batch_size=1, key=key, img_size=tuple(input_mask.shape[-2:])
            )["mask"][0]
            if input_mask.shape[-2:] != mask.shape[-2:]:
                raise ValueError(
                    "Input mask should be same shape as generated mask, but "
                    f"input has shape {input_mask.shape} and generated has "
                    f"shape {mask.shape}"
                )
            return mask * jnp.asarray(input_mask)
        return self.split_generator.step(batch_size=1, key=key,
                                         img_size=img_size)["mask"][0]


class GaussianSplittingMaskGenerator(BernoulliSplittingMaskGenerator):
    """Spatial-Gaussian splitting masks (reference inpainting.py:334, the
    SSDU masks of Yaman et al. 2020): removes ``ceil(n (1-split_ratio))``
    points drawn without replacement from a centered Gaussian pdf (with the
    autocalibration ``center_block`` always kept) from the input mask.
    Supports static (C, H, W) and dynamic (C, T, H, W) masks.

    :param std_scale: Gaussian std is ``(H/std_scale, W/std_scale)`` pixels.
    :param center_block: always-kept central block (int or (h, w)).
    """

    def __init__(self, img_size, split_ratio: float, pixelwise: bool = True,
                 std_scale: float = 4.0, center_block=(8, 8), seed: int = 0):
        super().__init__(img_size, split_ratio=split_ratio,
                         pixelwise=pixelwise, seed=seed)
        if len(self.img_size) < 3:
            raise ValueError(
                "img_size should be at least of shape (C, H, W). Gaussian "
                "splitting mask does not support signals of shape (C, M)."
            )
        self.std_scale = std_scale
        self.center_block = (
            (center_block, center_block) if isinstance(center_block, int)
            else tuple(center_block)
        )

    def get_pdf(self, shape):
        """Centered anisotropic Gaussian (reference inpainting.py:404)."""
        nx, ny = shape
        x, y = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), indexing="ij")
        return jnp.exp(
            -((x - nx // 2) ** 2 / (2 * (nx / self.std_scale) ** 2)
              + (y - ny // 2) ** 2 / (2 * (ny / self.std_scale) ** 2))
        )

    def batch_sample(self, key, input_mask=None, img_size=None):
        pixelwise = self.check_pixelwise()
        _T = self.img_size[1] if len(self.img_size) > 3 else 1
        _C = self.img_size[0] if not pixelwise else 1

        if input_mask is None or np.size(input_mask) <= 1:
            img_size = img_size if img_size is not None else self.img_size
            input_mask = jnp.ones((_C, _T) + tuple(img_size[-2:]))

        input_mask = jnp.asarray(input_mask, jnp.float32)
        if input_mask.ndim < len(self.img_size):
            no_channel_dim = True
            input_mask = input_mask[None]
            _C = 1
        else:
            no_channel_dim = False
        if input_mask.ndim == 3:
            input_mask = input_mask[:, None]
        if pixelwise:
            input_mask = input_mask[:1]

        nx, ny = input_mask.shape[-2:]
        cx, cy = nx // 2, ny // 2
        bh, bw = self.center_block
        prob = input_mask * self.get_pdf((nx, ny))
        prob = prob.at[..., cx - bh // 2: cx + bh // 2,
                       cy - bw // 2: cy + bw // 2].set(0)
        prob = prob / prob.sum(axis=(-2, -1), keepdims=True)

        removed = jnp.zeros_like(input_mask).reshape(*input_mask.shape[:-2], -1)
        keys = jax.random.split(key, _C * _T).reshape(_C, _T)
        for c in range(_C):
            for t in range(_T):
                n_remove = int(math.ceil(
                    float(input_mask[c, t].sum()) * (1 - self.split_ratio)
                ))
                p = prob[c, t].reshape(-1)
                # Gumbel top-k == weighted draw without replacement
                g = jax.random.gumbel(keys[c, t], (nx * ny,))
                scores = jnp.where(p > 0, jnp.log(p) + g, -jnp.inf)
                # never remove more than the removable (p > 0) support —
                # top_k past it returns -inf-scored (protected or already
                # zero) positions, and subtracting those produced -1
                # entries in the mask
                n_avail = int(np.count_nonzero(np.asarray(p) > 0))
                ind = jax.lax.top_k(scores, min(n_remove, n_avail))[1]
                removed = removed.at[c, t, ind].set(1)

        mask_out = input_mask - removed.reshape(input_mask.shape)
        if len(self.img_size) == 3:
            mask_out = mask_out[:, 0]
        if self.pixelwise and not no_channel_dim:
            mask_out = jnp.concatenate([mask_out] * self.img_size[0], axis=0)
        return mask_out


class Phase2PhaseSplittingMaskGenerator(BernoulliSplittingMaskGenerator):
    """Even-phase splitting of dynamic (C, T, H, W) data (reference
    inpainting.py:512); used by :class:`deepinv_tpu.loss.mri.Phase2PhaseLoss`."""

    def __init__(self, img_size, seed: int = 0):
        super().__init__(img_size, split_ratio=None, pixelwise=None, seed=seed)

    def batch_sample(self, key, input_mask=None, img_size=None):
        if len(self.img_size) != 4:
            raise ValueError("Default img_size must be of shape (C, T, H, W)")
        if input_mask is not None and np.size(input_mask) > 1 \
                and tuple(input_mask.shape) != self.img_size:
            raise ValueError("input_mask must be same shape as default img_size")
        if input_mask is None or np.size(input_mask) <= 1:
            img_size = (
                self.img_size if img_size is None
                else self.img_size[:-2] + tuple(img_size)[-2:]
            )
            input_mask = jnp.ones(img_size)
        input_mask = jnp.asarray(input_mask, jnp.float32)
        mask_out = jnp.zeros_like(input_mask)
        return mask_out.at[:, ::2].set(input_mask[:, ::2])


class Artifact2ArtifactSplittingMaskGenerator(Phase2PhaseSplittingMaskGenerator):
    """Random-time-chunk splitting of dynamic data (reference
    inpainting.py:571, Liu et al. RARE): keeps one ``split_size``-long chunk.
    ``persist_prev=True`` re-draws a chunk different from the previous one
    (used by :class:`deepinv_tpu.loss.mri.Artifact2ArtifactLoss` to compare
    an input chunk against a different output chunk).

    :param split_size: chunk length (must divide T), or a tuple to randomly
        choose from at each draw.
    """

    def __init__(self, img_size, split_size=2, seed: int = 0):
        super().__init__(img_size, seed=seed)
        self.split_size = split_size
        self.prev_idx = None
        self.prev_split_size = None

    def batch_sample(self, key, input_mask=None, img_size=None,
                     persist_prev: bool = False):
        # dimension checks via the Phase2Phase path (reference :623)
        super().batch_sample(key, input_mask=input_mask, img_size=None)

        if input_mask is None or np.size(input_mask) <= 1:
            img_size = (
                self.img_size if img_size is None
                else self.img_size[:-2] + tuple(img_size)[-2:]
            )
            input_mask = jnp.ones(img_size)
        input_mask = jnp.asarray(input_mask, jnp.float32)

        k1, k2 = jax.random.split(key)
        split_size = self.split_size
        if isinstance(self.split_size, (tuple, list)):
            if persist_prev:
                split_size = self.prev_split_size
            else:
                # the chunk *length* shapes the output: must stay concrete
                pick = int(jax.random.randint(k1, (), 0, len(self.split_size)))
                self.prev_split_size = split_size = self.split_size[pick]

        T = input_mask.shape[1]
        n_chunks = T // split_size
        if persist_prev and self.prev_idx is not None:
            # a chunk different from the previous draw; works with a traced
            # prev_idx too (both draws live in the same trace)
            idx = (
                self.prev_idx + 1 + jax.random.randint(k2, (), 0, n_chunks - 1)
            ) % n_chunks
        else:
            idx = jax.random.randint(k2, (), 0, n_chunks)
        self.prev_idx = idx

        # jit-safe chunk selection: one-hot over the frame axis
        sel = (jnp.arange(T) // split_size == idx).astype(input_mask.dtype)
        return input_mask * sel[None, :, None, None]

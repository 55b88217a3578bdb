"""Measurement-splitting losses (reference deepinv/loss/measplit.py, 519 LoC).

SplittingLoss: split measurements into disjoint input/target subsets with a
random mask each step — self-supervision without ground truth
(SSDU/Noise2Inverse). ``adapt_model`` wraps the model in a
:class:`SplittingModel` that masks the input during training and
Monte-Carlo-averages ``eval_n_samples`` splits at evaluation (reference
measplit.py:11 and the nested SplittingModel :212).

JAX design: the reference wrapper *stores* its drawn masks for the loss to
reuse (``model.get_masks()``); here the shared state is the PRNG key — the
loss calls the adapted model with its own key and recovers the identical
mask via ``return_mask=True``, so the whole train step stays pure and
jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from ..core.rng import ensure_key
from .base import Loss
from .metric import MSE

__all__ = ["SplittingLoss", "SplittingModel", "Neighbor2Neighbor"]


def _base_mask(physics):
    """The physics' own subsampling mask, or None."""
    m = getattr(physics, "mask", None)
    if m is None or isinstance(m, (int, float)):
        return None
    return m


def sample_split_mask(y, physics, key, split_ratio, pixelwise, mask_generator):
    """Draw one splitting mask, subsampled from the physics mask if present
    (reference measplit.py:163 'masks will be subsets of the physics mask')."""
    input_mask = _base_mask(physics)
    if mask_generator is not None:
        m = mask_generator.step(y.shape[0], key=key, input_mask=input_mask)["mask"]
        m = jnp.broadcast_to(m, y.shape).astype(y.dtype)
        if input_mask is not None:
            # idempotent for generators that already honor input_mask;
            # guarantees the split is a subset of the physics mask
            m = m * input_mask
        return m
    shape = list(y.shape)
    if pixelwise:
        shape[1] = 1
    m = jax.random.bernoulli(key, split_ratio, tuple(shape)).astype(y.dtype)
    m = jnp.broadcast_to(m, y.shape)
    if input_mask is not None:
        m = m * input_mask
    return m


def split(mask, y, physics=None):
    """``y1 = M y`` and ``A1 = M A`` (reference SplittingLoss.split,
    measplit.py:120): the split physics keeps the original noise model."""
    y1 = mask * y
    if physics is None:
        return y1
    base = _base_mask(physics)
    if base is not None:
        p1 = physics.update(mask=mask * base)
    else:
        from ..physics.inpainting import Inpainting
        from ..physics.base import compose

        # keep the FULL batched mask: mask[0] would apply sample 0's
        # splitting pattern to every batch element (reference
        # measplit.py:133 passes the batched mask)
        inp = Inpainting(img_size=y.shape[1:], mask=mask)
        p1 = compose(physics, inp)  # (inp ∘ physics): A1 = M A
        p1 = p1.replace(noise_model=getattr(physics, "noise_model", None)) \
            if hasattr(p1, "replace") else p1
    return y1, p1


class SplittingModel(Module):
    """Input-splitting model wrapper (reference measplit.py:212).

    During training one random split feeds the model; at evaluation the
    output is Monte-Carlo averaged over ``eval_n_samples`` splits
    (``eval_split_input``), optionally output-masked
    (``eval_split_output``), or the full measurement is used
    (``eval_split_input=False``).

    The ``train`` flag replaces the reference's ``.train()/.eval()`` module
    state; the Trainer passes it explicitly (``train_aware`` protocol).
    """

    train_aware = True  # Trainer passes key=/train= to the forward

    def __init__(self, model, split_ratio=0.9, mask_generator=None,
                 eval_n_samples=5, eval_split_input=True,
                 eval_split_output=False, pixelwise=True, noise_model=None):
        self.model = model
        self.split_ratio = split_ratio
        self.mask_generator = mask_generator
        self.eval_n_samples = eval_n_samples
        self.eval_split_input = eval_split_input
        self.eval_split_output = eval_split_output
        self.pixelwise = pixelwise
        # Robust-SSDU: further-noise the split input during training
        # (reference mri/measplit.py:299 RobustSplittingModel.split)
        self.noise_model = noise_model

    def _mask(self, y, physics, key):
        return sample_split_mask(
            y, physics, key, self.split_ratio, self.pixelwise,
            self.mask_generator,
        )

    def __call__(self, y, physics, key=None, train=False, return_mask=False):
        key = ensure_key(key, 21)
        if not train and not self.eval_split_input:
            out = self.model(y, physics)
            return (out, None) if return_mask else out
        n = 1 if train else max(self.eval_n_samples, 1)
        split_output = (not train) and self.eval_split_output
        out = 0.0
        m2_sum = 0.0
        mask0 = None
        for i in range(n):
            mask = self._mask(y, physics, jax.random.fold_in(key, i))
            if mask0 is None:
                mask0 = mask
            y1, p1 = split(mask, y, physics)
            if self.noise_model is not None and train:
                knoise = jax.random.fold_in(jax.random.fold_in(key, i), 7)
                y1 = mask * self.noise_model(y1, key=knoise)
            o = self.model(y1, p1)
            if split_output:
                base = _base_mask(physics)
                m2 = (base if base is not None else 1.0) - mask
                out = out + m2 * o
                m2_sum = m2_sum + m2
            else:
                out = out + o / n
        if split_output:
            out = out / jnp.clip(m2_sum, 1e-6, None)
        return (out, mask0) if return_mask else out


class SplittingLoss(Loss):
    r"""Measurement splitting (reference measplit.py:11).

    ``y1 = M y`` feeds the (adapted) model; the loss is evaluated on the
    complement ``M_2 = M_A - M``:
    ``loss = metric(M_2 A(xhat), M_2 y) / mean(M_2)``.

    :param split_ratio: fraction of measurements kept as input.
    :param mask_generator: optional PhysicsGenerator drawing the splitting
        masks (default iid Bernoulli).
    :param eval_n_samples: Monte-Carlo splits averaged at evaluation.
    :param eval_split_input: split the input at evaluation (SSDU sets
        False).
    :param eval_split_output: average only the output complement at eval.
    :param pixelwise: share the mask across channels.
    :param normalize_loss: divide by the complement mask density.

    :Examples:

        Self-supervised from measurements alone — ``adapt_model`` makes the
        model consume the masked input (reference measplit.py adapt_model):

        >>> import jax
        >>> from deepinv_tpu.loss import SplittingLoss
        >>> from deepinv_tpu.physics import Denoising, GaussianNoise
        >>> from deepinv_tpu.models import MedianFilter
        >>> physics = Denoising(noise_model=GaussianNoise(0.1))
        >>> x = jax.random.uniform(jax.random.key(0), (2, 1, 16, 16))
        >>> y = physics(x, key=jax.random.key(1))
        >>> loss = SplittingLoss(split_ratio=0.8, eval_n_samples=2)
        >>> model = loss.adapt_model(lambda yv, p, **kw: MedianFilter()(yv, 0.1))
        >>> x_net = model(y, physics, key=jax.random.key(2))  # eval: MC avg
        >>> l = loss(x_net=x_net, y=y, physics=physics, model=model,
        ...          key=jax.random.key(3))
        >>> l.shape
        (2,)
    """

    def __init__(self, metric=None, split_ratio: float = 0.9,
                 mask_generator=None, eval_n_samples: int = 5,
                 eval_split_input: bool = True, eval_split_output: bool = False,
                 pixelwise: bool = True, normalize_loss: bool = True):
        self.metric = metric if metric is not None else MSE()
        self.split_ratio = split_ratio
        self.mask_generator = mask_generator
        self.eval_n_samples = eval_n_samples
        self.eval_split_input = eval_split_input
        self.eval_split_output = eval_split_output
        self.pixelwise = pixelwise
        self.normalize_loss = normalize_loss

    # static helpers mirroring the reference surface
    split = staticmethod(split)

    def sample_mask(self, y, key, physics=None):
        return sample_split_mask(
            y, physics, key, self.split_ratio, self.pixelwise,
            self.mask_generator,
        )

    def __call__(self, x_net=None, y=None, physics=None, model=None, key=None, **kwargs):
        key = ensure_key(key, 12)
        if isinstance(model, SplittingModel):
            # same key -> same mask as the model's forward: the loss
            # complement is consistent with the input split
            x1, mask = model(y, physics, key=key, train=True, return_mask=True)
        else:
            mask = self.sample_mask(y, key, physics)
            y1, p1 = split(mask, y, physics)
            x1 = model(y1, p1)
        base = _base_mask(physics)
        mask2 = (base if base is not None else 1.0) - mask
        # evaluate through the USER metric (reference measplit.py:170:
        # metric(physics2.A(x_net), y2)); hardcoding squared error here
        # silently ignored a custom metric
        loss = self.metric(mask2 * physics.A(x1), mask2 * y)
        if self.normalize_loss:
            loss = loss / jnp.clip(jnp.mean(mask2), 1e-6, None)
        return loss

    def adapt_model(self, model):
        """Wrap the model in a :class:`SplittingModel` (input masking +
        eval-time MC averaging — reference measplit.py:176)."""
        if isinstance(model, SplittingModel):
            return model
        return SplittingModel(
            model,
            split_ratio=self.split_ratio,
            mask_generator=self.mask_generator,
            eval_n_samples=self.eval_n_samples,
            eval_split_input=self.eval_split_input,
            eval_split_output=self.eval_split_output,
            pixelwise=self.pixelwise,
        )


# reference exposes the wrapper as a nested class (measplit.py:212)
SplittingLoss.SplittingModel = SplittingModel


class Neighbor2Neighbor(Loss):
    r"""Neighbor2Neighbor loss (reference measplit.py, Huang et al. 2021):
    random neighbor subsampling pairs + consistency regularizer."""

    def __init__(self, metric=None, gamma: float = 2.0):
        self.metric = metric if metric is not None else MSE()
        self.gamma = gamma

    @staticmethod
    def space_to_depth(x, block_size: int):
        """(B, C, H, W) -> (B, C*b^2, H/b, W/b) (reference measplit.py:432,
        torch unfold ordering: channel-major over the b^2 offsets)."""
        B, C, H, W = x.shape
        b = block_size
        v = x.reshape(B, C, H // b, b, W // b, b)
        # unfold channel order: (C, bh, bw)
        v = jnp.transpose(v, (0, 1, 3, 5, 2, 4))
        return v.reshape(B, C * b * b, H // b, W // b)

    @staticmethod
    def generate_mask_pair(img, key=None):
        """Random neighboring-pixel mask pair over 2x2 cells (reference
        measplit.py:438): two flat boolean masks of length ``B*H/2*W/2*4``
        selecting one pixel each from every cell."""
        key = ensure_key(key, 21)
        B, C, H, W = img.shape
        ncell = B * (H // 2) * (W // 2)
        idx_pair = jnp.asarray(
            [[0, 1], [0, 2], [1, 3], [2, 3], [1, 0], [2, 0], [3, 1], [3, 2]],
            jnp.int32)
        rd = jax.random.randint(key, (ncell,), 0, 8)
        pair = idx_pair[rd] + (jnp.arange(ncell, dtype=jnp.int32) * 4)[:, None]
        mask1 = jnp.zeros((ncell * 4,), bool).at[pair[:, 0]].set(True)
        mask2 = jnp.zeros((ncell * 4,), bool).at[pair[:, 1]].set(True)
        return mask1, mask2

    @classmethod
    def generate_subimages(cls, img, mask):
        """Extract the masked pixel of each 2x2 cell (reference
        measplit.py:471): returns (B, C, H/2, W/2)."""
        B, C, H, W = img.shape
        outs = []
        for i in range(C):
            per = cls.space_to_depth(img[:, i : i + 1], 2)  # (B, 4, H/2, W/2)
            per = jnp.transpose(per, (0, 2, 3, 1)).reshape(-1)
            # mask selects exactly one of each cell's 4 entries
            sel = per.reshape(-1, 4)[mask.reshape(-1, 4)]
            outs.append(sel.reshape(B, H // 2, W // 2, 1).transpose(0, 3, 1, 2))
        return jnp.concatenate(outs, axis=1)

    @staticmethod
    def _subsample(y, choice, offset):
        """Pick one pixel of each 2x2 cell; ``choice`` in {0..3} per cell."""
        B, C, H, W = y.shape
        H2, W2 = H // 2, W // 2
        cells = y[:, :, : H2 * 2, : W2 * 2].reshape(B, C, H2, 2, W2, 2)
        cells = jnp.moveaxis(cells, 3, -2).reshape(B, C, H2, W2, 4)
        idx = (choice + offset) % 4
        return jnp.take_along_axis(cells, idx[..., None], axis=-1)[..., 0]

    def __call__(self, y=None, physics=None, model=None, x_net=None, key=None, **kwargs):
        key = ensure_key(key, 13)
        B, C, H, W = y.shape
        H2, W2 = H // 2, W // 2
        # draw ADJACENT neighbor pairs from the reference's idx_pair table
        # (measplit.py:438) — the old (choice+offset)%4 scheme produced
        # diagonal cell-mates the N2N noise-independence argument excludes
        idx_pair = jnp.asarray(
            [[0, 1], [0, 2], [1, 3], [2, 3], [1, 0], [2, 0], [3, 1], [3, 2]],
            jnp.int32)
        rd = jax.random.randint(key, (B, 1, H2, W2), 0, 8)
        pair = idx_pair[rd]  # (..., 2)
        c1, c2 = pair[..., 0], pair[..., 1]
        zero = jnp.zeros_like(c1)
        g1 = self._subsample(y, c1, zero)
        g2 = self._subsample(y, c2, zero)
        f_g1 = model(g1, physics)
        # consistency: denoise full image then subsample — detached like
        # the reference (measplit.py:511) so gradients only flow through
        # the subsampled branch
        f_y = jax.lax.stop_gradient(model(y, physics))
        f_y1 = self._subsample(f_y, c1, zero)
        f_y2 = self._subsample(f_y, c2, zero)
        l_rec = self.metric(f_g1, g2)
        l_reg = self.metric(f_g1 - f_y1, g2 - f_y2)
        return l_rec + self.gamma * l_reg

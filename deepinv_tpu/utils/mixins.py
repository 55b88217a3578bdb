"""Mixins: temporal flattening and 2D tiled processing
(reference deepinv/utils/mixins.py:19 TimeMixin, :290 TiledMixin2d;
tiling core at utils/_tiling.py, patch ops at utils/patch_extractor.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "TimeMixin",
    "TiledMixin2d",
    "tiled_apply",
    "image_to_patches",
    "patches_to_image",
    "patchify",
]


class TimeMixin:
    """Temporal helpers for (B, C, T, H, W) data (utils/mixins.py:19)."""

    @staticmethod
    def flatten(x):
        """(B, C, T, H, W) -> (B*T, C, H, W)."""
        B, C, T, H, W = x.shape
        return jnp.moveaxis(x, 2, 1).reshape(B * T, C, H, W)

    @staticmethod
    def unflatten(x, batch_size: int = 1):
        BT, C, H, W = x.shape
        T = BT // batch_size
        return jnp.moveaxis(x.reshape(batch_size, T, C, H, W), 1, 2)

    @staticmethod
    def flatten_C(x):
        """(B, C, T, H, W) -> (B, C*T, H, W)."""
        B, C, T, H, W = x.shape
        return x.reshape(B, C * T, H, W)

    @staticmethod
    def wrap_flatten_C(f):
        """Flatten time into channels, apply ``f``, unflatten back
        (utils/mixins.py:63)."""

        def wrapped(x, *args, **kwargs):
            B, C, T, H, W = x.shape
            out = f(TimeMixin.flatten_C(x), *args, **kwargs)
            return out.reshape(-1, C, T, H, W)

        return wrapped

    @staticmethod
    def average(x, mask=None, axis: int = 2):
        """Collapse the time axis by averaging over acquired (non-zero)
        frames (utils/mixins.py:84): sum over time divided by the per-pixel
        count of frames where ``mask`` (default: ``x != 0``) is non-zero;
        zero where no frame contributes."""
        num = jnp.sum(x, axis=axis)
        m = mask if mask is not None else (x != 0)
        cnt = jnp.sum(m.astype(x.dtype), axis=axis)
        return jnp.where(cnt != 0, num / jnp.where(cnt != 0, cnt, 1.0), 0.0)

    @staticmethod
    def repeat(x, target, axis: int = 2):
        return jnp.repeat(jnp.expand_dims(x, axis), target.shape[axis], axis=axis)

    def to_static(self):
        """Return a time-collapsed (static) version of this object.

        Template method (utils/mixins.py:114) — concrete temporal physics
        and time-aware nets override it.
        """
        raise NotImplementedError()


def _as_pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (int(v), int(v))


def _resolve_tiling_params(patch_size, stride=None):
    """Normalize (patch_size, stride) pairs (utils/_tiling.py:10)."""
    p = _as_pair(patch_size)
    s = _as_pair(stride) if stride is not None else tuple(q // 2 for q in p)
    if s[0] > p[0] or s[1] > p[1]:
        raise ValueError(f"Stride {s} must be smaller or equal than patch_size {p}.")
    return p, s


def _compute_needed_pad(img_size, patch_size, stride):
    n_h = abs(img_size[0] - patch_size[0]) // stride[0] + 1
    n_w = abs(img_size[1] - patch_size[1]) // stride[1] + 1
    pad_h = (patch_size[0] + n_h * stride[0] - img_size[0]) % stride[0]
    pad_w = (patch_size[1] + n_w * stride[1] - img_size[1]) % stride[1]
    return pad_h, pad_w


def _compute_compatible_img_size(img_size, patch_size, stride):
    ph, pw = _compute_needed_pad(img_size, patch_size, stride)
    return img_size[0] + ph, img_size[1] + pw


def _compute_num_patches(img_size, patch_size, stride, pad_if_needed):
    size = (
        _compute_compatible_img_size(img_size, patch_size, stride)
        if pad_if_needed
        else img_size
    )
    n_h = (size[0] - patch_size[0]) // stride[0] + 1
    n_w = (size[1] - patch_size[1]) // stride[1] + 1
    return n_h, n_w


def image_to_patches(image, patch_size, stride=None, pad_if_needed=True,
                     pad=(0, 0, 0, 0)):
    """Split ``(B, C, H, W)`` into overlapping patches
    ``(B, C, n_h, n_w, ph, pw)`` (utils/patch_extractor.py via _tiling.py:66).

    ``pad`` = (left, right, top, bottom) extra context padding: enlarges the
    effective patch size by the padding amounts, like the reference.
    """
    patch_size, stride = _resolve_tiling_params(patch_size, stride)
    if image.ndim != 4:
        raise ValueError(
            f"Input image must have shape (B, C, H, W), got {tuple(image.shape)}."
        )
    extra = (pad,) * 4 if isinstance(pad, int) else tuple(pad)
    if len(extra) != 4:
        raise ValueError(
            "Pad must be an int or a tuple of 4 ints (left, right, top, bottom)."
        )
    if pad_if_needed:
        pad_h, pad_w = _compute_needed_pad(image.shape[-2:], patch_size, stride)
        full = (extra[0], extra[1] + pad_w, extra[2], extra[3] + pad_h)
    else:
        full = extra
    if any(p > 0 for p in full):
        image = jnp.pad(
            image,
            ((0, 0), (0, 0), (full[2], full[3]), (full[0], full[1])),
        )
    ph = patch_size[0] + extra[2] + extra[3]
    pw = patch_size[1] + extra[0] + extra[1]
    B, C = image.shape[:2]
    H, W = image.shape[-2:]
    n_h = (H - ph) // stride[0] + 1
    n_w = (W - pw) // stride[1] + 1
    # One XLA op instead of an O(n_h*n_w) unrolled slice loop: returns
    # (B, C*ph*pw, n_h, n_w) with the channel axis laid out as (C, ph, pw).
    # precision=HIGHEST: the one-hot identity filter must gather exactly —
    # the default matmul precision would round patch values to bf16.
    patches = jax.lax.conv_general_dilated_patches(
        image, filter_shape=(ph, pw), window_strides=stride, padding="VALID",
        precision=jax.lax.Precision.HIGHEST,
    )
    patches = patches.reshape(B, C, ph, pw, n_h, n_w)
    return jnp.transpose(patches, (0, 1, 4, 5, 2, 3))  # (B, C, n_h, n_w, ph, pw)


def patches_to_image(patches, stride, img_size=None, reduce_overlap="mean"):
    """Reassemble patches ``(B, C, n_h, n_w, ph, pw)`` into an image,
    summing or averaging overlaps (utils/_tiling.py:101). Default ``"mean"``,
    matching the reference functional API (utils/patch_extractor.py:153);
    :meth:`TiledMixin2d.patches_to_image` defaults to ``"sum"`` like the
    reference mixin method."""
    if reduce_overlap not in ("sum", "mean"):
        raise ValueError(
            f"Invalid reduce_overlap option: {reduce_overlap}. Must be 'sum' or 'mean'."
        )
    stride = _as_pair(stride)
    B, C, n_h, n_w, ph, pw = patches.shape
    H = ph + (n_h - 1) * stride[0]
    W = pw + (n_w - 1) * stride[1]
    # Single vectorized scatter-add over all patches: index grids broadcast
    # to (n_h, n_w, ph, pw), matching the patch layout.
    rows = (jnp.arange(n_h)[:, None] * stride[0] + jnp.arange(ph)[None, :])
    cols = (jnp.arange(n_w)[:, None] * stride[1] + jnp.arange(pw)[None, :])
    r = rows[:, None, :, None]  # (n_h, 1, ph, 1)
    c = cols[None, :, None, :]  # (1, n_w, 1, pw)
    out = jnp.zeros((B, C, H, W), patches.dtype).at[:, :, r, c].add(patches)
    if reduce_overlap == "mean":
        cnt = (
            jnp.zeros((H, W), patches.dtype)
            .at[r, c]
            .add(jnp.ones((n_h, n_w, ph, pw), patches.dtype))
        )
        out = out / jnp.clip(cnt, 1.0, None)
    if img_size is not None:
        out = out[:, :, : img_size[0], : img_size[1]]
    return out


def patchify(image, patch_size, stride=None, pad_if_needed=True):
    """Alias of :func:`image_to_patches` (patch_extractor.py:177)."""
    return image_to_patches(image, patch_size, stride, pad_if_needed=pad_if_needed)


def tiled_apply(fn, x, patch_size=256, overlap: int = 64):
    """Apply ``fn`` patch-wise with overlap blending (utils/_tiling.py:148).

    ``patch_size`` may be an int or an ``(ph, pw)`` pair. Patches are
    processed as ONE batched call (vmap-free stacking) and reassembled with
    linear cross-fade weights in the overlap bands.
    """
    B, C, H, W = x.shape
    ph, pw = _as_pair(patch_size)
    # clamp per-dimension so images smaller than the patch in ONE
    # dimension (panoramas, sinograms) tile full-height/width strips
    # instead of crashing the (N*B, C, ph, pw) reshape
    ph, pw = min(ph, H), min(pw, W)
    ov = overlap
    if H <= ph and W <= pw:
        return fn(x)

    def _starts(size, p):
        s = list(range(0, max(size - p, 0) + 1, max(p - ov, 1)))
        if s[-1] + p < size:
            s.append(size - p)
        return s

    ys, xs = _starts(H, ph), _starts(W, pw)

    patches = jnp.stack(
        [x[:, :, i : i + ph, j : j + pw] for i in ys for j in xs], axis=0
    )  # (N, B, C, ph, pw)
    N = patches.shape[0]
    outs = fn(patches.reshape(N * B, C, ph, pw)).reshape(N, B, C, ph, pw)

    # cross-fade weight window
    def _ramp(p):
        r = np.minimum(np.arange(1, p + 1), ov) / ov if ov > 0 else np.ones(p)
        return np.minimum(r, r[::-1])

    w = jnp.asarray(np.outer(_ramp(ph), _ramp(pw)), x.dtype)

    acc = jnp.zeros_like(x)
    cnt = jnp.zeros((1, 1, H, W), x.dtype)
    idx = 0
    for i in ys:
        for j in xs:
            acc = acc.at[:, :, i : i + ph, j : j + pw].add(outs[idx] * w)
            cnt = cnt.at[:, :, i : i + ph, j : j + pw].add(w)
            idx += 1
    return acc / jnp.clip(cnt, 1e-8, None)


class TiledMixin2d:
    """Overlapping-patch extraction / reconstruction helpers
    (utils/mixins.py:290): ``image_to_patches`` → ``(B,C,n_h,n_w,ph,pw)``,
    ``patches_to_image`` with sum/mean overlap reduction, plus the padding
    geometry queries. ``apply_tiled`` adds cross-faded whole-image inference
    on top (not in the reference, used by TiledSpaceVaryingBlur)."""

    patch_size = (256, 256)
    stride = (128, 128)
    overlap: int = 64
    pad_if_needed: bool = True

    def __init__(self, patch_size=None, stride=None, pad_if_needed=True,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.patch_size, self.stride = _resolve_tiling_params(
            patch_size if patch_size is not None else self.patch_size,
            stride if stride is not None else
            (self.stride if patch_size is None else None),
        )
        self.pad_if_needed = pad_if_needed

    def image_to_patches(self, image, pad=(0, 0, 0, 0)):
        return image_to_patches(
            image, self.patch_size, self.stride,
            pad_if_needed=self.pad_if_needed, pad=pad,
        )

    def patches_to_image(self, patches, img_size=None, reduce_overlap="sum"):
        return patches_to_image(
            patches, self.stride, img_size=img_size,
            reduce_overlap=reduce_overlap,
        )

    def get_needed_pad(self, img_size):
        return _compute_needed_pad(img_size, self.patch_size, self.stride)

    def get_compatible_img_size(self, img_size):
        return _compute_compatible_img_size(img_size, self.patch_size, self.stride)

    def get_num_patches(self, img_size):
        return _compute_num_patches(
            img_size, self.patch_size, self.stride, self.pad_if_needed
        )

    def apply_tiled(self, fn, x):
        return tiled_apply(fn, x, patch_size=self.patch_size, overlap=self.overlap)

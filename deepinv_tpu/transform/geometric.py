"""Concrete group actions: Shift, Rotate, Scale, Reflect
(reference deepinv/transform/{shift,rotate,scale,reflect}.py; projective
transforms live in :mod:`deepinv_tpu.transform.projective`).

Warps use ``jax.scipy.ndimage.map_coordinates`` (the XLA equivalent of the
reference's kornia/grid_sample warps). Rotations by multiples of 90 degrees
use exact ``rot90``. All actions are vmapped over the batch and jit-safe: the
randomly drawn parameters are traced values, not Python ints.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from .base import Transform

__all__ = ["Shift", "Rotate", "Scale", "Reflect"]


def _warp_affine(x, mat):
    """Apply (batched) inverse-affine warp via map_coordinates.

    :param x: (B, C, H, W); mat: (B, 2, 3) mapping output coords -> input.
    """
    B, C, H, W = x.shape
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    coords = jnp.stack([yy - cy, xx - cx], 0).reshape(2, -1)  # centered

    def warp_one(img, m):
        src = m[:, :2] @ coords + m[:, 2:3]
        src = src + jnp.array([[cy], [cx]])

        def chan(c):
            return jax.scipy.ndimage.map_coordinates(
                c, [src[0].reshape(H, W), src[1].reshape(H, W)], order=1, mode="constant"
            )

        return jax.vmap(chan)(img)

    return jax.vmap(warp_one)(x, mat)


class Shift(Transform):
    """Cyclic pixel shift (reference shift.py:73)."""

    def __init__(self, shift_max: float = 1.0, **kwargs):
        super().__init__(**kwargs)
        self.shift_max = shift_max

    def get_params(self, x, key=None):
        key = ensure_key(key, self.seed)
        H, W = x.shape[-2:]
        kx, ky = jax.random.split(key)
        n = self.n_trans * x.shape[0]
        # reference shift.py:34 draws from [-int(shift_max*H),
        # int(shift_max*H)) — the full range, not half of it
        amount_h = int(self.shift_max * H)
        amount_w = int(self.shift_max * W)
        sy = jax.random.randint(ky, (n,), -amount_h, max(amount_h, 1))
        sx = jax.random.randint(kx, (n,), -amount_w, max(amount_w, 1))
        return {"y_shift": sy, "x_shift": sx}

    def transform(self, x, y_shift=None, x_shift=None):
        x = self._repeat(x) if x.shape[0] != y_shift.shape[0] else x

        def roll_one(img, sy, sx):
            return jnp.roll(img, (sy, sx), axis=(-2, -1))

        return jax.vmap(roll_one)(x, y_shift, x_shift)


class Rotate(Transform):
    """Rotation (reference rotate.py:169).

    :param multiples: angle grid (degrees); default 90-degree subgroup uses
        exact rot90, otherwise bilinear warp.
    :param positive: sample only positive angles.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.transform import Rotate
        >>> t = Rotate(multiples=90, n_trans=4)
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 8, 8))
        >>> t(x, key=jax.random.key(1)).shape  # 4 rotated copies
        (4, 1, 8, 8)
    """

    def __init__(self, multiples: float = 90.0, limits: float = 360.0, interpolation: str = "bilinear", **kwargs):
        super().__init__(**kwargs)
        self.multiples = multiples
        self.limits = limits
        self.interpolation = interpolation

    def get_params(self, x, key=None):
        key = ensure_key(key, self.seed)
        n = self.n_trans * x.shape[0]
        n_angles = max(int(self.limits / self.multiples), 1)
        idx = jax.random.randint(key, (n,), 0, n_angles)
        return {"theta": idx.astype(jnp.float32) * self.multiples}

    def transform(self, x, theta=None):
        x = self._repeat(x) if x.shape[0] != theta.shape[0] else x
        if self.multiples % 90 == 0 and self.limits % 90 == 0:
            # exact subgroup: select among the 4 rot90 images per sample
            k = (theta / 90.0).astype(jnp.int32) % 4
            rots = jnp.stack([jnp.rot90(x, i, axes=(-2, -1)) for i in range(4)], 1)
            return jax.vmap(lambda r, ki: r[ki])(rots, k)
        th = jnp.deg2rad(theta)
        c, s = jnp.cos(th), jnp.sin(th)
        # inverse rotation matrix (output -> input coords)
        mat = jnp.stack(
            [jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2
        )  # (B, 2, 2)
        mat = jnp.concatenate([mat, jnp.zeros(mat.shape[:-1] + (1,))], -1)
        return _warp_affine(x, mat)


class Scale(Transform):
    """Isotropic dilation (reference scale.py:131)."""

    def __init__(self, factors=(0.75, 0.5), **kwargs):
        super().__init__(**kwargs)
        self.factors = tuple(factors)

    def get_params(self, x, key=None):
        key = ensure_key(key, self.seed)
        n = self.n_trans * x.shape[0]
        idx = jax.random.randint(key, (n,), 0, len(self.factors))
        return {"factor": jnp.asarray(self.factors)[idx]}

    def invert_params(self, params):
        return {"factor": 1.0 / params["factor"]}

    def transform(self, x, factor=None):
        x = self._repeat(x) if x.shape[0] != factor.shape[0] else x
        z = factor
        zero = jnp.zeros_like(z)
        mat = jnp.stack(
            [
                jnp.stack([1.0 / z, zero, zero], -1),
                jnp.stack([zero, 1.0 / z, zero], -1),
            ],
            -2,
        )
        return _warp_affine(x, mat)


class Reflect(Transform):
    """Axis reflections (reference reflect.py:79).

    :param dim: axes to possibly flip; e.g. [-2, -1].
    """

    def __init__(self, dim=(-1,), **kwargs):
        super().__init__(**kwargs)
        self.dim = tuple(dim)

    def get_params(self, x, key=None):
        key = ensure_key(key, self.seed)
        n = self.n_trans * x.shape[0]
        flips = jax.random.bernoulli(key, 0.5, (n, len(self.dim)))
        return {"flip": flips.astype(jnp.float32)}

    def invert_params(self, params):
        return params  # reflections are involutions

    def transform(self, x, flip=None):
        x = self._repeat(x) if x.shape[0] != flip.shape[0] else x

        def flip_one(img, f):
            out = img
            for i, ax in enumerate(self.dim):
                flipped = jnp.flip(out, axis=ax)
                out = jnp.where(f[i] > 0.5, flipped, out)
            return out

        return jax.vmap(flip_one)(x, flip)


def rotate_via_shear(image, angle, center=None):
    r"""Exact FFT three-shear rotation (reference rotate.py:100):
    ``R(theta) = Shear_u(a) Shear_v(b) Shear_u(a)`` with
    ``a = -tan(theta/2)``, ``b = sin(theta)`` — reuses the Fourier shear
    machinery of :mod:`deepinv_tpu.ops.radon_fourier` (embedded in a padded
    grid; angles reduced to [-45, 45] degrees with exact ``rot90``).
    Positive angles rotate counter-clockwise (image convention: row 0 = top).

    :param image: (B, C, H, W) input (square).
    :param angle: degrees, scalar or (B,).
    :return: rotated images (B, C, H, W).
    """
    from ..ops.radon_fourier import _rotate_stack, _next_smooth

    B, C, H, W = image.shape
    if H != W:
        raise ValueError("rotate_via_shear needs square images")
    th = jnp.deg2rad(jnp.broadcast_to(jnp.asarray(angle, jnp.float32), (B,)))
    k = jnp.round(th / (jnp.pi / 2)).astype(jnp.int32)
    th_r = th - k.astype(jnp.float32) * (jnp.pi / 2)
    rots = jnp.stack([jnp.rot90(image, i, axes=(-2, -1)) for i in range(4)], 1)
    base = jax.vmap(lambda r, ki: r[jnp.mod(ki, 4)])(rots, k)

    G = _next_smooth(2 * W)
    before = (G - W) // 2
    center = before + (W - 1) / 2.0
    emb = jnp.pad(base, [(0, 0), (0, 0), (before, G - W - before), (before, G - W - before)])

    def one(img, t):
        # _rotate_stack rotates one (G, G) image over a stack of angles;
        # vmap over channels with a length-1 angle stack
        def chan(im):
            return jnp.real(_rotate_stack(im, t[None], center)[0])

        return jax.vmap(chan)(img)

    out = jax.vmap(one)(emb, -th_r)
    return out[:, :, before : before + H, before : before + W]

"""Projective transforms in the pinhole-camera parameterization
(reference deepinv/transform/projective.py:162 ``Homography`` and its
subgroups :297 ``Affine``, :336 ``Similarity``, :372 ``Euclidean``,
:407 ``PanTiltRotate``; following Wang & Davies, "Perspective-Equivariant
Imaging", 2024).

TPU-native design: the reference warps through kornia's
``warp_perspective``; here the per-sample 3x3 homography is built in one
batched einsum chain and the warp is ``jax.scipy.ndimage.map_coordinates``
(order-1, vmapped over batch and channels), so the whole transform jits,
vmaps, and differentiates. Parameters are drawn per output sample
(``n_trans * B``), matching this package's per-sample convention.

Conventions (reference projective.py:104-126): principal point at the image
center, focal length 100, x right / y down pixel coordinates. The camera
intrinsics before/after are

    K  = [[f, 0, u0], [0, f, v0], [0, 0, 1]]
    K' = [[f/zoom/stretch_x, skew, u0+shift_x],
          [0, f/zoom/stretch_y, v0+shift_y], [0, 0, 1]]

and the output image samples the input at ``K' R^T K^{-1} @ [x, y, 1]``
(the inverse of the reference's ``H_inverse = K @ R @ K'^{-1}`` passed to
``warp_perspective``). Note the reference computes ``u0`` from
``im.shape[2]`` (height) due to a width/height swap (projective.py:107) —
irrelevant for the square images it is used on; this implementation uses the
geometrically correct axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from .base import Transform, TransformParam

__all__ = [
    "TransformParam",
    "Homography",
    "Affine",
    "Similarity",
    "Euclidean",
    "PanTiltRotate",
]

_PAD_MODES = {"reflection": "reflect", "zeros": "constant", "border": "nearest"}

# parameters inverted by reciprocal rather than negation (the reference's
# ``TransformParam(p, neg=lambda x: 1/x)`` trick, projective.py:240)
_RECIPROCAL = ("zoom_f", "stretch_x", "stretch_y")


def rotation_matrix(tx, ty, tz):
    """Batched extrinsic xyz Euler rotation ``Rz @ Ry @ Rx`` from degrees
    (reference projective.py:13 ``rotation_matrix``).

    :param tx: (n,) x rotations in degrees (same for ty, tz).
    :return: (n, 3, 3) rotation matrices.
    """
    tx, ty, tz = (jnp.deg2rad(jnp.asarray(t, jnp.float32)) for t in (tx, ty, tz))
    cx, sx = jnp.cos(tx), jnp.sin(tx)
    cy, sy = jnp.cos(ty), jnp.sin(ty)
    cz, sz = jnp.cos(tz), jnp.sin(tz)
    o, z = jnp.ones_like(cx), jnp.zeros_like(cx)
    Rx = jnp.stack(
        [o, z, z, z, cx, -sx, z, sx, cx], -1
    ).reshape(cx.shape + (3, 3))
    Ry = jnp.stack(
        [cy, z, sy, z, o, z, -sy, z, cy], -1
    ).reshape(cx.shape + (3, 3))
    Rz = jnp.stack(
        [cz, -sz, z, sz, cz, z, z, z, o], -1
    ).reshape(cx.shape + (3, 3))
    return Rz @ Ry @ Rx


def apply_homography(
    im,
    theta_x=0.0,
    theta_y=0.0,
    theta_z=0.0,
    zoom_factor=1.0,
    skew=0.0,
    x_stretch_factor=1.0,
    y_stretch_factor=1.0,
    x_t=0.0,
    y_t=0.0,
    padding: str = "reflection",
    interpolation: str = "bilinear",
):
    """Warp a batch with per-sample pinhole-camera homographies
    (reference projective.py:55 ``apply_homography``).

    All geometric arguments broadcast to shape (B,); the warp samples the
    input at ``K' R^T K^{-1} [x, y, 1]`` per output pixel.

    :param im: (B, C, H, W) images.
    :param interpolation: "bilinear" or "nearest" (XLA map_coordinates is
        order<=1; the reference's "bicubic" is not supported).
    """
    if interpolation not in ("bilinear", "nearest"):
        raise ValueError("interpolation must be 'bilinear' or 'nearest'")
    order = 1 if interpolation == "bilinear" else 0
    mode = _PAD_MODES.get(padding, padding)
    B, C, H, W = im.shape
    bc = lambda p: jnp.broadcast_to(jnp.asarray(p, jnp.float32), (B,))
    theta_x, theta_y, theta_z, zoom, skew, sfx, sfy, xt, yt = map(
        bc,
        (theta_x, theta_y, theta_z, zoom_factor, skew, x_stretch_factor,
         y_stretch_factor, x_t, y_t),
    )

    f = 100.0
    u0, v0 = float(int(W / 2)), float(int(H / 2))
    o, z = jnp.ones((B,)), jnp.zeros((B,))

    # K' (new intrinsics), row-major
    kp = jnp.stack(
        [f / zoom / sfx, skew, u0 + xt,
         z, f / zoom / sfy, v0 + yt,
         z, z, o], -1
    ).reshape(B, 3, 3)
    # K^{-1} analytic
    kinv = jnp.stack(
        [o / f, z, -u0 / f * o,
         z, o / f, -v0 / f * o,
         z, z, o], -1
    ).reshape(B, 3, 3)
    R = rotation_matrix(theta_x, theta_y, theta_z)
    # sampling map: output pixel -> input pixel
    Minv = kp @ jnp.swapaxes(R, -1, -2) @ kinv

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pts = jnp.stack([xx, yy, jnp.ones_like(xx)], 0).reshape(3, -1)

    def warp_one(img, m):
        s = m @ pts
        sx = s[0] / jnp.clip(jnp.abs(s[2]), 1e-8, None) * jnp.sign(s[2])
        sy = s[1] / jnp.clip(jnp.abs(s[2]), 1e-8, None) * jnp.sign(s[2])

        def chan(c):
            return jax.scipy.ndimage.map_coordinates(
                c, [sy.reshape(H, W), sx.reshape(H, W)], order=order, mode=mode
            )

        return jax.vmap(chan)(img)

    return jax.vmap(warp_one)(im, Minv)


class Homography(Transform):
    """Random projective transformations (reference projective.py:162).

    Draws pan/tilt (``theta_x/y``), 2D rotation (``theta_z``), zoom, pixel
    shift, skew, and axis stretches; subgroup classes pin subsets of these
    to the identity. Parameters are drawn per output sample
    (``n_trans * B``) and invert exactly: angles/shifts/skew negate, zoom
    and stretches reciprocate (reference ``TransformParam`` negation,
    projective.py:240-247).

    :param theta_max: max pan/tilt angle (degrees), default 180.
    :param theta_z_max: max in-plane rotation (degrees), default 180.
    :param zoom_factor_min: min zoom factor (up to 1), default 0.5.
    :param shift_max: max shift fraction (1 = half image), default 1.
    :param skew_max: max skew, default 50.
    :param x_stretch_factor_min: min x stretch (up to 1), default 0.5.
    :param y_stretch_factor_min: min y stretch (up to 1), default 0.5.
    :param padding: "reflection", "zeros" or "border".
    :param interpolation: "bilinear" or "nearest".

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.transform import Homography
        >>> x = jax.random.normal(jax.random.key(0), (1, 3, 16, 16))
        >>> Homography(n_trans=2)(x, key=jax.random.key(1)).shape
        (2, 3, 16, 16)
    """

    def __init__(
        self,
        theta_max: float = 180.0,
        theta_z_max: float = 180.0,
        zoom_factor_min: float = 0.5,
        shift_max: float = 1.0,
        skew_max: float = 50.0,
        x_stretch_factor_min: float = 0.5,
        y_stretch_factor_min: float = 0.5,
        padding: str = "reflection",
        interpolation: str = "bilinear",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.theta_max = theta_max
        self.theta_z_max = theta_z_max
        self.zoom_factor_min = zoom_factor_min
        self.shift_max = shift_max
        self.skew_max = skew_max
        self.x_stretch_factor_min = x_stretch_factor_min
        self.y_stretch_factor_min = y_stretch_factor_min
        self.padding = padding
        self.interpolation = interpolation

    def rand(self, maxi: float, mini: float = None, key=None, n: int = None):
        """Uniform draw in ``[mini, maxi]`` of shape ``(n_trans,)``
        (reference projective.py:224; keyed rather than stateful-rng)."""
        if mini is None:
            mini = -maxi
        key = ensure_key(key, self.seed)
        n = self.n_trans if n is None else n
        return jax.random.uniform(key, (n,), minval=mini, maxval=maxi)

    def get_params(self, x, key=None) -> dict:
        key = ensure_key(key, self.seed)
        n = self.n_trans * x.shape[0]
        H, W = x.shape[-2:]
        ks = jax.random.split(key, 9)
        u = lambda k, lo, hi: self.rand(hi, lo, key=k, n=n)
        return {
            "theta_x": u(ks[0], -self.theta_max, self.theta_max),
            "theta_y": u(ks[1], -self.theta_max, self.theta_max),
            "theta_z": u(ks[2], -self.theta_z_max, self.theta_z_max),
            "zoom_f": u(ks[3], self.zoom_factor_min, 1.0),
            "shift_x": u(ks[4], -W / 2 * self.shift_max, W / 2 * self.shift_max),
            "shift_y": u(ks[5], -H / 2 * self.shift_max, H / 2 * self.shift_max),
            "skew": u(ks[6], -self.skew_max, self.skew_max),
            "stretch_x": u(ks[7], self.x_stretch_factor_min, 1.0),
            "stretch_y": u(ks[8], self.y_stretch_factor_min, 1.0),
        }

    def invert_params(self, params: dict) -> dict:
        return {
            k: (1.0 / v if k in _RECIPROCAL else -v) for k, v in params.items()
        }

    def transform(
        self,
        x,
        theta_x=None,
        theta_y=None,
        theta_z=None,
        zoom_f=None,
        shift_x=None,
        shift_y=None,
        skew=None,
        stretch_x=None,
        stretch_y=None,
    ):
        x = self._repeat(x) if x.shape[0] != theta_x.shape[0] else x
        return apply_homography(
            x,
            theta_x=theta_x,
            theta_y=theta_y,
            theta_z=theta_z,
            zoom_factor=zoom_f,
            skew=skew,
            x_stretch_factor=stretch_x,
            y_stretch_factor=stretch_y,
            x_t=shift_x,
            y_t=shift_y,
            padding=self.padding,
            interpolation=self.interpolation,
        )


class Affine(Homography):
    """Random affine transformations — Aff(3) subgroup: no pan/tilt
    (reference projective.py:297)."""

    def __init__(self, **kwargs):
        kwargs["theta_max"] = 0.0
        super().__init__(**kwargs)


class Similarity(Homography):
    """Random similarity transformations — S(2) subgroup: shift, rotation,
    isotropic scale (reference projective.py:336)."""

    def __init__(self, **kwargs):
        kwargs.update(
            theta_max=0.0, skew_max=0.0,
            x_stretch_factor_min=1.0, y_stretch_factor_min=1.0,
        )
        super().__init__(**kwargs)


class Euclidean(Homography):
    """Random Euclidean transformations — E(2) subgroup: shift + rotation
    (reference projective.py:372)."""

    def __init__(self, **kwargs):
        kwargs.update(
            theta_max=0.0, skew_max=0.0, zoom_factor_min=1.0,
            x_stretch_factor_min=1.0, y_stretch_factor_min=1.0,
        )
        super().__init__(**kwargs)


class PanTiltRotate(Homography):
    """Random 3D camera rotations — SO(3) pan+tilt+rotate subgroup with true
    perspective effects (reference projective.py:407)."""

    def __init__(self, **kwargs):
        kwargs.update(
            shift_max=0.0, skew_max=0.0, zoom_factor_min=1.0,
            x_stretch_factor_min=1.0, y_stretch_factor_min=1.0,
        )
        super().__init__(**kwargs)

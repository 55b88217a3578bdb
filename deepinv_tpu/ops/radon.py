"""Parallel-beam Radon transform and filtered backprojection in pure XLA.

TPU-native counterpart of deepinv/physics/functional/radon.py (Radon:176,
IRadon, RampFilter:75). The reference rotates the image per angle with
``grid_sample``; here the sampling grid for *all* angles is built once and
evaluated with a single batched ``map_coordinates`` gather, which XLA lowers
onto the TPU as one fused gather+reduction — no per-angle Python loop.

Conventions preserved (for numerical parity):
- angles in degrees;
- ``circle=False`` pads the image to ceil(sqrt(2) W) before projecting;
- sinogram shape (B, C, n_detector, n_angles);
- FBP with frequency-domain ramp filter and pi/(2 n_angles) scaling.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["radon", "iradon", "ramp_filter", "radon_output_size", "fanbeam"]


def radon_output_size(in_size: int, circle: bool = False) -> int:
    if circle:
        return in_size
    return in_size + int(math.ceil(math.sqrt(2) * in_size - in_size))


def _pad_image(x, circle):
    W = x.shape[-1]
    if circle:
        return x
    diagonal = math.sqrt(2) * W
    pad = int(math.ceil(diagonal - W))
    new_center = (W + pad) // 2
    old_center = W // 2
    before = new_center - old_center
    return jnp.pad(
        x,
        [(0, 0)] * (x.ndim - 2) + [(before, pad - before), (before, pad - before)],
    )


def _circle_mask(W, dtype):
    ax = 2 * np.arange(W) / (W - 1) - 1.0
    yy, xx = np.meshgrid(ax, ax, indexing="ij")
    return jnp.asarray((yy**2 + xx**2 <= 1).astype(np.float32), dtype)


def radon(x, theta, circle: bool = False, interp_order: int = 1):
    """Radon transform of (B, C, W, W) images -> (B, C, n_det, n_angles).

    :param theta: angles in degrees (array).
    """
    if x.shape[-1] != x.shape[-2]:
        raise ValueError("input image must be square")
    x = _pad_image(x, circle)
    W = x.shape[-1]
    if circle:
        x = x * _circle_mask(W, x.dtype)
    th = jnp.deg2rad(jnp.asarray(theta, jnp.float32))
    c = (W - 1) / 2.0
    u = jnp.arange(W, dtype=jnp.float32) - c  # integration variable (rows)
    v = jnp.arange(W, dtype=jnp.float32) - c  # detector coordinate (cols)
    cos, sin = jnp.cos(th), jnp.sin(th)
    # rotated sample positions: for angle t, out(u, v) = x(R_t [u, v])
    # rows: c + cos*u - sin*v ; cols: c + sin*u + cos*v
    rows = c + cos[:, None, None] * u[None, :, None] - sin[:, None, None] * v[None, None, :]
    cols = c + sin[:, None, None] * u[None, :, None] + cos[:, None, None] * v[None, None, :]

    B, C = x.shape[:2]
    flat = x.reshape(B * C, W, W)

    def sample_one(img):
        vals = jax.scipy.ndimage.map_coordinates(
            img, [rows, cols], order=interp_order, mode="constant"
        )  # (n_angles, W, W)
        return jnp.sum(vals, axis=1)  # integrate over u -> (n_angles, n_det)

    sino = jax.vmap(sample_one)(flat)  # (B*C, n_angles, n_det)
    sino = jnp.moveaxis(sino, 1, 2)  # (B*C, n_det, n_angles)
    return sino.reshape(B, C, W, th.shape[0])


def ramp_filter(sino, dtype=jnp.float32):
    """Frequency-domain ramp filter along the detector axis (reference
    RampFilter radon.py:75): zero-pad to next power of two, multiply by the
    band-limited ramp, crop."""
    N = sino.shape[-2]
    size = max(64, int(2 ** math.ceil(math.log2(2 * N))))
    # spatial-domain ramp (Kak & Slaney) then FFT — matches the reference
    n = np.concatenate(
        [np.arange(1, size / 2 + 1, 2), np.arange(size / 2 - 1, 0, -2)]
    )
    f = np.zeros(size, np.float64)
    f[0] = 0.25
    f[1::2] = -1.0 / (np.pi * n) ** 2
    fourier_ramp = jnp.asarray(2 * np.real(np.fft.fft(f)), dtype)
    sp = jnp.fft.fft(
        jnp.concatenate(
            [sino, jnp.zeros(sino.shape[:-2] + (size - N,) + sino.shape[-1:], sino.dtype)],
            axis=-2,
        ),
        axis=-2,
    )
    filtered = jnp.real(jnp.fft.ifft(sp * fourier_ramp[:, None], axis=-2))
    return filtered[..., :N, :].astype(sino.dtype)


def iradon(
    sino,
    theta,
    circle: bool = False,
    filtered: bool = True,
    out_size: int | None = None,
    interp_order: int = 1,
):
    """(Filtered) backprojection: (B, C, n_det, n_angles) -> (B, C, W, W)."""
    th = jnp.deg2rad(jnp.asarray(theta, jnp.float32))
    n_det, n_angles = sino.shape[-2:]
    W = n_det
    if out_size is None:
        out_size = W if circle else int(math.floor(math.sqrt(W**2 / 2.0)))
    if filtered:
        sino = ramp_filter(sino)
    c = (W - 1) / 2.0
    # backproject on the full padded grid, then crop like the reference
    # (radon.py:425-435) — keeps the half-pixel alignment identical
    ax = jnp.arange(W, dtype=jnp.float32) - c
    yy, xx = jnp.meshgrid(ax, ax, indexing="ij")
    cos, sin = jnp.cos(th), jnp.sin(th)
    # detector coordinate of pixel (y, x) at angle t: t = x*cos - y*sin
    # (the forward integrates along (cos, sin) with detector axis (-sin, cos))
    t_pos = (
        xx[None] * cos[:, None, None] - yy[None] * sin[:, None, None]
    ) + c  # (n_angles, H, W)
    ang_idx = jnp.broadcast_to(
        jnp.arange(n_angles, dtype=jnp.float32)[:, None, None], t_pos.shape
    )

    B, C = sino.shape[:2]
    flat = sino.reshape(B * C, n_det, n_angles)

    def bp_one(s):
        vals = jax.scipy.ndimage.map_coordinates(
            s, [t_pos, ang_idx], order=interp_order, mode="constant"
        )
        return jnp.sum(vals, axis=0)

    out = jax.vmap(bp_one)(flat).reshape(B, C, W, W)
    if not circle:
        pad = W - out_size
        new_center = (out_size + pad) // 2
        before = new_center - out_size // 2
        out = out[..., before : before + out_size, before : before + out_size]
    else:
        out = out * _circle_mask(W, out.dtype)
        if out_size != W:
            before = (W - out_size) // 2
            out = out[..., before : before + out_size, before : before + out_size]
    out = out * jnp.pi / (2 * n_angles)
    return out


def fanbeam(
    x,
    theta,
    source_radius: float = 57.5,
    detector_radius: float = 57.5,
    n_detector_pixels: int = 258,
    detector_spacing: float = 0.077,
    pixel_spacing: float = None,
    n_steps: int = None,
    interp_order: int = 1,
):
    """Fan-beam projection (reference radon.py:16 fan_beam_grid geometry):
    rays from a rotating point source to a flat detector array.

    :param x: (B, C, W, W) image; ``pixel_spacing`` defaults to 0.5/W.
    :returns: sinogram (B, C, n_detector_pixels, n_angles).
    """
    W = x.shape[-1]
    if pixel_spacing is None:
        pixel_spacing = 0.5 / W
    if n_steps is None:
        n_steps = 2 * W
    th = jnp.deg2rad(jnp.asarray(theta, jnp.float32))
    c = (W - 1) / 2.0
    # world coordinates in units of pixels
    Rs = source_radius / pixel_spacing / W  # in image half-widths… keep pixels:
    Rs = source_radius / (pixel_spacing * W) * (W / 2.0)
    Rd = detector_radius / (pixel_spacing * W) * (W / 2.0)
    det = (
        (jnp.arange(n_detector_pixels) - (n_detector_pixels - 1) / 2.0)
        * detector_spacing
        / (pixel_spacing * W)
        * (W / 2.0)
    )
    cos, sin = jnp.cos(th), jnp.sin(th)

    def rotate(p, cs, sn):
        xr = cs * p[..., 0] - sn * p[..., 1]
        yr = sn * p[..., 0] + cs * p[..., 1]
        return jnp.stack([yr, xr], -1)  # (row, col)

    d0 = jnp.stack([det, jnp.full_like(det, Rd)], -1)  # (D, 2): (x, y)
    dpos = jax.vmap(lambda cs, sn: rotate(d0, cs, sn))(cos, sin)  # (A, D, 2)
    spos = jax.vmap(lambda cs, sn: rotate(jnp.array([[0.0, -Rs]]), cs, sn)[0])(
        cos, sin
    )  # (A, 2)

    # restrict integration to the ray's intersection with the image disk
    # (the source sits ~2 Rs away; uniform sampling of the full segment
    # would waste all samples outside the image)
    dirv = dpos - spos[:, None, :]  # (A, D, 2)
    seg = jnp.linalg.norm(dirv, axis=-1)  # (A, D) full segment length
    u = dirv / jnp.clip(seg[..., None], 1e-9, None)
    r_img = (W / 2.0) * jnp.sqrt(2.0)
    # solve |S + t u|^2 = r_img^2 for t in [0, seg]
    b = jnp.einsum("ad,adc->ad", jnp.ones_like(seg), u * spos[:, None, :])
    b = jnp.sum(u * spos[:, None, :], axis=-1)
    c_term = jnp.sum(spos**2, axis=-1)[:, None] - r_img**2
    disc = jnp.clip(b**2 - c_term, 0.0, None)
    sq = jnp.sqrt(disc)
    t0 = jnp.clip(-b - sq, 0.0, None)
    t1 = jnp.clip(-b + sq, 0.0, None)
    hit = disc > 0
    ts = jnp.linspace(0.0, 1.0, n_steps)
    # sample points along the clipped interval: (A, D, T, 2)
    tt = t0[..., None] + ts[None, None, :] * (t1 - t0)[..., None]
    P = spos[:, None, None, :] + tt[..., None] * u[:, :, None, :]
    rows = P[..., 0] + c
    cols = P[..., 1] + c
    step_len = (t1 - t0) / n_steps  # (A, D)
    step_len = jnp.where(hit, step_len, 0.0)

    B, C = x.shape[:2]
    flat = x.reshape(B * C, W, W)

    def one(img):
        vals = jax.scipy.ndimage.map_coordinates(
            img, [rows, cols], order=interp_order, mode="constant"
        )  # (A, D, T)
        return jnp.sum(vals, axis=-1) * step_len  # (A, D)

    sino = jax.vmap(one)(flat)  # (BC, A, D)
    sino = jnp.moveaxis(sino, 1, 2)  # (BC, D, A)
    return sino.reshape(B, C, n_detector_pixels, th.shape[0])

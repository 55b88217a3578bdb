"""Gather-free Radon transform via FFT three-shear rotation.

TPU gathers are bandwidth-crippled: the grid-sampling Radon
(ops/radon.py, faithful to the reference) costs ~1 s per 256px/180-angle
projection on a v5e chip. This implementation decomposes each rotation into
three shears, R(theta) = Shear_u(a) Shear_v(b) Shear_u(a) with
a = -tan(theta/2), b = sin(theta) (Unser et al.), and applies every shear as
an FFT phase ramp — the whole sinogram becomes batched FFTs + elementwise
complex multiplies, which the TPU executes at memory bandwidth. Interpolation
is exact (sinc) rather than bilinear.

Angles are static, so quadrant reduction (rot90 about the image center
applied *before* zero-embedding) happens at trace time with plain Python;
residual rotations |t| <= 45 degrees run fully batched. The embedding grid is
the next 5-smooth size >= 2W (prime FFT sizes are catastrophic on TPU) and
the shear center is the embedded image center — the grid center is
irrelevant. The adjoint is ``jax.linear_transpose`` of the forward — exact.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .radon import _pad_image, _circle_mask, ramp_filter, radon_output_size
from ..core.linalg import transpose_primal

__all__ = ["radon_fourier", "iradon_fourier"]


def _next_smooth(n: int) -> int:
    """Smallest even 5-smooth integer >= n."""
    best = None
    a = 1
    while a <= 4 * n:
        b = a
        while b <= 4 * n:
            c = b
            while c <= 4 * n:
                # prefer even (power-of-two-rich) sizes: the TPU FFT
                # handles odd radices like 3^6 poorly
                if c >= n and c % 2 == 0 and (best is None or c < best):
                    best = c
                c *= 5
            b *= 3
        a *= 2
    return best if best is not None else n


def _fft_shear(stack, amounts, axis: int, center: float):
    """out[t] samples in at (axis)-coordinate shifted by
    amounts[t] * (other coordinate - center); i.e. the elementary shear
    matrix [[1, a], [0, 1]] (axis=1) or [[1, 0], [a, 1]] (axis=2).

    :param stack: (T, G, G) complex array.
    """
    T, G, _ = stack.shape
    freqs = jnp.fft.fftfreq(G)
    other = jnp.arange(G) - center
    F = jnp.fft.fft(stack, axis=axis)
    if axis == 1:
        phase = jnp.exp(
            2j * jnp.pi * amounts[:, None, None] * freqs[None, :, None] * other[None, None, :]
        )
    else:
        phase = jnp.exp(
            2j * jnp.pi * amounts[:, None, None] * other[None, :, None] * freqs[None, None, :]
        )
    return jnp.fft.ifft(F * phase, axis=axis)


def _rotate_stack(emb, thetas_rad, center: float):
    """Rotate an embedded (G, G) image to a stack of residual angles.

    Convention matches ops/radon.py: out(u, v) = x(cE + cos u' - sin v',
    cE + sin u' + cos v') with u', v' centered at ``center``.
    """
    T = thetas_rad.shape[0]
    stack = jnp.broadcast_to(emb[None], (T,) + emb.shape).astype(jnp.complex64)
    a = -jnp.tan(thetas_rad / 2.0)
    b = jnp.sin(thetas_rad)
    stack = _fft_shear(stack, a, 1, center)
    stack = _fft_shear(stack, b, 2, center)
    stack = _fft_shear(stack, a, 1, center)
    return stack


def _quadrant_groups(theta_deg: np.ndarray):
    groups = {}
    for i, th in enumerate(np.asarray(theta_deg, np.float64)):
        t = th % 360.0
        k = int(np.round(t / 90.0)) % 4
        resid = t - 90.0 * np.round(t / 90.0)
        groups.setdefault(k, []).append((i, resid))
    return groups


def radon_fourier(x, theta, circle: bool = False):
    """Radon transform, same conventions as :func:`ops.radon.radon`:
    (B, C, W0, W0) -> (B, C, n_det, n_angles); sinc interpolation."""
    theta = np.asarray(theta, np.float64)
    x = _pad_image(x, circle)
    W = x.shape[-1]
    if circle:
        x = x * _circle_mask(W, x.dtype)
    G = _next_smooth(2 * W)
    before = (G - W) // 2
    center = before + (W - 1) / 2.0

    B, C = x.shape[:2]
    groups = _quadrant_groups(theta)
    n_angles = len(theta)
    cols = [None] * n_angles

    for k, items in groups.items():
        idxs = [i for i, _ in items]
        resid = jnp.asarray(np.deg2rad([r for _, r in items]), jnp.float32)
        # pre-rotate clockwise about the *image* center, then embed
        xk = jnp.rot90(x, k=-k, axes=(-2, -1))
        emb = jnp.pad(
            xk,
            [(0, 0)] * (x.ndim - 2)
            + [(before, G - W - before), (before, G - W - before)],
        )
        flat = emb.reshape(B * C, G, G)

        def one_img(img):
            stack = _rotate_stack(img, resid, center)
            return jnp.real(jnp.sum(stack, axis=1))  # (T, G)

        proj = jax.vmap(one_img)(flat)  # (BC, T, G)
        proj = proj[..., before : before + W]
        for j, i in enumerate(idxs):
            cols[i] = proj[:, j]

    sino = jnp.stack(cols, axis=-1)
    return sino.reshape(B, C, W, n_angles)


def iradon_fourier(
    sino, theta, circle: bool = False, filtered: bool = True, out_size: int | None = None
):
    """(Filtered) backprojection as the exact transpose of
    :func:`radon_fourier` (plus the ramp filter)."""
    n_det = sino.shape[-2]
    if circle:
        W0 = n_det
    else:
        W0 = out_size if out_size is not None else int(math.floor(math.sqrt(n_det**2 / 2.0)))
    if filtered:
        sino = ramp_filter(sino)
    B, C = sino.shape[:2]
    x_shape = (B, C, W0, W0)
    fwd = lambda v: radon_fourier(v, theta, circle=circle)
    (xt,) = jax.linear_transpose(fwd, transpose_primal(sino, x_shape))(sino)
    n_angles = sino.shape[-1]
    return xt * jnp.pi / (2 * n_angles)

"""Radon transform via the Fourier-slice theorem (NUFFT gridding).

Third projector backend (alongside ``ops.radon`` gather and
``ops.radon_fourier`` shear-FFT), counterpart in spirit to the reference's
torch-radon/astra fast projectors (deepinv/physics/functional/radon.py):

    P_theta(r) = x_hat(r * omega_theta)

so ALL projections are obtained from ONE oversampled 2D FFT + a Kaiser-
Bessel interpolation at the radial sample points (``ops.nufft``), followed
by per-angle 1D inverse FFTs. Cost is one G^2 FFT + O(n_angles * n_det)
gathers — versus 6 full-grid FFT passes *per quadrant group* for the shear
method and O(n_angles * W^2) gathers for the interp method. On the v5e this
is the fastest projector by an order of magnitude (see bench.py 'ct').

Accuracy: the slice projector is the band-limited (sinc-basis) line
integral; it differs from the bilinear gather projector by the
interpolation model (~0.3-1% relative), not by numerical error.

Conventions match ``ops.radon.radon``: angles in degrees, ``circle=False``
pads to the diagonal, sinogram (B, C, n_det, n_angles), detector coordinate
``t = x cos(theta) - y sin(theta)``.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .radon import _pad_image, _circle_mask, ramp_filter
from .nufft import nufft2, _grid_setup, _kb_params

__all__ = [
    "radon_slice",
    "iradon_slice",
    "radon_slice_adjoint",
    "radon_slice_normal_spec",
    "radon_slice_normal",
]


def _slice_plan(W: int, theta_deg: np.ndarray, J: int, osf: float):
    """Static (numpy) sampling plan: radial k-space points + the phase that
    aligns the NUFFT grid origin with the radon center convention."""
    r = 2 * np.pi * np.fft.fftfreq(W)  # (W,) radians / pixel
    th = np.deg2rad(np.asarray(theta_deg, np.float64))
    om_row = -np.sin(th)[:, None] * r[None, :]
    om_col = np.cos(th)[:, None] * r[None, :]
    omega = np.stack([om_row.reshape(-1), om_col.reshape(-1)])

    # centering: the NUFFT's phase origin is the oversampled-grid center
    # mapped into image coordinates (G//2 - (G-W)//2); radon integrates
    # about (W-1)/2. The residual shift is a pure phase ramp.
    (G1, _), _, _ = _grid_setup((W, W), J, osf)
    origin = G1 // 2 - (G1 - W) // 2
    d = (W - 1) / 2.0 - origin  # -1 for odd W (even G), -0.5 for even W
    dt = W // 2 - (W - 1) / 2.0  # ifft places t=0 at index W//2
    phase = np.exp(1j * (om_row * d + om_col * d + r[None, :] * dt))
    return (
        jnp.asarray(omega, jnp.float32),
        jnp.asarray(phase.astype(np.complex64)),
    )


def radon_slice(x, theta, circle: bool = False, J: int = 4, osf: float = 2.0):
    """Radon transform of (B, C, W0, W0) -> (B, C, n_det, n_angles) via the
    Fourier-slice theorem. ``theta`` must be concrete (the sampling plan is
    built at trace time)."""
    theta = np.asarray(theta, np.float64)
    x = _pad_image(x, circle)
    W = x.shape[-1]
    if circle:
        x = x * _circle_mask(W, x.dtype)
    omega, phase = _slice_plan(W, theta, J, osf)
    S = nufft2(x, omega, J=J, osf=osf).reshape(x.shape[:-2] + (len(theta), W))
    S = S * phase
    p = jnp.real(jnp.fft.fftshift(jnp.fft.ifft(S, axis=-1), axes=(-1,)))
    return jnp.moveaxis(p, -2, -1).astype(x.dtype)


def iradon_slice(
    sino,
    theta,
    circle: bool = False,
    filtered: bool = True,
    out_size: int | None = None,
    J: int = 4,
    osf: float = 2.0,
):
    """(Filtered) backprojection matching :func:`radon_slice`: ramp filter +
    exact adjoint (via ``jax.linear_transpose``) with the pi/(2 n_angles)
    FBP scaling of ``ops.radon.iradon``."""
    theta = np.asarray(theta, np.float64)
    n_det, n_angles = sino.shape[-2:]
    W = n_det
    if out_size is None:
        out_size = W if circle else int(math.floor(math.sqrt(W**2 / 2.0)))
    if filtered:
        sino = ramp_filter(sino)
    xt = radon_slice_adjoint(
        sino, theta, circle=circle, J=J, osf=osf, out_size=out_size
    )
    return xt * jnp.pi / (2 * n_angles)


# ---------------------------------------------------------------------------
# Fast explicit adjoint: the sampling plan is static, so the type-1 NUFFT
# scatter can be precomputed host-side as a SORTED segment-sum (XLA's
# dynamic scatter with unsorted indices is ~6x slower than the forward's
# gathers on TPU; a sorted segment-sum restores the balance).
# ---------------------------------------------------------------------------
import functools as _functools


@_functools.lru_cache(maxsize=32)
def _adjoint_plan(W: int, theta_key, J: int, osf: float):
    theta = np.asarray(theta_key, np.float64)
    (G1, G2), beta, _ = _grid_setup((W, W), J, osf)
    r = 2 * np.pi * np.fft.fftfreq(W)
    th = np.deg2rad(theta)
    om_row = (-np.sin(th)[:, None] * r[None, :]).reshape(-1)
    om_col = (np.cos(th)[:, None] * r[None, :]).reshape(-1)
    M = om_row.shape[0]

    def kb(x):
        arg = np.clip(1 - (2 * x / J) ** 2, 0.0, None)
        return np.where(np.abs(x) <= J / 2, np.i0(beta * np.sqrt(arg)) / np.i0(beta), 0.0)

    g1 = om_row / (2 * np.pi) * G1 + G1 / 2
    g2 = om_col / (2 * np.pi) * G2 + G2 / 2
    k1 = np.floor(g1 - J / 2).astype(np.int64)
    k2 = np.floor(g2 - J / 2).astype(np.int64)
    src, ids, wts = [], [], []
    for j1 in range(1, J + 1):
        i1 = np.mod(k1 + j1, G1)
        w1 = kb(g1 - (k1 + j1))
        for j2 in range(1, J + 1):
            i2 = np.mod(k2 + j2, G2)
            w2 = kb(g2 - (k2 + j2))
            src.append(np.arange(M))
            ids.append(i1 * G2 + i2)
            wts.append(w1 * w2)
    src = np.concatenate(src)
    ids = np.concatenate(ids)
    wts = np.concatenate(wts).astype(np.float32)
    order = np.argsort(ids, kind="stable")
    ids_sorted = ids[order]
    # scatter-free plan: for every grid cell, the [start, end) range of its
    # taps in the sorted order — the scatter becomes cumsum + 2 static
    # gathers (out[g] = cs[end_g] - cs[start_g])
    cells = np.arange(G1 * G2 + 1)
    bounds = np.searchsorted(ids_sorted, cells)
    # return numpy (host) arrays: jnp constants created inside a trace must
    # not be cached across traces (tracer leak)
    return src[order], bounds, wts[order].astype(np.float32), (G1, G2), beta


# ---------------------------------------------------------------------------
# Toeplitz-embedded normal operator: A^T A as two FFTs (no gathers at all).
#
# For the NDFT E (E_s x = sum_r x[r] e^{-i omega_s.(r - r0)}) the normal
# operator E^H diag(w) E is EXACTLY a convolution with kernel
# k(r) = sum_s w_s e^{i omega_s.r} (phase origins cancel), so it can be
# applied as a circular convolution on any grid >= 2W-1: the classic NUFFT
# Toeplitz embedding (used by MRI toolboxes for iterative recon). The slice
# projector's sample-space normal weights collapse to w_s = 1/W (the radial
# ifft is unitary up to 1/W and the alignment phases have unit modulus), so
#
#   A^T A x  ~=  cropT( ifft2( T * fft2( embed(x) ) ) ),
#   T = fft2( type1_nufft(1/W, omega, im=(Gn, Gn)) rolled to offset 0 )
#
# exact up to KB-gridding accuracy (~1e-4 rel, the projector's own accuracy
# class). On a v5e this replaces the 37 ms gather/segment-sum adjoint with a
# ~2 ms FFT pair — the hot loop of every iterative CT solver.
# ---------------------------------------------------------------------------


def _normal_spec_impl(W: int, theta_key, J: int, osf: float):
    from .nufft import nufft2_toeplitz_spec

    theta = np.asarray(theta_key, np.float64)
    r = 2 * np.pi * np.fft.fftfreq(W)
    th = np.deg2rad(theta)
    om = np.stack([
        (-np.sin(th)[:, None] * r[None, :]).reshape(-1),
        (np.cos(th)[:, None] * r[None, :]).reshape(-1),
    ])
    # sample-space normal weights collapse to 1/W (radial ifft is unitary up
    # to 1/W; the alignment phases have unit modulus)
    return nufft2_toeplitz_spec(
        jnp.asarray(om, jnp.float32), (W, W), weights=1.0 / W, J=J, osf=osf
    )


def radon_slice_normal_spec(img_width: int, theta, circle: bool = False,
                            J: int = 4, osf: float = 2.0):
    """Precompute the Toeplitz spectrum ``T`` of ``A^T A`` for
    :func:`radon_slice` with these angles (one-time, at construction)."""
    theta = np.asarray(theta, np.float64)
    W = img_width if circle else img_width + int(
        math.ceil(math.sqrt(2) * img_width - img_width)
    )
    return _normal_spec_impl(W, tuple(theta.tolist()), J, osf)


def radon_slice_normal(x, spec, circle: bool = False):
    """Apply ``A^T A`` for :func:`radon_slice` via the precomputed Toeplitz
    spectrum: pad, two ``Gn x Gn`` FFTs and a pointwise multiply, crop."""
    from .nufft import nufft2_normal

    W0 = x.shape[-1]
    xp = _pad_image(x, circle)
    W = xp.shape[-1]
    if circle:
        xp = xp * _circle_mask(W, xp.dtype)
    out = jnp.real(nufft2_normal(xp, spec)).astype(x.dtype)
    # transpose of the padding/masking steps (mirrors radon_slice_adjoint)
    if circle:
        out = out * _circle_mask(W, out.dtype)
        return out
    pad = W - W0
    new_center = (W0 + pad) // 2
    before = new_center - W0 // 2
    return out[..., before : before + W0, before : before + W0]


def radon_slice_adjoint(sino, theta, circle: bool = False, J: int = 4,
                        osf: float = 2.0, out_size: int | None = None):
    """Exact transpose of :func:`radon_slice` with the scatter implemented
    as a static sorted segment-sum (validated against
    ``jax.linear_transpose`` to float tolerance; ~4x faster on TPU)."""
    from .nufft import _scaling_image

    theta = np.asarray(theta, np.float64)
    n_det, n_angles = sino.shape[-2:]
    W = n_det
    omega, phase = _slice_plan(W, theta, J, osf)
    src_np, bounds_np, wts_np, (G1, G2), beta = _adjoint_plan(
        W, tuple(np.asarray(theta, np.float64).tolist()), J, osf
    )
    src, wts = jnp.asarray(src_np), jnp.asarray(wts_np)
    starts, ends = jnp.asarray(bounds_np[:-1]), jnp.asarray(bounds_np[1:])
    from jax.scipy.special import i0 as _i0

    const = (J / _i0(jnp.asarray(beta))) ** 2

    # transpose of the sinogram post-processing
    y = jnp.moveaxis(sino, -1, -2)  # (B, C, A, W)
    y = jnp.fft.ifftshift(y.astype(jnp.complex64), axes=(-1,))
    S = jnp.fft.fft(y, axis=-1) / W  # adjoint of ifft
    S = S * jnp.conj(phase)
    v = S.reshape(S.shape[:-2] + (n_angles * W,)) / const  # (B, C, M)

    # scatter-free accumulation: cumsum over sorted taps + boundary gathers
    taps = v[..., src] * wts  # (B, C, T)
    B, C = taps.shape[:2]
    cs = jnp.cumsum(taps.reshape(B * C, -1), axis=-1)
    cs = jnp.concatenate([jnp.zeros((B * C, 1), cs.dtype), cs], axis=-1)
    grid = (cs[:, ends] - cs[:, starts]).reshape(B, C, G1, G2)

    # adjoint of fftshift . fft2 . ifftshift (unitary-transpose = scaled ifft2)
    g = jnp.fft.ifftshift(grid, axes=(-2, -1))
    xp = jnp.fft.fftshift(jnp.fft.ifft2(g, axes=(-2, -1)), axes=(-2, -1)) * (G1 * G2)
    p1, p2 = (G1 - W) // 2, (G2 - W) // 2
    xc = xp[..., p1 : p1 + W, p2 : p2 + W]
    s1 = _scaling_image(W, G1, J, beta)
    s2 = _scaling_image(W, G2, J, beta)
    xt = jnp.real(xc) * jnp.outer(s1, s2)

    # transpose of the diagonal-padding step of _pad_image
    if out_size is None:
        out_size = W if circle else int(math.floor(math.sqrt(W**2 / 2.0)))
    if circle:
        xt = xt * _circle_mask(W, xt.dtype)
        if out_size != W:
            b0 = (W - out_size) // 2
            xt = xt[..., b0 : b0 + out_size, b0 : b0 + out_size]
        return xt
    pad = W - out_size
    new_center = (out_size + pad) // 2
    before = new_center - out_size // 2
    return xt[..., before : before + out_size, before : before + out_size]

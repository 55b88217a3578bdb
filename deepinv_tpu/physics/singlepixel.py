"""Single-pixel camera (reference deepinv/physics/singlepixel.py, 528 LoC).

Fast-Hadamard DecomposablePhysics: ``A = S H`` with ``H`` the orthonormal 2D
Walsh-Hadamard transform (butterfly FWHT, log2 stages of adds — pure VPU
work) and ``S`` a binary pattern-selection mask with the reference's four
orderings ('sequency', 'cake_cutting', 'zig_zag', 'xy'). Mask construction is
host-side numpy (static constants).
"""

from __future__ import annotations

import math
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .base import DecomposablePhysics

__all__ = ["SinglePixelCamera", "hadamard_1d", "hadamard_2d", "sequency_order"]


def _hadamard_matrix(n: int) -> np.ndarray:
    """Dense Sylvester-order Hadamard matrix (host-side, cached)."""
    H = np.array([[1.0]], np.float32)
    while H.shape[0] < n:
        H = np.block([[H, H], [H, -H]])
    return H


_HADAMARD_CACHE: dict = {}

# Dense-matmul threshold: on the MXU a dense H_N matmul (2·N² flop/elt on
# ~190 TF/s) beats the log2(N)-pass butterfly (log2(N) HBM round trips on
# ~800 GB/s) for N up to ~10^4 — images are always in this regime.
_DENSE_MAX = 4096


def hadamard_1d(u, axis: int = -1, normalize: bool = True):
    """Fast Walsh-Hadamard transform (natural order) along ``axis``.

    TPU-first: for ``n <= 4096`` this is ONE dense matmul with the
    precomputed H_n (MXU-bound, single HBM pass) rather than the classic
    ``log2(n)`` butterfly passes (bandwidth-bound); the butterfly is kept
    for larger n.
    """
    u = jnp.moveaxis(u, axis, -1)
    n = u.shape[-1]
    k = int(math.log2(n))
    assert 2**k == n, "FWHT requires power-of-two length"
    if n <= _DENSE_MAX:
        H = _HADAMARD_CACHE.get(n)
        if H is None:
            H = _HADAMARD_CACHE[n] = jnp.asarray(_hadamard_matrix(n))
        v = u @ H  # H is symmetric
    else:
        v = u
        for _ in range(k):
            v = v.reshape(v.shape[:-1] + (v.shape[-1] // 2, 2))
            a = v[..., 0] + v[..., 1]
            b = v[..., 0] - v[..., 1]
            v = jnp.concatenate([a, b], axis=-1)
    if normalize:
        v = v / math.sqrt(n)
    return jnp.moveaxis(v, -1, axis)


def hadamard_2d(x, normalize: bool = True):
    return hadamard_1d(hadamard_1d(x, axis=-1, normalize=normalize), axis=-2, normalize=normalize)


def _gray_code(nbits: int) -> np.ndarray:
    n = 2**nbits
    g = np.arange(n) ^ (np.arange(n) >> 1)
    return ((g[:, None] >> np.arange(nbits - 1, -1, -1)) & 1).astype(np.int64)


def sequency_order(n: int) -> np.ndarray:
    """Natural indices in sequency order (reference singlepixel.py:516)."""
    nbits = int(math.log2(n))
    G = _gray_code(nbits)[:, ::-1]
    return G.dot(2 ** np.arange(nbits - 1, -1, -1)).astype(np.int64)


def _hadamard_ishift_2d(mask_np: np.ndarray) -> np.ndarray:
    """Map a sequency-ordered 2D selection back to natural order
    (reference hadamard_2d_ishift, singlepixel.py:99)."""
    H, W = mask_np.shape[-2:]
    sh = sequency_order(H)
    sw = sequency_order(W)
    out = np.zeros_like(mask_np)
    out[..., sh, :] = mask_np
    out2 = np.zeros_like(out)
    out2[..., :, sw] = out
    return out2


def _sequency_mask(img_size, m) -> np.ndarray:
    C, H, W = img_size
    n = H * W
    idx = sequency_order(n)[:m]
    i, j = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    i = i.flatten(order="F")
    j = j.flatten(order="F")
    mask = np.zeros((1, C, H, W), np.float32)
    mask[:, :, i[idx], j[idx]] = 1.0
    return mask


def _cake_cutting_order(n: int) -> np.ndarray:
    p = int(np.sqrt(n))
    seq = []
    for i in range(1, p + 1):
        step = -i * (-1) ** (i % 2)
        if i % 2 == 1:
            seq += list(range(i, i * p + 1, step))
        else:
            seq += list(range(i * p, i - 1, step))
    return np.argsort(seq)


def _cake_cutting_mask(img_size, m) -> np.ndarray:
    C, H, W = img_size
    if H != W:
        warnings.warn("cake cutting mask assumes square images")
    n = H * W
    idx = sequency_order(n)[_cake_cutting_order(n)][:m]
    i, j = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    i = i.flatten(order="F")
    j = j.flatten(order="F")
    mask = np.zeros((1, C, H, W), np.float32)
    mask[:, :, i[idx], j[idx]] = 1.0
    return mask


def _zig_zag_mask(img_size, m) -> np.ndarray:
    C, H, W = img_size
    I, J = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    S = I + J
    order = np.argsort((S.flatten() * H * W - I.flatten()), kind="stable")
    flat = np.empty(H * W, np.int64)
    flat[order] = np.arange(H * W)
    mask = (flat.reshape(H, W) < m).astype(np.float32)
    mask = np.broadcast_to(mask, (1, C, H, W)).copy()
    return _hadamard_ishift_2d(mask)


def _xy_mask(img_size, m) -> np.ndarray:
    C, H, W = img_size
    X, Y = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    index_matrix = X * Y + (X**2 + Y**2) / 4
    index_matrix = index_matrix / index_matrix.max()
    indx = np.argsort(index_matrix.flatten(), kind="stable")
    rank = np.arange(1, H * W + 1)
    out = np.empty(H * W, np.int64)
    out[indx] = rank
    mask = (out.reshape(H, W) <= m).astype(np.float32)
    mask = np.broadcast_to(mask, (1, C, H, W)).copy()
    return _hadamard_ishift_2d(mask)


class SinglePixelCamera(DecomposablePhysics):
    r"""``y = S H x`` single-pixel camera (reference singlepixel.py:292).

    :param m: number of measurement patterns kept.
    :param img_size: (C, H, W); H, W must be powers of two for the fast path.
    :param ordering: 'sequency' | 'cake_cutting' | 'zig_zag' | 'xy'.

    :Examples:

        Hadamard patterns run as MXU dense matmuls (bit-exact vs the
        butterfly); the operator is decomposable so ``A_dagger`` is closed
        form:

        >>> import jax
        >>> from deepinv_tpu.physics import SinglePixelCamera
        >>> physics = SinglePixelCamera(m=100, img_size=(1, 16, 16))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> y = physics.A(x)  # masked Hadamard spectrum (m kept patterns)
        >>> y.shape, physics.A_dagger(y).shape
        ((1, 1, 16, 16), (1, 1, 16, 16))
    """

    def __init__(self, m: int, img_size, ordering: str = "sequency", fast: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.img_size = tuple(img_size)
        self.m = int(m)
        self.ordering = ordering
        if ordering == "sequency":
            mask = _sequency_mask(self.img_size, self.m)
        elif ordering == "cake_cutting":
            mask = _cake_cutting_mask(self.img_size, self.m)
        elif ordering == "zig_zag":
            mask = _zig_zag_mask(self.img_size, self.m)
        elif ordering == "xy":
            mask = _xy_mask(self.img_size, self.m)
        else:
            raise ValueError(f"unknown ordering {ordering!r}")
        self.mask = jnp.asarray(mask)

    def V_adjoint(self, x):
        return hadamard_2d(x)

    def V(self, y):
        return hadamard_2d(y)  # orthonormal FWHT is self-inverse

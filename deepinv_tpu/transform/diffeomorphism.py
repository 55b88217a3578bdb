"""CPAB diffeomorphism transform, implemented natively.

Counterpart of reference deepinv/transform/diffeomorphism.py
(CPABDiffeomorphism:7), which wraps the external ``libcpab`` package
(CUDA/torch). Here CPAB — Continuous Piecewise-Affine Based
diffeomorphisms (Freifeld et al., "Transformations Based on Continuous
Piecewise-Affine Velocity Fields", TPAMI 2017) — is built from scratch the
TPU way:

- The **basis** of continuous (optionally zero-boundary / divergence-free)
  piecewise-affine velocity fields on a triangular tessellation is a
  host-side numpy null-space computation, cached per configuration.
- **Integration** of the velocity ODE is a fixed-step RK4 ``lax.scan``
  (static step count, no data-dependent control flow); cell lookup is a
  branch-free floor/compare + gather, so the whole warp jits and vmaps.
- Images are warped by integrating the *negative* field backward from the
  output grid and sampling with bilinear ``map_coordinates`` — the inverse
  of a CPAB flow is the flow of ``-v``, so forward and inverse warps are
  exact inverses of each other up to integration error.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from .base import Transform

__all__ = ["CPABDiffeomorphism"]


# ---------------------------------------------------------------- basis ----
@functools.lru_cache(maxsize=None)
def _cpab_basis(nx: int, ny: int, zero_boundary: bool, volume_preservation: bool):
    """Null-space basis of continuous PA fields on the 4-triangle-per-cell
    tessellation of [-1,1]^2. Returns (triangles' vertex matrix pseudo
    structure, basis B of shape (6*T, d), triangle count T)."""
    # vertices of the tessellation: cell corners + cell centers
    xs = np.linspace(-1, 1, nx + 1)
    ys = np.linspace(-1, 1, ny + 1)

    tris = []  # each triangle = 3 vertex coordinates (x, y)
    for i in range(nx):
        for j in range(ny):
            c = np.array([(xs[i] + xs[i + 1]) / 2, (ys[j] + ys[j + 1]) / 2])
            v00 = np.array([xs[i], ys[j]])
            v10 = np.array([xs[i + 1], ys[j]])
            v01 = np.array([xs[i], ys[j + 1]])
            v11 = np.array([xs[i + 1], ys[j + 1]])
            # triangle order inside a cell: left, right, bottom, top
            tris.append((v00, v01, c))
            tris.append((v10, v11, c))
            tris.append((v00, v10, c))
            tris.append((v01, v11, c))
    T = len(tris)

    # constraints: velocities of triangles sharing an edge agree at that
    # edge's endpoints (affine on a segment is fixed by its endpoints).
    # Build shared-vertex pairs: map rounded vertex -> list of (tri, vertex)
    def key(p):
        return (round(float(p[0]), 9), round(float(p[1]), 9))

    # shared edges: for each pair of triangles, if they share 2 vertices
    vert_map = {}
    for t, vs in enumerate(tris):
        for p in vs:
            vert_map.setdefault(key(p), []).append(t)

    rows = []

    def vel_row(t, p, dim):
        """Row of the constraint matrix for velocity dim of triangle t at p."""
        r = np.zeros(6 * T)
        # A_t = [[a, b, c], [d, e, f]]; v = A_t [x, y, 1]
        base = 6 * t + 3 * dim
        r[base : base + 3] = [p[0], p[1], 1.0]
        return r

    # edge continuity: two triangles sharing an edge (two vertices)
    from itertools import combinations

    edge_map = {}
    exact_pts = {}  # rounded key -> exact coordinates (rounding the
    # constraint points themselves would inject ~1e-10 rank noise that
    # poisons the null space)
    for t, vs in enumerate(tris):
        for a, b in combinations(range(3), 2):
            ka, kb = key(vs[a]), key(vs[b])
            exact_pts.setdefault(ka, vs[a])
            exact_pts.setdefault(kb, vs[b])
            ek = tuple(sorted([ka, kb]))
            edge_map.setdefault(ek, []).append(t)
    for (k1, k2), ts in edge_map.items():
        for ta, tb in combinations(ts, 2):
            for p in (exact_pts[k1], exact_pts[k2]):
                for dim in (0, 1):
                    rows.append(vel_row(ta, p, dim) - vel_row(tb, p, dim))

    if zero_boundary:
        for t, vs in enumerate(tris):
            for p in vs:
                if abs(abs(p[0]) - 1) < 1e-9 or abs(abs(p[1]) - 1) < 1e-9:
                    for dim in (0, 1):
                        rows.append(vel_row(t, np.array(p), dim))

    if volume_preservation:
        for t in range(T):
            r = np.zeros(6 * T)
            r[6 * t + 0] = 1.0  # a (dvx/dx)
            r[6 * t + 3 + 1] = 1.0  # e (dvy/dy)
            rows.append(r)

    L = np.asarray(rows)
    _, s, Vt = np.linalg.svd(L)  # Vt is (6T, 6T); null space = rows >= rank
    tol = max(L.shape) * np.finfo(np.float64).eps * (s[0] if len(s) else 1.0)
    rank = int(np.sum(s > tol))
    B = Vt[rank:].T  # (6T, d)
    return np.float32(B), T


# ------------------------------------------------------------ evaluation ----
def _cell_lookup(pts, nx, ny):
    """Branch-free triangle index for points in [-1,1]^2: cell from floor,
    then which of the 4 center-split triangles from the two diagonals."""
    x, y = pts[..., 0], pts[..., 1]
    xc = jnp.clip((x + 1) * nx / 2, 0, nx - 1e-6)
    yc = jnp.clip((y + 1) * ny / 2, 0, ny - 1e-6)
    i = jnp.floor(xc).astype(jnp.int32)
    j = jnp.floor(yc).astype(jnp.int32)
    fx = xc - i  # in [0,1) inside the cell
    fy = yc - j
    # triangle order (left, right, bottom, top) matches _cpab_basis
    left = fx <= jnp.minimum(fy, 1 - fy)
    right = fx >= jnp.maximum(fy, 1 - fy)
    bottom = fy <= jnp.minimum(fx, 1 - fx)
    tri = jnp.where(left, 0, jnp.where(right, 1, jnp.where(bottom, 2, 3)))
    return (i * ny + j) * 4 + tri


def _velocity(pts, A, nx, ny):
    """Evaluate the PA field at pts (..., 2); A is (T, 2, 3)."""
    idx = _cell_lookup(pts, nx, ny)
    At = A[idx]  # (..., 2, 3)
    ones = jnp.ones_like(pts[..., :1])
    ph = jnp.concatenate([pts, ones], axis=-1)
    return jnp.einsum("...ij,...j->...i", At, ph)


def _integrate(pts, A, nx, ny, n_steps=10):
    """RK4 flow of the PA field for unit time (scan, static step count)."""
    h = 1.0 / n_steps

    def step(p, _):
        k1 = _velocity(p, A, nx, ny)
        k2 = _velocity(p + 0.5 * h * k1, A, nx, ny)
        k3 = _velocity(p + 0.5 * h * k2, A, nx, ny)
        k4 = _velocity(p + h * k3, A, nx, ny)
        return p + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4), None

    out, _ = jax.lax.scan(step, pts, None, length=n_steps)
    return out


class CPABDiffeomorphism(Transform):
    """Random CPAB diffeomorphism data augmentation
    (reference diffeomorphism.py:7; same parameters, no external package).

    Follows the library-wide Transform protocol: ``get_params`` samples one
    theta per output image (``n_trans * B``), ``transform`` warps, and the
    base-class ``inverse`` (theta -> -theta) is the *exact* group inverse
    here, because the flow of ``-v`` inverts the flow of ``v``.

    :param n_trans: transformed versions generated per input image.
    :param n_tesselation: cells per dimension of the tessellation.

    :Examples:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.transform import CPABDiffeomorphism
        >>> t = CPABDiffeomorphism()
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> p = t.get_params(x, jax.random.key(1))
        >>> xt = t.transform(x, **p)
        >>> back = t.inverse(xt, **p)  # flow of -v inverts the flow of v
        >>> xt.shape == back.shape == x.shape
        True

    :param sigma: scale of the Gaussian over basis coefficients theta.
    :param zero_boundary: velocity vanishes on the image boundary.
    :param volume_preservation: constrain per-triangle divergence to zero.
    :param n_steps: RK4 integration steps.
    """

    def __init__(
        self,
        n_trans: int = 1,
        n_tesselation: int = 3,
        sigma: float = 0.3,
        zero_boundary: bool = True,
        volume_preservation: bool = False,
        n_steps: int = 10,
        **kwargs,
    ):
        super().__init__(n_trans=n_trans, **kwargs)
        self.n_tesselation = n_tesselation
        self.sigma = sigma
        self.zero_boundary = zero_boundary
        self.volume_preservation = volume_preservation
        self.n_steps = n_steps
        B, T = _cpab_basis(
            n_tesselation, n_tesselation, zero_boundary, volume_preservation
        )
        self.basis = jnp.asarray(B)  # (6T, d)
        self.n_tris = T
        self.dim = B.shape[1]

    def get_params(self, x, key=None):
        from ..core.rng import ensure_key

        key = ensure_key(key, self.seed)
        n = self.n_trans * x.shape[0]
        return {"diffeo": self.sigma * jax.random.normal(key, (n, self.dim))}

    def _field(self, theta):
        return (self.basis @ theta).reshape(self.n_tris, 2, 3)

    def _warp_one(self, img, A):
        """Warp (C, H, W) by the field A; backward warping integrates -A."""
        C, H, W = img.shape
        n = self.n_tesselation
        gy = (jnp.arange(H) + 0.5) / H * 2 - 1
        gx = (jnp.arange(W) + 0.5) / W * 2 - 1
        yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
        pts = jnp.stack([xx, yy], -1).reshape(-1, 2)
        src = _integrate(pts, -A, n, n, self.n_steps).reshape(H, W, 2)
        rows = (src[..., 1] + 1) / 2 * H - 0.5
        cols = (src[..., 0] + 1) / 2 * W - 0.5
        return jax.vmap(
            lambda im: jax.scipy.ndimage.map_coordinates(
                im, [rows, cols], order=1, mode="nearest"
            )
        )(img)

    def transform(self, x, diffeo=None):
        if x.shape[0] != diffeo.shape[0]:
            x = jnp.concatenate([x] * self.n_trans, axis=0)
        A = jax.vmap(self._field)(diffeo)  # (N, T, 2, 3)
        return jax.vmap(self._warp_one)(x, A)

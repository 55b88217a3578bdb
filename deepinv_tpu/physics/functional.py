"""Reference-compatible functional namespace
(counterpart of ``deepinv.physics.functional``,
reference deepinv/physics/functional/__init__.py).

Re-exports this package's stateless kernels under the reference's public
names, plus the handful of reference-only helpers implemented here:
1D DCT wrappers, ``liu_jia_pad`` (DST-I biharmonic boundary extension),
``multiplier_adjoint``, tiled partition-of-unity multipliers, and thin
class wrappers (``Radon``/``IRadon``/``RampFilter``/``ApplyRadon``/
``XrayTransform``) over the functional projectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.linalg import power_method
from ..ops import (
    conv2d,
    conv_transpose2d,
    conv3d,
    conv_transpose3d,
    conv2d_fft,
    conv_transpose2d_fft,
    conv3d_fft,
    conv_transpose3d_fft,
    filter_fft_2d,
    gaussian_blur,
    bilinear_filter,
    bicubic_filter,
    sinc_filter,
    kaiser_window,
    dct2,
    idct2,
    dct1d,
    idct1d,
    dst1,
    histogram,
    histogramdd,
    imresize_matlab,
    random_choice,
    product_convolution2d,
    product_convolution2d_adjoint,
    multiplier,
    ThinPlateSpline,
)
from ..ops import radon as _radon_fn, iradon as _iradon_fn, ramp_filter as _ramp
from ..ops.xray import xray_geometry, xray_transform, ray_integrals

__all__ = [
    "conv2d", "conv_transpose2d", "conv3d", "conv_transpose3d",
    "conv2d_fft", "conv_transpose2d_fft", "conv3d_fft",
    "conv_transpose3d_fft", "filter_fft", "filter_fft_2d",
    "gaussian_blur", "bilinear_filter", "bicubic_filter", "sinc_filter",
    "kaiser_window", "dct", "idct", "dct_2d", "idct_2d", "dst1",
    "histogram", "histogramdd", "imresize_matlab", "random_choice",
    "random_uniform", "product_convolution2d",
    "product_convolution2d_adjoint", "multiplier", "multiplier_adjoint",
    "generate_tiled_multipliers", "liu_jia_pad", "power_method",
    "Radon", "IRadon", "RampFilter", "ApplyRadon", "XrayTransform",
    "ThinPlateSpline",
]

# reference alias (functional/__init__.py exports both spellings)
filter_fft = filter_fft_2d
dct_2d = dct2
idct_2d = idct2


def _dct_scale(N, dtype):
    # orthonormal -> scipy-unnormalized DCT-II factors:
    # X_u[0] = 2 sqrt(N) X_o[0], X_u[k>0] = sqrt(2N) X_o[k]
    s = np.full((N,), np.sqrt(2.0 * N))
    s[0] = np.sqrt(4.0 * N)
    return jnp.asarray(s, dtype)


def dct(x, norm=None):
    """DCT-II over the last axis (reference functional/dct.py:16).

    :param norm: ``None`` (unnormalized, scipy convention) or ``'ortho'``.
    """
    y = dct1d(x, axis=-1, ortho=True)
    if norm == "ortho":
        return y
    return y * _dct_scale(x.shape[-1], x.dtype)


def idct(x, norm=None):
    """Inverse DCT-II (a scaled DCT-III; reference functional/dct.py:52)."""
    if norm == "ortho":
        return idct1d(x, axis=-1, ortho=True)
    N = x.shape[-1]
    return idct1d(x / _dct_scale(N, x.dtype), axis=-1, ortho=True)


def random_uniform(key, shape=(), minval=0.0, maxval=1.0, dtype=jnp.float32):
    """Uniform draws with an explicit key (the reference's generator-based
    ``random_uniform``, functional/hist.py)."""
    return jax.random.uniform(key, shape, dtype, minval, maxval)


def multiplier_adjoint(x, mult):
    """Adjoint of :func:`multiplier`: ``x * conj(mult)``
    (reference functional/multiplier.py)."""
    return x * jnp.conj(mult)


# ---------------------------------------------------------------- padding --
def _biharmonic_inpainting(x):
    """Fill the (zero) interior of ``x`` harmonically given its 1-px
    boundary (reference functional/blur.py:368): solve the 5-point
    Laplace equation by DST-I diagonalization."""
    H, W = x.shape[-2:]
    lap = (
        x[..., 1:-1, 2:] + x[..., 1:-1, :-2] + x[..., 2:, 1:-1]
        + x[..., :-2, 1:-1] - 4 * x[..., 1:-1, 1:-1]
    )
    spec = dst1(lap, axes=(-2, -1), ortho=True)
    fh = jnp.arange(1, H - 1, dtype=x.dtype)
    fw = jnp.arange(1, W - 1, dtype=x.dtype)
    d = (
        2 * jnp.cos(jnp.pi * fh / (H - 1))[:, None]
        + 2 * jnp.cos(jnp.pi * fw / (W - 1))[None, :]
        - 4
    )
    z = dst1(-spec / d, axes=(-2, -1), ortho=True)
    return x.at[..., 1:-1, 1:-1].set(z)


def liu_jia_pad(x, *, padding):
    """Liu-Jia boundary-smoothing pad (reference functional/blur.py:439):
    extends (B, C, H, W) to (B, C, H + 2*pad_h, W + 2*pad_w) with smooth
    circular boundaries (harmonic inpainting of the pad region), removing
    the ringing of spectral deconvolution on real blurry images."""
    if x.ndim != 4:
        raise ValueError("Input tensor must be 4-dimensional (B, C, H, W)")
    padding_lr, padding_tb = padding
    if padding_lr < 0 or padding_tb < 0:
        raise ValueError(f"Padding values must be non-negative. Got: {padding}")
    if padding_lr == 0 and padding_tb == 0:
        return x
    if padding_lr == 0 or padding_tb == 0:
        raise ValueError(f"Single direction padding is not supported. Got: {padding}")

    padding_h = 2 * padding_lr
    padding_w = 2 * padding_tb
    BC = tuple(x.shape[:-2])
    H, W = x.shape[-2:]

    A = jnp.zeros(BC + (2 + padding_h, W), x.dtype)
    B = jnp.zeros(BC + (H, 2 + padding_w), x.dtype)
    C = jnp.zeros(BC + (2 + padding_h, 2 + padding_w), x.dtype)

    # shared boundaries with x (circular continuation)
    A = A.at[..., :1, :].set(x[..., -1:, :]).at[..., -1:, :].set(x[..., :1, :])
    B = B.at[..., :, :1].set(x[..., :, -1:]).at[..., :, -1:].set(x[..., :, :1])

    a = jnp.linspace(0, 1, padding_h, dtype=x.dtype).reshape(
        (1,) * len(BC) + (padding_h,)
    )
    b = jnp.linspace(0, 1, padding_w, dtype=x.dtype).reshape(
        (1,) * len(BC) + (padding_w,)
    )
    A = A.at[..., 1:-1, 0].set((1 - a) * A[..., 0, 0, None] + a * A[..., -1, 0, None])
    A = A.at[..., 1:-1, -1].set(
        (1 - a) * A[..., 0, -1, None] + a * A[..., -1, -1, None]
    )
    B = B.at[..., 0, 1:-1].set((1 - b) * B[..., 0, 0, None] + b * B[..., 0, -1, None])
    B = B.at[..., -1, 1:-1].set(
        (1 - b) * B[..., -1, 0, None] + b * B[..., -1, -1, None]
    )

    # C shares its rows with B and its columns with A (reference
    # blur.py:513-517); B's width is 2 + padding_w, A's height 2 + padding_h
    C = C.at[..., :1, :].set(B[..., -1:, :])
    C = C.at[..., -1:, :].set(B[..., :1, :])
    C = C.at[..., :, :1].set(A[..., :, -1:])
    C = C.at[..., :, -1:].set(A[..., :, :1])

    A = _biharmonic_inpainting(A)
    B = _biharmonic_inpainting(B)
    C = _biharmonic_inpainting(C)

    A = A[..., 1:-1, :]
    B = B[..., :, 1:-1]
    C = C[..., 1:-1, 1:-1]

    z = jnp.concatenate(
        [jnp.concatenate([x, B], axis=-1), jnp.concatenate([A, C], axis=-1)],
        axis=-2,
    )
    return jnp.roll(z, shift=padding, axis=(-2, -1))


# ------------------------------------------------------------------ tiles --
def generate_tiled_multipliers(img_size, patch_size, stride, mode="bump",
                               dtype=jnp.float32):
    """Per-patch partition-of-unity blending masks, shape
    ``(1, 1, K, ph, pw)`` (reference functional/tiled_product_convolution.py
    generate_tiled_multipliers; used by TiledSpaceVaryingBlur)."""
    pair = lambda v: (v, v) if isinstance(v, int) else tuple(v)
    H, W = pair(img_size)
    ph, pw = pair(patch_size)
    sh, sw = pair(stride)

    def wins(L, p, s):
        n = (L - p) // s + 1
        Lp = p + (n - 1) * s
        t = np.linspace(-1, 1, p)
        if mode == "linear":
            w = 1.0 - np.abs(t)
        elif mode == "bump":
            w = np.exp(-1.0 / np.clip(1 - t**2, 1e-9, None))
        else:
            raise ValueError("mode must be 'bump' or 'linear'")
        w = np.clip(w, 1e-12, None)
        M = np.zeros((n, Lp))
        for i in range(n):
            M[i, i * s : i * s + p] = w
        M /= M.sum(0, keepdims=True) + 1e-8
        return M, n

    My, ny = wins(H, ph, sh)
    Mx, nx = wins(W, pw, sw)
    # crop each patch's mask to its own window
    out = np.zeros((ny * nx, ph, pw))
    for i in range(ny):
        for j in range(nx):
            out[i * nx + j] = np.outer(
                My[i, i * sh : i * sh + ph], Mx[j, j * sw : j * sw + pw]
            )
    return jnp.asarray(out, dtype)[None, None]


def tiled_product_convolution(x, filters, patch_size, stride,
                              mode: str = "bump"):
    """Tiled space-varying convolution ``y = sum_k h_k * (m_k . x)``
    (reference functional tiled PC); delegates to
    :class:`deepinv_tpu.physics.TiledSpaceVaryingBlur`."""
    from .blur import TiledSpaceVaryingBlur

    p = TiledSpaceVaryingBlur(filters=filters, patch_size=patch_size,
                              stride=stride, blending_mode=mode)
    return p.A(x)


# ------------------------------------------------------------------ radon --
class Radon:
    """Functional Radon projector (reference functional/radon.py Radon)."""

    def __init__(self, in_size=None, theta=None, circle: bool = False,
                 parallel_computation: bool = True, fan_beam: bool = False,
                 fan_parameters=None, dtype=jnp.float32):
        self.theta = jnp.asarray(
            theta if theta is not None else jnp.arange(180.0), dtype
        )
        self.circle = circle
        self.fan_beam = fan_beam
        self.fan_parameters = fan_parameters

    def __call__(self, x):
        if self.fan_beam:
            from ..ops import radon as _  # noqa: F401
            from ..ops.radon import fanbeam

            return fanbeam(x, self.theta, **(self.fan_parameters or {}))
        return _radon_fn(x, self.theta, circle=self.circle)


class IRadon:
    """Functional filtered/plain backprojection (reference functional
    IRadon)."""

    def __init__(self, in_size=None, theta=None, circle: bool = False,
                 use_filter: bool = True, out_size=None, dtype=jnp.float32):
        self.in_size = in_size
        self.theta = jnp.asarray(
            theta if theta is not None else jnp.arange(180.0), dtype
        )
        self.circle = circle
        self.use_filter = use_filter

    def __call__(self, sino):
        return _iradon_fn(
            sino, self.theta, circle=self.circle, filtered=self.use_filter,
            out_size=self.in_size,
        )


class RampFilter:
    """Frequency-domain ramp filter (reference functional/radon.py:168)."""

    def create_filter(self, f):
        """The ramp filter passes the base |omega| response through
        unchanged (reference radon.py:172)."""
        return f

    def _get_fourier_filter(self, size: int):
        """Real-spectrum ramp response of the Ram-Lak kernel (reference
        radon.py:151)."""
        n = np.concatenate([np.arange(1, size / 2 + 1, 2),
                            np.arange(size / 2 - 1, 0, -2)])
        f = np.zeros(size, np.float32)
        f[0] = 0.25
        f[1::2] = -1 / (np.pi * n) ** 2
        return 2 * jnp.fft.rfft(jnp.asarray(f))

    def filter(self, x, fourier_filter, pad_width: int, dim: int = 3):
        """Filter the detector axis ``dim`` of a sinogram with a 1D Fourier
        filter, zero-padding by ``pad_width`` first (reference
        radon.py:115)."""
        input_size = x.shape[dim]
        pad = [(0, 0)] * x.ndim
        pad[dim] = (0, pad_width)
        padded = jnp.pad(x, pad)
        result = jnp.fft.irfft(
            jnp.fft.rfft(padded, axis=dim) * fourier_filter, axis=dim,
            n=padded.shape[dim])
        return jax.lax.slice_in_dim(result, 0, input_size, axis=dim)

    def __call__(self, sino):
        return _ramp(sino)


class ApplyRadon:
    """Function-style Radon apply with explicit adjoint (the reference's
    autograd.Function, functional/radon.py ApplyRadon). In JAX the forward
    is differentiable as-is; ``apply`` exists for API parity."""

    @staticmethod
    def apply(x, radon: "Radon", iradon: "IRadon", is_adjoint: bool = False):
        return iradon(x) if is_adjoint else radon(x)


class XrayTransform:
    """Native ray-driven X-ray transform (the reference's astra-backed
    ``XrayTransform``, functional/astra.py:13 — here the in-repo projector
    of :mod:`deepinv_tpu.ops.xray`).

    :param geometry: dict from :func:`deepinv_tpu.ops.xray.xray_geometry`
        (or kwargs for it).
    :param img_size: (H, W) or (D, H, W).
    """

    def __init__(self, geometry=None, img_size=None, pixel_spacing=1.0,
                 n_detector_pixels=None, **geom_kwargs):
        self.geometry_type = geom_kwargs.get("geometry_type")
        if geometry is None:
            geometry = xray_geometry(**geom_kwargs)
        self.geometry = geometry
        self.img_size = tuple(img_size)
        self.pixel_spacing = pixel_spacing
        self.n_detector_pixels = n_detector_pixels

    # -- geometry queries (reference functional/astra.py:50-135; derived
    # from the astra-style per-view vectors instead of astra dicts) --------

    @property
    def domain_shape(self) -> tuple:
        """Shape of the input volume (reference astra.py:50)."""
        return tuple(self.img_size)

    @property
    def range_shape(self) -> tuple:
        """Shape of the output projection: (A, N) in 2D, (V, A, N) in 3D
        (reference astra.py:57)."""
        A = int(np.asarray(self.geometry["det"]).shape[0])
        n = self.n_detector_pixels
        if isinstance(n, (tuple, list)):
            V, N = int(n[0]), int(n[-1])
        else:
            N = int(n) if n is not None else int(
                np.ceil(np.sqrt(2) * max(self.img_size[-2:])))
            V = self.img_size[0] if len(self.img_size) == 3 else None
        return (A, N) if V is None else (V, A, N)

    @property
    def detector_cell_u_length(self) -> float:
        """Horizontal detector cell pitch ``||u||`` (reference
        astra.py:93)."""
        return float(np.linalg.norm(np.asarray(self.geometry["u"])[0]))

    @property
    def detector_cell_v_length(self) -> float:
        """Vertical detector cell pitch ``||v||`` (reference astra.py:83)."""
        return float(np.linalg.norm(np.asarray(self.geometry["v"])[0]))

    @property
    def detector_cell_area(self) -> float:
        """Physical area of one detector cell (reference astra.py:103)."""
        return self.detector_cell_u_length * self.detector_cell_v_length

    @property
    def source_radius(self) -> float:
        """Source-to-rotation-axis distance (reference astra.py:108);
        0.0 for parallel geometries (no point source)."""
        src = self.geometry.get("src")
        if src is None:
            return 0.0
        return float(np.linalg.norm(np.asarray(src)[0]))

    @property
    def detector_radius(self) -> float:
        """Detector-centre-to-rotation-axis distance (reference
        astra.py:119)."""
        return float(np.linalg.norm(np.asarray(self.geometry["det"])[0]))

    @property
    def object_cell_volume(self) -> float:
        """Physical volume of one voxel (reference astra.py:64)."""
        return float(self.pixel_spacing) ** len(self.img_size)

    @property
    def magnification_factor(self) -> float:
        """Cone-beam magnification (reference astra.py:130); 1.0 for
        parallel and fan geometries."""
        if (self.geometry_type and "cone" in self.geometry_type
                and self.source_radius > 0):
            return (self.detector_radius + self.source_radius) / self.source_radius
        return 1.0

    def __call__(self, x):
        return xray_transform(
            x, self.geometry, self.img_size,
            pixel_spacing=self.pixel_spacing,
            n_detector_pixels=self.n_detector_pixels,
        )

    forward = __call__

    def T(self, y):
        """Exact adjoint via linear_transpose."""
        from ..core.linalg import transpose_primal

        B, Cc = y.shape[:2]
        fwd = lambda v: self(v)
        (xt,) = jax.linear_transpose(
            fwd, transpose_primal(y, (B, Cc) + self.img_size)
        )(y)
        return xt

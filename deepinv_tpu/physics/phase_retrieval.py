"""Phase retrieval physics (reference deepinv/physics/phase_retrieval.py,
539 LoC) + spectral initialization (reference optim/phase_retrieval.py).

``y = |Bx|^2`` with B a linear operator. Nonlinear Physics with analytic
``A_vjp`` through the squared modulus; ``B_dagger``-based pseudo-inverse.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from ..core.linalg import power_method
from .base import Physics, LinearPhysics
from .compressed_sensing import CompressedSensing
from .structured_random import StructuredRandom, generate_diagonal

__all__ = [
    "PhaseRetrieval",
    "RandomPhaseRetrieval",
    "StructuredRandomPhaseRetrieval",
    "PtychographyLinearOperator",
    "Ptychography",
    "spectral_methods",
    "correct_global_phase",
    "cosine_similarity",
]


class PhaseRetrieval(Physics):
    r"""``y = |Bx|^2`` (reference phase_retrieval.py:17)."""

    def __init__(self, B: LinearPhysics, **kwargs):
        super().__init__(**kwargs)
        self.B = B

    def A(self, x, **params):
        return jnp.abs(self.B.A(x, **params)) ** 2

    def A_vjp(self, x, v):
        """v^T dA/dx = B_adjoint(2 conj(Bx) . v) (reference :87)."""
        bx = self.B.A(x)
        return self.B.A_adjoint(2.0 * bx * v)

    def B_adjoint(self, y, **params):
        return self.B.A_adjoint(y, **params)

    def A_adjoint(self, y, **params):
        """Adjoint of the underlying linear ``B`` (reference
        phase_retrieval.py:63 — used as a cheap linear backprojection)."""
        return self.B_adjoint(y, **params)

    def B_dagger(self, y, **params):
        return self.B.A_dagger(y, **params)

    def release_memory(self):
        """Reference API (phase_retrieval.py:101 frees the CUDA matrix);
        no-op here — XLA buffers are freed when the pytree is dropped."""
        return self

    def A_dagger(self, y, key=None, **params):
        """Spectral-method initialization (reference :52)."""
        return spectral_methods(y, self, key=key)


class RandomPhaseRetrieval(PhaseRetrieval):
    r"""iid complex Gaussian B (reference phase_retrieval.py:107).

    :Examples:

        ``y = |Bx|^2`` is nonlinear; ``A_vjp`` provides the chain rule for
        data-fidelity gradients:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.physics import RandomPhaseRetrieval
        >>> physics = RandomPhaseRetrieval(m=40, img_size=(1, 5, 5),
        ...                                key=jax.random.key(0))
        >>> x = jax.random.normal(jax.random.key(1), (1, 1, 5, 5)) + 0j
        >>> y = physics.A(x)
        >>> y.shape, bool(jnp.all(y.real >= 0))
        ((1, 40), True)
    """

    def __init__(self, m: int, img_size, key=None, seed: int = 0, **kwargs):
        key = ensure_key(key, seed)
        n = int(np.prod(img_size))
        kr, ki = jax.random.split(key)
        mat = (
            jax.random.normal(kr, (m, n)) + 1j * jax.random.normal(ki, (m, n))
        ) / math.sqrt(2 * m)
        mat = jax.jit(lambda a: a)(mat.astype(jnp.complex64))
        img_size = tuple(img_size)

        class _DenseB(LinearPhysics):
            def __init__(self, mat):
                super().__init__()
                self.mat = mat

            def A(self, x, **p):
                v = x.reshape(x.shape[0], -1).astype(jnp.complex64)
                return v @ self.mat.T

            def A_adjoint(self, y, **p):
                v = y @ jnp.conj(self.mat)
                return v.reshape((y.shape[0],) + img_size)

        super().__init__(_DenseB(mat), **kwargs)
        self.m = m
        self.img_size = img_size

    def get_A_squared_mean(self):
        """E[|B_ij|^2] of the sensing matrix (reference
        phase_retrieval.py:179 — spectral-method normalization)."""
        a = self.B.mat
        return jnp.var(a) + jnp.abs(jnp.mean(a)) ** 2


class StructuredRandomPhaseRetrieval(PhaseRetrieval):
    r"""``B = prod_i F D_i`` structured random phase retrieval
    (reference phase_retrieval.py:183): oversampled Fourier with random
    phase diagonals."""

    def __init__(self, img_size, output_size=None, n_layers: int = 2, key=None, seed: int = 0, **kwargs):
        key = ensure_key(key, seed)
        img_size = tuple(img_size)
        output_size = tuple(output_size) if output_size is not None else img_size
        keys = jax.random.split(key, n_layers)
        diagonals = [
            generate_diagonal(img_size, "uniform_phase", keys[i])
            for i in range(n_layers)
        ]

        class _StructB(LinearPhysics):
            def __init__(self, diagonals):
                super().__init__()
                self.diagonals = diagonals

            @staticmethod
            def _crop_or_pad(v, hw):
                """Center-crop to (h, w) when smaller, zero-pad when
                larger — supports both under- and OVERsampled
                configurations (the reference zero-pads for
                output_size > img_size; negative-index crops silently
                returned wrong shapes before r5)."""
                H, W = v.shape[-2:]
                h, w = hw
                if h <= H and w <= W:
                    top, left = (H - h) // 2, (W - w) // 2
                    return v[..., top:top + h, left:left + w]
                pad = [(0, 0)] * (v.ndim - 2) + [
                    ((h - H) // 2, h - H - (h - H) // 2),
                    ((w - W) // 2, w - W - (w - W) // 2),
                ]
                return jnp.pad(v, pad)

            def A(self, x, **p):
                out = x.astype(jnp.complex64)
                for d in self.diagonals:
                    out = jnp.fft.fft2(out * d, norm="ortho")
                return self._crop_or_pad(out, output_size[-2:])

            def A_adjoint(self, y, **p):
                # adjoint of crop is pad and vice versa
                out = self._crop_or_pad(y, img_size[-2:])
                for d in reversed(self.diagonals):
                    out = jnp.fft.ifft2(out, norm="ortho") * jnp.conj(d)
                return out

        super().__init__(_StructB(diagonals), **kwargs)
        self.img_size = img_size
        self.output_size = output_size
        self.n_layers = n_layers

    @property
    def diagonals(self):
        """Random phase diagonals of the structured product."""
        return self.B.diagonals

    def get_A_squared_mean(self):
        """Mean of the squared operator entries, ``var + mean^2`` of the
        first diagonal (reference phase_retrieval.py:298); ``None`` for the
        single-Fourier (n_layers=0.5) structure."""
        if self.n_layers == 0.5:
            import warnings

            warnings.warn(
                "computing the mean of the squared operator for a single "
                "Fourier transform.")
            return None
        d = self.diagonals[0]
        return jnp.var(d) + jnp.mean(d) ** 2

    @staticmethod
    def get_structure(n_layers) -> str:
        """Operator structure string, e.g. ``'FDFD'`` (reference
        phase_retrieval.py:307)."""
        import math

        return "FD" * math.floor(n_layers) + "F" * (n_layers % 1 == 0.5)


class PtychographyLinearOperator(LinearPhysics):
    r"""Linear ptychography operator (reference phase_retrieval.py:317):
    shifted illumination probes followed by Fourier transforms."""

    def __init__(self, img_size, probe=None, shifts=None, n_img: int = 25, probe_radius: float = 0.3, **kwargs):
        super().__init__(**kwargs)
        self.img_size = tuple(img_size)
        H, W = self.img_size[-2:]
        if probe is None:
            yy, xx = np.meshgrid(
                np.arange(H) - H / 2, np.arange(W) - W / 2, indexing="ij"
            )
            r = np.sqrt(yy**2 + xx**2)
            probe = (r < probe_radius * min(H, W)).astype(np.float32)
        self.probe = jnp.asarray(probe, jnp.complex64)
        if shifts is None:
            k = int(np.sqrt(n_img))
            ys = np.linspace(-H / 4, H / 4, k).astype(int)
            xs = np.linspace(-W / 4, W / 4, k).astype(int)
            shifts = np.array([(y, x) for y in ys for x in xs])
        self.shifts = jnp.asarray(np.asarray(shifts), jnp.int32)

    def _shifted_probe(self, shift):
        """Probe shifted by ``(dy, dx)`` with the wrapped-in region ZEROED
        (vmap-safe arithmetic mask). A plain jnp.roll wrapped probe pixels
        around the image edge, so boundary measurements included
        illumination that :meth:`get_overlap_img`'s coverage map (which
        zeroes those regions) did not account for."""
        p = jnp.roll(self.probe, (shift[0], shift[1]), axis=(-2, -1))
        H, W = p.shape[-2:]
        ii = jnp.arange(H)[:, None]
        jj = jnp.arange(W)[None, :]
        sy, sx = shift[0], shift[1]
        keep = (jnp.where(sy >= 0, ii >= sy, ii < H + sy)
                & jnp.where(sx >= 0, jj >= sx, jj < W + sx))
        return p * keep

    def A(self, x, **params):
        xc = x.astype(jnp.complex64)

        def one(shift):
            return jnp.fft.fft2(xc * self._shifted_probe(shift), norm="ortho")

        out = jax.vmap(one)(self.shifts)  # (n_img, B, C, H, W)
        return jnp.moveaxis(out, 0, 1)  # (B, n_img, C, H, W)

    def A_adjoint(self, y, **params):
        yc = jnp.moveaxis(y, 1, 0)

        def one(shift, yi):
            return jnp.fft.ifft2(yi, norm="ortho") * jnp.conj(
                self._shifted_probe(shift))

        outs = jax.vmap(one)(self.shifts, yc)
        return jnp.sum(outs, axis=0)

    @staticmethod
    def shift(x, x_shift, y_shift, pad_zeros: bool = True):
        """Roll ``x`` by ``(x_shift, y_shift)``, optionally zeroing the
        wrapped-in region (reference phase_retrieval.py:397)."""
        x = jnp.roll(x, (x_shift, y_shift), axis=(-2, -1))
        if pad_zeros:
            H, W = x.shape[-2:]
            ii = jnp.arange(H)[:, None]
            jj = jnp.arange(W)[None, :]
            keep = jnp.ones((H, W), bool)
            if x_shift < 0:
                keep = keep & (ii < H + x_shift)
            elif x_shift > 0:
                keep = keep & (ii >= x_shift)
            if y_shift < 0:
                keep = keep & (jj < W + y_shift)
            elif y_shift > 0:
                keep = keep & (jj >= y_shift)
            x = jnp.where(keep, x, 0)
        return x

    def get_overlap_img(self, shifts):
        """Sum of squared shifted probe intensities — the illumination
        coverage map used for normalization (reference
        phase_retrieval.py:420)."""
        overlap = jnp.zeros(self.probe.shape, jnp.float32)
        for x_shift, y_shift in np.asarray(shifts):
            overlap = overlap + jnp.abs(
                self.shift(self.probe, int(x_shift), int(y_shift))) ** 2
        return overlap


class Ptychography(PhaseRetrieval):
    r"""``y = |Ptycho(x)|^2`` (reference phase_retrieval.py:433)."""

    def __init__(self, img_size, probe=None, shifts=None, n_img: int = 25,
                 probe_radius: float = 0.3, **kwargs):
        B = PtychographyLinearOperator(
            img_size, probe=probe, shifts=shifts, n_img=n_img,
            probe_radius=probe_radius,
        )
        super().__init__(B, **kwargs)
        self.img_size = tuple(img_size)


# ---------------------------------------------------------------------------
# Spectral initialization and phase utilities (reference optim/phase_retrieval.py)
# ---------------------------------------------------------------------------


def spectral_methods(y, physics, x=None, n_iter: int = 50, preprocessing=None, lamb: float = 10.0, key=None):
    """Spectral initialization: leading eigenvector of
    ``B^* diag(T(y)) B + lamb I`` by power iteration (reference
    optim/phase_retrieval.py spectral_methods)."""
    key = ensure_key(key, 23)
    if preprocessing is None:
        preprocessing = lambda u: jnp.maximum(1 - 1 / jnp.clip(u, 1e-6, None), -5.0)
    yn = y / jnp.mean(y, axis=tuple(range(1, y.ndim)), keepdims=True)
    diag = preprocessing(yn)

    if x is None:
        shape = physics.B.A_adjoint(y).shape
        x = jax.random.normal(key, shape)
    x = x.astype(jnp.complex64)

    def op(v):
        return physics.B.A_adjoint(diag * physics.B.A(v)) + lamb * v

    v = x
    for _ in range(n_iter):
        v = op(v)
        v = v / jnp.sqrt(jnp.sum(jnp.abs(v) ** 2))
    # normalize per-sample to measurement energy; reduce over ALL non-batch
    # y axes to a (B,) scale and re-broadcast at v's rank (y and v may have
    # different ranks, e.g. ptychography's (B, n_img, C, H, W) measurements)
    scale = jnp.sqrt(jnp.mean(y, axis=tuple(range(1, y.ndim))))
    vmean = jnp.sqrt(jnp.mean(jnp.abs(physics.B.A(v)) ** 2, axis=tuple(range(1, y.ndim))))
    ratio = (scale / jnp.clip(vmean, 1e-12, None)).reshape(
        (v.shape[0],) + (1,) * (v.ndim - 1)
    )
    return v * ratio


def correct_global_phase(x_hat, x):
    """Align the global phase of x_hat with x (reference
    optim/phase_retrieval.py correct_global_phase)."""
    inner = jnp.sum(jnp.conj(x_hat) * x, axis=tuple(range(1, x.ndim)), keepdims=True)
    phase = inner / jnp.clip(jnp.abs(inner), 1e-12, None)
    return x_hat * phase


def cosine_similarity(a, b):
    num = jnp.abs(jnp.vdot(a, b))
    den = jnp.sqrt(jnp.sum(jnp.abs(a) ** 2) * jnp.sum(jnp.abs(b) ** 2))
    return num / jnp.clip(den, 1e-12, None)

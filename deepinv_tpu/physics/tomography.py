"""Computed tomography physics (reference deepinv/physics/tomography.py:26).

``Tomography`` wraps the pure-XLA Radon/IRadon kernels (ops/radon.py). The
adjoint is the *exact* transpose of the forward (``jax.linear_transpose``),
unlike the reference's interpolation-based approximate adjoint — so the
universal adjointness property tests hold to float precision. ``A_dagger``
is filtered backprojection.

The reference's ``TomographyWithAstra`` (CUDA astra-toolbox bridge,
tomography.py:353) has no TPU equivalent; the pure path covers its parallel-
beam functionality.
"""

from __future__ import annotations

import math
from typing import Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.radon import radon, iradon, radon_output_size, fanbeam
from ..ops.radon_fourier import radon_fourier, iradon_fourier
from ..ops.radon_slice import (
    radon_slice,
    iradon_slice,
    radon_slice_adjoint,
    radon_slice_normal_spec,
    radon_slice_normal,
)
from .base import LinearPhysics

__all__ = ["Tomography", "Tomography3D"]


class Tomography(LinearPhysics):
    r"""Parallel-beam CT ``y = R x`` (reference tomography.py:26).

    :param angles: number of angles (spread over [0, 180)) or explicit array
        of angles in degrees.
    :param img_width: input image width (square images).
    :param circle: restrict to the inscribed circle (no padding).
    :param normalize: scale A and A_adjoint so the operator has roughly unit
        norm (reference :68 — normalization by img_width).
    :param method: 'interp' (bilinear grid sampling, bit-comparable to the
        reference) or 'fourier' (gather-free FFT three-shear rotation,
        ~5x faster on TPU with exact sinc interpolation — see
        ops/radon_fourier.py).
    """

    def __init__(
        self,
        angles: Union[int, np.ndarray],
        img_width: int,
        circle: bool = False,
        normalize: bool = False,
        fbp_interpolate_boundary: bool = False,
        method: str = "interp",
        fan_beam: bool = False,
        fan_parameters: dict = None,
        fast_normal: bool = True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if isinstance(angles, int):
            theta = np.linspace(0, 180, angles, endpoint=False)
        else:
            theta = np.asarray(angles, np.float32)
        self.theta = jnp.asarray(theta, jnp.float32)
        # static copy for the fourier path: shear planning (grid sizes,
        # quadrant reduction) happens at trace time and needs concrete angles
        self._theta_deg = tuple(float(t) for t in np.asarray(theta))
        self.img_width = int(img_width)
        self.circle = circle
        self.normalize = normalize
        self.n_det = radon_output_size(self.img_width, circle)
        self.method = method
        self.fan_beam = fan_beam
        fp = dict(fan_parameters or {})
        fp.setdefault("pixel_spacing", 0.5 / self.img_width)
        fp.setdefault("source_radius", 57.5)
        fp.setdefault("detector_radius", 57.5)
        fp.setdefault("n_detector_pixels", 258)
        fp.setdefault("detector_spacing", 0.077)
        self.fan_parameters = fp
        if fan_beam:
            self.n_det = fp["n_detector_pixels"]
        # Toeplitz-embedded normal operator (slice method): A^T A as two
        # FFTs + pointwise multiply — the hot op of every iterative solver
        # (~17x faster than adjoint-of-forward on a v5e; see ops/radon_slice)
        self._normal_spec = (
            radon_slice_normal_spec(self.img_width, self._theta_deg, circle=circle)
            if (method == "slice" and not fan_beam and fast_normal)
            else None
        )

    def _theta_for(self, fn):
        """Concrete angles for fourier/slice-mode functions (their sampling
        plans are built at trace time), traced/differentiable otherwise."""
        if fn in (radon_fourier, iradon_fourier, radon_slice, iradon_slice):
            return np.asarray(self._theta_deg, np.float32)
        return self.theta

    def A(self, x, **params):
        if self.fan_beam:
            y = fanbeam(x, self.theta, **self.fan_parameters)
        else:
            fwd = {"fourier": radon_fourier, "slice": radon_slice}.get(self.method, radon)
            y = fwd(x, self._theta_for(fwd), circle=self.circle)
        if self.normalize:
            y = y / self.img_width
        return y

    def A_adjoint(self, y, **params):
        B, C = y.shape[:2]
        x_shape = (B, C, self.img_width, self.img_width)
        if not self.fan_beam and self.method == "slice":
            # explicit fast adjoint: sorted segment-sum scatter (see
            # ops/radon_slice.py), exact transpose of radon_slice
            if self.normalize:
                y = y / self.img_width
            return radon_slice_adjoint(
                y, np.asarray(self._theta_deg, np.float32),
                circle=self.circle, out_size=self.img_width,
            )
        if self.fan_beam:
            fwd = lambda x: fanbeam(x, self.theta, **self.fan_parameters)
        else:
            radon_fn = {"fourier": radon_fourier, "slice": radon_slice}.get(self.method, radon)
            fwd = lambda x: radon_fn(x, self._theta_for(radon_fn), circle=self.circle)
        (xt,) = jax.linear_transpose(
            fwd, jax.ShapeDtypeStruct(x_shape, y.dtype)
        )(y)
        if self.normalize:
            xt = xt / self.img_width
        return xt

    @property
    def fast_normal(self) -> bool:
        """True when ``A_adjoint_A`` runs via the precomputed Toeplitz
        spectrum (consumed by ``optim.L2.grad`` to split the data-fidelity
        gradient into ``A_adjoint_A(x) - A_adjoint(y)``, whose second term
        XLA hoists out of reconstruction loops as loop-invariant)."""
        return self._normal_spec is not None

    def A_adjoint_A(self, x, **params):
        if self._normal_spec is not None:
            out = radon_slice_normal(x, self._normal_spec, circle=self.circle)
            if self.normalize:
                out = out / self.img_width**2
            return out
        return self.A_adjoint(self.A(x, **params), **params)

    def A_dagger(self, y, **params):
        """Filtered backprojection (reference tomography.py A_dagger)."""
        if self.fan_beam:
            # approximate fan-beam FBP: ramp filter + adjoint (weighted BP)
            from ..ops.radon import ramp_filter

            yf = ramp_filter(y)
            xt = self.A_adjoint(yf)
            return xt * jnp.pi / (2 * self.theta.shape[0])
        if self.normalize:
            y = y * self.img_width
        ifn = {"fourier": iradon_fourier, "slice": iradon_slice}.get(self.method, iradon)
        return ifn(
            y, self._theta_for(ifn), circle=self.circle, filtered=True, out_size=self.img_width
        )

    def fbp(self, y, **params):
        return self.A_dagger(y, **params)


class TomographyWithAstra:
    """Gated adapter for the ASTRA toolbox (reference tomography.py
    TomographyWithAstra). ASTRA is a CUDA/CPU C++ library not available on
    TPU; the native :class:`Tomography` (interp | fourier projectors,
    parallel and fan beam) covers the same geometries on-device."""

    def __init__(self, *args, **kwargs):
        raise ImportError(
            "TomographyWithAstra requires the 'astra-toolbox' package "
            "(CUDA/CPU only). Use deepinv_tpu.physics.Tomography instead — "
            "it provides parallel/fan-beam projectors natively on TPU."
        )


class Tomography3D(LinearPhysics):
    r"""3D parallel-beam CT: rotation about the z axis, so every z-slice
    projects independently through the 2D Radon transform (the reference
    covers 3D geometries through the astra bridge, tomography.py:353; its
    3D 'parallel' case is exactly this slice-stacked operator; cone beam
    remains gated with :class:`TomographyWithAstra`).

    Volumes are (B, C, D, H, W) with square slices; sinograms are
    (B, C, D, n_det, n_angles). All 2D projector backends are available
    (``method='interp' | 'fourier' | 'slice'``), including the slice
    method's Toeplitz-embedded ``A_adjoint_A`` fast path which applies
    batched over depth.
    """

    def __init__(self, angles, img_size, **kwargs):
        img_size = tuple(img_size)
        if len(img_size) != 3 or img_size[-1] != img_size[-2]:
            raise ValueError("img_size must be (D, H, W) with H == W")
        self.depth = img_size[0]
        noise_model = kwargs.pop("noise_model", None)
        super().__init__(noise_model=noise_model)
        self._slice_physics = Tomography(
            angles=angles, img_width=img_size[-1], **kwargs
        )
        self.img_width = img_size[-1]
        self.n_det = self._slice_physics.n_det
        self.theta = self._slice_physics.theta

    def _per_slice(self, fn, v):
        # (B, C, D, h, w) -> fold depth into channels (the 2D projectors
        # treat leading dims as batch), apply, unfold
        B, C, D = v.shape[:3]
        out = fn(v.reshape(B, C * D, *v.shape[3:]))
        return out.reshape(B, C, D, *out.shape[2:])

    def A(self, x, **params):
        return self._per_slice(self._slice_physics.A, x)

    def A_adjoint(self, y, **params):
        return self._per_slice(self._slice_physics.A_adjoint, y)

    def A_adjoint_A(self, x, **params):
        return self._per_slice(self._slice_physics.A_adjoint_A, x)

    @property
    def fast_normal(self) -> bool:
        return getattr(self._slice_physics, "fast_normal", False)

    def A_dagger(self, y, **params):
        """Per-slice filtered backprojection (the 3D-parallel analogue of
        the reference's FBP/FDK A_dagger, tomography.py:713)."""
        return self._per_slice(self._slice_physics.A_dagger, y)

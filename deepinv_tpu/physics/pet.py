"""Positron emission tomography physics (reference deepinv/physics/pet.py:13).

The reference wraps the CUDA ``parallelproj`` projectors in custom autograd
Functions (pet.py:355,436). There is no TPU build of parallelproj; this
implementation uses the framework's own parallel-beam projectors with the
reference's PET modelling surface:

- line-integral projector (2D, or 3D via per-plane projection, or the full
  multi-ring cylinder geometry with oblique LORs when ``ring_differences``
  is given: crystal-to-crystal rays per michelogram segment through
  ``ops.xray.ray_integrals``, with an exact adjoint),
- Gaussian resolution model ``g * x`` (reference ``fwhm_data_mm`` /
  ``GaussianFilterOperator``, pet.py:193),
- attenuation correction factors ``c`` applied in sinogram space (an
  image-space ``mu`` map is converted through the projector: c = exp(-R mu)),
- additive expected ``background`` (randoms + scatter) with
  ``A(x, add_background=True)`` and ``generate_background`` (pet.py:304),
- optional operator-norm normalization (pet.py:119 ``normalize``),
- Poisson counting noise, and an MLEM/OSEM reconstruction baseline.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.radon import radon, iradon
from ..ops.radon_fourier import radon_fourier
from ..ops.radon_slice import radon_slice
from .base import LinearPhysics
from .noise import PoissonNoise
from ..core.linalg import transpose_primal

__all__ = ["PET"]


class PET(LinearPhysics):
    r"""PET forward operator ``y = c . R(g * x) (+ b)`` (reference pet.py:13).

    :param img_size: activity image size — int or (H, W) for 2D (square),
        (D, H, W) for 3D (per-plane projection over D rings).
    :param angles: number of projection angles over 180 degrees.
    :param fwhm: resolution-model FWHM in pixels (Gaussian PSF ``g``; 0
        disables it). Counterpart of the reference's ``fwhm_data_mm``.
    :param attenuation: attenuation map — image-space ``mu`` (converted to
        sinogram factors ``c = exp(-R mu)``) or precomputed sinogram-space
        factors (shape inferred, like the reference's ``update_parameters``).
    :param background: expected additive background sinogram ``b``.
    :param sensitivity: per-bin detector sensitivity.
    :param normalize: scale A and A_adjoint by the operator norm.
    :param gain: Poisson noise gain (reference ``gain``).
    :param img_width: legacy alias for square 2D ``img_size``.
    :param ring_differences: (3D only) michelogram segments as ring-index
        differences, e.g. ``(0, -1, 1)``; enables the cylinder LOR geometry
        with oblique segments (parallelproj semantics, reference pet.py:355).
        Measurements become ``(B, C, S, D, N, A)`` — segment, ring, radial
        bin, angle.
    :param scanner_radius: crystal ring radius in pixel units (default:
        ``img_width``, outside the FOV).
    :param ring_spacing: axial crystal pitch in voxel units.
    :param n_radial: radial bins per view (default ``img_width``).
    """

    def __init__(
        self,
        img_size=None,
        angles: int = 90,
        fwhm: float = 0.0,
        attenuation=None,
        background=None,
        sensitivity=None,
        normalize: bool = False,
        gain: float = 1.0,
        counts: float = 1e6,
        method: str = "interp",
        noise_model=None,
        img_width: int = None,
        ring_differences=None,
        scanner_radius: float = None,
        ring_spacing: float = 1.0,
        n_radial: int = None,
        **kwargs,
    ):
        if noise_model is None:
            noise_model = PoissonNoise(gain=gain, clip_positive=True)
        super().__init__(noise_model=noise_model, **kwargs)
        if img_size is None:
            img_size = img_width
        if img_size is None:
            raise ValueError("img_size (or img_width) is required")
        if isinstance(img_size, int):
            img_size = (img_size, img_size)
        img_size = tuple(int(s) for s in img_size)
        if len(img_size) == 3:
            self.depth = img_size[0]
            self.is_2d = False
        else:
            self.depth = None
            self.is_2d = True
        if img_size[-1] != img_size[-2]:
            raise ValueError("PET images must have square slices (H == W)")
        self.img_width = img_size[-1]
        theta = np.linspace(0, 180, angles, endpoint=False)
        self.theta = jnp.asarray(theta, jnp.float32)
        self._theta_np = theta.astype(np.float32)
        self.method = method
        self.counts = counts
        self.normalize = normalize

        # multi-ring michelogram mode: crystal-to-crystal LORs incl. oblique
        # segments (the parallelproj cylinder geometry, reference pet.py:355)
        self.ring_differences = (
            tuple(int(d) for d in ring_differences)
            if ring_differences is not None
            else None
        )
        self.ring_spacing = float(ring_spacing)
        if self.ring_differences is not None:
            if self.is_2d:
                raise ValueError("ring_differences requires a 3D img_size")
            self._lor_p0, self._lor_p1 = self._build_lors(
                scanner_radius, n_radial
            )
        else:
            self._lor_p0 = self._lor_p1 = None
        # Gaussian resolution model (host-built separable kernel)
        if fwhm and fwhm > 0:
            sigma = float(fwhm) / 2.3548
            rad = max(1, int(np.ceil(3 * sigma)))
            g = np.exp(-0.5 * (np.arange(-rad, rad + 1) / sigma) ** 2)
            self._psf = jnp.asarray((g / g.sum()).astype(np.float32))
        else:
            self._psf = None
        if attenuation is not None:
            attenuation = jnp.asarray(attenuation)
            if attenuation.shape[-1] == self.img_width:
                # image-space mu map -> sinogram correction factors
                if self._lor_p0 is not None:
                    mu = attenuation
                    while mu.ndim < 5:
                        mu = mu[None]
                    att_sino = self._project_lor(mu)
                else:
                    att_sino = self._project(self._fold(attenuation))
                self.acf = jnp.exp(-att_sino)
            else:  # already sinogram-space factors
                self.acf = attenuation
        else:
            self.acf = jnp.ones(())
        self.sensitivity = (
            jnp.asarray(sensitivity) if sensitivity is not None else jnp.ones(())
        )
        self.background = (
            jnp.asarray(background) if background is not None else jnp.zeros(())
        )
        if normalize:
            key = jax.random.key(0)
            shape = (1, 1) + ((self.depth,) if self.depth else ()) + (
                self.img_width, self.img_width)
            x0 = jax.random.uniform(key, shape)
            self.operator_norm = jnp.sqrt(
                jax.jit(lambda p, v: p._norm_unnormalized(v))(self, x0)
            )
        else:
            self.operator_norm = jnp.ones(())

    # -- projector ---------------------------------------------------------
    def _build_lors(self, scanner_radius, n_radial):
        """Endpoint grid (S, D, N, A, 3) of cylinder LORs: for segment
        ``Δ = ring_differences[s]``, radial bin ``t`` and view ``a``, the ray
        joins crystals on rings ``r`` and ``r + Δ`` at the two intersections
        of the transaxial chord (offset t, direction (sin a, cos a)) with the
        scanner circle. Rays with ``r + Δ`` outside the scanner collapse to
        zero length (integral 0), mirroring parallelproj's michelogram."""
        D, W = self.depth, self.img_width
        R = float(scanner_radius) if scanner_radius is not None else float(W)
        self.scanner_radius = R
        N = int(n_radial) if n_radial is not None else W
        a = np.deg2rad(self._theta_np.astype(np.float64))  # (A,)
        t = (np.arange(N) - (N - 1) / 2.0)  # radial offsets, pixel units
        d_hat = np.stack([np.sin(a), np.cos(a), np.zeros_like(a)], -1)  # (A,3)
        u_hat = np.stack([np.cos(a), -np.sin(a), np.zeros_like(a)], -1)
        L = np.sqrt(np.maximum(R * R - t * t, 0.0))  # (N,)
        base = t[:, None, None] * u_hat[None]  # (N, A, 3)
        chord = L[:, None, None] * d_hat[None]  # (N, A, 3)
        segs = self.ring_differences
        S = len(segs)
        p0 = np.zeros((S, D, N, len(a), 3))
        p1 = np.zeros_like(p0)
        zc = (np.arange(D) - (D - 1) / 2.0) * self.ring_spacing
        for si, delta in enumerate(segs):
            for r in range(D):
                r2 = r + delta
                e0 = base - chord
                e1 = base + chord
                e0 = e0 + np.array([0.0, 0.0, zc[r]])
                if 0 <= r2 < D:
                    e1 = e1 + np.array([0.0, 0.0, zc[r2]])
                else:
                    e1 = e0  # zero-length ray -> integral 0
                p0[si, r] = e0
                p1[si, r] = e1
        return jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32)

    def _project_lor(self, x):
        """(B, C, D, H, W) -> (B, C, S, D, N, A) michelogram."""
        from ..ops.xray import ray_integrals

        return ray_integrals(
            x, self._lor_p0, self._lor_p1,
            img_size=(self.depth, self.img_width, self.img_width),
            pixel_spacing=(self.ring_spacing, 1.0, 1.0),
        )

    def plot_geometry(self, n_lors: int = 64, show: bool = True):
        """3D plot of the scanner geometry (reference pet.py:274, which
        delegates to parallelproj's ``show_geometry``): crystal rings and a
        subset of the michelogram lines of response. Returns the figure."""
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(16, 8))
        ax = fig.add_subplot(1, 1, 1, projection="3d")
        R = getattr(self, "scanner_radius", float(self.img_width))
        phi = np.linspace(0, 2 * np.pi, 181)
        D = self.depth or 1
        zc = (np.arange(D) - (D - 1) / 2.0) * self.ring_spacing
        for z in zc:
            ax.plot(R * np.cos(phi), R * np.sin(phi), np.full_like(phi, z),
                    color="0.6", lw=0.8)
        if self._lor_p0 is not None:
            p0 = np.asarray(self._lor_p0).reshape(-1, 3)
            p1 = np.asarray(self._lor_p1).reshape(-1, 3)
            keep = np.linalg.norm(p1 - p0, axis=-1) > 0
            p0, p1 = p0[keep], p1[keep]
            step = max(1, len(p0) // n_lors)
            for a, b in zip(p0[::step], p1[::step]):
                ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]],
                        color="C0", lw=0.5, alpha=0.5)
        ax.set_xlabel("mm")
        ax.set_ylabel("mm")
        ax.set_zlabel("mm")
        fig.tight_layout()
        if show:  # pragma: no cover - interactive
            fig.show()
        return fig

    def _fold(self, v):
        """(B, C, D, H, W) -> (B, C*D, H, W) for per-plane projection."""
        if self.is_2d:
            return v
        B, C, D = v.shape[:3]
        return v.reshape(B, C * D, *v.shape[3:])

    def _unfold(self, v, like):
        if self.is_2d:
            return v
        B, C, D = like[:3]
        return v.reshape(B, C, D, *v.shape[2:])

    def _resolution(self, x):
        """Separable Gaussian PSF g * x (resolution model)."""
        if self._psf is None:
            return x
        g = self._psf
        k = g.shape[0]
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(k // 2, k // 2)] * 2,
                     mode="edge")
        x1 = jax.lax.conv_general_dilated(
            xp.reshape((-1, 1) + xp.shape[-2:]),
            g.reshape(1, 1, k, 1), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        x2 = jax.lax.conv_general_dilated(
            x1, g.reshape(1, 1, 1, k), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return x2.reshape(x.shape)

    def _project(self, x):
        fwd = {"fourier": radon_fourier, "slice": radon_slice}.get(self.method, radon)
        th = self._theta_np if self.method in ("fourier", "slice") else self.theta
        return fwd(x, th, circle=True)

    def _fwd_chain(self, x):
        """R(g * x) on folded (B, C', H, W) input."""
        return self._project(self._resolution(x))

    def _norm_unnormalized(self, x0, n_iter: int = 20):
        def body(_, v):
            w = self._A_core(v)
            u = self._At_core(w)
            return u / jnp.linalg.norm(u)

        v = jax.lax.fori_loop(0, n_iter, body, x0)
        return jnp.vdot(self._A_core(v), self._A_core(v)) / jnp.vdot(v, v)

    def _fwd_chain_lor(self, x):
        """LOR(g * x) on (B, C, D, H, W) volumes -> (B, C, S, D, N, A)."""
        return self._project_lor(self._resolution(x))

    def _A_core(self, x):
        if self._lor_p0 is not None:
            return self._fwd_chain_lor(x) * self.acf * self.sensitivity
        y = self._fwd_chain(self._fold(x)) * self.acf * self.sensitivity
        return self._unfold(y, x.shape) if not self.is_2d else y

    def _At_core(self, y):
        yw = y * self.acf * self.sensitivity
        if self._lor_p0 is not None:
            x_shape = y.shape[:2] + (self.depth, self.img_width, self.img_width)
            (xt,) = jax.linear_transpose(
                self._fwd_chain_lor, transpose_primal(y, x_shape)
            )(yw)
            return xt
        if not self.is_2d:
            yw = self._fold(yw)
        x_shape = (y.shape[0], yw.shape[1], self.img_width, self.img_width)
        (xt,) = jax.linear_transpose(
            self._fwd_chain, transpose_primal(y, x_shape)
        )(yw)
        return self._unfold(xt, y.shape) if not self.is_2d else xt

    # -- public operator ---------------------------------------------------
    def A(self, x, add_background: bool = False, **params):
        out = self._A_core(x) / self.operator_norm
        if add_background:
            out = out + self.background
        return out

    def A_adjoint(self, y, **params):
        return self._At_core(y) / self.operator_norm

    def __call__(self, x, key=None, **params):
        """Generate PET measurements: Poisson(c R(g*x) + b) (pet.py:291)."""
        return self.sensor(
            self.noise(self.A(x, add_background=True, **params), key=key)
        )

    def generate_background(self, expected_background, key=None):
        """Draw a random background realization (reference pet.py:304)."""
        return self.noise_model(expected_background, key=key)

    def A_dagger(self, y, **params):
        """FBP of the attenuation-corrected sinogram. In michelogram mode
        the direct planes (ring difference 0) are used if present, like
        single-slice rebinning; otherwise falls back to the Krylov dagger."""
        yc = y * self.operator_norm / jnp.clip(self.acf * self.sensitivity, 1e-6, None)
        if self._lor_p0 is not None:
            if 0 not in self.ring_differences:
                return super().A_dagger(y, **params)
            s0 = self.ring_differences.index(0)
            yc = yc[:, :, s0]  # (B, C, D, N, A)
            B, C, D = yc.shape[:3]
            out = iradon(
                yc.reshape(B, C * D, *yc.shape[3:]), self.theta, circle=True,
                filtered=True, out_size=self.img_width,
            )
            return out.reshape(B, C, D, self.img_width, self.img_width)
        yc = self._fold(yc) if not self.is_2d else yc
        out = iradon(yc, self.theta, circle=True, filtered=True,
                     out_size=self.img_width)
        return self._unfold(out, y.shape) if not self.is_2d else out

    def osem(self, y, n_iter: int = 4, n_subsets: int = 1):
        """MLEM reconstruction baseline (reference PET examples use OSEM)."""
        shape = y.shape[:2] + (() if self.is_2d else (self.depth,)) + (
            self.img_width, self.img_width)
        x = jnp.ones(shape, y.dtype)
        ones_y = jnp.ones_like(y)
        sens_img = self.A_adjoint(ones_y)
        # MLEM assumes a nonnegative system matrix; the band-limited 'slice'
        # projector has small negative Gibbs values, so clip measurements and
        # updates, bound the ratio, and freeze pixels outside the scanner's
        # sensitive region (sens ~ 0)
        y_pos = jnp.clip(y - self.background, 0.0, None)
        sens_pos = jnp.clip(sens_img, 0.0, None)
        valid = (sens_pos > 1e-3 * jnp.max(sens_pos)).astype(y.dtype)

        def body(_, x):
            pred = jnp.clip(self.A(x), 1e-6, None)
            ratio = jnp.clip(y_pos / pred, 0.0, 1e3)
            upd = jnp.clip(self.A_adjoint(ratio), 0.0, None) / jnp.clip(
                sens_pos, 1e-9, None
            )
            return x * jnp.where(valid > 0, upd, 0.0)

        return jax.lax.fori_loop(0, n_iter, body, x)

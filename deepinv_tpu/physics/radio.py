"""Radio interferometry physics (reference deepinv/physics/radio.py:7).

``y = W . NUFFT(x)`` at the (u, v) visibility coordinates, using the
pure-XLA Kaiser-Bessel NUFFT (ops/nufft.py) instead of torchkbnufft.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.nufft import nufft2, nufft2_adjoint, nufft2_toeplitz_spec, nufft2_normal
from .base import LinearPhysics

__all__ = ["RadioInterferometry"]


class RadioInterferometry(LinearPhysics):
    r"""Radio interferometric imaging (reference radio.py:7).

    :param img_size: (H, W) sky image size.
    :param samples_loc: (2, M) visibility coordinates in radians [-pi, pi).
    :param dataWeight: optional per-visibility weights.
    :param real_projection: project the adjoint back to real images.

    :Examples:

        Visibilities via the pure-XLA Kaiser-Bessel NUFFT (the reference
        needs torchkbnufft):

        >>> import jax, numpy as np
        >>> from deepinv_tpu.physics import RadioInterferometry
        >>> uv = np.clip(np.random.default_rng(0).normal(size=(2, 300)),
        ...              -3.0, 3.0).astype("float32")
        >>> physics = RadioInterferometry((32, 32), uv)
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 32, 32))
        >>> vis = physics.A(x)
        >>> # with real_projection (default) the adjoint maps back to real
        >>> # images, so adjointness holds on the real part:
        >>> v = jax.random.normal(jax.random.key(1), vis.shape)
        >>> s1 = float(jax.numpy.vdot(physics.A(x), v).real)
        >>> s2 = float(jax.numpy.vdot(x, physics.A_adjoint(v)).real)
        >>> vis.shape, bool(abs(s1 - s2) < 1e-3 * abs(s1))
        ((1, 1, 300), True)
    """

    def __init__(
        self,
        img_size,
        samples_loc,
        dataWeight=None,
        interp_points: int = 4,
        k_oversampling: float = 2.0,
        real_projection: bool = True,
        fast_normal: bool = True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.img_size = tuple(img_size)[-2:]
        self.samples_loc = jnp.asarray(samples_loc, jnp.float32)
        self.dataWeight = (
            jnp.asarray(dataWeight) if dataWeight is not None else jnp.ones(())
        )
        self.J = interp_points
        self.osf = k_oversampling
        self.real_projection = real_projection
        # Toeplitz-embedded normal operator A^H |W|^2 A: two FFTs per
        # application instead of a full NUFFT forward/adjoint pair
        # (ops/nufft.py nufft2_toeplitz_spec; iterative-solver hot path)
        self._normal_spec = (
            nufft2_toeplitz_spec(
                self.samples_loc, self.img_size,
                weights=jnp.abs(self.dataWeight) ** 2,
                J=self.J, osf=self.osf,
            )
            if fast_normal
            else None
        )

    @property
    def fast_normal(self) -> bool:
        return self._normal_spec is not None

    def A_adjoint_A(self, x, **params):
        if self._normal_spec is not None:
            out = nufft2_normal(x, self._normal_spec)
            if self.real_projection:
                out = jnp.real(out)
            return out
        return self.A_adjoint(self.A(x, **params), **params)

    def setWeight(self, w) -> "RadioInterferometry":
        """Return a copy with new per-visibility weights (reference
        radio.py:98; functional — pytrees are immutable)."""
        return self.replace(dataWeight=jnp.asarray(w))

    def A(self, x, **params):
        if x.ndim == 4:  # (B, C, H, W) -> treat channels as batch
            y = nufft2(x, self.samples_loc, J=self.J, osf=self.osf)
        else:
            y = nufft2(x, self.samples_loc, J=self.J, osf=self.osf)
        return y * self.dataWeight

    def A_adjoint(self, y, **params):
        yw = y * jnp.conj(self.dataWeight)
        x = nufft2_adjoint(yw, self.samples_loc, self.img_size, J=self.J, osf=self.osf)
        if self.real_projection:
            x = jnp.real(x)
        return x

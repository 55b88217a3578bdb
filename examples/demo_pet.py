"""Positron emission tomography — 2D and 3D michelogram projectors with
MLEM reconstruction (counterpart of reference examples/physics/demo_pet2d.py
and demo_pet3d.py, built on the native xray projector instead of
parallelproj)."""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax

# persistent compile cache (shared with bench.py): the ray-driven PET
# projector is compile-heavy; a warm cache makes re-runs instant
jax.config.update("jax_compilation_cache_dir",
                  _os.path.join(_os.path.dirname(_os.path.dirname(
                      _os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from deepinv_tpu.physics import PET, PoissonNoise
from deepinv_tpu.optim import optim_builder, PoissonLikelihood, ZeroPrior
from deepinv_tpu.loss import PSNR
from deepinv_tpu.datasets import shepp_logan


def main():
    # ------------------------------------------------------------------
    # 2D PET: attenuated Radon transform + Poisson counting noise
    # ------------------------------------------------------------------
    W = 32
    x = jnp.clip(jnp.asarray(shepp_logan(W))[None, None], 0, None)
    # attenuation map (water-like inside the phantom support)
    mu = 0.01 * (np.asarray(x[0, 0]) > 0).astype(np.float32)[None, None]
    gain = 1e-2  # counts scaling: lower gain = noisier data

    physics = PET(img_width=W, angles=45, attenuation=jnp.asarray(mu),
                  normalize=True, noise_model=PoissonNoise(gain=gain))
    y = physics(x, key=jax.random.key(0))
    print(f"2D PET sinogram: {tuple(y.shape)}, mean counts {float(y.mean())/gain:.1f}")

    # MLEM is the classical PET reconstruction: multiplicative updates that
    # keep the iterate positive and maximize the Poisson likelihood.
    model = optim_builder("MLEM", data_fidelity=PoissonLikelihood(gain=gain),
                          prior=ZeroPrior(), max_iter=25,
                          params_algo={"stepsize": 1.0})
    xhat = model(y, physics)

    psnr = PSNR()
    x_bp = physics.A_adjoint(y)
    x_bp = x_bp * (x.mean() / (x_bp.mean() + 1e-9))
    print(f"backprojection PSNR: {float(psnr(x_bp, x)[0]):.2f} dB")
    print(f"MLEM (25 it) PSNR  : {float(psnr(xhat, x)[0]):.2f} dB")

    # ------------------------------------------------------------------
    # 3D PET: multi-ring scanner -> michelogram of oblique sinogram planes
    # ------------------------------------------------------------------
    D = 3
    x3 = jnp.broadcast_to(x[:, :, None], (1, 1, D, W, W))
    p3 = PET(img_size=(D, W, W), angles=12, ring_differences=(0, -1, 1))
    y3 = p3.A(x3)
    print(f"3D PET michelogram: {tuple(y3.shape)} "
          f"(segments x rings x radial bins x angles)")
    # adjointness of the full 3D projector (exact by construction)
    u = jax.random.normal(jax.random.key(1), x3.shape)
    v = jax.random.normal(jax.random.key(2), y3.shape)
    lhs = jnp.vdot(p3.A(u), v)
    rhs = jnp.vdot(u, p3.A_adjoint(v))
    print(f"adjointness <Au,v> vs <u,A'v>: {float(lhs):.4f} vs {float(rhs):.4f}")


if __name__ == "__main__":
    main()

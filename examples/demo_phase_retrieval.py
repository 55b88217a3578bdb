"""Phase retrieval: spectral initialization + gradient refinement.

Mirrors the reference gallery's ``physics/demo_phase_retrieval.py``
(reference physics/phase_retrieval.py, optim/phase_retrieval.py): measure
intensities ``y = |Bx|^2`` with a random phase-retrieval operator, estimate
the signal with the spectral method, refine by gradient descent on the
amplitude loss, and score with phase-corrected cosine similarity (the
global phase is unrecoverable).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp

from deepinv_tpu.physics import RandomPhaseRetrieval
from deepinv_tpu.physics.phase_retrieval import (
    correct_global_phase,
    cosine_similarity,
    spectral_methods,
)
from deepinv_tpu.optim import AmplitudeLoss


def main():
    key = jax.random.key(0)
    n = 24
    physics = RandomPhaseRetrieval(m=4 * n * n, img_size=(1, n, n),
                                   key=key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, n, n),
                          dtype=jnp.complex64)
    y = physics.A(x)

    # spectral initialization (reference optim/phase_retrieval.py)
    x0 = spectral_methods(y, physics, n_iter=400)
    c0 = float(jnp.abs(cosine_similarity(x0, x)))

    # gradient refinement on the amplitude loss
    loss = AmplitudeLoss()

    def obj(u):
        return jnp.sum(loss.fn(u, y, physics))

    g = jax.jit(jax.grad(obj))

    @jax.jit
    def refine(u, n_iter=1200, lr=1e-3):
        def body(u, _):
            return u - lr * g(u).conj(), None

        u, _ = jax.lax.scan(body, u, None, length=n_iter)
        return u

    xr = refine(x0)
    c1 = float(jnp.abs(cosine_similarity(xr, x)))

    xr_aligned = correct_global_phase(xr, x)
    err = float(jnp.linalg.norm(xr_aligned - x) / jnp.linalg.norm(x))
    print(f"cosine similarity: spectral {c0:.3f} -> refined {c1:.3f}")
    print(f"relative error after phase alignment: {err:.3f}")
    assert c1 > c0 and c1 > 0.9
    print("phase retrieval OK")


if __name__ == "__main__":
    main()

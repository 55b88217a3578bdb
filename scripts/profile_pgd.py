"""Per-phase profile of the PnP-PGD mri/ct bench iterations.

Decomposes one PGD iteration (x <- D(x - lr * A^T(Ax - y))) into its two
phases — data-fidelity gradient (physics) and DnCNN denoiser — and
slope-times each as its own lax.scan program on the attached chip, the same
methodology as scripts/profile_deblur.py. Tells us whether the mri/ct
configs are physics- or denoiser-bound before any kernel work.

Usage: python scripts/profile_pgd.py [mri|ct]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from deepinv_tpu.models import DnCNN, autocast
from deepinv_tpu.utils.profiling import compiled_cost

N = 16


def slope_time(step, x0, *ctx):
    def run(iters):
        f = jax.jit(lambda v, *c: jax.lax.scan(
            lambda carry, _: (step(carry, *c), None), v, None,
            length=iters)[0])
        _ = np.asarray(jax.device_get(f(x0, *ctx))).ravel()[:1]
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            o = f(x0, *ctx)
            _ = np.asarray(jax.device_get(o)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(4 * N) - run(N)) / (3 * N)


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "mri"
    key = jax.random.key(0)
    # everything device-side goes through jit: the axon backend raises
    # UNIMPLEMENTED for several eagerly-dispatched ops (notably FFT).
    if config == "mri":
        from deepinv_tpu.physics import MRI

        mask = jnp.asarray(
            (np.random.default_rng(0).random((256, 256)) < 0.3)
            .astype(np.float32))
        physics = MRI(mask=mask, img_size=(256, 256))
        x = jax.jit(lambda k: jax.random.normal(k, (1, 2, 256, 256)))(key)
        denoiser = autocast(DnCNN(2, 2, pretrained=None))
    else:
        from deepinv_tpu.physics import Tomography

        physics = Tomography(img_width=256, angles=90, method="slice",
                             normalize=True)
        x = jax.jit(lambda k: jax.random.normal(k, (1, 1, 256, 256)))(key)
        denoiser = autocast(DnCNN(1, 1, pretrained=None))

    y = jax.jit(lambda p, v: p.A(v))(physics, x)
    lr = 0.9

    def grad_step(v, phys, yv):
        return v - lr * phys.A_adjoint(phys.A(v) - yv)

    def den_step(v, den):
        return den(v, 0.05)

    def full_step(v, phys, yv, den):
        return den(v - lr * phys.A_adjoint(phys.A(v) - yv), 0.05)

    rows = [
        ("fidelity grad (A, A^T)", slope_time(grad_step, x, physics, y)),
        ("DnCNN denoiser", slope_time(den_step, x, denoiser)),
        ("full PGD iteration", slope_time(full_step, x, physics, y, denoiser)),
    ]
    print(f"config={config}  (1x{x.shape[1]}x256x256, "
          f"{jax.devices()[0].device_kind})")
    for name, dt in rows:
        print(f"  {name:28s} {dt*1e3:7.3f} ms/iter   {1/dt:8.1f} it/s")

    c = compiled_cost(lambda v, d: d(v, 0.05), x, denoiser)
    print(f"  DnCNN cost analysis: {c.get('flops', 0)/1e9:.1f} GF, "
          f"{c.get('bytes accessed', 0)/1e6:.0f} MB (pre-fusion bound)")


if __name__ == "__main__":
    main()

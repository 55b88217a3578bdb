"""Unfolded Chambolle-Pock for CONSTRAINED inpainting — counterpart of
reference examples/unfolded/demo_unfolded_constrained_LISTA.py: solve

    min_x  iota_{B2(y, r)}(A x) + ||W x||_1

(the data term is the INDICATOR of the l2 ball of radius r around y, not
a penalty), unfolding Chambolle-Pock and learning the per-iteration
wavelet thresholds and step sizes LISTA-style. The constrained
formulation guarantees feasibility ||A x - y|| <= r at the solution —
useful when the noise level is known but a penalty weight is not.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepinv_tpu.physics import Denoising, GaussianNoise, Inpainting
from deepinv_tpu.optim import IndicatorL2, WaveletPrior
from deepinv_tpu.unfolded import unfolded_builder
from deepinv_tpu.datasets.phantoms import shepp_logan


def main(steps=None):
    steps = _util.scale(60, 6) if steps is None else steps
    H = 32 if _util.fast() else 64
    sigma = 0.05

    # ground truths: shifted/scaled phantoms (stand-in for a dataset)
    base = jnp.asarray(shepp_logan(H))[None, None]
    rng = np.random.default_rng(0)
    xs = jnp.concatenate([
        jnp.roll(base, (int(a), int(b)), (-2, -1))
        for a, b in rng.integers(-4, 5, (8, 2))
    ])

    physics = Inpainting(img_size=(1, H, H), mask=0.5, key=jax.random.key(1),
                         noise_model=GaussianNoise(sigma))
    ys = physics(xs, key=jax.random.key(2))

    # the radius of the feasibility ball: E||noise|| on the kept pixels
    m = float(physics.mask.sum())
    radius = sigma * float(np.sqrt(m))

    # explicit K=A splitting (reference PDCP params "K"): the indicator's
    # prox then acts in measurement space where it is a CLOSED-FORM ball
    # projection — exact and reverse-differentiable, so the whole unfolded
    # network trains end-to-end
    model = unfolded_builder(
        "CP",
        data_fidelity=IndicatorL2(radius=radius),
        prior=WaveletPrior(wv="db4", level=2),
        params_algo={"stepsize": 1.0, "stepsize_dual": 1.0,
                     "g_param": 0.01, "lambda": 1.0},
        max_iter=8,
        trainable_params=["stepsize", "stepsize_dual", "g_param"],
        K=physics.A, K_adjoint=physics.A_adjoint,
    )

    opt = optax.adam(2e-3)

    ident = Denoising()  # with explicit K, the model sees identity physics

    def loss_fn(mdl, yv, xv):
        return jnp.mean((mdl(yv, ident) - xv) ** 2)

    @jax.jit
    def step(mdl, state, yv, xv):
        l, g = jax.value_and_grad(loss_fn)(mdl, yv, xv)
        updates, state = opt.update(g, state, mdl)
        return optax.apply_updates(mdl, updates), state, l

    state = opt.init(model)
    psnr = lambda a, b: float(10 * jnp.log10(1.0 / jnp.mean((a - b) ** 2)))
    x0 = physics.A_adjoint(ys)
    print(f"zero-fill PSNR {psnr(x0, xs):.2f} dB")
    for it in range(steps):
        model, state, l = step(model, state, ys, xs)
        if it % max(steps // 5, 1) == 0:
            print(f"step {it:3d}  train mse {float(l):.5f}")

    xhat = model(ys, ident)
    print(f"unfolded constrained-CP PSNR {psnr(xhat, xs):.2f} dB")
    # the indicator drives reconstructions toward the feasibility ball
    # (8 unfolded iterations approximate the constrained solution; running
    # the trained model with more iterations tightens the residual)
    res = jnp.sqrt(jnp.sum((physics.A(xhat) - ys) ** 2, axis=(1, 2, 3)))
    print(f"max residual {float(res.max()):.4f} (ball radius {radius:.4f})")
    assert psnr(xhat, xs) > psnr(x0, xs)
    return xhat


if __name__ == "__main__":
    main()

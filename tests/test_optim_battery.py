"""Optim battery: the reference's sweep families ported as ideas
(deepinv/tests/test_optim.py — prior x algorithm recon sweeps :612, PnP
parameter variants :503, CP with operator splitting :768/:858, stacked data
fidelity :1004, least-squares solver matrix :1037, complex linear systems
:1087, global-phase correction :1151).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.models import MedianFilter
from deepinv_tpu.optim import (CP, L1, L2, PGD, AmplitudeLoss, IndicatorL2,
                               L1Prior, PnP, RED, Tikhonov, TVPrior,
                               WaveletPrior, bicgstab, conjugate_gradient,
                               least_squares, lsqr, minres, optim_builder)
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.physics import (Blur, BlurFFT, Denoising, GaussianNoise,
                                 Inpainting, stack)

IMSIZE = (1, 16, 16)


def _problem(key, noise=0.05):
    kx, kn = jax.random.split(key)
    H, W = IMSIZE[-2:]
    yy, xx = jnp.mgrid[0:H, 0:W]
    x = ((yy - 8) ** 2 / 25 + (xx - 8) ** 2 / 16 < 1).astype(jnp.float32)
    x = x[None, None] * 0.8
    physics = Inpainting(img_size=IMSIZE, mask=0.7, key=jax.random.key(5),
                         noise_model=GaussianNoise(sigma=noise))
    y = physics(x, key=kn)
    return x, physics, y


def _psnr(a, b):
    return float(10 * jnp.log10(1.0 / jnp.mean((a - b) ** 2)))


@pytest.mark.parametrize("prior_name", [
    "pnp-median", "red-median", "l1", "tv", "wavelet", "tikhonov",
])
def test_prior_family_recon_sweep(prior_name, key):
    """Every prior family runs through its natural algorithm and improves
    its objective over the initialization; the denoiser-based priors also
    improve PSNR over the adjoint image (reference test_priors_algo:612).
    RED has no prox (it is a gradient-only prior), so it goes through GD
    like the reference."""
    x, physics, y = _problem(key)
    prior = {
        "pnp-median": lambda: PnP(denoiser=MedianFilter()),
        "red-median": lambda: RED(denoiser=MedianFilter()),
        "l1": L1Prior,
        "tv": TVPrior,
        "wavelet": WaveletPrior,
        "tikhonov": Tikhonov,
    }[prior_name]()
    algo = "GD" if prior_name == "red-median" else "PGD"
    model = optim_builder(
        algo, data_fidelity=L2(), prior=prior,
        params_algo={"stepsize": 0.9, "lambda": 0.05, "g_param": 0.02},
        max_iter=60)
    xhat = model(y, physics)
    assert bool(jnp.all(jnp.isfinite(xhat))), prior_name
    y_img = physics.A_adjoint(y)
    if prior_name in ("pnp-median", "red-median"):
        assert _psnr(xhat, x) > _psnr(y_img, x) + 0.5, prior_name
    else:
        # proxable objectives: PGD decreases F = f + lambda*g vs the init
        f0 = float(jnp.sum(model.objective(y_img, y, physics)))
        f1 = float(jnp.sum(model.objective(xhat, y, physics)))
        assert f1 <= f0 + 1e-5, (prior_name, f0, f1)


@pytest.mark.parametrize("algo", ["PGD", "HQS", "ADMM", "DRS"])
@pytest.mark.parametrize("g_first", [False, True])
def test_g_first_sweep(algo, g_first, key):
    """Each splitting algorithm supports prox-g-first ordering (reference
    test_pnp_algo's g_first parameter, :503). ADMM/DRS fixed points are the
    exact minimizer in both orders (this caught a real dual-sign bug in
    ADMM g_first); PGD(g_first)/HQS solve a prox-relaxed problem, so they
    get a looser optimality band."""
    x, physics, y = _problem(key, noise=0.0)
    model = optim_builder(
        algo, data_fidelity=L2(), prior=Tikhonov(),
        params_algo={"stepsize": 0.7, "lambda": 0.2, "g_param": 0.1,
                     "stepsize_dual": 0.7},
        max_iter=300, g_first=g_first)
    xhat = model(y, physics)
    # optimality of f + lam*g: gradient residual A^T(Ax-y) + lam*x ~ 0
    res = float(jnp.max(jnp.abs(
        physics.A_adjoint(physics.A(xhat) - y) + 0.2 * xhat)))
    exact = (algo in ("ADMM", "DRS")) or (algo == "PGD" and not g_first)
    assert res < (5e-3 if exact else 0.1), (algo, g_first, res)
    assert bool(jnp.all(jnp.isfinite(xhat)))


def test_cp_with_linear_operator(key):
    """Chambolle-Pock with an explicit K (the blur operator) splitting
    ||Kx - y||: converges to the same solution as PGD on the composed
    problem (reference test_CP_K:768)."""
    x, _, _ = _problem(key, noise=0.0)
    filt = gaussian_blur(sigma=1.0)
    physics = BlurFFT(img_size=IMSIZE, filter=filt)
    y = physics.A(x)

    model_cp = optim_builder(
        "CP", data_fidelity=L2(), prior=Tikhonov(),
        params_algo={"stepsize": 0.5, "lambda": 0.05, "g_param": 0.05,
                     "stepsize_dual": 0.5},
        max_iter=400, K=physics.A, K_adjoint=physics.A_adjoint)
    # with explicit K, the fidelity sees the raw dual space: identity
    # physics carries the measurement (reference test_CP_K:768 uses
    # physics=Denoising with K the blur)
    from deepinv_tpu.physics import Denoising

    xhat = model_cp(y, Denoising())
    res = physics.A_adjoint(physics.A(xhat) - y) + 0.05 * xhat
    assert float(jnp.max(jnp.abs(res))) < 5e-3


def test_stacked_datafidelity(key):
    """L2 on stacked physics equals the sum of per-operator L2 values and
    its grad equals the sum of per-operator grads (reference
    test_datafid_stacking:1004)."""
    x, _, _ = _problem(key)
    p1 = Denoising(noise_model=GaussianNoise(sigma=0.1))
    p2 = BlurFFT(img_size=IMSIZE, filter=gaussian_blur(sigma=1.0))
    sp = stack(p1, p2)
    y = sp.A(x)
    fid = L2()
    val = float(jnp.sum(fid(x, y, sp)))  # fidelities return (B,) values
    v1 = float(jnp.sum(fid(x, y[0], p1)))
    v2 = float(jnp.sum(fid(x, y[1], p2)))
    assert abs(val - (v1 + v2)) < 1e-4
    g = fid.grad(x, y, sp)
    g12 = fid.grad(x, y[0], p1) + fid.grad(x, y[1], p2)
    assert float(jnp.max(jnp.abs(g - g12))) < 1e-5


@pytest.mark.parametrize("solver", ["CG", "BiCGStab", "MINRES", "lsqr"])
@pytest.mark.parametrize("gamma", [None, 0.5])
def test_least_squares_solver_matrix(solver, gamma, key):
    """least_squares over solver x regularization: the returned x satisfies
    the (regularized) normal equations (reference
    test_least_square_solvers:1037)."""
    x, _, _ = _problem(key)
    physics = BlurFFT(img_size=IMSIZE, filter=gaussian_blur(sigma=1.0))
    y = physics.A(x)
    z = jnp.zeros_like(x)
    xhat = least_squares(physics.A, physics.A_adjoint, y, solver=solver,
                         gamma=gamma, z=z if gamma else None,
                         max_iter=500, tol=1e-7)
    if gamma:
        # optimality of min ||Ax-y||^2/2 + (1/2gamma)||x - z||^2
        res = physics.A_adjoint(physics.A(xhat) - y) + (xhat - z) / gamma
    else:
        res = physics.A_adjoint(physics.A(xhat) - y)
    assert float(jnp.max(jnp.abs(res))) < 1e-3, (solver, gamma)


@pytest.mark.parametrize("solver", [conjugate_gradient, bicgstab, minres,
                                    lsqr])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.complex64])
def test_linear_system_dtype_sweep(solver, dtype, key):
    """Krylov solvers handle real and complex HPD systems — operands are
    batched (leading axis = batch, like the reference's solvers)
    (reference test_linear_system:1087)."""
    n = 12
    k1, k2, k3 = jax.random.split(key, 3)
    M = jax.random.normal(k1, (n, n), jnp.float32)
    if dtype == jnp.complex64:
        M = M + 1j * jax.random.normal(k2, (n, n), jnp.float32)
    A = M @ M.conj().T + 2 * jnp.eye(n, dtype=dtype)  # HPD
    xt = jax.random.normal(k3, (2, n), jnp.float32).astype(dtype)
    b = xt @ A.T  # batched rhs: (2, n)
    op = lambda v: v @ A.T
    if solver is lsqr:
        got = solver(op, lambda v: v @ jnp.conj(A), b, max_iter=300,
                     tol=1e-7)
    else:
        got = solver(op, b, max_iter=300, tol=1e-7)
    if isinstance(got, tuple):
        got = got[0]
    rel = float(jnp.linalg.norm(got - xt) / jnp.linalg.norm(xt))
    assert rel < 1e-2, (solver.__name__, dtype, rel)


def test_correct_global_phase(key):
    """Global-phase correction aligns a phase-rotated complex estimate
    with the reference (reference test_correct_global_phase:1151)."""
    from deepinv_tpu.physics.phase_retrieval import correct_global_phase

    kx, kp = jax.random.split(key)
    x = (jax.random.normal(kx, (1, 1, 8, 8))
         + 1j * jax.random.normal(kp, (1, 1, 8, 8)))
    rot = x * jnp.exp(1j * 1.234)
    fixed = correct_global_phase(rot, x)
    assert float(jnp.max(jnp.abs(fixed - x))) < 1e-4


def test_amplitude_loss_value_and_grad(key):
    """AmplitudeLoss: zero at a consistent point, positive elsewhere, and
    differentiable (reference test_data_fidelity_amplitude_loss:304)."""
    from deepinv_tpu.physics import RandomPhaseRetrieval

    physics = RandomPhaseRetrieval(m=40, img_size=(1, 4, 4),
                                   key=jax.random.key(2))
    x = jax.random.normal(key, (1, 1, 4, 4)) + 0j
    y = physics.A(x)
    fid = AmplitudeLoss()
    v0 = float(jnp.sum(fid(x, y, physics)))
    assert abs(v0) < 1e-6
    v1 = float(jnp.sum(fid(1.5 * x, y, physics)))
    assert v1 > 1e-3
    g = fid.grad(1.5 * x, y, physics)
    assert bool(jnp.all(jnp.isfinite(jnp.abs(g))))


def test_indicator_l2_projection(key):
    """IndicatorL2 prox projects onto the measurement ball: result is
    within radius and unchanged if already inside (reference
    test_data_fidelity_indicator:121)."""
    fid = IndicatorL2(radius=0.5)
    k1, k2 = jax.random.split(key)
    y = jax.random.normal(k1, (1, 1, 4, 4))
    far = y + jax.random.normal(k2, (1, 1, 4, 4))
    proj = fid.d.prox(far, y, gamma=1.0)
    assert float(jnp.linalg.norm(proj - y)) < 0.5 + 1e-4
    near = y + 0.01
    proj2 = fid.d.prox(near, y, gamma=1.0)
    assert float(jnp.max(jnp.abs(proj2 - near))) < 1e-5


def test_builder_custom_init_and_metrics(key):
    """optim_builder accepts a custom initialization and records
    convergence metrics when asked (reference test_optim_algo's custom_init
    path, :376)."""
    x, physics, y = _problem(key, noise=0.0)

    def custom_init(yy, ph):
        return {"est": (ph.A_adjoint(yy), ph.A_adjoint(yy))}

    model = optim_builder(
        "PGD", data_fidelity=L2(), prior=Tikhonov(),
        params_algo={"stepsize": 0.7, "lambda": 0.2},
        max_iter=150, custom_init=custom_init)
    xhat = model(y, physics)
    res = physics.A_adjoint(physics.A(xhat) - y) + 0.2 * xhat
    assert float(jnp.max(jnp.abs(res))) < 5e-3

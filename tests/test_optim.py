"""Optimization tests: each algorithm converges to the known minimizer
(mirrors reference tests/test_optim.py strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.physics import Denoising, Inpainting, BlurFFT, Blur, GaussianNoise
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import (
    L2,
    L1,
    ItohFidelity,
    PoissonLikelihood,
    Tikhonov,
    L1Prior,
    TVPrior,
    WaveletPrior,
    PnP,
    RED,
    Zero,
    BaseOptim,
    optim_builder,
    HQS,
    PGD,
    FISTA,
    ADMM,
    DRS,
    GD,
    CP,
    SIRT,
    MLEM,
    conjugate_gradient,
    bicgstab,
    minres,
    lsqr,
    least_squares,
)
from conftest import assert_close

IMSIZE = (1, 16, 16)


def _tikhonov_solution(physics, y, lam):
    """Closed form argmin 0.5||Ax-y||^2 + lam*0.5||x||^2 for small problems."""
    n = int(np.prod(IMSIZE))
    eye = jnp.eye(n)
    cols = jax.vmap(lambda e: physics.A(e.reshape((1,) + IMSIZE)).reshape(-1))(eye)
    A = cols.T  # (m, n)
    rhs = A.T @ y.reshape(-1)
    sol = jnp.linalg.solve(A.T @ A + lam * jnp.eye(n), rhs)
    return sol.reshape((1,) + IMSIZE)


@pytest.fixture
def problem():
    key = jax.random.key(0)
    x = jax.random.uniform(key, (1,) + IMSIZE)
    physics = Inpainting(img_size=IMSIZE, mask=0.7, key=jax.random.key(1))
    y = physics.A(x)
    return x, physics, y


def test_hqs_fixed_point(problem):
    """HQS converges to x = prox_g(prox_f(x)) — the Moreau-envelope
    surrogate, not argmin f + lam g (reference hqs.py:24 docstring)."""
    x, physics, y = problem
    lam, step = 0.3, 0.9
    model = optim_builder(
        "HQS",
        data_fidelity=L2(),
        prior=Tikhonov(),
        params_algo={"stepsize": step, "lambda": lam},
        max_iter=300,
    )
    xhat = model(y, physics)
    fp = Tikhonov().prox(
        L2().prox(xhat, y, physics, gamma=step), gamma=lam * step
    )
    assert float(jnp.max(jnp.abs(fp - xhat))) < 1e-4


@pytest.mark.parametrize("algo", ["GD", "PGD", "FISTA", "ADMM", "DRS", "CP"])
def test_algorithms_converge_tikhonov(problem, algo):
    """All splitting algorithms minimize f + lambda*Tikhonov to the same
    closed-form solution."""
    x, physics, y = problem
    lam = 0.3
    xstar = _tikhonov_solution(physics, y, lam)
    params = {"stepsize": 0.9, "lambda": lam, "g_param": 0.1, "stepsize_dual": 0.9}
    model = optim_builder(
        algo,
        data_fidelity=L2(),
        prior=Tikhonov(),
        params_algo=params,
        max_iter=300,
    )
    xhat = model(y, physics)
    err = float(jnp.max(jnp.abs(xhat - xstar)))
    assert err < 1e-3, f"{algo} error {err}"


def test_early_stop(problem):
    x, physics, y = problem
    model = optim_builder(
        "PGD",
        data_fidelity=L2(),
        prior=Tikhonov(),
        params_algo={"stepsize": 0.9, "lambda": 0.3},
        max_iter=1000,
        early_stop=True,
        thres_conv=1e-6,
    )
    xhat = model(y, physics)
    xstar = _tikhonov_solution(physics, y, 0.3)
    assert float(jnp.max(jnp.abs(xhat - xstar))) < 1e-3


def test_anderson_acceleration(problem):
    x, physics, y = problem
    xstar = _tikhonov_solution(physics, y, 0.3)
    model = optim_builder(
        "PGD",
        data_fidelity=L2(),
        prior=Tikhonov(),
        params_algo={"stepsize": 0.2, "lambda": 0.3},
        max_iter=8,
        anderson_acceleration=True,
    )
    model_plain = optim_builder(
        "PGD",
        data_fidelity=L2(),
        prior=Tikhonov(),
        params_algo={"stepsize": 0.2, "lambda": 0.3},
        max_iter=8,
    )
    err_aa = float(jnp.max(jnp.abs(model(y, physics) - xstar)))
    err_plain = float(jnp.max(jnp.abs(model_plain(y, physics) - xstar)))
    assert err_aa < err_plain, (err_aa, err_plain)


def test_l1_prior_sparsity():
    """PGD with L1 prior on denoising = soft thresholding of y."""
    key = jax.random.key(3)
    x = jax.random.normal(key, (2,) + IMSIZE)
    physics = Denoising()
    y = physics.A(x)
    lam = 0.2
    model = optim_builder(
        "PGD",
        data_fidelity=L2(),
        prior=L1Prior(),
        params_algo={"stepsize": 1.0, "lambda": lam},
        max_iter=100,
    )
    xhat = model(y, physics)
    expected = jnp.sign(y) * jnp.maximum(jnp.abs(y) - lam, 0.0)
    assert_close(xhat, expected, rtol=1e-3, atol=1e-4)


def test_tv_prior_prox():
    """TV prox reduces total variation while staying close to input."""
    key = jax.random.key(4)
    x = jax.random.normal(key, (1, 1, 32, 32))
    tv = TVPrior(n_it_max=200)
    out = tv.prox(x, gamma=0.5)
    assert float(tv.fn(out)[0]) < float(tv.fn(x)[0])
    # gamma -> 0 returns input
    out0 = tv.prox(x, gamma=1e-8)
    assert_close(out0, x, rtol=1e-3, atol=1e-3)


def test_wavelet_prior_prox():
    key = jax.random.key(5)
    x = jax.random.normal(key, (1, 1, 32, 32))
    wp = WaveletPrior(wv="db4", level=3)
    out = wp.prox(x, gamma=0.5)
    assert float(wp.fn(out)[0]) < float(wp.fn(x)[0])
    out0 = wp.prox(x, gamma=0.0)
    assert_close(out0, x, rtol=1e-4, atol=1e-5)


def test_pnp_hqs_runs(problem):
    """PnP with a (dummy) denoiser plugged as prox."""
    x, physics, y = problem

    class BoxDenoiser:
        def __call__(self, u, sigma):
            return jnp.clip(u, 0.0, 1.0)

    model = optim_builder(
        "HQS",
        data_fidelity=L2(),
        prior=PnP(BoxDenoiser()),
        params_algo={"stepsize": 1.0, "g_param": 0.05},
        max_iter=10,
    )
    xhat = model(y, physics)
    # observed pixels are data-consistent; output respects the box constraint
    mask = physics.mask
    err_obs = float(jnp.max(jnp.abs((xhat - x) * mask)))
    assert err_obs < 0.05, err_obs
    assert xhat.min() >= 0 and xhat.max() <= 1


def test_sirt_mlem():
    key = jax.random.key(6)
    x = jax.random.uniform(key, (1,) + IMSIZE) + 0.1
    physics = Blur(filter=gaussian_blur(sigma=1.0), padding="circular")
    y = physics.A(x)
    sirt = optim_builder("SIRT", data_fidelity=L2(), prior=Zero(),
                         params_algo={"stepsize": 1.0}, max_iter=100)
    xs = sirt(y, physics)
    assert float(jnp.mean((physics.A(xs) - y) ** 2)) < float(jnp.mean((y - physics.A(physics.A_adjoint(y))) ** 2))
    mlem = optim_builder("MLEM", data_fidelity=PoissonLikelihood(), prior=Zero(),
                         params_algo={"lambda": 0.0}, max_iter=50)
    xm = mlem(y, physics, x_init=jnp.ones_like(x))
    assert float(jnp.mean((physics.A(xm) - y) ** 2)) < 1e-3


def test_unfolded_gradient_flow(problem):
    """Gradients flow through the scan to params_algo and prior weights —
    the unfolded-network mechanism (reference optimizers.py:250)."""
    x, physics, y = problem
    model = optim_builder(
        "PGD",
        data_fidelity=L2(),
        prior=Tikhonov(),
        params_algo={"stepsize": 0.5, "lambda": 0.3},
        max_iter=5,
    )

    def loss(m):
        xhat = m(y, physics)
        return jnp.sum((xhat - x) ** 2)

    g = jax.grad(loss)(model)
    gs = g.params_algo["stepsize"]
    assert gs.shape == (5,)
    assert float(jnp.sum(jnp.abs(gs))) > 0


def test_jit_recon(problem):
    x, physics, y = problem
    model = optim_builder(
        "HQS", data_fidelity=L2(), prior=Tikhonov(),
        params_algo={"stepsize": 0.9, "lambda": 0.3}, max_iter=50,
    )

    @jax.jit
    def recon(m, y, p):
        return m(y, p)

    assert_close(recon(model, y, physics), model(y, physics), rtol=1e-5, atol=1e-5)


# -- solver unit tests -------------------------------------------------------


def test_solvers_small_system():
    key = jax.random.key(7)
    M = jax.random.normal(key, (12, 12))
    S = M @ M.T + 5 * jnp.eye(12)
    xtrue = jax.random.normal(jax.random.key(8), (2, 12))
    b = xtrue @ S.T  # batched

    H = lambda v: v @ S.T
    for solver in (conjugate_gradient, bicgstab, minres):
        xh = solver(H, b, max_iter=200, tol=1e-9)
        assert_close(xh, xtrue, rtol=1e-3, atol=1e-4)


def test_lsqr_overdetermined():
    key = jax.random.key(9)
    A = jax.random.normal(key, (20, 8))
    xtrue = jax.random.normal(jax.random.key(10), (3, 8))
    y = xtrue @ A.T
    Af = lambda v: v @ A.T
    At = lambda u: u @ A
    xh = lsqr(Af, At, y, max_iter=100, tol=1e-10)
    assert_close(xh, xtrue, rtol=1e-3, atol=1e-4)


def test_least_squares_implicit_grad():
    """Gradient of the implicit prox solve matches finite differences."""
    physics = BlurFFT(img_size=(1, 8, 8), filter=gaussian_blur(sigma=0.8))
    # use a generic LinearPhysics wrapper to exercise the Krylov path
    from deepinv_tpu.physics import LinearPhysics

    wrapped = LinearPhysics(A=physics.A, A_adjoint=physics.A_adjoint)
    z = jax.random.normal(jax.random.key(11), (1, 1, 8, 8))
    y = jax.random.normal(jax.random.key(12), (1, 1, 8, 8))

    def f(yv):
        out = wrapped.prox_l2(z, yv, 2.0, max_iter=100, tol=1e-8)
        return jnp.sum(out**2)

    g = jax.grad(f)(y)
    eps = 1e-3
    d = jax.random.normal(jax.random.key(13), y.shape)
    fd = (f(y + eps * d) - f(y - eps * d)) / (2 * eps)
    ad = jnp.vdot(g, d)
    assert abs(float(fd - ad)) / (abs(float(fd)) + 1e-9) < 1e-2


def test_remat_and_backtracking(problem):
    """remat produces identical results with lower memory; backtracking
    rescues a divergent stepsize."""
    x, physics, y = problem
    xstar = _tikhonov_solution(physics, y, 0.3)
    m_remat = optim_builder(
        "PGD", data_fidelity=L2(), prior=Tikhonov(),
        params_algo={"stepsize": 0.9, "lambda": 0.3}, max_iter=100, remat=True,
    )
    m_plain = optim_builder(
        "PGD", data_fidelity=L2(), prior=Tikhonov(),
        params_algo={"stepsize": 0.9, "lambda": 0.3}, max_iter=100,
    )
    assert_close(m_remat(y, physics), m_plain(y, physics), rtol=1e-6, atol=1e-7)
    # gradients still flow under remat
    g = jax.grad(lambda m: jnp.sum(m(y, physics) ** 2))(m_remat)
    assert float(jnp.sum(jnp.abs(g.params_algo["stepsize"]))) > 0

    # divergent stepsize (> 2/L with L=1+lam): plain GD diverges,
    # backtracking recovers
    bad = {"stepsize": 2.5, "lambda": 0.3}
    m_div = optim_builder("GD", data_fidelity=L2(), prior=Tikhonov(),
                          params_algo=bad, max_iter=60)
    m_bt = optim_builder("GD", data_fidelity=L2(), prior=Tikhonov(),
                         params_algo=bad, max_iter=60, backtracking=True)
    err_div = float(jnp.max(jnp.abs(m_div(y, physics) - xstar)))
    err_bt = float(jnp.max(jnp.abs(m_bt(y, physics) - xstar)))
    assert err_bt < 1e-2, err_bt
    assert err_div > err_bt


def test_tv_pallas_matches_xla():
    """Pallas (interpret on CPU) TV prox == XLA fori_loop prox, values and
    gradients."""
    key = jax.random.key(7)
    x = jax.random.normal(key, (2, 1, 17, 23))
    tv_x = TVPrior(n_it_max=40)
    tv_p = TVPrior(n_it_max=40, use_pallas=True)
    a, b = tv_x.prox(x, gamma=0.4), tv_p.prox(x, gamma=0.4)
    assert_close(a, b, rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda u: jnp.sum(tv_x.prox(u, gamma=0.4) ** 2))(x)
    g2 = jax.grad(lambda u: jnp.sum(tv_p.prox(u, gamma=0.4) ** 2))(x)
    assert_close(g1, g2, rtol=1e-4, atol=1e-5)
    # traced gamma (the scan-parameter case inside BaseOptim)
    out = jax.jit(lambda g: tv_p.prox(x, gamma=g))(jnp.asarray(0.4))
    assert_close(out, a, rtol=1e-5, atol=1e-6)


def test_hadamard_dense_matmul_path():
    """MXU dense-matmul FWHT == butterfly FWHT; involution holds."""
    from deepinv_tpu.physics import singlepixel as sp

    x = jax.random.normal(jax.random.key(8), (3, 128))
    dense = sp.hadamard_1d(x)
    old = sp._DENSE_MAX
    try:
        sp._DENSE_MAX = 1
        butterfly = sp.hadamard_1d(x)
    finally:
        sp._DENSE_MAX = old
    assert_close(dense, butterfly, rtol=1e-5, atol=1e-5)
    assert_close(sp.hadamard_1d(dense), x, rtol=1e-5, atol=1e-5)


def test_itoh_fidelity_unwrapping():
    """ItohFidelity: zero at the truth; LS solve unwraps a smooth ramp."""
    import numpy as np
    from deepinv_tpu.optim import ItohFidelity, conjugate_gradient
    from deepinv_tpu.physics import SpatialUnwrapping

    yy, xx = np.mgrid[0:24, 0:24] / 24
    # keep |D x| < threshold/2 so the Itoh condition holds exactly
    x = jnp.asarray(3.0 * xx + 1.2 * np.sin(2 * np.pi * yy), jnp.float32)[None, None]
    phys = SpatialUnwrapping(threshold=1.0, mode="round")
    y = phys.A(x)
    fid = ItohFidelity(sigma=1.0)
    assert float(fid.fn(x, y)[0]) < 1e-8
    a = 1e6
    rhs = jnp.zeros_like(y) + a * fid.D_adjoint(fid.WD(y))
    z = conjugate_gradient(lambda u: u + a * fid.D_adjoint(fid.D(u)), rhs,
                           max_iter=400, tol=1e-9)
    err = z - x
    err = err - err.mean()
    assert float(jnp.abs(err).max()) < 1e-2


def test_itoh_prox_parity():
    """DCT closed-form Itoh prox / D_dagger match the reference
    bit-for-bit (reference data_fidelity.py:517)."""
    from test_namespace_parity import _make_stubs, REFERENCE
    import os
    import sys
    import tempfile

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    stub_root = tempfile.mkdtemp()
    _make_stubs(stub_root)
    sys.path.insert(0, stub_root)
    sys.path.insert(0, REFERENCE)
    try:
        from deepinv.optim.data_fidelity import ItohFidelity as RefItoh
    finally:
        sys.path.remove(stub_root)
        sys.path.remove(REFERENCE)

    rng = np.random.default_rng(0)
    y = rng.normal(size=(2, 1, 13, 17)).astype(np.float32)
    x = rng.normal(size=(2, 1, 13, 17)).astype(np.float32)
    ref = RefItoh(sigma=1.0, threshold=1.0)
    ours = ItohFidelity(sigma=1.0, threshold=1.0)
    assert_close(
        np.asarray(ours.prox(jnp.asarray(x), jnp.asarray(y), gamma=0.7)),
        ref.prox(torch.tensor(x), torch.tensor(y), physics=None,
                 gamma=0.7).numpy(), rtol=1e-4, atol=1e-4)
    assert_close(np.asarray(ours.D_dagger(jnp.asarray(y))),
                 ref.D_dagger(torch.tensor(y)).numpy(),
                 rtol=1e-4, atol=1e-4)
    assert_close(np.asarray(ours.grad(jnp.asarray(x), jnp.asarray(y))),
                 ref.grad(torch.tensor(x), torch.tensor(y)).numpy(),
                 rtol=1e-4, atol=1e-4)


def test_pmd_equals_pgd_and_pdcp_equals_cp(problem):
    """PMD with the default BregmanL2 potential reduces to PGD; PDCP with
    identity K reduces to CP (reference optimizers.py:2081)."""
    from deepinv_tpu.optim import PMD, PDCP

    x, physics, y = problem
    pa = {"stepsize": 0.9, "lambda": 0.3}
    a = PMD(data_fidelity=L2(), prior=Tikhonov(), params_algo=pa, max_iter=100)(y, physics)
    b = optim_builder("PGD", data_fidelity=L2(), prior=Tikhonov(), params_algo=pa, max_iter=100)(y, physics)
    assert_close(a, b, rtol=1e-5, atol=1e-6)
    pa2 = {"stepsize": 0.5, "stepsize_dual": 0.5, "lambda": 0.3}
    c = PDCP(data_fidelity=L2(), prior=Tikhonov(), params_algo=pa2, max_iter=100)(y, physics)
    d = optim_builder("CP", data_fidelity=L2(), prior=Tikhonov(), params_algo=pa2, max_iter=100)(y, physics)
    assert_close(c, d, rtol=1e-6, atol=1e-7)


def test_spectral_method_iterator():
    """SMIteration recovers the phase-retrieval direction like the
    standalone spectral initializer."""
    from deepinv_tpu.optim import Zero
    from deepinv_tpu.physics import RandomPhaseRetrieval
    from deepinv_tpu.physics.phase_retrieval import cosine_similarity

    phys = RandomPhaseRetrieval(m=800, img_size=(1, 8, 8))
    x = jax.random.normal(jax.random.key(3), (1, 1, 8, 8)).astype(jnp.complex64)
    y = phys.A(x)
    m = optim_builder(
        "SM", data_fidelity=L2(), prior=Zero(), params_algo={"stepsize": 1.0},
        max_iter=100,
        custom_init=lambda yy, p: jax.random.normal(
            jax.random.key(23), (1, 1, 8, 8)).astype(jnp.complex64),
    )
    assert float(cosine_similarity(m(y, phys), x)) > 0.7


def test_l12_prior_reference_semantics():
    """L12Prior: l2 over the LAST axis by default, l1 across the rest
    (reference prior.py:963); prox = relu(z-gamma)/z * x."""
    from deepinv_tpu.optim import L12Prior

    x = jax.random.normal(jax.random.key(5), (2, 1, 4, 5))
    p = L12Prior()
    n = np.linalg.norm(np.asarray(x), axis=-1)
    want_fn = np.abs(n).reshape(2, -1).sum(1)
    np.testing.assert_allclose(np.asarray(p.fn(x)), want_fn, rtol=1e-5)
    g = 0.3
    z = np.linalg.norm(np.asarray(x), axis=-1, keepdims=True)
    want = np.maximum(z - g, 0) / (z + 1e-12) * np.asarray(x)
    np.testing.assert_allclose(np.asarray(p.prox(x, gamma=g)), want, rtol=1e-5)


def test_l1_fidelity_prox_closed_form():
    """L1 fidelity prox via dual forward-backward matches the closed form
    y + soft(x - y, gamma) when A = Id. The reference's solver mistakenly
    drops its gamma (data_fidelity.py:745 passes gamma positionally into
    *args) — this guards OUR correct behavior."""
    from deepinv_tpu.optim import L1
    from deepinv_tpu.physics import Denoising

    key = jax.random.key(6)
    x = jax.random.normal(key, (2, 1, 8, 8))
    y = jax.random.normal(jax.random.fold_in(key, 1), (2, 1, 8, 8)) * 0.5
    g = 0.3
    got = L1().prox(x, y, Denoising(), gamma=g)
    xn, yn = np.asarray(x), np.asarray(y)
    soft = lambda v, t: np.sign(v) * np.maximum(np.abs(v) - t, 0)
    np.testing.assert_allclose(np.asarray(got), yn + soft(xn - yn, g), atol=1e-5)


def test_poisson_likelihood_fn_value():
    """PoissonLikelihood.fn includes the reference's constant terms
    (distance.py:222): sum(-y log(u/g + b)) + sum(u/g + b - y)."""
    from deepinv_tpu.optim import PoissonLikelihood
    from deepinv_tpu.physics import Denoising

    u = jnp.abs(jax.random.normal(jax.random.key(7), (1, 1, 4, 4))) + 0.2
    y = jnp.abs(jax.random.normal(jax.random.key(8), (1, 1, 4, 4))) + 0.1
    gain, bkg = 0.2, 0.1
    f = PoissonLikelihood(gain=gain, bkg=bkg)
    got = float(f.fn(u, y, Denoising())[0])
    un, yn = np.asarray(u), np.asarray(y) / gain  # fidelity denormalizes y
    want = float((-yn * np.log(un / gain + bkg)).sum() + (un / gain + bkg - yn).sum())
    assert abs(got - want) / abs(want) < 1e-5


def test_data_fidelity_l2_matrix_closed_forms():
    """L2 fidelity against the reference's hand-computed matrix cases
    (reference test_optim.py:test_data_fidelity_l2)."""
    from deepinv_tpu.physics import LinearPhysics
    from deepinv_tpu.optim import L2

    x = jnp.array([[[1.0], [4.0]]])
    y = jnp.array([[[1.0], [1.0]]])
    A = jnp.array([[2.0, 0.0], [0.0, 0.5]])
    physics = LinearPhysics(A=lambda v: A @ v, A_adjoint=lambda v: A.T @ v)
    df = L2()
    assert np.allclose(np.asarray(df(x, y, physics)), [1.0])
    assert np.allclose(np.asarray(df.grad(x, y, physics)).ravel(),
                       [2.0, 0.5])
    assert np.allclose(np.asarray(df.prox(x, y, physics, gamma=1.0)).ravel(),
                       [0.6, 3.6], atol=1e-5)
    # trivial operations on d (not d o A)
    assert np.allclose(np.asarray(df.d.prox(x, y, 1.0)), (x + y) / 2)
    assert np.allclose(np.asarray(df.d.grad(x, y)), x - y)

    # nonsymmetric operator: prox against the matrix-inverse closed form
    B = jnp.array([[2.0, 1.0], [-1.0, 0.5]])
    pb = LinearPhysics(A=lambda v: B @ v, A_adjoint=lambda v: B.T @ v)
    manual = jnp.linalg.inv(jnp.eye(2) + B.T @ B) @ (x[0] + B.T @ y[0])
    assert np.allclose(np.asarray(df.prox(x, y, pb, gamma=1.0)).ravel(),
                       np.asarray(manual).ravel(), atol=1e-5)
    assert np.allclose(np.asarray(df.grad(x, y, pb)).ravel(),
                       np.asarray(B.T @ (B @ x[0] - y[0])).ravel(), atol=1e-5)
    # d.prox/grad vs prox_d/grad_d consistency
    assert np.allclose(np.asarray(df.d.prox(x, y, 1.0)),
                       np.asarray(df.prox_d(x, y, pb, gamma=1.0)))
    assert np.allclose(np.asarray(df.d.grad(x, y)),
                       np.asarray(df.grad_d(x, y)))


def test_data_fidelity_indicator_reference_values():
    """IndicatorL2: ball membership, trivial projection, and the dual
    forward-backward prox against the reference's published solution
    (reference test_optim.py:test_data_fidelity_indicator) — regression
    for a missing Moreau u_/step scaling that converged to a feasible but
    suboptimal point."""
    from deepinv_tpu.physics import LinearPhysics
    from deepinv_tpu.optim import IndicatorL2

    x = jnp.array([[[1.0], [4.0]]])
    y = jnp.array([[[1.0], [1.0]]])
    A = jnp.array([[2.0, 0.0], [0.0, 0.5]])
    physics = LinearPhysics(A=lambda v: A @ v, A_adjoint=lambda v: A.T @ v)
    df = IndicatorL2(radius=0.5)

    assert not np.isfinite(np.asarray(df(x, y, physics)))[0]
    assert np.asarray(df(x / 2, y, physics))[0] == 0.0
    assert not np.isfinite(np.asarray(df.d(x, y, radius=1.0)))[0]
    assert np.asarray(df.d(x, y, radius=3.1))[0] == 0.0
    assert np.allclose(np.asarray(df.d.prox(x, y)).ravel(), [1.0, 1.5])

    pr = df.prox(x, y, physics, max_iter=1000, crit_conv=1e-12)
    assert np.allclose(np.asarray(pr).ravel(), [0.5290, 2.9932], atol=1e-4)
    assert float(jnp.linalg.norm(A @ pr[0] - y[0])) <= 0.5 + 1e-5

"""Sampling battery wave 2 — reference test_sampling.py ideas not yet in
tests/test_sampling.py: solver-order checks (Euler vs Heun on an exactly
solvable ODE), forward-marginal statistics for the EDM/Song
parametrizations, Welford vs numpy, solver rng contracts, and seed
determinism of the posterior samplers (reference sde_solver.py rng
semantics; diffusion_sde.py:248,477).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.sampling import (
    BaseSDE,
    EDMDiffusionSDE,
    EulerSolver,
    HeunSolver,
    SongDiffusionSDE,
    Welford,
)

from conftest import assert_close


# ----------------------------------------------------------------- Welford --
def test_welford_matches_numpy(key):
    xs = jax.random.normal(key, (40, 2, 3))
    w = Welford(xs[0])
    for i in range(1, xs.shape[0]):
        w.update(xs[i])
    assert_close(w.mean(), jnp.mean(xs, axis=0), rtol=1e-5, atol=1e-6)
    assert_close(w.var(), jnp.var(xs, axis=0, ddof=1), rtol=1e-4, atol=1e-6)


# ------------------------------------------------------------ solver order --
def _linear_ode(lam=-1.0):
    """dx = lam x dt with zero diffusion: exact solution x0 exp(lam t)."""
    return BaseSDE(drift=lambda x, t: lam * x,
                   diffusion=lambda t: jnp.zeros(()))


@pytest.mark.parametrize("solver_cls,order", [(EulerSolver, 1),
                                              (HeunSolver, 2)])
def test_solver_convergence_order(solver_cls, order, key):
    """On the deterministic limit the global error scales as dt^order —
    halving dt must shrink the error by at least ~2^order * 0.7."""
    sde = _linear_ode()
    x0 = jnp.ones((1, 1, 2, 2))
    exact = float(np.exp(-1.0))

    def err(n):
        ts = jnp.linspace(0.0, 1.0, n + 1)
        out = solver_cls(ts).sample(sde, x0, key=key)
        return abs(float(out[0, 0, 0, 0]) - exact)

    e1, e2 = err(16), err(32)
    assert e2 < e1 / (2**order) * 1.4


def test_heun_beats_euler_on_coarse_grid(key):
    sde = _linear_ode(lam=-2.0)
    x0 = jnp.ones((1, 1, 2, 2))
    ts = jnp.linspace(0.0, 1.0, 9)
    exact = float(np.exp(-2.0))
    e_euler = abs(float(EulerSolver(ts).sample(sde, x0, key=key)[0, 0, 0, 0])
                  - exact)
    e_heun = abs(float(HeunSolver(ts).sample(sde, x0, key=key)[0, 0, 0, 0])
                 - exact)
    assert e_heun < e_euler


def test_solver_rng_contracts(key):
    """randn_like advances like the reference's stateful generator
    (successive draws differ); rng_manual_seed accepts string seeds;
    reset_rng restores construction state so the stream replays
    (reference sde_solver.py rng semantics)."""
    s = EulerSolver(jnp.linspace(0, 1, 4), rng_seed=3)
    x = jnp.zeros((1, 1, 4, 4))
    a = s.randn_like(x)
    b = s.randn_like(x)
    assert not np.allclose(np.asarray(a), np.asarray(b))  # stream advances
    s.rng_manual_seed("some-string-seed")
    c = s.randn_like(x)
    assert not np.allclose(np.asarray(a), np.asarray(c))
    s.reset_rng()
    assert_close(s.randn_like(x), a)  # replay from the construction seed
    # explicit keys bypass the stream (pure-function mode, jit-safe)
    e1 = s.randn_like(x, key=jax.random.key(9))
    e2 = s.randn_like(x, key=jax.random.key(9))
    assert_close(e1, e2)


def test_same_key_same_chain_different_key_differs(key):
    """SDE sampling is a pure function of the key."""
    sde = BaseSDE(drift=lambda x, t: -x, diffusion=lambda t: jnp.ones(()))
    solver = EulerSolver(jnp.linspace(0.0, 1.0, 16))
    x0 = jnp.ones((1, 1, 4, 4))
    o1 = solver.sample(sde, x0, key=jax.random.key(5))
    o2 = solver.sample(sde, x0, key=jax.random.key(5))
    o3 = solver.sample(sde, x0, key=jax.random.key(6))
    assert_close(o1, o2)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


# ---------------------------------------------------- EDM / Song schedules --
def _id_denoiser(x, sigma):
    return x


def test_edm_ve_prior_scale():
    """Variance-exploding EDM: s(t)=1, so the prior draw has std
    sigma(T)."""
    sde = EDMDiffusionSDE(sigma_t=lambda t: t, variance_exploding=True,
                          T=10.0, denoiser=_id_denoiser)
    xs = sde.prior_sample((4, 1, 64, 64), jax.random.key(0))
    assert float(jnp.std(xs)) == pytest.approx(10.0, rel=0.05)
    assert float(sde.scale_t(3.0)) == pytest.approx(1.0)


def test_edm_vp_scale_schedule():
    """Variance-preserving EDM: s(t) = (1+sigma^2)^{-1/2}, so the total
    marginal std s(t)*sqrt(1+sigma(t)^2) stays 1."""
    sde = EDMDiffusionSDE(sigma_t=lambda t: t, variance_preserving=True,
                          T=4.0, denoiser=_id_denoiser)
    for t in (0.5, 1.0, 3.0):
        s, sg = float(sde.scale_t(t)), float(sde.sigma_t(t))
        assert s * np.sqrt(1 + sg**2) == pytest.approx(1.0, rel=1e-5)


def test_edm_autodiff_derivatives_match_manual():
    """Unsupplied sigma'/scale' come from jax.grad and must match the
    closed forms."""
    sde = EDMDiffusionSDE(sigma_t=lambda t: t**2,
                          variance_exploding=True, denoiser=_id_denoiser)
    for t in (0.3, 1.7):
        assert float(sde.sigma_prime_t(t)) == pytest.approx(2 * t, rel=1e-5)
        assert float(sde.scale_prime_t(t)) == pytest.approx(0.0, abs=1e-6)


def test_edm_score_is_tweedie():
    """With the identity denoiser the Tweedie score is exactly 0 (D(u)=u)."""
    sde = EDMDiffusionSDE(sigma_t=lambda t: t, variance_exploding=True,
                          denoiser=_id_denoiser)
    x = jnp.ones((1, 1, 4, 4)) * 3.0
    assert_close(sde.score(x, jnp.asarray(0.7)), jnp.zeros_like(x))


def test_song_vp_matches_edm_vp_parametrization():
    """Song VP with the default linear beta must produce the canonical
    s(t) = exp(-B(t)/2) with total marginal std <= 1 and sigma increasing."""
    sde = SongDiffusionSDE(variance_preserving=True, T=1.0,
                           denoiser=_id_denoiser)
    ts = np.linspace(0.05, 0.95, 7)
    sigmas = [float(sde.sigma_t(t)) for t in ts]
    assert all(b > a for a, b in zip(sigmas, sigmas[1:]))
    for t in ts:
        s, sg = float(sde.scale_t(t)), float(sde.sigma_t(t))
        total = s * np.sqrt(1 + sg**2)
        assert total == pytest.approx(1.0, rel=5e-3)


def test_edm_reverse_sde_gaussianity(key):
    """Reverse EDM-VE sampling with the identity denoiser (score=0) is a
    driftless diffusion: from the sigma(T)-scaled prior, marginal variance
    shrinks monotonically as sigma decreases toward 0 ... actually with
    score=0 the reverse SDE only injects the forward noise back, so the
    final std must be close to sigma(T) (nothing removes energy). This
    pins the drift/diffusion sign conventions."""
    T = 1.0
    sde = EDMDiffusionSDE(sigma_t=lambda t: 2.0 * t,
                          variance_exploding=True, T=T,
                          denoiser=_id_denoiser)
    x0 = sde.prior_sample((8, 1, 32, 32), key)
    ts = jnp.linspace(T, 1e-3, 33)
    out = EulerSolver(ts).sample(sde, x0, key=jax.random.key(2))
    # score=0: d(var)/dt = g^2 along reverse time; integrating from T to 0
    # doubles the variance: std = sqrt(2) * sigma(T) up to discretization
    assert float(jnp.std(out)) == pytest.approx(np.sqrt(2) * 2.0, rel=0.15)


# ---------------------------------------------------- posterior samplers --
def test_ddrm_key_determinism(key):
    """DDRM sampling is a pure function of its key (reference samplers use
    resettable torch.Generators; here the key IS the state)."""
    import numpy as np

    from deepinv_tpu.physics import GaussianNoise, Inpainting
    from deepinv_tpu.sampling import DDRM

    physics = Inpainting(img_size=(1, 16, 16), mask=0.6,
                         key=jax.random.key(1),
                         noise_model=GaussianNoise(0.05))
    x = jax.random.uniform(key, (1, 1, 16, 16))
    y = physics(x, key=jax.random.key(2))
    den = lambda v, s, **kw: v
    m = DDRM(den, sigmas=np.linspace(1, 0, 8))
    o1 = m(y, physics, key=jax.random.key(3))
    o2 = m(y, physics, key=jax.random.key(3))
    o3 = m(y, physics, key=jax.random.key(4))
    assert_close(o1, o2)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    assert o1.shape == x.shape


def test_history_size_true_stores_all_and_false_raises(key):
    """r5 review: history_size=True keeps EVERY included sample;
    history_size=False raises on get_chain (reference sampling.py)."""
    from deepinv_tpu.optim import L2, Tikhonov
    from deepinv_tpu.physics import Denoising, GaussianNoise
    from deepinv_tpu.sampling import sampling_builder

    physics = Denoising(noise_model=GaussianNoise(0.1))
    y = physics(jnp.zeros((1, 1, 6, 6)), key=key)
    kw = dict(data_fidelity=L2(), prior=Tikhonov(),
              params_algo={"step_size": 0.01, "alpha": 1.0, "sigma": 0.1},
              max_iter=20, burnin_ratio=0.5, thinning=1)
    s_all = sampling_builder("ULA", history_size=True, **kw)
    s_all.sample(y, physics, key=jax.random.key(1))
    assert len(s_all.get_chain()) == 10  # every post-burn-in sample

    s_none = sampling_builder("ULA", history_size=False, **kw)
    s_none.sample(y, physics, key=jax.random.key(1))
    with pytest.raises(RuntimeError):
        s_none.get_chain()

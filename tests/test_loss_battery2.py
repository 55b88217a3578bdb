"""Loss battery wave 2 — reference test_loss.py matrices not yet ported:
the measurement-splitting masking matrix (test_measplit_masking: mode x
split_ratio statistics and complementarity), StackedPhysicsLoss over
heterogeneous stacks (test_stacked_loss), ReducedResolutionLoss shape
contracts (test_reducedresolution_shapes), the R2R noise-type sweep
(test_r2r) and the Poisson-Gaussian SURE variant (test_sure).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinv_tpu.loss import (
    MCLoss,
    R2RLoss,
    ReducedResolutionLoss,
    SplittingLoss,
    StackedPhysicsLoss,
    SupLoss,
    SurePGLoss,
)
from deepinv_tpu.physics import (
    Denoising,
    Downsampling,
    GammaNoise,
    GaussianNoise,
    Inpainting,
    PoissonNoise,
    stack,
)
from deepinv_tpu.physics.generator import (
    BernoulliSplittingMaskGenerator,
    GaussianSplittingMaskGenerator,
)

from conftest import assert_close


def _model(yv, p, **kw):
    return p.A_adjoint(yv)


# --------------------------------------------------------- splitting masks --
@pytest.mark.parametrize("split_ratio", [0.5, 0.9])
@pytest.mark.parametrize("gen_cls", [BernoulliSplittingMaskGenerator,
                                     GaussianSplittingMaskGenerator])
def test_measplit_masking_matrix(gen_cls, split_ratio, key):
    """Reference test_measplit_masking: the generator's masks hit the
    requested density and the split/complement are exactly disjoint."""
    img_size = (1, 32, 32)
    gen = gen_cls(img_size=img_size, split_ratio=split_ratio, seed=3)
    params = gen.step(batch_size=4, key=key)
    mask = np.asarray(params["mask"])
    assert mask.shape[0] == 4
    density = mask.mean()
    tol = 0.12 if gen_cls is GaussianSplittingMaskGenerator else 0.05
    assert density == pytest.approx(split_ratio, abs=tol)
    assert set(np.unique(mask)).issubset({0.0, 1.0})


@pytest.mark.parametrize("pixelwise", [True, False])
def test_splitting_loss_mask_complementarity(pixelwise, key):
    """The train-time input mask and the loss complement never overlap and
    together tile the measurement (reference measplit.py:11)."""
    img_size = (2, 16, 16)
    p = Denoising(noise_model=GaussianNoise(0.05))
    x = jax.random.uniform(key, (1, *img_size))
    y = p(x, key=jax.random.key(1))
    loss = SplittingLoss(split_ratio=0.6, pixelwise=pixelwise)
    model = loss.adapt_model(_model)
    k = jax.random.key(2)
    x_net, mask = model(y, p, key=k, train=True, return_mask=True)
    m = np.asarray(mask)
    if pixelwise:
        # mask shared across channels
        assert np.array_equal(m[:, 0], m[:, 1])
    l = loss(x_net=x_net, y=y, physics=p, model=model, key=k)
    assert np.isfinite(np.asarray(l)).all()


def test_splitting_eval_modes_differ(key):
    """eval_split_input=False (SSDU) feeds the full measurement at eval;
    the two eval conventions give different reconstructions."""
    img_size = (1, 16, 16)
    p = Denoising(noise_model=GaussianNoise(0.05))
    y = p(jax.random.uniform(key, (1, *img_size)), key=jax.random.key(1))

    def den(yv, pp, **kw):
        return yv * 0.9

    m_split = SplittingLoss(split_ratio=0.6, eval_n_samples=2).adapt_model(den)
    m_full = SplittingLoss(split_ratio=0.6,
                           eval_split_input=False).adapt_model(den)
    o_split = m_split(y, p, key=jax.random.key(3))
    o_full = m_full(y, p, key=jax.random.key(3))
    assert_close(o_full, y * 0.9)
    assert not np.allclose(np.asarray(o_split), np.asarray(o_full))


# ------------------------------------------------------------ stacked loss --
def test_stacked_loss_over_heterogeneous_stack(key):
    """Reference test_stacked_loss: per-operator losses applied to a
    TensorList measurement sum to the serial evaluation."""
    img_size = (1, 16, 16)
    p1 = Inpainting(img_size=img_size, mask=0.7, key=jax.random.key(1))
    p2 = Downsampling(img_size=img_size, filter="bilinear", factor=2)
    sp = stack(p1, p2)
    x = jax.random.uniform(key, (2, *img_size))
    y = sp.A(x)
    model = lambda yv, pp, **kw: x

    losses = [MCLoss(), MCLoss()]
    sl = StackedPhysicsLoss(losses)
    got = sl(x_net=x, y=y, physics=sp, model=model)
    want = sum(
        np.asarray(l(x_net=x, y=yi, physics=pi, model=model))
        for l, yi, pi in zip(losses, list(y), [p1, p2])
    )
    assert_close(got, want, rtol=1e-5, atol=1e-6)


# ----------------------------------------------------- reduced resolution --
def test_reducedresolution_shapes_and_train_eval(key):
    """Reference test_reducedresolution_shapes: the Wald-protocol wrapper
    re-degrades at train time (shapes shrink through A) and is the
    identity wrapper at eval."""
    img_size = (1, 32, 32)
    p = Downsampling(img_size=img_size, filter="bilinear", factor=2)
    x = jax.random.uniform(key, (1, *img_size))
    y = p.A(x)  # (1,1,16,16)
    # the Wald re-degradation must be applicable to y itself: pass an
    # explicit lower-resolution physics (reference sup.py:53 'physics'
    # argument)
    p_lo = Downsampling(img_size=(1, 16, 16), filter="bilinear", factor=2)

    def up_model(yv, pp, **kw):
        return pp.A_adjoint(yv)

    loss = ReducedResolutionLoss(physics=p_lo)
    m = loss.adapt_model(up_model)
    m.training = True
    x_net = m(y, p)
    assert x_net.shape == y.shape  # model upsampled the re-degraded input
    l = loss(x_net=x_net, y=y, physics=p, model=m)
    assert np.isfinite(np.asarray(l)).all()
    m.training = False
    assert m(y, p).shape == x.shape


# ------------------------------------------------------------- R2R matrix --
@pytest.mark.parametrize("noise_model,alpha", [
    (GaussianNoise(0.1), 0.5),
    (PoissonNoise(gain=0.5), 0.5),
    (GammaNoise(l=10.0), 0.5),
])
def test_r2r_noise_type_sweep(noise_model, alpha, key):
    """Reference test_r2r: for each supported noise family the corruption
    pair (y1, y2) is unbiased — E[alpha y2 + (1-alpha) y1] == y — and the
    loss is finite."""
    img_size = (1, 16, 16)
    p = Denoising(noise_model=noise_model)
    x = 0.5 + 0.4 * jax.random.uniform(key, (1, *img_size))
    y = p(x, key=jax.random.key(1))
    loss = R2RLoss(noise_model=noise_model, alpha=alpha)
    model = loss.adapt_model(_model)

    # unbiasedness of the recorruption over many draws
    recon = []
    for i in range(200):
        x1, y1 = model(y, p, key=jax.random.key(10 + i), train=True,
                       return_corruption=True)
        y2 = (y - (1 - alpha) * y1) / alpha
        recon.append(alpha * np.asarray(y2) + (1 - alpha) * np.asarray(y1))
    assert_close(np.mean(recon, axis=0), y, rtol=0.1, atol=0.05)

    l = loss(y=y, physics=p, model=model, key=key)
    assert np.isfinite(np.asarray(l)).all()


# ------------------------------------------------------------ SURE PG ----
def test_sure_pg_estimates_risk(key):
    """SurePGLoss approximates the true MSE risk for a linear shrinkage
    denoiser under Poisson-Gaussian noise (reference test_sure)."""
    sigma, gain = 0.05, 0.2
    img_size = (1, 32, 32)
    from deepinv_tpu.physics import PoissonGaussianNoise

    p = Denoising(noise_model=PoissonGaussianNoise(sigma=sigma, gain=gain))
    x = 0.5 + 0.3 * jax.random.uniform(key, (1, *img_size))

    def den(yv, pp, **kw):
        return 0.9 * yv

    loss = SurePGLoss(sigma=sigma, gain=gain)
    vals, mses = [], []
    for i in range(64):
        y = p(x, key=jax.random.key(100 + i))
        x_net = den(y, p)
        vals.append(float(np.mean(np.asarray(
            loss(y=y, physics=p, model=den, x_net=x_net,
                 key=jax.random.key(200 + i))))))
        mses.append(float(jnp.mean((x_net - x) ** 2)))
    # SURE is risk-unbiased up to the constant ||x||^2 terms it drops;
    # compare both estimates of the *excess* risk
    assert np.mean(vals) == pytest.approx(np.mean(mses), rel=0.35)


def test_sup_and_mc_zero_at_truth(key):
    img_size = (1, 8, 8)
    p = Denoising()
    x = jax.random.uniform(key, (1, *img_size))
    y = p.A(x)
    assert float(np.mean(np.asarray(
        SupLoss()(x_net=x, x=x, y=y, physics=p, model=None)))) == 0.0
    assert float(np.mean(np.asarray(
        MCLoss()(x_net=x, y=y, physics=p, model=None)))) == 0.0


# ------------------------------------------------- r5 review regressions --
def test_pgd_g_first_is_gradient_step_on_prior(key):
    """r5 review: g_first=True runs a GRADIENT step on g then prox of f
    (reference pgd.py gStepPGD), not a prox-prox splitting."""
    from deepinv_tpu.optim import Tikhonov, L2, optim_builder
    from deepinv_tpu.physics import BlurFFT
    from deepinv_tpu.ops import gaussian_blur

    img = (1, 16, 16)
    physics = BlurFFT(img_size=img, filter=gaussian_blur(sigma=0.8))
    y = physics.A(jax.random.uniform(key, (1, *img)))
    lam, tau = 0.1, 0.5
    m = optim_builder("PGD", data_fidelity=L2(), prior=Tikhonov(),
                      params_algo={"stepsize": tau, "lambda": lam},
                      max_iter=1, g_first=True,
                      custom_init=lambda yv, p: physics.A_adjoint(yv))
    got = m(y, physics)
    x0 = physics.A_adjoint(y)
    z = x0 - lam * tau * x0                      # gradient step on g
    want = physics.prox_l2(z, y, tau)            # prox of f
    assert_close(got, want, rtol=1e-4, atol=1e-5)


def test_ensure_weights_residual_by_density(key):
    """r5 review: ENSURE weights the residual by W^{-1/2} from the
    physics generator (its defining correction)."""
    from deepinv_tpu.loss import ENSURELoss
    from deepinv_tpu.physics.generator import BernoulliSplittingMaskGenerator

    gen = BernoulliSplittingMaskGenerator(img_size=(1, 8, 8),
                                          split_ratio=0.5, seed=0)
    l_w = ENSURELoss(sigma=0.1, physics_generator=gen)
    l_plain = ENSURELoss(sigma=0.1)
    assert l_w.dsqrti is not None and l_plain.dsqrti is None
    # density ~0.5 -> weights ~sqrt(2)
    assert float(jnp.mean(l_w.dsqrti)) == pytest.approx(np.sqrt(2), rel=0.1)

    p = Denoising(noise_model=GaussianNoise(0.1))
    y = p(jax.random.uniform(key, (1, 1, 8, 8)), key=jax.random.key(1))
    model = lambda yv, pp, **kw: yv * 0.9
    a = float(np.mean(np.asarray(l_w(y=y, physics=p, model=model, key=key))))
    b = float(np.mean(np.asarray(l_plain(y=y, physics=p, model=model,
                                         key=key))))
    assert np.isfinite(a) and np.isfinite(b) and a != b


def test_splitting_loss_respects_metric(key):
    """r5 review: the user metric must change the loss value (it was
    silently ignored in favor of hardcoded MSE)."""
    from deepinv_tpu.loss.metric import MAE

    p = Denoising(noise_model=GaussianNoise(0.05))
    y = p(jax.random.uniform(key, (1, 1, 16, 16)), key=jax.random.key(1))
    model = lambda yv, pp, **kw: yv * 0.5
    k = jax.random.key(2)
    l_mse = SplittingLoss(split_ratio=0.6)(
        x_net=None, y=y, physics=p, model=model, key=k)
    l_mae = SplittingLoss(split_ratio=0.6, metric=MAE())(
        x_net=None, y=y, physics=p, model=model, key=k)
    assert not np.allclose(np.asarray(l_mse), np.asarray(l_mae))


def test_n2n_pairs_are_adjacent(key):
    """r5 review: Neighbor2Neighbor draws adjacent (non-diagonal) cell
    pairs from the reference's idx_pair table."""
    from deepinv_tpu.loss import Neighbor2Neighbor

    idx_pair = np.asarray(
        [[0, 1], [0, 2], [1, 3], [2, 3], [1, 0], [2, 0], [3, 1], [3, 2]])
    diffs = {tuple(sorted(p)) for p in idx_pair}
    assert (0, 3) not in diffs and (1, 2) not in diffs  # no diagonals
    # loss is finite and gradient flows only through the subsampled branch
    p = Denoising(noise_model=GaussianNoise(0.05))
    y = p(jax.random.uniform(key, (1, 1, 16, 16)), key=jax.random.key(1))
    n2n = Neighbor2Neighbor()
    model = lambda yv, pp, **kw: yv * 0.9
    val = n2n(y=y, physics=p, model=model, key=key)
    assert np.isfinite(np.asarray(val)).all()


def test_moi_loss_generator_mode(key):
    """r5 review: MOILoss(physics_generator=...) resamples operator
    parameters every forward (reference moi.py:86)."""
    from deepinv_tpu.loss import MOILoss
    from deepinv_tpu.physics import Inpainting
    from deepinv_tpu.physics.generator import BernoulliSplittingMaskGenerator

    base = Inpainting(img_size=(1, 8, 8), mask=0.5, key=jax.random.key(0))
    gen = BernoulliSplittingMaskGenerator(img_size=(1, 8, 8),
                                          split_ratio=0.5, seed=1)
    loss = MOILoss(physics_list=[base], physics_generator=gen)
    x_net = jax.random.uniform(key, (2, 1, 8, 8))
    model = lambda yv, pp, **kw: pp.A_adjoint(yv)
    a = np.asarray(loss(x_net=x_net, physics=base, model=model,
                        key=jax.random.key(5)))
    b = np.asarray(loss(x_net=x_net, physics=base, model=model,
                        key=jax.random.key(6)))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.allclose(a, b)  # different key -> different operator

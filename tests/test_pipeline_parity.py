"""Full-pipeline numeric parity vs the PyTorch reference.

Runs the complete DPIR reconstruction (physics -> HQS prox -> DRUNet ->
per-iteration schedule, reference optim/dpir.py:81) through BOTH frameworks
with identical weights and measurements — component parity is covered
elsewhere; this test fails if ANY stage of the pipeline drifts.

The DRUNet is randomly initialized (no downloads) and ported through
``models.convert.port_drunet``; bit-faithful porting is asserted separately
in test_weight_porting.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from test_namespace_parity import reference  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def torch(reference):  # noqa: F811
    import torch as _torch

    return _torch


def _psnr(a, b):
    return -10 * np.log10(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_dpir_deblur_pipeline_parity(reference, torch):  # noqa: F811
    """End-to-end DPIR (8 HQS iterations, log-spaced sigma/stepsize
    schedule, BlurFFT closed-form prox) matches the reference output."""
    import deepinv as dinv
    from deepinv_tpu.physics import BlurFFT, GaussianNoise
    from deepinv_tpu.ops import gaussian_blur
    from deepinv_tpu.optim import DPIR
    from deepinv_tpu.models import DRUNet
    from deepinv_tpu.models.convert import port_drunet

    H = W = 64
    noise_level = 0.03

    # fixed smooth test image
    yy, xx = np.mgrid[0:H, 0:W] / float(H)
    x_np = np.stack(
        [np.sin(6 * xx) * np.cos(4 * yy) * 0.4 + 0.5, xx * 0.8 + 0.1,
         ((xx + yy) / 2) * 0.9], dtype=np.float32,
    )[None]

    # --- reference side (torch CPU) -------------------------------------
    filt_t = dinv.physics.blur.gaussian_blur(sigma=1.2)
    physics_t = dinv.physics.BlurFFT(
        img_size=(3, H, W), filter=filt_t,
        noise_model=dinv.physics.GaussianNoise(sigma=noise_level,
                                               rng=torch.Generator().manual_seed(0)),
    )
    x_t = torch.from_numpy(x_np)
    y_t = physics_t(x_t)

    ref_net = dinv.models.DRUNet(
        in_channels=3, out_channels=3, nc=[16, 32, 64, 64], nb=2,
        pretrained=None,
    ).eval()

    # a random-weight DRUNet maps everything to ~0 and would make parity
    # trivially pass on near-zero outputs; a soft-identity mix keeps the
    # signal O(1) through all 8 iterations so the prox/schedule/denoiser
    # chain is exercised with meaningful values on both sides
    class RefSoftIdentity(dinv.models.base.Denoiser):
        def forward(self, x, sigma, **kwargs):
            return 0.9 * x + 0.1 * ref_net(x, sigma)

    ref_model = dinv.optim.DPIR(sigma=noise_level, denoiser=RefSoftIdentity())
    with torch.no_grad():
        xhat_t = ref_model(y_t, physics_t).numpy()

    # --- TPU-native side, same weights / same measurements --------------
    sd = {k: np.asarray(v.numpy()) for k, v in ref_net.state_dict().items()}
    net = port_drunet(
        DRUNet(in_channels=3, out_channels=3, nc=(16, 32, 64, 64), nb=2,
               pretrained=None),
        sd,
    )

    class SoftIdentity:
        def __call__(self, x, sigma, **kwargs):
            return 0.9 * x + 0.1 * net(x, sigma)

    denoiser = SoftIdentity()
    physics = BlurFFT(img_size=(3, H, W), filter=gaussian_blur(sigma=1.2),
                      noise_model=GaussianNoise(noise_level))
    y = jnp.asarray(y_t.numpy())
    model = DPIR(sigma=noise_level, denoiser=denoiser)
    xhat = np.asarray(jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics))

    # the measurements fed to both sides are identical by construction;
    # the filters must agree too (component sanity inside the pipeline)
    filt_err = np.abs(filt_t.numpy() - np.asarray(gaussian_blur(sigma=1.2))).max()
    assert filt_err < 1e-6, filt_err

    err = np.abs(xhat - xhat_t).max()
    psnr_cross = _psnr(xhat, xhat_t)
    # 8 iterations of float32 FFT prox + CNN: bit drift accumulates but
    # parity must stay at the tolerance of the denoiser port
    assert err < 5e-3, (err, psnr_cross)
    assert psnr_cross > 55, psnr_cross
    # the compared signals are O(1), not a trivial all-zeros agreement
    assert np.std(xhat_t) > 0.05


def test_pgd_mri_pipeline_parity(reference, torch):  # noqa: F811
    """Unfolded-style PnP-PGD on masked-FFT MRI matches the reference:
    physics adjoint -> gradient step -> denoiser, 6 iterations."""
    import deepinv as dinv
    from deepinv_tpu.physics import MRI
    from deepinv_tpu.optim import optim_builder, L2, PnP
    from deepinv_tpu.models import DnCNN
    from deepinv_tpu.models.convert import port_dncnn

    H = W = 32
    rng = np.random.default_rng(0)
    mask_np = (rng.random((H, W)) < 0.4).astype(np.float32)
    x_np = rng.standard_normal((1, 2, H, W)).astype(np.float32) * 0.3

    mask_t = torch.from_numpy(mask_np)
    physics_t = dinv.physics.MRI(mask=mask_t, img_size=(H, W))
    y_t = physics_t.A(torch.from_numpy(x_np))

    torch.manual_seed(0)  # deterministic weights regardless of test order
    ref_den = dinv.models.DnCNN(2, 2, depth=4, pretrained=None).eval()
    prior_t = dinv.optim.PnP(ref_den)
    model_t = dinv.optim.optim_builder(
        "PGD", prior=prior_t, data_fidelity=dinv.optim.L2(), max_iter=6,
        params_algo={"stepsize": 1.0, "g_param": 0.05},
    )
    with torch.no_grad():
        xhat_t = model_t(y_t, physics_t).numpy()

    sd = {k: np.asarray(v.numpy()) for k, v in ref_den.state_dict().items()}
    den = port_dncnn(DnCNN(2, 2, depth=4, pretrained=None), sd)
    physics = MRI(mask=jnp.asarray(mask_np), img_size=(H, W))
    y = jnp.asarray(y_t.numpy())
    model = optim_builder(
        "PGD", prior=PnP(den), data_fidelity=L2(), max_iter=6,
        params_algo={"stepsize": 1.0, "g_param": 0.05},
    )
    xhat = np.asarray(jax.jit(lambda m, yv, p: m(yv, p))(model, y, physics))

    err = np.abs(xhat - xhat_t).max()
    assert err < 2e-4, err


@pytest.mark.slow
def test_ddrm_pipeline_statistical_parity(reference, torch):  # noqa: F811
    """DDRM posterior sampling (reference sampling/diffusion.py:83) through
    both frameworks with the same ported DnCNN: the sampler is stochastic,
    so parity is statistical — mean reconstruction PSNR over seeds must
    agree. Catches schedule/branch drift in the SVD-space updates."""
    import deepinv as dinv
    from deepinv_tpu.physics import Inpainting, GaussianNoise
    from deepinv_tpu.sampling import DDRM
    from deepinv_tpu.models import DnCNN
    from deepinv_tpu.models.convert import port_dncnn

    H = W = 32
    rng = np.random.default_rng(0)
    x_np = (rng.random((1, 1, H, W)) > 0.5).astype(np.float32) * 0.6 + 0.2
    mask_np = (rng.random((1, H, W)) < 0.7).astype(np.float32)
    sigma_noise = 0.05
    sigmas = np.linspace(1, 0, 25)

    # reference side
    physics_t = dinv.physics.Inpainting(
        img_size=(1, H, W), mask=torch.from_numpy(mask_np),
        noise_model=dinv.physics.GaussianNoise(
            sigma=sigma_noise, rng=torch.Generator().manual_seed(0)),
    )
    y_t = physics_t(torch.from_numpy(x_np))
    torch.manual_seed(0)  # deterministic random weights
    ref_net = dinv.models.DnCNN(1, 1, depth=4, pretrained=None).eval()

    # soft-identity mix: a pure random-weight net amplifies noise and both
    # samplers diverge identically (parity trivially holds on garbage);
    # the mix makes DDRM behave like a proper denoising process
    class RefSoftIdentity(dinv.models.base.Denoiser):
        def forward(self, x, sigma, **kwargs):
            return 0.95 * x + 0.05 * ref_net(x, sigma)

    model_t = dinv.sampling.DDRM(denoiser=RefSoftIdentity(), sigmas=sigmas)
    psnrs_t, imgs_t = [], []
    with torch.no_grad():
        for s in range(6):
            torch.manual_seed(s)
            xh = model_t(y_t, physics_t).numpy()
            psnrs_t.append(_psnr(xh, x_np))
            imgs_t.append(xh)

    # TPU-native side: same weights, same measurements
    sd = {k: np.asarray(v.numpy()) for k, v in ref_net.state_dict().items()}
    net = port_dncnn(DnCNN(1, 1, depth=4, pretrained=None), sd)
    den = lambda v, s, **kw: 0.95 * v + 0.05 * net(v, s)
    physics = Inpainting(img_size=(1, H, W), mask=jnp.asarray(mask_np),
                         noise_model=GaussianNoise(sigma_noise))
    y = jnp.asarray(y_t.numpy())
    model = DDRM(den, sigmas=sigmas)
    f = jax.jit(lambda yv, k: model(yv, physics, key=k))
    imgs_j = [np.asarray(f(y, jax.random.key(s))) for s in range(6)]
    psnrs_j = [_psnr(im, x_np) for im in imgs_j]

    m_t, m_j = np.mean(psnrs_t), np.mean(psnrs_j)
    # stochastic samplers: means over 6 seeds agree to ~1 dB unless the
    # schedule or a branch drifted
    assert abs(m_t - m_j) < 1.0, (m_t, m_j, psnrs_t, psnrs_j)
    # sample spread agrees too (same noise schedule scale); 6 seeds only,
    # so this is a coarse drift guard on top of the mean-PSNR check
    s_t, s_j = np.std(imgs_t), np.std(imgs_j)
    assert abs(s_t - s_j) / s_t < 0.2, (s_t, s_j)


@pytest.mark.slow
def test_diffpir_pipeline_statistical_parity(reference, torch):  # noqa: F811
    """DiffPIR (reference sampling/diffusion.py:227) through both
    frameworks with the same ported DnCNN: geometric sigma trajectory,
    t-index mapping and rho schedule must agree — statistical check over
    seeds like the DDRM test."""
    import deepinv as dinv
    from deepinv_tpu.physics import Inpainting, GaussianNoise
    from deepinv_tpu.sampling import DiffPIR
    from deepinv_tpu.models import DnCNN
    from deepinv_tpu.models.convert import port_dncnn

    H = W = 32
    rng = np.random.default_rng(0)
    x_np = (rng.random((1, 1, H, W)) > 0.5).astype(np.float32) * 0.6 + 0.2
    mask_np = (rng.random((1, H, W)) < 0.7).astype(np.float32)
    sigma_noise = 0.05

    physics_t = dinv.physics.Inpainting(
        img_size=(1, H, W), mask=torch.from_numpy(mask_np),
        noise_model=dinv.physics.GaussianNoise(
            sigma=sigma_noise, rng=torch.Generator().manual_seed(0)),
    )
    y_t = physics_t(torch.from_numpy(x_np))
    torch.manual_seed(0)
    ref_net = dinv.models.DnCNN(1, 1, depth=4, pretrained=None).eval()

    class RefSoftIdentity(dinv.models.base.Denoiser):
        def forward(self, x, sigma, **kwargs):
            return 0.95 * x + 0.05 * ref_net(x, sigma)

    model_t = dinv.sampling.DiffPIR(
        model=RefSoftIdentity(), data_fidelity=dinv.optim.L2(),
        max_iter=20, zeta=0.3, sigma=sigma_noise,
    )
    psnrs_t = []
    with torch.no_grad():
        for s in range(6):
            torch.manual_seed(s)
            xh = model_t(y_t, physics_t).numpy()
            psnrs_t.append(_psnr(xh, x_np))

    sd = {k: np.asarray(v.numpy()) for k, v in ref_net.state_dict().items()}
    net = port_dncnn(DnCNN(1, 1, depth=4, pretrained=None), sd)
    den = lambda v, s, **kw: 0.95 * v + 0.05 * net(v, s)
    physics = Inpainting(img_size=(1, H, W), mask=jnp.asarray(mask_np),
                         noise_model=GaussianNoise(sigma_noise))
    y = jnp.asarray(y_t.numpy())
    model = DiffPIR(den, max_iter=20, zeta=0.3, sigma=sigma_noise)
    f = jax.jit(lambda yv, k: model(yv, physics, key=k))
    psnrs_j = [
        _psnr(np.asarray(f(y, jax.random.key(s))), x_np) for s in range(6)
    ]

    m_t, m_j = np.mean(psnrs_t), np.mean(psnrs_j)
    assert abs(m_t - m_j) < 1.0, (m_t, m_j, psnrs_t, psnrs_j)


@pytest.mark.slow
def test_dps_posterior_diffusion_statistical_parity(reference, torch):  # noqa: F811
    """Reference DPS (PosteriorDiffusion + DPSDataFidelity + VP + Euler,
    reference diffusion.py:516) vs our PosteriorDiffusion with the same
    analytic Gaussian-prior MMSE denoiser: both discretize the same guided
    reverse SDE, so seed-averaged reconstruction PSNR must agree.

    Uses an analytic denoiser (D -> x as sigma -> 0) because Tweedie-score
    SDEs require a true MMSE denoiser for stability."""
    import deepinv as dinv
    from deepinv_tpu.physics import Inpainting, GaussianNoise
    from deepinv_tpu.sampling import (
        PosteriorDiffusion, DPSDataFidelity, VariancePreservingDiffusion,
        EulerSolver,
    )

    H = W = 16
    rng = np.random.default_rng(0)
    x01 = (rng.random((1, 1, H, W)) > 0.5).astype(np.float32) * 0.6 + 0.2
    x_pm = 2 * x01 - 1  # states in [-1, 1] like the reference pipeline
    mask_np = (rng.random((1, H, W)) < 0.7).astype(np.float32)
    sigma_noise = 0.05
    mu, tau = float(x_pm.mean()), 0.5

    # reference side
    physics_t = dinv.physics.Inpainting(
        img_size=(1, H, W), mask=torch.from_numpy(mask_np),
        noise_model=dinv.physics.GaussianNoise(
            sigma=sigma_noise, rng=torch.Generator().manual_seed(0)),
    )
    y_t = physics_t.A(torch.from_numpy(x_pm))

    class RefGauss(dinv.models.base.Denoiser):
        def forward(self, x, sigma, **kwargs):
            s2 = float(sigma) ** 2 if not torch.is_tensor(sigma) else sigma**2
            return (mu * s2 + x * tau**2) / (tau**2 + s2)

    model_t = dinv.sampling.DPS(RefGauss(), schedule="vp", num_steps=300,
                                verbose=False)
    psnrs_t = []
    with torch.no_grad():
        pass
    for s in range(4):
        torch.manual_seed(s)
        xh = model_t(y_t, physics_t).detach().numpy()
        psnrs_t.append(_psnr(xh, x_pm))

    # TPU-native side: same denoiser, same measurements
    def gauss_den(v, sig, **kw):
        s2 = jnp.asarray(sig) ** 2
        return (mu * s2 + v * tau**2) / (tau**2 + s2)

    physics = Inpainting(img_size=(1, H, W), mask=jnp.asarray(mask_np),
                         noise_model=GaussianNoise(sigma_noise))
    y = jnp.asarray(y_t.numpy())
    sde = VariancePreservingDiffusion(gauss_den)
    model = PosteriorDiffusion(
        sde, DPSDataFidelity(gauss_den, weight=1.0, clip=(-1.0, 1.0)),
        solver=EulerSolver(np.linspace(1.0, 1e-3, 300)),
    )
    imgs_j = [np.asarray(model(y, physics, key=jax.random.key(s)))
              for s in range(4)]
    psnrs_j = [_psnr(im, x_pm) for im in imgs_j]

    # DPS guidance is an approximation (not an exact posterior sampler):
    # check the samples remain prior-consistent (mean near mu, bounded)
    mean_j = np.mean(imgs_j, axis=0)
    assert abs(mean_j.mean() - mu) < 0.3, mean_j.mean()
    assert np.abs(mean_j).max() < 3.0

    # coarse cross-framework agreement: the reference Euler discretization
    # under-disperses slightly (unconditional VP std 0.41 vs analytic 0.50,
    # ours 0.50), which inflates its PSNR; allow that bias
    m_t, m_j = np.mean(psnrs_t), np.mean(psnrs_j)
    assert abs(m_t - m_j) < 2.5, (m_t, m_j, psnrs_t, psnrs_j)


def test_optimizer_transient_parity(reference, torch):  # noqa: F811
    """Seven proximal algorithms (ADMM, DRS, FISTA, GD, HQS, PGD, CP) with a
    Tikhonov prior match the reference ITERATE-FOR-ITERATE (15 iterations,
    not just at convergence) — catches initialization and relaxation drift
    (e.g. ADMM's auxiliary variable seeding, reference admm.py:58)."""
    import deepinv as dinv
    from deepinv_tpu.physics import BlurFFT
    from deepinv_tpu.ops import gaussian_blur
    from deepinv_tpu.optim import optim_builder, L2, Tikhonov

    H = W = 32
    rng = np.random.default_rng(0)
    x_np = rng.random((1, 1, H, W)).astype(np.float32)
    filt_t = dinv.physics.blur.gaussian_blur(sigma=1.0)
    pt = dinv.physics.BlurFFT(img_size=(1, H, W), filter=filt_t)
    yt = pt.A(torch.from_numpy(x_np))
    pj = BlurFFT(img_size=(1, H, W), filter=gaussian_blur(sigma=1.0))
    yj = jnp.asarray(yt.numpy())

    for algo in ["ADMM", "DRS", "FISTA", "GD", "HQS", "PGD", "CP"]:
        params = {"stepsize": 0.5, "lambda": 0.1, "g_param": 0.1}
        if algo == "FISTA":
            params["a"] = 3.0
        if algo == "CP":
            params.update(stepsize_dual=0.5, beta=1.0)
            mt = dinv.optim.PDCP(
                prior=dinv.optim.Tikhonov(),
                data_fidelity=dinv.optim.L2(), max_iter=15,
                params_algo=dict(params),
            )
        else:
            mt = dinv.optim.optim_builder(
                algo, prior=dinv.optim.Tikhonov(),
                data_fidelity=dinv.optim.L2(), max_iter=15,
                params_algo=dict(params),
            )
        with torch.no_grad():
            ot = mt(yt, pt).numpy()
        mj = optim_builder(
            algo, prior=Tikhonov(), data_fidelity=L2(), max_iter=15,
            params_algo=dict(params),
        )
        oj = np.asarray(jax.jit(lambda m, yv, p: m(yv, p))(mj, yj, pj))
        err = np.abs(ot - oj).max()
        assert err < 1e-4, (algo, err)


def test_mlem_sirt_transient_parity(reference, torch):  # noqa: F811
    """MLEM and SIRT match the reference bit-for-bit at every iteration
    (reference mlem.py / sirt.py)."""
    import deepinv as dinv
    from deepinv_tpu.physics import Inpainting
    from deepinv_tpu.optim import optim_builder, PoissonLikelihood, Zero, L2

    H = W = 16
    rng = np.random.default_rng(0)
    x_np = rng.random((1, 1, H, W)).astype(np.float32) * 0.8 + 0.2
    mask_np = np.ones((1, H, W), np.float32)
    pt = dinv.physics.Inpainting(img_size=(1, H, W),
                                 mask=torch.from_numpy(mask_np))
    yt = pt.A(torch.from_numpy(x_np)) + 0.01
    pj = Inpainting(img_size=(1, H, W), mask=jnp.asarray(mask_np))
    yj = jnp.asarray(yt.numpy())

    for it in (1, 10):
        mt = dinv.optim.MLEM(
            data_fidelity=dinv.optim.PoissonLikelihood(),
            prior=dinv.optim.ZeroPrior(), max_iter=it,
            params_algo={"stepsize": 1.0, "lambda": 1.0},
        )
        with torch.no_grad():
            ot = mt(yt, pt).numpy()
        mj = optim_builder("MLEM", data_fidelity=PoissonLikelihood(),
                           prior=Zero(), max_iter=it,
                           params_algo={"stepsize": 1.0, "lambda": 1.0})
        assert np.abs(ot - np.asarray(mj(yj, pj))).max() < 1e-5

        st = dinv.optim.SIRT(max_iter=it, stepsize=1.0)
        with torch.no_grad():
            ot = st(yt, pt).numpy()
        sj = optim_builder("SIRT", data_fidelity=L2(), prior=Zero(),
                           max_iter=it,
                           params_algo={"stepsize": 1.0, "lambda": 1.0})
        assert np.abs(ot - np.asarray(sj(yj, pj))).max() < 1e-5


def test_noise_model_moment_parity(reference, torch):  # noqa: F811
    """All stochastic noise models match the reference distributionally
    (mean/std over 64x32x32 draws at x = 0.5) — catches parameterization
    drift like FisherTippett's log-intensity convention (noise.py:870)."""
    import deepinv as dinv
    import deepinv_tpu.physics as P

    x_np = np.full((64, 1, 32, 32), 0.5, np.float32)
    xt = torch.from_numpy(x_np)
    xj = jnp.asarray(x_np)
    g = torch.Generator().manual_seed(0)
    pairs = [
        (dinv.physics.GaussianNoise(sigma=0.1, rng=g), P.GaussianNoise(0.1)),
        (dinv.physics.PoissonNoise(gain=0.05, rng=g), P.PoissonNoise(gain=0.05)),
        (dinv.physics.PoissonGaussianNoise(gain=0.05, sigma=0.05, rng=g),
         P.PoissonGaussianNoise(gain=0.05, sigma=0.05)),
        (dinv.physics.GammaNoise(l=10.0), P.GammaNoise(l=10.0)),
        (dinv.physics.UniformNoise(a=0.1, rng=g), P.UniformNoise(a=0.1)),
        (dinv.physics.LogPoissonNoise(N0=1024, mu=0.02, rng=g),
         P.LogPoissonNoise(N0=1024, mu=0.02)),
        (dinv.physics.SaltPepperNoise(p=0.05, s=0.05, rng=g),
         P.SaltPepperNoise(p=0.05, s=0.05)),
        (dinv.physics.RicianNoise(sigma=0.1), P.RicianNoise(sigma=0.1)),
        (dinv.physics.FisherTippettNoise(l=10.0), P.FisherTippettNoise(l=10.0)),
        (dinv.physics.LaplaceNoise(b=0.1), P.LaplaceNoise(b=0.1)),
    ]
    for nt, nj in pairs:
        name = type(nt).__name__
        with torch.no_grad():
            yt = nt(xt).numpy()
        yj = np.asarray(nj(xj, key=jax.random.key(0)))
        assert abs(yt.mean() - yj.mean()) < 0.02, (name, yt.mean(), yj.mean())
        assert abs(yt.std() - yj.std()) < 0.02, (name, yt.std(), yj.std())


def test_niqe_fit_and_score_parity(reference, torch):  # noqa: F811
    """NIQE fitted on the same pristine images scores the same test batch
    as the reference implementation (perceptual.py:111): identical AGGD
    grids, patch pipeline, and pooled-covariance Mahalanobis distance."""
    import deepinv as dinv
    from deepinv_tpu.loss import NIQE

    rng = np.random.default_rng(7)
    H = 96  # 96px, patch 16, overlap 8 -> 121 patches/image (full-rank MVG)

    def smooth(seed):
        r = np.random.default_rng(seed)
        f = r.normal(size=(H, H)).astype(np.float32)
        # low-pass in Fourier domain -> natural-ish smooth pristine image
        F = np.fft.fft2(f)
        ky = np.fft.fftfreq(H)[:, None]
        kx = np.fft.fftfreq(H)[None]
        F *= np.exp(-((kx**2 + ky**2) / (2 * 0.05**2)))
        img = np.real(np.fft.ifft2(F))
        img = (img - img.min()) / (img.max() - img.min() + 1e-9)
        return img.astype(np.float32)[None]  # (1, H, W)

    pristine = [smooth(100 + i) for i in range(6)]
    test_imgs = np.stack(
        [smooth(7), np.clip(smooth(8) + 0.15 * rng.normal(size=(1, H, H)), 0, 1)]
    ).astype(np.float32)

    n_ref = dinv.loss.metric.NIQE(
        weights_path=None, denominator=1 / 255.0, patch_size=16, patch_overlap=8
    )
    mu_ref, cov_ref = n_ref.create_weights(
        [torch.from_numpy(p) for p in pristine], sharpness_threshold=0.0
    )
    with torch.no_grad():
        s_ref = n_ref(torch.from_numpy(test_imgs)).numpy()

    n_jax = NIQE(denominator=1 / 255.0, patch_size=16, patch_overlap=8)
    params = n_jax.create_weights(pristine, sharpness_threshold=0.0)
    s_jax = np.asarray(n_jax(jnp.asarray(test_imgs)))

    # pristine MVG fit agrees feature-for-feature -> whole NSS pipeline
    # (MSCN, AGGD grid fits, two scales, patching) matches
    assert np.allclose(mu_ref.numpy(), np.asarray(params["mu"]),
                       rtol=2e-3, atol=2e-3)
    assert np.allclose(cov_ref.numpy(), np.asarray(params["cov"]),
                       rtol=0.02, atol=1e-3)
    # final pooled-covariance Mahalanobis scores agree
    assert np.allclose(s_ref, s_jax, rtol=0.01, atol=0.01), (s_ref, s_jax)


def test_imresize_matlab_parity(reference, torch):  # noqa: F811
    """imresize_matlab matches the reference's MATLAB-bicubic resampler at
    down/up/fractional scales to float32 epsilon, boundaries included
    (physics/functional/imresize.py; regression for the one-pixel mirror
    off-by-one fixed in r2)."""
    from deepinv.physics.functional import imresize_matlab as ref_resize
    from deepinv_tpu.ops import imresize_matlab as jx_resize

    x = np.random.default_rng(0).random((2, 3, 37, 51)).astype(np.float32)
    for s in (0.5, 2.0, 0.3, 1.7):
        a = ref_resize(torch.from_numpy(x), scale=s, kernel="cubic",
                       antialiasing=True, padding_type="reflect").numpy()
        b = np.asarray(jx_resize(jnp.asarray(x), scale=s))
        assert a.shape == b.shape
        assert np.abs(a - b).max() < 5e-6, (s, np.abs(a - b).max())

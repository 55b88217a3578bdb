"""Model tests: shape contracts, sigma conditioning, classic denoisers
denoise, weight-port mapping round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.models import (
    DnCNN,
    DRUNet,
    UNet,
    TVDenoiser,
    TGVDenoiser,
    WaveletDenoiser,
    WaveletDictDenoiser,
    MedianFilter,
    BilateralFilter,
    AnscombeDenoiser,
    ArtifactRemoval,
)
from conftest import assert_close


def _noisy_pair(key, shape=(2, 3, 37, 31), sigma=0.1):
    kx, kn = jax.random.split(key)
    # piecewise-constant image (disks) — the regime classic denoisers target
    H, W = shape[-2:]
    yy, xx = jnp.mgrid[0:H, 0:W]
    x = ((yy - H / 2) ** 2 / (H / 3) ** 2 + (xx - W / 2) ** 2 / (W / 3) ** 2 < 1).astype(
        jnp.float32
    ) * 0.7
    x = x + ((yy - H / 4) ** 2 + (xx - W / 4) ** 2 < 16) * 0.3
    x = jnp.broadcast_to(x, shape)
    y = x + sigma * jax.random.normal(kn, shape)
    return x, y


@pytest.mark.parametrize(
    "model_fn",
    [
        lambda: DnCNN(depth=4, nf=8),
        lambda: DRUNet(nc=(8, 16, 16, 32), nb=1),
        lambda: UNet(scales=3, base=8),
    ],
)
def test_nn_shapes(model_fn, key):
    model = model_fn()
    x = jax.random.normal(key, (2, 3, 37, 31))
    out = model(x, 0.05)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_drunet_sigma_conditioning(key):
    """Different sigma inputs give different outputs (noise map wired in)."""
    model = DRUNet(nc=(8, 16, 16, 32), nb=1)
    x = jax.random.normal(key, (1, 3, 32, 32))
    o1 = model(x, 0.01)
    o2 = model(x, 0.5)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-6
    # batched sigma
    xb = jnp.concatenate([x, x])
    ob = model(xb, jnp.array([0.01, 0.5]))
    assert_close(ob[0], o1[0], rtol=1e-4, atol=1e-5)
    assert_close(ob[1], o2[0], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "denoiser",
    [
        TVDenoiser(n_it_max=100),
        WaveletDenoiser("db4", 3),
        WaveletDictDenoiser(("db2", "db4"), 3),
        MedianFilter(3),
        BilateralFilter(5),
    ],
)
def test_classic_denoisers_improve_mse(denoiser, key):
    x, y = _noisy_pair(key)
    ths = 0.05
    out = denoiser(y, ths)
    assert out.shape == x.shape
    mse_in = float(jnp.mean((y - x) ** 2))
    mse_out = float(jnp.mean((out - x) ** 2))
    assert mse_out < mse_in, f"{type(denoiser).__name__}: {mse_out} !< {mse_in}"


def test_tgv_runs(key):
    x, y = _noisy_pair(key, shape=(1, 1, 32, 32))
    out = TGVDenoiser(n_it_max=50)(y, 0.1)
    assert out.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_anscombe(key):
    from deepinv_tpu.models import MedianFilter

    den = AnscombeDenoiser(MedianFilter(3), gain=0.1)
    x = jnp.clip(jax.random.uniform(key, (1, 1, 16, 16)), 0.05, 1.0)
    out = den(x)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_artifact_removal(key):
    from deepinv_tpu.physics import BlurFFT
    from deepinv_tpu.ops import gaussian_blur

    physics = BlurFFT(img_size=(3, 32, 32), filter=gaussian_blur(sigma=1.0))
    x = jax.random.normal(key, (1, 3, 32, 32))
    y = physics.A(x)
    model = ArtifactRemoval(TVDenoiser(50), mode="adjoint", sigma=0.05)
    out = model(y, physics)
    assert out.shape == x.shape


def test_dncnn_weight_port_roundtrip(key):
    """Port a fake torch state dict and check exact numerical agreement with
    a hand-built forward."""
    import numpy as np

    rng = np.random.RandomState(0)
    depth, nf = 4, 8
    sd = {}
    sd["in_conv.weight"] = rng.randn(nf, 3, 3, 3).astype(np.float32) * 0.1
    sd["in_conv.bias"] = rng.randn(nf).astype(np.float32) * 0.1
    for i in range(depth - 2):
        sd[f"conv_list.{i}.weight"] = rng.randn(nf, nf, 3, 3).astype(np.float32) * 0.1
        sd[f"conv_list.{i}.bias"] = rng.randn(nf).astype(np.float32) * 0.1
    sd["out_conv.weight"] = rng.randn(3, nf, 3, 3).astype(np.float32) * 0.1
    sd["out_conv.bias"] = rng.randn(3).astype(np.float32) * 0.1

    model = DnCNN(depth=depth, nf=nf, pretrained=sd)
    # verify against torch conv if available
    import torch
    import torch.nn.functional as F

    x = jax.random.normal(key, (1, 3, 16, 16))
    xt = torch.tensor(np.asarray(x))
    h = F.relu(F.conv2d(xt, torch.tensor(sd["in_conv.weight"]), torch.tensor(sd["in_conv.bias"]), padding=1))
    for i in range(depth - 2):
        h = F.relu(F.conv2d(h, torch.tensor(sd[f"conv_list.{i}.weight"]), torch.tensor(sd[f"conv_list.{i}.bias"]), padding=1))
    ref = (F.conv2d(h, torch.tensor(sd["out_conv.weight"]), torch.tensor(sd["out_conv.bias"]), padding=1) + xt).numpy()
    assert_close(model(x), ref, rtol=1e-4, atol=1e-5)


def test_convtranspose_matches_torch(key):
    """ConvTranspose2d layer matches torch's semantics exactly."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from deepinv_tpu.models import ConvTranspose2d

    layer = ConvTranspose2d(4, 6, 2, 2, key=key)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    ref = F.conv_transpose2d(
        torch.tensor(np.asarray(x)),
        torch.tensor(np.asarray(layer.weight)),
        torch.tensor(np.asarray(layer.bias)),
        stride=2,
    ).numpy()
    assert_close(layer(x), ref, rtol=1e-4, atol=1e-5)


def test_model_gradients(key):
    model = DnCNN(depth=3, nf=4)
    x = jax.random.normal(key, (1, 3, 16, 16))

    def loss(m):
        return jnp.sum(m(x) ** 2)

    g = jax.grad(loss)(model)
    assert g.in_conv.weight.shape == model.in_conv.weight.shape
    assert float(jnp.sum(jnp.abs(g.in_conv.weight))) > 0


def test_cnn_denoisers(key):
    from deepinv_tpu.models import FFDNet, AutoEncoder, DScCP

    x = jax.random.uniform(key, (2, 3, 32, 32))
    for model in [FFDNet(), DScCP(depth=4, n_channels_per_layer=8)]:
        out = model(x, 0.05)
        assert out.shape == x.shape, type(model).__name__
        assert bool(jnp.all(jnp.isfinite(out)))
    ae = AutoEncoder(dim_input=3 * 8 * 8, dim_hid=32, dim_mid=8)
    xs = jax.random.uniform(key, (2, 3, 8, 8))
    assert ae(xs).shape == xs.shape


def test_srresnet(key):
    from deepinv_tpu.models import SRResNet

    model = SRResNet(upscale=2, feats=8, num_blocks=2)
    y = jax.random.uniform(key, (1, 3, 16, 16))
    out = model(y)
    assert out.shape == (1, 3, 32, 32)


def test_gsdrunet(key):
    from deepinv_tpu.models import GSDRUNet

    model = GSDRUNet(nc=(8, 16, 16, 16), nb=1)
    x = jax.random.uniform(key, (1, 3, 32, 32))
    out = model(x, 0.05)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_equivariant_denoiser(key):
    from deepinv_tpu.models import EquivariantDenoiser, MedianFilter
    from deepinv_tpu.transform import Rotate

    den = EquivariantDenoiser(MedianFilter(3), Rotate(multiples=90, n_trans=4))
    x = jax.random.uniform(key, (2, 1, 16, 16))
    out = den(x, key=key)
    assert out.shape == x.shape
    # median filter commutes with rot90 -> equivariant average equals plain
    assert_close(out, MedianFilter(3)(x), rtol=1e-4, atol=1e-4)


def test_time_nets(key):
    from deepinv_tpu.models import TimeAgnosticNet, TimeAveragingNet, MedianFilter

    y = jax.random.uniform(key, (2, 1, 4, 16, 16))
    net = TimeAgnosticNet(lambda u, p=None: u * 2)
    assert net(y).shape == y.shape
    avg = TimeAveragingNet(lambda u, p=None: u)
    assert avg(y).shape == (2, 1, 16, 16)


@pytest.mark.slow
def test_varnet_modl_pdnet(key):
    from deepinv_tpu.models import VarNet, MoDL, PDNet
    from deepinv_tpu.physics import MRI

    mask = (jax.random.uniform(jax.random.key(7), (16, 16)) > 0.4).astype(jnp.float32)
    physics = MRI(mask=mask)
    x = jax.random.normal(key, (1, 2, 16, 16))
    y = physics.A(x)

    for model in [
        VarNet(num_cascades=2),
        MoDL(num_iter=2),
        PDNet(num_iter=2, n_channels=2),
    ]:
        xhat = model(y, physics)
        assert xhat.shape == x.shape, type(model).__name__
        # trainable end to end
        g = jax.grad(lambda m: jnp.sum(m(y, physics) ** 2))(model)
        leaves = jax.tree_util.tree_leaves(g)
        assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0


def test_pannet(key):
    from deepinv_tpu.models import PanNet
    from deepinv_tpu.physics import Pansharpen

    physics = Pansharpen((3, 32, 32), factor=4)
    x = jax.random.uniform(key, (1, 3, 32, 32))
    y = physics.A(x)
    model = PanNet(hrms_shape=(3, 32, 32), nf=8, n_blocks=1)
    out = model(y, physics)
    assert out.shape == x.shape


def test_gan_models(key):
    from deepinv_tpu.models import (
        DCGANGenerator, DCGANDiscriminator, PatchGANDiscriminator, CSGMGenerator,
    )
    from deepinv_tpu.physics import Denoising

    G = DCGANGenerator(nz=16, ngf=8, nc=1)
    z = jax.random.normal(key, (2, 16))
    img = G(z)
    assert img.shape == (2, 1, 64, 64)
    D = DCGANDiscriminator(ndf=8, nc=1)
    assert D(img).shape[0] == 2
    P = PatchGANDiscriminator(input_nc=1, ndf=8)
    assert P(img).shape[0] == 2


def test_icnn_convexity(key):
    from deepinv_tpu.models import ICNN

    icnn = ICNN(in_channels=1, dim_hidden=8, depth=3)
    x1 = jax.random.normal(key, (1, 1, 8, 8))
    x2 = jax.random.normal(jax.random.key(9), (1, 1, 8, 8))
    f1, f2 = float(icnn.fn(x1)[0]), float(icnn.fn(x2)[0])
    fm = float(icnn.fn(0.5 * (x1 + x2))[0])
    assert fm <= 0.5 * (f1 + f2) + 1e-4  # convexity


def test_mmse_oracle(key):
    from deepinv_tpu.models import MMSE
    from deepinv_tpu.physics import Denoising, GaussianNoise
    import numpy as np

    xs = [np.full((1, 4, 4), v, np.float32) for v in (0.0, 1.0)]
    model = MMSE(xs, sigma=0.1)
    physics = Denoising(noise_model=GaussianNoise(0.1))
    y = jnp.full((1, 1, 4, 4), 0.95)
    out = model(y, physics)
    assert float(jnp.mean(out)) > 0.9  # posterior mass on the x=1 atom


def test_noise_estimators(key):
    from deepinv_tpu.models import WaveletNoiseEstimator, PatchCovarianceNoiseEstimator

    sigma = 0.15
    x = jnp.zeros((2, 1, 64, 64)) + sigma * jax.random.normal(key, (2, 1, 64, 64))
    est_w = WaveletNoiseEstimator()(x)
    assert abs(float(jnp.mean(est_w)) - sigma) / sigma < 0.2
    est_p = PatchCovarianceNoiseEstimator()(x)
    assert abs(float(jnp.mean(est_p)) - sigma) / sigma < 0.3


@pytest.mark.slow
def test_diffunet_and_edm(key):
    from deepinv_tpu.models import DiffUNet, EDMPrecond

    model = DiffUNet(nc=(8, 16, 16), num_res_blocks=1)
    x = jax.random.normal(key, (2, 3, 32, 32))
    out = model(x, jnp.array([0.1, 0.5]))
    assert out.shape == x.shape
    edm = EDMPrecond(model)
    out2 = edm(x, 0.2)
    assert out2.shape == x.shape
    # at sigma->0, EDM output -> x (c_skip -> 1, c_out -> 0)
    out3 = edm(x, 1e-6)
    assert_close(out3, x, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_restormer(key):
    from deepinv_tpu.models import Restormer

    m = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1)
    x = jax.random.normal(key, (1, 3, 37, 31))
    out = m(x)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_swinir_scunet(key):
    from deepinv_tpu.models import SwinIR, SCUNet

    for m in [
        SwinIR(embed_dim=12, depths=(2, 2), num_heads=(2, 2), window_size=8),
        SCUNet(dim=8, config=(1,) * 7, head_dim=4, window_size=4),
    ]:
        x = jax.random.normal(key, (1, 3, 37, 31))
        out = m(x)
        assert out.shape == x.shape, type(m).__name__
        assert bool(jnp.all(jnp.isfinite(out)))


def test_transform_extras(key):
    from deepinv_tpu.transform import ShiftTime, RandomNoise, RandomPhaseError

    xt = jax.random.uniform(key, (2, 1, 6, 8, 8))
    # wrap padding is a true group action: exact round trip
    st = ShiftTime(padding="wrap")
    p = st.get_params(xt, key)
    rt = st.inverse(st.transform(xt, **p), **p)
    assert_close(rt, xt)
    # reflect padding (the reference default, temporal.py:29) is not an
    # exact group action; check the roll itself against the reference
    # formula: y[i] = pad[(T-1+i-s) mod (3T-2)] over [flip[:T-1], x, flip[1:]]
    srefl = ShiftTime(padding="reflect")
    v = np.asarray(jax.random.uniform(jax.random.key(3), (6, 4)))
    pad = np.concatenate([v[::-1][: 6 - 1], v, v[::-1][1:6]], axis=0)
    for s in (-5, -2, 0, 3, 7):
        sn = s % (2 * 6 - 2)
        sn = sn - (2 * 6 - 2) if sn > 5 else sn
        want = np.stack([pad[(6 - 1 + i - sn) % (3 * 6 - 2)] for i in range(6)])
        got = np.asarray(srefl.roll_reflect_1d(jnp.asarray(v), s, axis=0))
        assert_close(got, want)

    x = jax.random.uniform(key, (2, 2, 8, 8))
    pe = RandomPhaseError(scale=0.2)
    pp = pe.get_params(x, key)
    rr = pe.inverse(pe.transform(x, **pp), **pp)
    assert_close(rr, x, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_promptir_and_poisson2sparse(key):
    from deepinv_tpu.models import PromptIR, ConvLista, RAM
    from deepinv_tpu.physics import Inpainting, GaussianNoise

    m = PromptIR(dim=8, num_blocks=(1, 1, 1))
    x = jax.random.normal(key, (1, 3, 33, 31))
    assert m(x).shape == x.shape

    cl = ConvLista(n_filters=8, n_iter=4)
    u = jax.random.normal(key, (1, 1, 16, 16))
    assert cl(u).shape == u.shape

    ram = RAM(in_channels=[1], nc=(8, 8, 8, 8), nb=1)
    physics = Inpainting(img_size=(1, 32, 32), mask=0.6, key=jax.random.key(1),
                         noise_model=GaussianNoise(0.05))
    xt = jax.random.uniform(key, (1, 1, 32, 32))
    y = physics(xt, key=jax.random.key(2))
    out = ram(y, physics)
    assert out.shape == xt.shape
    out2 = ram(xt, sigma=0.1)
    assert out2.shape == xt.shape


@pytest.mark.slow
def test_bm3d_denoiser():
    """Pure-JAX BM3D (reference gates this behind a pip package) clearly
    beats the wavelet denoiser at sigma=25/255."""
    from deepinv_tpu.models import BM3D, WaveletDenoiser
    from deepinv_tpu.datasets import random_circles
    from deepinv_tpu.loss.metric import PSNR

    x = jnp.asarray(random_circles(48, seed=3))[None]
    if x.ndim == 3:
        x = x[None]
    sigma = 25 / 255
    y = x + sigma * jax.random.normal(jax.random.key(0), x.shape)
    out = BM3D(search_radius=6, search_step=1, ref_stride=3)(y, sigma)
    psnr = PSNR()
    p_bm3d = float(psnr(out, x)[0])
    p_noisy = float(psnr(y, x)[0])
    p_wav = float(psnr(WaveletDenoiser(wv="db4", level=3)(y, sigma), x)[0])
    assert p_bm3d > p_noisy + 4
    assert p_bm3d > p_wav + 1, (p_bm3d, p_wav)


@pytest.mark.slow
def test_autocast_bf16_parity():
    """AutocastDenoiser (bf16 compute, f32 accumulate) stays within ~1e-2
    relative error of the f32 denoiser, and a PnP-HQS reconstruction built
    on it matches the f32 reconstruction to <0.1 dB — the quality guard for
    bench.py's default mixed precision."""
    from deepinv_tpu.models import DnCNN, autocast
    from deepinv_tpu.physics import BlurFFT, GaussianNoise
    from deepinv_tpu.ops import gaussian_blur
    from deepinv_tpu.optim import optim_builder, L2, PnP
    from deepinv_tpu.loss.metric import PSNR

    den = DnCNN(1, 1, pretrained=None)
    den16 = autocast(den)
    x = jax.random.uniform(jax.random.key(0), (1, 1, 32, 32))
    a, b = den(x, 0.05), den16(x, 0.05)
    assert b.dtype == a.dtype
    rel = float(jnp.abs(a - b).max() / jnp.clip(jnp.abs(a).max(), 1e-6, None))
    assert rel < 3e-2, rel

    physics = BlurFFT(img_size=(1, 32, 32), filter=gaussian_blur(sigma=1.0),
                      noise_model=GaussianNoise(0.02))
    y = physics(x, key=jax.random.key(1))
    psnr = PSNR()

    def recon(d):
        m = optim_builder("HQS", data_fidelity=L2(), prior=PnP(d),
                          params_algo={"stepsize": 2.0, "g_param": 0.02},
                          max_iter=8)
        return float(psnr(m(y, physics), x)[0])

    assert abs(recon(den) - recon(den16)) < 0.1


def test_noise_estimators_accuracy():
    """WaveletNoiseEstimator and PatchCovarianceNoiseEstimator recover a
    known sigma on a smooth image (reference noise_level_estimation.py:177)."""
    from deepinv_tpu.models import (
        WaveletNoiseEstimator,
        PatchCovarianceNoiseEstimator,
    )

    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    clean = jnp.asarray(
        np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy), jnp.float32
    )[None, None]
    noisy = clean + 0.1 * jax.random.normal(jax.random.key(0), clean.shape)
    for est in (WaveletNoiseEstimator(), PatchCovarianceNoiseEstimator()):
        sig = float(est(noisy)[0])
        assert 0.07 < sig < 0.14, (type(est).__name__, sig)


def test_jacobian_spectral_norm_exact():
    """JacobianSpectralNorm recovers the exact operator norm of a linear
    map (reference regularisers.py power iteration)."""
    from deepinv_tpu.loss import JacobianSpectralNorm, FNEJacobianSpectralNorm

    x = jnp.asarray(np.random.default_rng(0).random((1, 1, 16, 16)), jnp.float32)
    jsn = JacobianSpectralNorm(max_iter=30)
    assert abs(float(jsn(y=x, model=lambda u: 0.5 * u)) - 0.5) < 1e-4
    # FNE variant: norm of J of (2f - I); for f = 0.7 I -> |2*0.7 - 1| = 0.4
    fne = FNEJacobianSpectralNorm(max_iter=30)
    assert abs(float(fne(y=x, model=lambda u: 0.7 * u)) - 0.4) < 1e-3


def test_client_rest_roundtrip():
    """models.Client posts base64-npy measurements to a REST endpoint and
    decodes the reconstruction (reference client.py:13) — exercised against
    an in-process HTTP server standing in for the remote service."""
    import base64
    import io
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from deepinv_tpu.models import Client
    from deepinv_tpu.physics import Denoising

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            assert self.headers["Authorization"] == "Bearer secret"
            assert body["physics"] == "Denoising"
            y = np.load(io.BytesIO(base64.b64decode(body["y"])))
            buf = io.BytesIO()
            np.save(buf, y * 2.0)  # "reconstruction": double the input
            resp = json.dumps(
                {"x_hat": base64.b64encode(buf.getvalue()).decode()}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        client = Client(f"http://127.0.0.1:{port}/infer", api_key="secret")
        y = jnp.full((1, 1, 4, 4), 1.5)
        xhat = client(y, Denoising())
        assert np.allclose(np.asarray(xhat), 3.0)
    finally:
        server.shutdown()


def test_deal_reconstruction_smoke(key):
    """DEAL reconstruction mode runs its masked-CG fixed point through a
    linear physics (reference deal.py solve_inverse_problem:1097)."""
    from deepinv_tpu.models import DEAL
    from deepinv_tpu.physics import Inpainting

    m = DEAL(color=False, max_iter=3, lambda_reg=1.0, key=key)
    physics = Inpainting(img_size=(1, 16, 16), mask=0.7, key=key)
    x = jax.random.uniform(key, (1, 1, 16, 16))
    y = physics.A(x)
    out = m(y, physics)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    # denoiser calling convention model(y, sigma)
    out2 = m(y, 0.05)
    assert out2.shape == y.shape


def test_deep_image_prior_fits_measurements(key):
    """DIP's inner adam loop fits the observed measurements (reference
    dip.py:198); the affine-normalized ConvDecoder has enough capacity."""
    from deepinv_tpu.models import DeepImagePrior
    from deepinv_tpu.physics import Inpainting, GaussianNoise

    x = jax.random.uniform(key, (1, 1, 16, 16))
    physics = Inpainting(img_size=(1, 16, 16), mask=0.5, key=key,
                         noise_model=GaussianNoise(0.02))
    y = physics(x, key=jax.random.fold_in(key, 1))
    model = DeepImagePrior(img_shape=(1, 16, 16), iterations=200, lr=3e-2)
    xhat = model(y, physics, key=jax.random.fold_in(key, 2))
    fit = float(jnp.mean((physics.A(xhat) - y) ** 2))
    base = float(jnp.mean(y**2))
    assert fit < 0.2 * base, (fit, base)


def test_drunet_folded_forward_matches_plain(key):
    """The W-folded scale-0 forward (models/drunet_fold.py) is an exact
    layout transform of DRUNet.forward_unet (same MACs, reassociated)."""
    from deepinv_tpu.models.drunet import _ACTS
    from deepinv_tpu.models.drunet_fold import forward_unet_folded

    net = DRUNet(nc=(8, 16, 16, 16), nb=2)
    x = jax.random.uniform(key, (2, 4, 32, 48))
    ref = net.forward_unet(x)
    fold = forward_unet_folded(net, x, _ACTS["R"])
    assert jnp.abs(ref - fold).max() < 1e-4

    # and under jit with a nontrivial act mode
    net_l = DRUNet(nc=(8, 16, 16, 16), nb=1, act_mode="L")
    f = jax.jit(lambda n, v: forward_unet_folded(n, v, _ACTS["L"]))
    assert jnp.abs(f(net_l, x) - net_l.forward_unet(x)).max() < 1e-4


def test_fused_conv_chain_matches_lax(key):
    """The Pallas fused conv3x3+ReLU chain (interpret mode) matches the
    XLA conv chain, including the odd-layer-count tail path, and its
    custom_vjp gradients match autodiff through the lax chain."""
    from deepinv_tpu.ops.pallas.conv_chain import (_lax_chain,
                                                   fused_conv3x3_relu_chain)

    for L in (4, 5):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, L), 3)
        ws = jax.random.normal(k1, (L, 64, 64, 3, 3)) * 0.08
        bs = jax.random.normal(k2, (L, 64)) * 0.02
        h = jax.random.normal(k3, (1, 64, 16, 16), jnp.bfloat16)
        got = fused_conv3x3_relu_chain(h, ws, bs, True)
        want = _lax_chain(h, ws, bs)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-9
        assert err / scale < 2e-2, (L, err / scale)

    # gradients flow through the custom_vjp: backward reads the kernel's
    # DMA-stashed activations (no forward recompute) and must match
    # autodiff through the bf16 lax chain — the forward it actually
    # computes: comparing against the *f32* chain instead conflates
    # forward numerics with backward precision (borderline preacts flip
    # their ReLU mask between bf16 and f32 forwards) — for weights,
    # biases AND the input, on both even and odd layer counts
    for L in (4, 5):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 10 + L), 3)
        ws = jax.random.normal(k1, (L, 64, 64, 3, 3)) * 0.08
        bs = jax.random.normal(k2, (L, 64)) * 0.02
        h = jax.random.normal(k3, (1, 64, 16, 16), jnp.bfloat16)

        def _chain_bf16_rounded(hh, w, b):
            # f32 convs with explicit bf16 rounding points — the same
            # numerics as the bf16 chain (bf16 products are exact in f32),
            # expressed in a form JAX can differentiate end-to-end
            import jax.lax as _lax

            a = hh.astype(jnp.float32)
            for l in range(w.shape[0]):
                wb = w[l].astype(jnp.bfloat16).astype(jnp.float32)
                z = _lax.conv_general_dilated(
                    a, wb, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
                a = jnp.maximum(z + b[l][None, :, None, None], 0.0)
                a = a.astype(jnp.bfloat16).astype(jnp.float32)
            return a

        loss = lambda hh, w, b: jnp.sum(
            fused_conv3x3_relu_chain(hh, w, b, True).astype(jnp.float32))
        gh, gw, gb = jax.grad(loss, argnums=(0, 1, 2))(h, ws, bs)
        loss_ref = lambda hh, w, b: jnp.sum(_chain_bf16_rounded(hh, w, b))
        gh_r, gw_r, gb_r = jax.grad(loss_ref, argnums=(0, 1, 2))(h, ws, bs)
        for a, b_, nm in ((gw, gw_r, "dW"), (gb, gb_r, "db"), (gh, gh_r, "dh")):
            a = a.astype(jnp.float32)
            b_ = b_.astype(jnp.float32)
            rel = float(jnp.max(jnp.abs(a - b_)) / (jnp.max(jnp.abs(b_)) + 1e-9))
            assert rel < 3e-2, (L, nm, rel)


def test_fused_resblock_chain_matches_lax(key):
    """The Pallas fused resblock chain (interpret mode) matches the pure
    XLA f32 resblock chain on the folded tensor, and its custom_vjp
    gradients match autodiff through the lax chain."""
    from deepinv_tpu.ops.pallas.resblock_chain import (
        _lax_resblocks_f32, can_fuse_resblocks, fused_resblock_chain_folded)

    for R in (1, 3):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, R), 3)
        w1s = jax.random.normal(k1, (R, 64, 64, 3, 3)) * 0.08
        w2s = jax.random.normal(k2, (R, 64, 64, 3, 3)) * 0.08
        vf = jax.random.normal(k3, (1, 16, 8, 128), jnp.bfloat16)
        got = fused_resblock_chain_folded(vf, w1s, w2s, True)
        want = _lax_resblocks_f32(vf, w1s, w2s)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
        scale = float(jnp.max(jnp.abs(want))) + 1e-9
        assert err / scale < 2e-2, (R, err / scale)

    # custom_vjp gradients (backward = f32 lax chain autodiff)
    loss = lambda w1, w2: jnp.sum(
        fused_resblock_chain_folded(vf, w1, w2, True).astype(jnp.float32))
    g1, g2 = jax.grad(loss, argnums=(0, 1))(w1s, w2s)
    loss_ref = lambda w1, w2: jnp.sum(_lax_resblocks_f32(vf, w1, w2))
    r1, r2 = jax.grad(loss_ref, argnums=(0, 1))(w1s, w2s)
    for a, b, nm in ((g1, r1, "dW1"), (g2, r2, "dW2")):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        assert rel < 3e-2, (nm, rel)

    # the CPU gate keeps the fused path off the folded forward here
    assert not can_fuse_resblocks(vf, 3)


def test_fused_up_resblock_chain_matches_lax(key):
    """The Pallas up-projection + resblock chain (interpret mode) matches
    the pure XLA f32 reference (transposed conv, kernel == stride, +
    folded resblocks), and custom_vjp gradients flow to all four args."""
    from deepinv_tpu.ops.pallas.resblock_chain import (
        _lax_up_resblocks_f32, can_fuse_up_resblocks,
        fused_up_resblock_chain_folded)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    Ci = 16
    v = jax.random.normal(k1, (1, 8, 8, Ci), jnp.bfloat16)
    w = jax.random.normal(k2, (Ci, 64, 2, 2)) * 0.1
    w1s = jax.random.normal(k3, (2, 64, 64, 3, 3)) * 0.08
    w2s = jax.random.normal(k4, (2, 64, 64, 3, 3)) * 0.08
    got = fused_up_resblock_chain_folded(v, w, w1s, w2s, True)
    want = _lax_up_resblocks_f32(v, w, w1s, w2s)
    assert got.shape == (1, 16, 8, 128)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert err / scale < 2e-2, err / scale

    loss = lambda *a: jnp.sum(
        fused_up_resblock_chain_folded(*a, True).astype(jnp.float32))
    loss_ref = lambda *a: jnp.sum(_lax_up_resblocks_f32(*a))
    gs = jax.grad(loss, argnums=(0, 1, 2, 3))(v, w, w1s, w2s)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(v, w, w1s, w2s)
    for a, b, nm in zip(gs, gr, ("dv", "dw_up", "dw1", "dw2")):
        rel = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9))
        assert rel < 3e-2, (nm, rel)

    assert not can_fuse_up_resblocks(v, w, 2)  # CPU gate off


def test_fused_chains_disabled_context(key):
    """The trace-time training switch turns every fused gate off inside
    the context and restores it after (Trainer traces its step inside —
    bench_train_chain.py measured the fused path 2.4x slower under grad)."""
    from deepinv_tpu.ops.pallas.conv_chain import (fused_chains_disabled,
                                                   fused_disabled)
    from deepinv_tpu.ops.pallas.resblock_chain import (
        can_fuse_resblocks, can_fuse_up_resblocks)

    vf = jax.random.normal(key, (1, 16, 8, 128), jnp.bfloat16)
    v = jax.random.normal(key, (1, 8, 8, 16), jnp.bfloat16)
    w_up = jnp.zeros((16, 64, 2, 2))
    assert not fused_disabled()
    with fused_chains_disabled():
        assert fused_disabled()
        assert not can_fuse_resblocks(vf, 2)
        assert not can_fuse_up_resblocks(v, w_up, 2)
    assert not fused_disabled()


def test_dncnn_fused_gate_is_off_on_cpu(key):
    """can_fuse_chain must refuse on CPU so the quick gate never hits the
    Mosaic compiler; the env kill-switch must also disable it."""
    import os
    from deepinv_tpu.ops.pallas.conv_chain import can_fuse_chain

    h = jnp.zeros((1, 64, 32, 32), jnp.bfloat16)
    assert not can_fuse_chain(h, 18)  # tests run on the CPU backend
    os.environ["DEEPINV_TPU_FUSED_DNCNN"] = "0"
    try:
        assert not can_fuse_chain(h, 18)
    finally:
        del os.environ["DEEPINV_TPU_FUSED_DNCNN"]


def test_fused_chain_under_lax_map_matches_batch(key):
    """B>1 runs the per-image kernel under lax.map (what
    batched_fused_chain builds, r5): per-element outputs match the XLA
    chain on the full batch."""
    from deepinv_tpu.ops.pallas.conv_chain import (_lax_chain, chain_cost,
                                                   fused_conv3x3_relu_chain)

    k1, k2, k3 = jax.random.split(key, 3)
    L, B = 4, 3
    ws = jax.random.normal(k1, (L, 64, 64, 3, 3)) * 0.08
    bs = jax.random.normal(k2, (L, 64)) * 0.02
    h = jax.random.normal(k3, (B, 64, 16, 16), jnp.bfloat16)
    got = jax.lax.map(
        lambda hi: fused_conv3x3_relu_chain(hi[None], ws, bs, True)[0], h)
    want = _lax_chain(h, ws, bs)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-9
    assert err / scale < 2e-2

    # the analytic per-image cost helper matches what one forward records
    from deepinv_tpu.utils import profiling

    rec = {"flops": 0.0, "bytes": 0.0}
    prev, profiling._pallas_record = profiling._pallas_record, rec
    try:
        _ = fused_conv3x3_relu_chain(h[:1], ws, bs, True)
    finally:
        profiling._pallas_record = prev
    f1, b1 = chain_cost(16, 16, L)
    assert rec["flops"] == f1 and rec["bytes"] == b1


def test_fused_resblock_chain_under_lax_map_matches_batch(key):
    """Same contract for the DRUNet folded resblock kernel."""
    from deepinv_tpu.ops.pallas.resblock_chain import (
        _lax_resblocks_f32, fused_resblock_chain_folded)

    k1, k2, k3 = jax.random.split(key, 3)
    R, B = 2, 3
    w1s = jax.random.normal(k1, (R, 64, 64, 3, 3)) * 0.08
    w2s = jax.random.normal(k2, (R, 64, 64, 3, 3)) * 0.08
    vf = jax.random.normal(k3, (B, 16, 8, 128), jnp.bfloat16)
    got = jax.lax.map(
        lambda vi: fused_resblock_chain_folded(vi[None], w1s, w2s, True)[0],
        vf)
    want = jnp.concatenate([
        _lax_resblocks_f32(vf[i:i + 1].astype(jnp.float32), w1s, w2s)
        for i in range(B)])
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert err / scale < 3e-2

"""Denoiser battery: the reference's sweep-style model tests, ported as
*ideas* with tighter assertions where JAX makes them cheap.

Families covered (reference deepinv/tests/test_models.py):
- color / gray / 1-channel shape contracts on odd, non-square sizes
  (test_denoiser_color:404, test_denoiser_gray:425, :506)
- batched per-sample sigma == stacked per-sample calls
  (test_denoiser_sigma_gray:535 / _color:564 — reference only checks
  shapes; here batching must be semantically exact)
- DRUNet arbitrary input sizes incl. non-multiples of 8
  (test_drunet_inputs:703) and option sweep (test_drunet_options:777)
- equivariant wrapper sweep (test_equivariant:455)
- wavelet thresholding sweep: soft/hard/topk x dim x channels x batch
  (test_wavelet_denoiser_ths:623) + decomposition round-trip
  (test_wavelet_decomposition:662)
- complex-denoiser wrapper modes (test_complex_wrapper:1679)
- SwinIR upsampler combinations (test_swinir_upsample_without_upsampler:1619)
- SRResNet input contract (test_srresnet_inputs:1939)
- noise-estimator sweep (test_gaussian_noise_estimators:1827)
- NCSNpp net sweep (test_ncsnpp_net:1270)
- DScCP odd spatial sizes (test_dsccp_net:1299)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepinv_tpu.models as M

# ---------------------------------------------------------------------------
# registry: name -> factory(channels) with CI-sized configs; each entry also
# records the spatial-size constraint the architecture imposes.
# ---------------------------------------------------------------------------

def _choose(name, channels, H, W):
    if name == "unet":
        return M.UNet(in_channels=channels, out_channels=channels, scales=2,
                      base=4)
    if name == "drunet":
        return M.DRUNet(in_channels=channels, out_channels=channels,
                        nc=(4, 8, 8, 8), nb=1)
    if name == "dncnn":
        return M.DnCNN(in_channels=channels, out_channels=channels,
                       depth=3, nf=8)
    if name == "ffdnet":
        return M.FFDNet(in_channels=channels, out_channels=channels,
                        nf=8, depth=3)
    if name == "autoencoder":
        return M.AutoEncoder(dim_input=channels * H * W, dim_hid=32,
                             dim_mid=8)
    if name == "median":
        return M.MedianFilter()
    if name == "bilateral":
        return M.BilateralFilter()
    if name == "tv":
        return M.TVDenoiser(n_it_max=5)
    if name == "tgv":
        return M.TGVDenoiser(n_it_max=5)
    if name == "waveletdenoiser":
        return M.WaveletDenoiser(level=2)
    if name == "waveletdict":
        return M.WaveletDictDenoiser(level=2, max_iter=2)
    if name == "waveletdict_hard":
        return M.WaveletDictDenoiser(level=2, max_iter=2,
                                     list_wv=("db2", "db4"))
    if name == "waveletdict_topk":
        return M.WaveletDictDenoiser(level=2, max_iter=2)
    if name == "epll":
        return M.EPLLDenoiser(channels=channels, patch_size=3)
    if name == "restormer":
        return M.Restormer(in_channels=channels, out_channels=channels,
                           dim=4, num_blocks=(1, 1, 1, 1),
                           num_refinement_blocks=1, heads=(1, 1, 1, 1))
    if name == "promptir":
        return M.PromptIR(in_channels=channels, dim=4,
                          num_blocks=(1, 1, 1), heads=(1, 1, 1))
    if name == "scunet":
        return M.SCUNet(in_nc=channels, config=(1, 1, 1, 1, 1, 1, 1),
                        dim=8, input_resolution=32, head_dim=4,
                        window_size=2)
    if name == "swinir":
        return M.SwinIR(img_size=16, in_chans=channels, embed_dim=4,
                        depths=(1, 1), num_heads=(1, 1), window_size=4)
    if name == "gsdrunet":
        return M.GSDRUNet(in_channels=channels, out_channels=channels,
                          nc=(4, 8, 8, 8), nb=1)
    if name == "dsccp":
        return M.DScCP(depth=3, n_channels_per_layer=8, in_channels=channels)
    if name == "diffunet":
        return M.DiffUNet(in_channels=channels, out_channels=channels,
                          nc=(4, 8, 8), num_res_blocks=1)
    raise KeyError(name)


# (name, needs_pow2_or_window, sigma_conditioned)
_GRAY = [
    ("autoencoder", True, False),
    ("drunet", False, True),
    ("dncnn", False, False),
    ("ffdnet", True, True),
    ("median", False, False),
    ("tgv", False, False),
    ("waveletdenoiser", False, False),
    ("waveletdict", False, False),
    ("epll", False, True),
    ("restormer", True, False),
    ("promptir", True, False),
    ("diffunet", True, True),
]
_COLOR = _GRAY + [
    ("gsdrunet", False, True),
    ("scunet", True, False),
    ("swinir", True, False),
    ("tv", False, False),
    ("unet", True, False),
    ("waveletdict_hard", False, False),
    ("waveletdict_topk", False, False),
    ("dsccp", False, False),
    ("bilateral", False, False),
]


def _image(key, shape):
    H, W = shape[-2:]
    yy, xx = jnp.mgrid[0:H, 0:W]
    x = ((yy - H / 2) ** 2 / (H / 3) ** 2
         + (xx - W / 2) ** 2 / (W / 3) ** 2 < 1).astype(jnp.float32) * 0.6
    x = jnp.broadcast_to(x, shape) + 0.1 * jax.random.normal(key, shape)
    return x


@pytest.mark.parametrize("name,pow2,_", _COLOR)
def test_denoiser_color(name, pow2, _, key):
    """3-channel contract on odd non-square sizes (pow2-constrained nets get
    an aligned size). Reference test_models.py:404."""
    H, W = (16, 16) if pow2 else (17, 13)
    model = _choose(name, 3, H, W)
    y = _image(key, (1, 3, H, W))
    xhat = model(y, 0.1)
    assert xhat.shape == y.shape, name
    assert bool(jnp.all(jnp.isfinite(xhat))), name


@pytest.mark.parametrize("name,pow2,_", _GRAY)
def test_denoiser_gray(name, pow2, _, key):
    """1-channel contract (reference test_models.py:425,506)."""
    H, W = (16, 16) if pow2 else (13, 17)
    model = _choose(name, 1, H, W)
    y = _image(key, (2, 1, H, W))
    xhat = model(y, 0.1)
    assert xhat.shape == y.shape, name
    assert bool(jnp.all(jnp.isfinite(xhat))), name


@pytest.mark.parametrize("name", ["drunet", "ffdnet", "diffunet"])
@pytest.mark.parametrize("batch_size", [2, 3])
def test_denoiser_sigma_batch(name, batch_size, key):
    """A batched per-sample sigma must equal stacking per-sample calls —
    stronger than the reference's shape-only check (test_models.py:535,564).
    """
    H = W = 16
    model = _choose(name, 1, H, W)
    y = _image(key, (batch_size, 1, H, W))
    sigmas = jnp.linspace(0.05, 0.3, batch_size)
    batched = model(y, sigmas)
    assert batched.shape == y.shape
    singles = jnp.concatenate(
        [model(y[i:i + 1], float(sigmas[i])) for i in range(batch_size)])
    assert float(jnp.max(jnp.abs(batched - singles))) < 1e-5, name
    # scalar jnp sigma == python float sigma
    a = model(y, 0.1)
    b = model(y, jnp.asarray(0.1))
    assert float(jnp.max(jnp.abs(a - b))) < 1e-6


@pytest.mark.parametrize("spatial", [(31, 31), (32, 32), (37, 40), (40, 37)])
def test_drunet_input_sizes(spatial, key):
    """DRUNet accepts sizes that are not multiples of 2**scales and returns
    the same size (reference test_drunet_inputs:703 — sizes 31/37/40/65)."""
    model = M.DRUNet(nc=(4, 8, 8, 8), nb=1)
    y = _image(key, (1, 3) + spatial)
    xhat = model(y, 0.1)
    assert xhat.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(xhat)))


@pytest.mark.parametrize("act_mode", ["R", "L", "E", "S"])
def test_drunet_options(act_mode, key):
    """DRUNet activation-mode option sweep (reference test_drunet_options)."""
    model = M.DRUNet(nc=(4, 8, 8, 8), nb=1, act_mode=act_mode)
    y = _image(key, (1, 3, 16, 16))
    xhat = model(y, 0.1)
    assert xhat.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(xhat)))


@pytest.mark.parametrize("batch_size", [1, 2])
@pytest.mark.parametrize("random", [True, False])
def test_equivariant_sweep(batch_size, random, key):
    """Equivariant wrapper: output shape/finiteness for random and full
    symmetrization, batched (reference test_equivariant:455). The full
    (random=False) average over the 90-degree rotation group must be exactly
    invariant to pre-rotating the input."""
    from deepinv_tpu.transform import Rotate

    base = M.MedianFilter()
    model = M.EquivariantDenoiser(
        base, transform=Rotate(multiples=90, n_trans=4), random=random)
    y = _image(key, (batch_size, 1, 16, 16))
    xhat = model(y, 0.1)
    assert xhat.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(xhat)))
    if not random:
        y_rot = jnp.rot90(y, k=1, axes=(-2, -1))
        out_rot = model(y_rot, 0.1)
        back = jnp.rot90(out_rot, k=-1, axes=(-2, -1))
        assert float(jnp.max(jnp.abs(back - xhat))) < 1e-4


@pytest.mark.parametrize("non_linearity", ["soft", "hard", "topk"])
@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("channels", [1, 3])
def test_wavelet_denoiser_ths_sweep(non_linearity, dim, channels, key):
    """Wavelet denoiser over threshold rules and dimensions (reference
    test_wavelet_denoiser_ths:623). ths=0 must be (near-)identity for
    soft/hard; larger ths removes more energy."""
    shape = ((1, channels, 16, 16) if dim == 2
             else (1, channels, 8, 16, 16))
    y = _image(key, shape)
    model = M.WaveletDenoiser(level=2, non_linearity=non_linearity, wvdim=dim)
    if non_linearity == "topk":
        out = model(y, 10)
        assert out.shape == y.shape
        assert bool(jnp.all(jnp.isfinite(out)))
        return
    near_id = model(y, 1e-9)
    assert float(jnp.max(jnp.abs(near_id - y))) < 1e-3
    lo = model(y, 0.05)
    hi = model(y, 0.5)
    e = lambda t: float(jnp.sum((t - jnp.mean(t)) ** 2))
    assert e(hi) <= e(lo) + 1e-6


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("batch", [1, 2])
def test_wavelet_decomposition_roundtrip(dim, batch, key):
    """psi/psi_inv round-trip on odd sizes (reference
    test_wavelet_decomposition:662)."""
    shape = (batch, 1, 13, 17) if dim == 2 else (batch, 1, 7, 13, 17)
    x = jax.random.normal(key, shape)
    model = M.WaveletDenoiser(level=2, wvdim=dim)
    xp, pad = model.pad_input(x)
    back = model.crop_output(model.iwt(model.dwt(xp)), pad)
    assert back.shape == x.shape
    assert float(jnp.max(jnp.abs(back - x))) < 1e-4
    # psi exposes the flattened coefficient list (reference wavdict.py:157)
    bands = model.psi(xp, wavelet="db4", level=2, dimension=dim)
    assert len(bands) == 1 + 2 * (3 if dim == 2 else 7)


@pytest.mark.parametrize("separate", [False, True])
def test_complex_denoiser_wrapper(separate, key):
    """Complex wrapper handles complex input and returns complex output of
    the same shape (reference test_complex_wrapper:1679)."""
    kr, ki = jax.random.split(key)
    base = M.MedianFilter()
    model = M.ComplexDenoiser(base, separate=separate)
    y = (_image(kr, (1, 1, 16, 16))
         + 1j * 0.3 * _image(ki, (1, 1, 16, 16)))
    out = model(y, 0.1)
    assert out.shape == y.shape
    assert jnp.iscomplexobj(out)
    assert bool(jnp.all(jnp.isfinite(out.real) & jnp.isfinite(out.imag)))


@pytest.mark.parametrize("upscale", [1, 2])
def test_swinir_upscale(upscale, key):
    """SwinIR upsampling contract (reference
    test_swinir_upsample_without_upsampler:1619)."""
    model = M.SwinIR(img_size=8, in_chans=3, embed_dim=4, depths=(1,),
                     num_heads=(1,), window_size=4, upscale=upscale,
                     upsampler="pixelshuffle" if upscale > 1 else "")
    y = _image(key, (1, 3, 8, 8))
    out = model(y)
    assert out.shape == (1, 3, 8 * upscale, 8 * upscale)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("upscale", [2, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_srresnet_inputs(upscale, channels, key):
    """SRResNet upscales odd sizes and rejects nothing it shouldn't
    (reference test_srresnet_inputs:1939, test_super_resolution_nets:1916).
    """
    model = M.SRResNet(num_blocks=1, im_c=channels, feats=4, upscale=upscale)
    y = _image(key, (1, channels, 9, 7))
    out = model(y)
    assert out.shape == (1, channels, 9 * upscale, 7 * upscale)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("sigma", [0.05, 0.3])
@pytest.mark.parametrize("channels", [1, 3])
def test_noise_estimator_sweep(sigma, channels, key):
    """Patch-covariance and wavelet noise estimators recover sigma within
    50% across channels and noise levels (reference
    test_gaussian_noise_estimators:1827)."""
    kx, kn = jax.random.split(key)
    H = W = 64
    x = jnp.zeros((1, channels, H, W))
    y = x + sigma * jax.random.normal(kn, x.shape)
    for est in (M.PatchCovarianceNoiseEstimator(),
                M.WaveletNoiseEstimator()):
        got = float(jnp.mean(jnp.atleast_1d(est(y))))
        assert abs(got - sigma) / sigma < 0.5, (type(est).__name__, got)


@pytest.mark.parametrize("batch", [1, 2])
@pytest.mark.parametrize("channels", [1, 3])
def test_ncsnpp_tiny(batch, channels, key):
    """NCSNpp preconditioned net runs at tiny config over batch/channel
    combos (reference test_ncsnpp_net:1270)."""
    model = M.NCSNpp(img_resolution=16, in_channels=channels,
                     out_channels=channels, model_channels=4,
                     channel_mult=(1, 1), num_blocks=1, attn_resolutions=())
    y = _image(key, (batch, channels, 16, 16))
    out = model(y, 0.1)
    assert out.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dsccp_odd_sizes(key):
    """DScCP on odd, non-square spatial sizes (reference
    test_dsccp_net:1299)."""
    model = M.DScCP(depth=2, n_channels_per_layer=4, in_channels=3)
    y = _image(key, (1, 3, 19, 14))
    out = model(y, 0.1)
    assert out.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("name", ["dncnn", "drunet", "unet"])
def test_3d_denoisers(name, key):
    """3D variants of DnCNN / DRUNet / UNet run on volumes, including odd
    sizes via test_pad (reference test_3d_denoisers:608)."""
    m = {
        "dncnn": lambda: M.DnCNN(1, 1, depth=3, nf=4, dim=3),
        "drunet": lambda: M.DRUNet(in_channels=1, out_channels=1,
                                   nc=(4, 4, 4, 4), nb=1, dim=3),
        "unet": lambda: M.UNet(in_channels=1, out_channels=1, scales=2,
                               base=4, dim="3d"),
    }[name]()
    x = jax.random.uniform(key, (1, 1, 8, 16, 16))
    o = m(x, 0.1)
    assert o.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(o)))
    x_odd = jax.random.uniform(key, (1, 1, 7, 13, 17))
    o_odd = m(x_odd, 0.1)
    assert o_odd.shape == x_odd.shape


@pytest.mark.parametrize("isotropic", [False, True])
def test_initialize_3d_from_2d(isotropic, key):
    """2D -> 3D weight inflation (reference test_initialize_3d_from_2d:1736).
    Axial init places the 2D kernel on the TRUE central depth slice, so a
    depth-constant volume maps exactly to the per-slice 2D result — a
    property the reference's off-by-one placement (utils.py:471 indexes
    k//2 + 1) does not satisfy; the deviation is intentional."""
    from deepinv_tpu.models import initialize_3d_from_2d

    k2, k3, kx = jax.random.split(key, 3)
    m2d = M.DnCNN(1, 1, depth=3, nf=4, dim=2, key=k2)
    ckpt = {}
    for name, conv in [("in_conv", m2d.in_conv),
                       ("out_conv", m2d.out_conv)] + [
            (f"conv_list.{i}", c) for i, c in enumerate(m2d.conv_list)]:
        ckpt[f"{name}.weight"] = np.asarray(conv.weight)
        ckpt[f"{name}.bias"] = np.asarray(conv.bias)
    m3d = M.DnCNN(1, 1, depth=3, nf=4, dim=3, key=k3)
    initialize_3d_from_2d(m3d, ckpt, isotropic=isotropic)
    img = jax.random.uniform(kx, (1, 1, 16, 16))
    vol = jnp.broadcast_to(img[:, :, None], (1, 1, 8, 16, 16))
    out = m3d(vol, 0.1)
    assert bool(jnp.all(jnp.isfinite(out)))
    if not isotropic:
        err = float(jnp.max(jnp.abs(out[:, :, 4] - m2d(img, 0.1))))
        assert err < 1e-4, err


def test_denoisers_under_jit_and_vmap(key):
    """Denoisers are pytrees: jit(model)(y) == model(y) and vmap over a
    stacked batch axis matches a Python loop — the JAX-native contract the
    torch reference cannot state."""
    model = M.DnCNN(depth=3, nf=8)
    y = _image(key, (2, 3, 16, 16))
    eager = model(y, 0.1)
    jitted = jax.jit(lambda m, v: m(v, 0.1))(model, y)
    assert float(jnp.max(jnp.abs(eager - jitted))) < 1e-5

    ys = jnp.stack([y, y + 0.01])
    vm = jax.vmap(lambda v: model(v, 0.1))(ys)
    loop = jnp.stack([model(ys[0], 0.1), model(ys[1], 0.1)])
    assert float(jnp.max(jnp.abs(vm - loop))) < 1e-5


_PERF_DENOISERS = [
    # (name, min PSNR gain in dB on sigma=0.1 disks; classic denoisers
    # only — untrained nets are covered by the weight-porting suite)
    ("median", 1.0),
    ("tv", 2.0),
    ("tgv", 1.5),
    ("waveletdenoiser", 1.0),
    ("waveletdict", 1.0),
    ("bilateral", 1.0),
    # EPLL needs a FITTED GMM to denoise (covered by the patch-prior
    # tests); with a random-init mixture there is no gain to assert.
]


@pytest.mark.parametrize("name,min_gain", _PERF_DENOISERS)
def test_denoiser_perf(name, min_gain, key):
    """Classic denoisers must actually denoise: PSNR gain over the noisy
    input at the matched noise level (reference test_denoiser_perf:1328
    checks expected PSNRs on a real image; here a piecewise-constant
    phantom and a per-denoiser minimum gain)."""
    H = W = 64
    yy, xx = jnp.mgrid[0:H, 0:W]
    x = (((yy - 32) ** 2 / 300 + (xx - 32) ** 2 / 200) < 1).astype(
        jnp.float32) * 0.6 + 0.2
    x = x[None, None]
    sigma = 0.1
    y = x + sigma * jax.random.normal(key, x.shape)

    model = _choose(name, 1, H, W)
    sig_arg = {"tv": 0.1, "tgv": 0.1, "waveletdenoiser": 0.15,
               "waveletdict": 0.15}.get(name, sigma)
    xhat = model(y, sig_arg)

    def psnr(a):
        return float(10 * jnp.log10(1.0 / jnp.mean((a - x) ** 2)))

    gain = psnr(xhat) - psnr(y)
    assert gain > min_gain, (name, psnr(y), psnr(xhat))


def test_equivariant_reduces_variance(key):
    """Full-group equivariant averaging reduces output variance on noise —
    the statistical reason the wrapper exists (reference equivariant
    family)."""
    from deepinv_tpu.transform import Rotate

    base = M.TVDenoiser(n_it_max=10)
    eq = M.EquivariantDenoiser(
        base, transform=Rotate(multiples=90, n_trans=4), random=False)
    x = jnp.zeros((1, 1, 32, 32)).at[..., 8:24, 8:24].set(0.7)
    errs_b, errs_e = [], []
    for s in range(4):
        y = x + 0.15 * jax.random.normal(jax.random.fold_in(key, s), x.shape)
        errs_b.append(float(jnp.mean((base(y, 0.15) - x) ** 2)))
        errs_e.append(float(jnp.mean((eq(y, 0.15) - x) ** 2)))
    assert np.mean(errs_e) <= np.mean(errs_b) * 1.05, (np.mean(errs_b),
                                                       np.mean(errs_e))

"""Torch-to-JAX weight porting, validated against the actual reference
models: instantiate the reference architecture with random torch weights,
port the state dict through ``models.convert``, and compare outputs on the
same input. Bit-level agreement here means real pretrained checkpoints load
correctly. Skips when the reference checkout or torch is unavailable.
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


def test_drunet_port_bit_faithful(reference, torch):  # noqa: F811
    """Our DRUNet reproduces the reference DRUNet bit-for-bit given the same
    (randomly initialized) torch weights — the architecture and the
    checkpoint mapping are exact (reference models/drunet.py:23)."""
    from deepinv.models import DRUNet as RefDRUNet
    from deepinv_tpu.models import DRUNet
    from deepinv_tpu.models.convert import port_drunet

    ref = RefDRUNet(in_channels=3, out_channels=3, pretrained=None)
    x = torch.rand(1, 3, 48, 48, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        y_ref = ref(x, 0.05).numpy()

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    m = port_drunet(DRUNet(in_channels=3, out_channels=3, pretrained=None), sd)
    y = np.asarray(jax.jit(lambda mm, v: mm(v, 0.05))(m, jnp.asarray(x.numpy())))
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()


@pytest.mark.slow
def test_admunet_port_bit_faithful(reference, torch):  # noqa: F811
    """Our ADMUNet reproduces the reference guided-diffusion DiffUNet
    bit-for-bit: same state-dict names, same outputs in both forward modes —
    published FFHQ/ImageNet diffusion checkpoints load directly
    (reference models/diffunet.py:16)."""
    from deepinv.models import DiffUNet as RefDiffUNet
    from deepinv_tpu.models import ADMUNet

    ref = RefDiffUNet(pretrained=None)
    # randomize ALL weights — the zero-initialized output convs would make
    # an untouched random model produce identically-zero outputs (vacuous)
    g = torch.Generator().manual_seed(7)
    sd = {k: torch.randn(v.shape, generator=g) * 0.05
          for k, v in ref.state_dict().items()}
    for k in list(sd):
        if "alphas" in k:
            sd[k] = ref.state_dict()[k]
    ref.load_state_dict(sd)
    ref.eval()

    m = ADMUNet(pretrained=None).load_torch_state_dict(
        {k: v.numpy() for k, v in sd.items() if "alphas" not in k})

    x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        y_ref = ref.forward_diffusion(2 * x - 1, torch.tensor([17])).numpy()
    y = np.asarray(jax.jit(lambda mm, v, t: mm.forward_diffusion(v, t))(
        m, jnp.asarray((2 * x - 1).numpy()), jnp.asarray([17])))
    assert np.abs(y - y_ref).max() < 1e-4, np.abs(y - y_ref).max()

    # noise-level mode incl. the circular padding path (odd sizes)
    x2 = torch.rand(2, 3, 37, 41, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        d_ref = ref(x2, torch.tensor([0.1, 0.2]), type_t="noise_level").numpy()
    d = np.asarray(jax.jit(lambda mm, v, s: mm(v, s))(
        m, jnp.asarray(x2.numpy()), jnp.asarray([0.1, 0.2])))
    assert np.abs(d - d_ref).max() < 1e-4, np.abs(d - d_ref).max()


@pytest.mark.slow
def test_ram_port_bit_faithful(reference, torch):  # noqa: F811
    """Our RAM reproduces the reference RAM foundation model given the same
    (randomly initialized) torch weights, in both denoiser and physics-
    conditioned modes — the published mterris/ram checkpoint loads directly
    (reference models/ram.py:20)."""
    from deepinv.models import RAM as RefRAM
    from deepinv.physics import Inpainting as RefInpainting
    from deepinv.physics import GaussianNoise as RefGaussianNoise
    from deepinv_tpu.models import RAM
    from deepinv_tpu.models.convert import port_ram
    from deepinv_tpu.physics import Inpainting, GaussianNoise

    ref = RefRAM(pretrained=False)
    ref.eval()
    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    m = port_ram(RAM(pretrained=None), sd)

    # denoiser mode (physics=None -> Denoising under the hood)
    x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        y_ref = ref(x, sigma=0.1).numpy()
    y = np.asarray(m(jnp.asarray(x.numpy()), sigma=0.1))
    scale = max(np.abs(y_ref).max(), 1.0)
    assert np.abs(y - y_ref).max() / scale < 2e-4, np.abs(y - y_ref).max()

    # physics-conditioned mode: inpainting + Gaussian noise, shared mask
    mask = (torch.rand(1, 64, 64, generator=torch.Generator().manual_seed(2)) > 0.4).float()
    ref_phys = RefInpainting(img_size=(1, 64, 64), mask=mask,
                             noise_model=RefGaussianNoise(0.05))
    xg = torch.rand(2, 1, 64, 64, generator=torch.Generator().manual_seed(3))
    yg = ref_phys(xg)
    with torch.no_grad():
        r_ref = ref(yg, ref_phys).numpy()

    phys = Inpainting(img_size=(1, 64, 64), mask=jnp.asarray(mask.numpy()),
                      noise_model=GaussianNoise(0.05))
    r = np.asarray(m(jnp.asarray(yg.numpy()), phys))
    scale = max(np.abs(r_ref).max(), 1.0)
    assert np.abs(r - r_ref).max() / scale < 2e-4, np.abs(r - r_ref).max()


@pytest.mark.slow
def test_swinir_port_bit_faithful(reference, torch):  # noqa: F811
    """Our SwinIR reproduces the reference SwinIR (denoising config) given
    the same randomly initialized torch weights — published
    JingyunLiang/SwinIR DN checkpoints port directly
    (reference models/swinir.py:795)."""
    from deepinv.models import SwinIR as RefSwinIR
    from deepinv_tpu.models import SwinIR
    from deepinv_tpu.models.convert import port_swinir

    cfg = dict(img_size=32, in_chans=3, embed_dim=12, depths=(2, 2),
               num_heads=(2, 2), window_size=8, mlp_ratio=2.0, upscale=1,
               upsampler="")
    ref = RefSwinIR(pretrained=None, **cfg)
    ref.eval()
    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    m = port_swinir(SwinIR(**cfg), sd)

    # odd size exercises the reflect check_img_size path + SW-MSA masks
    x = torch.rand(2, 3, 36, 44, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        y_ref = ref(x).numpy()
    y = np.asarray(jax.jit(lambda mm, v: mm(v))(m, jnp.asarray(x.numpy())))
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()

    # classical-SR head
    cfg_sr = dict(cfg, upscale=2, upsampler="pixelshuffle")
    ref_sr = RefSwinIR(pretrained=None, **cfg_sr)
    ref_sr.eval()
    sd_sr = {k: np.asarray(v.numpy()) for k, v in ref_sr.state_dict().items()}
    m_sr = port_swinir(SwinIR(**cfg_sr), sd_sr)
    x2 = torch.rand(1, 3, 16, 16, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        s_ref = ref_sr(x2).numpy()
    s = np.asarray(m_sr(jnp.asarray(x2.numpy())))
    assert s.shape == s_ref.shape
    assert np.abs(s - s_ref).max() < 1e-5, np.abs(s - s_ref).max()


@pytest.mark.slow
def test_scunet_port_bit_faithful(reference, torch):  # noqa: F811
    """Our SCUNet reproduces the reference SCUNet given the same randomly
    initialized torch weights — the published scunet_color_real_psnr.pth
    checkpoint ports directly (reference models/scunet.py:284)."""
    from deepinv.models import SCUNet as RefSCUNet
    from deepinv_tpu.models import SCUNet
    from deepinv_tpu.models.convert import port_scunet

    ref = RefSCUNet(in_nc=3, config=(1,) * 7, dim=64, pretrained=None)
    ref.eval()
    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    m = port_scunet(SCUNet(in_nc=3, config=(1,) * 7, dim=64, pretrained=None), sd)

    # odd size exercises the replicate pad-to-64 path + SW-MSA masks
    x = torch.rand(1, 3, 70, 66, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        y_ref = ref(x).numpy()
    y = np.asarray(jax.jit(lambda mm, v: mm(v))(m, jnp.asarray(x.numpy())))
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()


@pytest.mark.slow
def test_restormer_port_bit_faithful(reference, torch):  # noqa: F811
    """Our Restormer reproduces the reference Restormer given the same
    randomly initialized torch weights — the published deepinv/Restormer
    checkpoints port directly (reference models/restormer.py:14)."""
    from deepinv.models import Restormer as RefRestormer
    from deepinv_tpu.models import Restormer
    from deepinv_tpu.models.convert import port_restormer

    cfg = dict(in_channels=3, out_channels=3, dim=8, num_blocks=(1, 1, 1, 1),
               num_refinement_blocks=1, heads=(1, 2, 4, 8))
    ref = RefRestormer(pretrained=None, **cfg)
    ref.eval()
    # randomize: default torch init leaves dwconvs near-uniform otherwise
    g = torch.Generator().manual_seed(5)
    sd = {k: torch.randn(v.shape, generator=g) * 0.2
          for k, v in ref.state_dict().items()}
    ref.load_state_dict(sd)
    sd = {k: np.asarray(v.numpy()) for k, v in sd.items()}
    m = port_restormer(Restormer(pretrained=None, **cfg), sd)

    x = torch.rand(1, 3, 35, 42, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        y_ref = ref(x).numpy()
    y = np.asarray(jax.jit(lambda mm, v: mm(v))(m, jnp.asarray(x.numpy())))
    scale = max(np.abs(y_ref).max(), 1.0)
    assert np.abs(y - y_ref).max() / scale < 1e-5, np.abs(y - y_ref).max()

    # WithBias layernorm + dual-pixel head variant
    cfg2 = dict(cfg, in_channels=6, dual_pixel_task=True,
                LayerNorm_type="WithBias", bias=True)
    ref2 = RefRestormer(pretrained=None, **cfg2)
    ref2.eval()
    sd2 = {k: np.asarray(v.numpy()) for k, v in ref2.state_dict().items()}
    m2 = port_restormer(Restormer(pretrained=None, **cfg2), sd2)
    x2 = torch.rand(1, 6, 32, 32, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        y2_ref = ref2(x2).numpy()
    y2 = np.asarray(m2(jnp.asarray(x2.numpy())))
    scale = max(np.abs(y2_ref).max(), 1.0)
    assert np.abs(y2 - y2_ref).max() / scale < 1e-5, np.abs(y2 - y2_ref).max()


@pytest.mark.slow
def test_gsdrunet_port_bit_faithful(reference, torch):  # noqa: F811
    """Our GSDRUNet (gradient-step ELU-DRUNet) reproduces the reference
    given the same torch weights — GSDRUNet_torch.ckpt ports directly
    (reference models/GSPnP.py:85). Checks the denoiser output AND the
    potential gradient used by GS-PnP."""
    from deepinv.models import GSDRUNet as RefGSDRUNet
    from deepinv_tpu.models import GSDRUNet

    ref = RefGSDRUNet(pretrained=None, in_channels=1, out_channels=1,
                      nc=(8, 16, 16, 16))
    ref.eval()
    sd = {("student_grad.model." + k if not k.startswith("student_grad") else k):
          np.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    m = GSDRUNet(in_channels=1, out_channels=1, nc=(8, 16, 16, 16),
                 pretrained=sd)

    x = torch.rand(1, 1, 32, 32, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        pass
    y_ref = ref(x, torch.tensor(0.05)).detach().numpy()
    # the reference's potential_grad marks x as requiring grad in-place
    y = np.asarray(jax.jit(lambda mm, v: mm(v, 0.05))(
        m, jnp.asarray(x.detach().numpy())))
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()


@pytest.mark.parametrize("model_type", ["ncsn", "ddpm"])
@pytest.mark.slow
def test_ncsnpp_port_bit_faithful(reference, torch, model_type):  # noqa: F811
    """Our NCSNpp/DDPM++ (EDM SongUNet) reproduces the reference given the
    same torch weights — edm-*-uncond-{ve,vp}.pt checkpoints port directly
    (reference models/ncsnpp.py:18)."""
    from deepinv.models import NCSNpp as RefNCSNpp
    from deepinv_tpu.models import NCSNpp
    from deepinv_tpu.models.convert import port_ncsnpp

    cfg = dict(model_type=model_type, img_resolution=32, in_channels=2,
               out_channels=2, model_channels=32, channel_mult=(1, 2),
               num_blocks=2, attn_resolutions=(16,), dropout=0.0)
    ref = RefNCSNpp(pretrained=None, **cfg)
    ref.eval()
    # randomize: zero-init output convs would zero the aux head otherwise
    g = torch.Generator().manual_seed(11)
    # keep resample_filter buffers: real checkpoints store the deterministic
    # filter, which our UpDownConv2d builds statically
    sd = {k: (torch.randn(v.shape, generator=g) * 0.1
              if v.dtype.is_floating_point and "resample_filter" not in k else v)
          for k, v in ref.state_dict().items()}
    ref.load_state_dict(sd)
    sd_np = {k: np.asarray(v.numpy()) for k, v in sd.items()}
    m = port_ncsnpp(NCSNpp(pretrained=None, **cfg), sd_np)

    x = torch.rand(2, 2, 32, 32, generator=torch.Generator().manual_seed(0))
    sig = torch.tensor([0.05, 0.4])
    with torch.no_grad():
        y_ref = ref(x, sig).numpy()
    y = np.asarray(jax.jit(lambda mm, v, s: mm(v, s))(
        m, jnp.asarray(x.numpy()), jnp.asarray(sig.numpy())))
    scale = max(np.abs(y_ref).max(), 1.0)
    assert np.abs(y - y_ref).max() / scale < 2e-5, np.abs(y - y_ref).max()


def test_srresnet_port_bit_faithful(reference, torch):  # noqa: F811
    """Our SRResNet reproduces the reference given the same torch weights —
    srresnet_ckpt.pth.tar ports directly (reference models/srresnet.py:20)."""
    from deepinv.models import SRResNet as RefSRResNet
    from deepinv_tpu.models import SRResNet

    cfg = dict(num_blocks=2, im_c=3, feats=8, upscale=4, final_relu=True)
    ref = RefSRResNet(pretrained=None, **cfg)
    ref.eval()
    # randomize batchnorm running stats too (published ckpts carry them)
    g = torch.Generator().manual_seed(3)
    sd = {}
    for k, v in ref.state_dict().items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.2
            if "running_var" in k:
                sd[k] = sd[k].abs() + 0.5
        else:
            sd[k] = v
    ref.load_state_dict(sd)
    sd_np = {k: np.asarray(v.numpy()) for k, v in sd.items()}
    m = SRResNet(pretrained=sd_np, **cfg)

    x = torch.rand(2, 3, 9, 11, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        y_ref = ref(x).numpy()
    y = np.asarray(jax.jit(lambda mm, v: mm(v))(m, jnp.asarray(x.numpy())))
    assert y.shape == y_ref.shape
    scale = max(np.abs(y_ref).max(), 1.0)
    assert np.abs(y - y_ref).max() / scale < 1e-5, np.abs(y - y_ref).max()


def test_dsccp_port_bit_faithful(reference, torch):  # noqa: F811
    """Our DScCP reproduces the reference given the same torch weights —
    ckpt_dsccp.pth.tar ports directly (reference models/dsccp.py:15). The
    stepsizes come from independent power methods on both sides (random
    start, 1e-4 tol), so parity is checked at 1e-3."""
    from deepinv.models import DScCP as RefDScCP
    from deepinv_tpu.models import DScCP

    ref = RefDScCP(depth=4, n_channels_per_layer=8, pretrained=None)
    ref.eval()
    sd = {k: np.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    m = DScCP(depth=4, n_channels_per_layer=8, pretrained=sd)

    x = torch.rand(1, 3, 24, 24, generator=torch.Generator().manual_seed(0))
    torch.manual_seed(0)
    with torch.no_grad():
        y_ref = ref(x, 0.1).numpy()
    y = np.asarray(jax.jit(lambda mm, v: mm(v, 0.1))(m, jnp.asarray(x.numpy())))
    assert np.abs(y - y_ref).max() < 1e-3, np.abs(y - y_ref).max()


@pytest.mark.slow
def test_kernel_network_port_bit_faithful(reference, torch):  # noqa: F811
    """Our KernelIdentificationNetwork reproduces the reference given the
    same torch weights — carbajal_kernel_identification_network.pth ports
    directly (reference models/kernel_network.py:9)."""
    from deepinv.models import KernelIdentificationNetwork as RefKIN
    from deepinv_tpu.models import KernelIdentificationNetwork

    ref = RefKIN(filters=4, pretrained=None)
    ref.eval()
    sd = {k: np.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    m = KernelIdentificationNetwork(filters=4, pretrained=sd)

    x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        out_ref = ref(x)
    out = jax.jit(lambda mm, v: mm(v))(m, jnp.asarray(x.numpy()))
    for k in ("filters", "multipliers"):
        a, b = np.asarray(out[k]), out_ref[k].numpy()
        assert a.shape == b.shape, (k, a.shape, b.shape)
        assert np.abs(a - b).max() < 1e-5, (k, np.abs(a - b).max())


def test_dncnn_port_bit_faithful(reference, torch):  # noqa: F811
    """Same check for DnCNN (reference models/dncnn.py)."""
    from deepinv.models import DnCNN as RefDnCNN
    from deepinv_tpu.models import DnCNN
    from deepinv_tpu.models.convert import port_dncnn

    ref = RefDnCNN(in_channels=1, out_channels=1, pretrained=None)
    x = torch.rand(2, 1, 33, 37, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        y_ref = ref(x, 0.05).numpy()

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    m = port_dncnn(DnCNN(1, 1, pretrained=None), sd)
    y = np.asarray(jax.jit(lambda mm, v: mm(v, 0.05))(m, jnp.asarray(x.numpy())))
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()


def test_vgg16_port_bit_faithful(torch):  # noqa: F811
    """VGG16Features reproduces the torchvision vgg16 feature taps given
    the same weights (backbone of LPIPS, reference perceptual.py:13)."""
    import torch.nn as nn
    from deepinv_tpu.models import VGG16Features
    from deepinv_tpu.models.vgg import port_vgg16

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
           "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    torch.manual_seed(0)
    for c in cfg:
        if c == "M":
            layers.append(nn.MaxPool2d(2))
        else:
            layers.append(nn.Conv2d(cin, c, 3, padding=1))
            layers.append(nn.ReLU())
            cin = c
    tnet = nn.Sequential(*layers)
    sd = {
        f"features.{i}.{k}": p.detach().numpy()
        for i, m in enumerate(tnet)
        if isinstance(m, nn.Conv2d)
        for k, p in (("weight", m.weight), ("bias", m.bias))
    }
    ours = port_vgg16(VGG16Features(requires_input_norm=False), sd)

    x = torch.rand(1, 3, 32, 32, generator=torch.Generator().manual_seed(1))
    taps, h = [], x
    with torch.no_grad():
        for i, m in enumerate(tnet):
            h = m(h)
            if i in (3, 8, 15, 22, 29):
                taps.append(h.numpy())
    feats = ours(jnp.asarray(x.numpy()))
    for i, (a, b) in enumerate(zip(feats, taps)):
        assert np.abs(np.asarray(a) - b).max() < 1e-5, i


def test_lpips_pipeline_ranks_corruption():
    """The native LPIPS pipeline (VGG features -> unit-norm -> diff) ranks
    heavier corruption as more dissimilar even before calibration."""
    from deepinv_tpu.loss.perceptual import LPIPS

    lp = LPIPS(allow_random_weights=True)
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 32, 32)), np.float32)
    mild = x + 0.03 * jax.random.normal(jax.random.key(1), x.shape)
    heavy = x + 0.4 * jax.random.normal(jax.random.key(2), x.shape)
    assert float(lp(mild, x)[0]) < float(lp(heavy, x)[0])


@pytest.mark.slow
def test_deal_port_bit_faithful(reference, torch):  # noqa: F811
    """Our DEAL reproduces the reference solver given the same torch
    weights — splines, zero-mean MultiConv2d, Fourier spectral norm, and
    the masked-CG fixed point all match (reference models/deal.py:15)."""
    from deepinv.models import DEAL as RefDEAL
    from deepinv_tpu.models import DEAL
    from deepinv_tpu.models.convert import port_deal

    ref = RefDEAL(pretrained=None, color=False)
    # randomize all weights so agreement is non-vacuous
    g = torch.Generator().manual_seed(3)
    sd = {}
    for k, v in ref.model.state_dict().items():
        if "coefficients" in k or "weight" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
        else:
            sd[k] = v
    # keep the lambda spline positive-ish so the solve is well-posed
    sd["spline_lambda.coefficients"] = torch.linspace(1.0, 5.0, 53)[None]
    ref.model.load_state_dict(sd, strict=False)
    ref.eval()

    x = torch.rand(1, 1, 16, 16, generator=torch.Generator().manual_seed(0))
    sigma = 0.1
    with torch.no_grad():
        y_ref = ref(x, sigma).numpy()

    m = port_deal(DEAL(color=False),
                  {"model." + k: np.asarray(v.numpy()) for k, v in sd.items()})
    # component parity: spectral norm and mask
    L_ref = float(ref.model.W1.spectral_norm())
    L = float(m.W1.spectral_norm())
    assert abs(L - L_ref) / L_ref < 1e-4, (L, L_ref)

    y = np.asarray(m(jnp.asarray(x.numpy()), sigma))
    assert np.abs(y - y_ref).max() < 1e-3, np.abs(y - y_ref).max()

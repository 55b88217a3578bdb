"""Utility layer (reference deepinv/tests/test_utils.py).

TensorList algebra beyond the core tests, patch extraction round trips,
tiled inference, signal normalization, dirac helpers, loggers, plotting
smoke tests (Agg backend), and IO helpers.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import matplotlib

matplotlib.use("Agg")

from deepinv_tpu.utils import (
    AverageMeter,
    ProgressMeter,
    CSVLogger,
    TensorList,
    complex_abs,
    dirac,
    dirac_like,
    dirac_comb,
    normalize_signal,
    image_to_patches,
    patches_to_image,
    patchify,
    TiledMixin2d,
    resize_pad_square_tensor,
    tiled_apply,
    plot,
    plot_curves,
    scatter_plot,
    rescale_img,
)


def test_dirac_helpers():
    d = dirac((1, 1, 7, 7))
    assert float(d.sum()) == 1.0
    assert float(d[0, 0, 3, 3]) == 1.0
    x = jnp.zeros((2, 3, 8, 8))
    dl = dirac_like(x)
    assert dl.shape == x.shape and np.allclose(dl.sum(axis=(-2, -1)), 1.0)
    comb = dirac_comb((1, 1, 8, 8), period=4)
    assert float(comb.sum()) == 4.0


def test_complex_abs():
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 4, 4)), jnp.float32)
    mag = complex_abs(z)
    assert mag.shape == (2, 1, 4, 4)
    assert np.allclose(mag, np.sqrt(z[:, :1] ** 2 + z[:, 1:] ** 2), atol=1e-6)


def test_normalize_signal():
    x = jnp.asarray(np.random.default_rng(1).normal(2.0, 3.0, (3, 1, 8, 8)), jnp.float32)
    n = normalize_signal(x)
    flat = np.asarray(n).reshape(3, -1)
    assert np.allclose(flat.min(axis=1), 0.0, atol=1e-6)
    assert np.allclose(flat.max(axis=1), 1.0, atol=1e-6)
    c = normalize_signal(x, mode="clip")
    assert float(c.min()) >= 0.0 and float(c.max()) <= 1.0


@pytest.mark.parametrize("stride", [8, 4])
def test_patchify_roundtrip(stride):
    """Reference 6-D convention (B, C, n_h, n_w, ph, pw): mean-reduced
    reconstruction is exact (reference utils/_tiling.py, mixins.py:290)."""
    x = jnp.asarray(np.random.default_rng(2).random((2, 3, 16, 16)), jnp.float32)
    p = image_to_patches(x, 8, stride=stride)
    nH = (16 - 8) // stride + 1
    assert p.shape == (2, 3, nH, nH, 8, 8)
    back = patches_to_image(p, stride, img_size=(16, 16), reduce_overlap="mean")
    assert np.allclose(back, x, atol=1e-6)
    assert np.allclose(patchify(x, 8, stride=stride), p)


def test_patch_content():
    x = jnp.arange(16.0).reshape(1, 1, 4, 4)
    p = image_to_patches(x, 2, stride=2)
    assert np.allclose(p[0, 0, 0, 0], x[0, 0, :2, :2])
    assert np.allclose(p[0, 0, 0, 1], x[0, 0, :2, 2:])


def test_tiled_mixin_reference_semantics():
    """TiledMixin2d matches the reference doctest (utils/mixins.py:306):
    3x3 patches, stride 2 on a 5x5 ramp; sum doubles overlaps, mean
    reconstructs exactly; geometry queries agree."""
    m = TiledMixin2d(patch_size=(3, 3), stride=(2, 2))
    x = jnp.arange(25.0).reshape(1, 1, 5, 5)
    p = m.image_to_patches(x)
    assert p.shape == (1, 1, 2, 2, 3, 3)
    assert np.allclose(p[0, 0, 0, 0], x[0, 0, :3, :3])
    rec = m.patches_to_image(p, img_size=(5, 5))
    assert float(rec[0, 0, 2, 2]) == 48.0  # 4-patch overlap summed
    rec_mean = m.patches_to_image(p, img_size=(5, 5), reduce_overlap="mean")
    assert np.allclose(rec_mean, x)
    assert m.get_num_patches((5, 5)) == (2, 2)
    assert m.get_needed_pad((5, 5)) == (0, 0)
    assert m.get_compatible_img_size((6, 6)) == (7, 7)
    # extra context padding enlarges the effective patch
    pc = m.image_to_patches(x, pad=1)
    assert pc.shape[-2:] == (5, 5)


def test_tiled_apply_identity_and_linearity():
    """Overlap-blended tiling reconstructs the identity exactly and
    commutes with any linear pixelwise map (utils/_tiling.py semantics)."""
    x = jnp.asarray(np.random.default_rng(3).random((1, 3, 70, 50)), jnp.float32)
    out = tiled_apply(lambda v: v, x, patch_size=32, overlap=8)
    assert out.shape == x.shape
    assert np.allclose(out, x, atol=1e-5)
    out2 = tiled_apply(lambda v: 2.0 * v + 1.0, x, patch_size=32, overlap=8)
    assert np.allclose(out2, 2.0 * x + 1.0, atol=1e-5)


def test_resize_pad_square():
    x = jnp.ones((1, 1, 10, 20))
    out = resize_pad_square_tensor(x, 32)
    assert out.shape == (1, 1, 32, 32)
    # aspect preserved: content occupies ~16 rows
    occupied = (np.asarray(out)[0, 0].sum(axis=1) > 0.1).sum()
    assert 14 <= occupied <= 18


def test_average_meter_uneven_batches():
    m = AverageMeter("loss")
    m.update(1.0, n=2)
    m.update(4.0, n=6)
    assert np.isclose(m.avg, (1.0 * 2 + 4.0 * 6) / 8)
    assert m.count == 8 and m.val == 4.0
    assert "loss" in str(m)
    m.reset()
    assert m.count == 0 and m.avg == 0.0


def test_progress_meter(capsys):
    meters = [AverageMeter("psnr")]
    meters[0].update(30.0)
    ProgressMeter(10, meters, prefix="ep1 ").display(3)
    out = capsys.readouterr().out
    assert "ep1" in out and "psnr" in out


def test_csv_logger(tmp_path):
    path = os.path.join(tmp_path, "log.csv")
    log = CSVLogger(path, fieldnames=["epoch", "loss"])
    log.log(epoch=0, loss=1.5)
    log.log(epoch=1, loss=0.5)
    text = open(path).read()
    assert "epoch" in text and "0.5" in text


def test_tensorlist_randn_and_shapes(key):
    tl = TensorList([jnp.zeros((1, 2, 3)), jnp.zeros((4,))])
    from deepinv_tpu.core import randn_like

    r = randn_like(key, tl)
    assert isinstance(r, TensorList)
    assert r[0].shape == (1, 2, 3) and r[1].shape == (4,)
    s = tl + r
    assert np.allclose(s[1], r[1])


def test_plot_smoke(tmp_path):
    """Plotting helpers run headless and save files (reference
    test_utils.py:227-362)."""
    x = jnp.asarray(np.random.default_rng(4).random((2, 3, 16, 16)), jnp.float32)
    plot([x, x * 0.5], titles=["a", "b"], show=False,
         save_fn=os.path.join(tmp_path, "p.png"))
    assert os.path.exists(os.path.join(tmp_path, "p.png"))
    plot_curves({"psnr": [[20.0, 21.0, 22.0]]}, show=False,
                save_fn=os.path.join(tmp_path, "c.png"))
    scatter_plot([jnp.asarray(np.random.default_rng(5).random((10, 2)))],
                 show=False, save_fn=os.path.join(tmp_path, "s.png"))
    r = rescale_img(x * 4.0 - 1.0)
    assert float(r.min()) >= 0.0 and float(r.max()) <= 1.0


def test_get_timestamp_and_devices():
    from deepinv_tpu.utils import get_timestamp, get_device, devices_equal

    ts = get_timestamp()
    assert len(ts) >= 10
    d = get_device()
    assert devices_equal(d, d)


def test_io_np_tiff_roundtrip(tmp_path):
    from deepinv_tpu.utils import load_np, load_tiff

    arr = np.random.default_rng(6).random((5, 7)).astype(np.float32)
    p = os.path.join(tmp_path, "a.npy")
    np.save(p, arr)
    assert np.allclose(load_np(p), arr)
    try:
        from PIL import Image

        tp = os.path.join(tmp_path, "a.tiff")
        Image.fromarray((arr * 255).astype(np.uint8)).save(tp)
        t = load_tiff(tp)
        assert t.shape[-2:] == (5, 7)
    except ImportError:
        pass


def test_plot_videos_and_ortho3d(tmp_path):
    """plot_videos renders a real GIF animation and plot_ortho3D a true
    3-plane view (reference utils/plotting.py:959,1081,1150)."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    from deepinv_tpu.utils import plot_videos, save_videos, plot_ortho3D

    vid = np.random.default_rng(0).random((1, 1, 5, 12, 10)).astype("float32")
    gif = save_videos([vid, vid], titles=["a", "b"],
                      save_fn=str(tmp_path / "v.gif"))
    assert os.path.getsize(gif) > 1000
    # a GIF with animation frames starts with GIF89a and has >1 image block
    with open(gif, "rb") as f:
        head = f.read(6)
    assert head in (b"GIF87a", b"GIF89a")

    anim = plot_videos(vid, titles="v")
    assert anim is not None

    vol = np.random.default_rng(1).random((1, 1, 6, 12, 10)).astype("float32")
    fig = plot_ortho3D([vol], titles=["vol"], return_fig=True,
                       save_fn=str(tmp_path / "o.png"))
    # L-shaped layout: 2x2 axes per volume
    assert len(fig.axes) == 4
    assert os.path.getsize(tmp_path / "o.png") > 1000


def test_inference_server_client_loopback():
    """The Client/Server pair round-trips over loopback HTTP: the server
    (serve.py) speaks the reference client protocol (client.py:13) and the
    jitted model output matches local inference. Auth is enforced."""
    import jax

    from deepinv_tpu.serve import InferenceServer
    from deepinv_tpu.models import MedianFilter, ArtifactRemoval, Client
    from deepinv_tpu.physics import Denoising, GaussianNoise

    physics = Denoising(noise_model=GaussianNoise(0.05))
    model = ArtifactRemoval(MedianFilter(3), mode="direct", sigma=0.05)
    x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
    y = physics(x, key=jax.random.key(1))

    server = InferenceServer(api_key="secret")
    server.register("Denoising", model, physics)
    with server.running() as url:
        client = Client(url, api_key="secret")
        xhat = client(y, physics)
        np.testing.assert_allclose(
            np.asarray(xhat), np.asarray(model(y, physics)), rtol=1e-5,
            atol=1e-6)

        # wrong token is rejected
        import urllib.error

        bad = Client(url, api_key="wrong")
        with pytest.raises(urllib.error.HTTPError):
            bad(y, physics)

        # unknown physics name is a clean 500 with a message
        class Weird:
            pass

        with pytest.raises(urllib.error.HTTPError):
            Client(url, api_key="secret")(y, Weird())


def test_tensorlist_arithmetic_reference():
    """TensorList arithmetic semantics (reference test_utils.py:57-116):
    +, *, scalar *, /, -, unary -, append."""
    from deepinv_tpu.core.tensorlist import TensorList

    a = TensorList([jnp.ones((1, 3)), jnp.zeros((1, 2))])
    b = TensorList([2 * jnp.ones((1, 3)), jnp.ones((1, 2))])
    assert np.allclose((a + b)[0], 3.0) and np.allclose((a + b)[1], 1.0)
    assert np.allclose((a * b)[0], 2.0) and np.allclose((a * b)[1], 0.0)
    assert np.allclose((2.0 * a)[0], 2.0)
    assert np.allclose((a / b)[0], 0.5)
    assert np.allclose((a - b)[1], -1.0)
    assert np.allclose((-a)[0], -1.0)
    c = a.append(b)
    assert len(c) == 4 and c.shape[2] == (1, 3)


def test_tensorlist_isnan_any_all():
    """isnan/any/all combination semantics (reference
    test_tensorlist_any_all_isnan)."""
    from deepinv_tpu.core.tensorlist import TensorList

    x = jnp.zeros((1, 3))
    x_nan = jnp.full((1, 3), jnp.nan)
    tl = TensorList([x, x])
    tl_mixed = TensorList([x, x_nan])
    tl_nan = TensorList([x_nan, x_nan])
    assert not bool(tl.isnan().any())
    assert not bool(tl.isnan().all())
    assert bool(tl_mixed.isnan().any())
    assert not bool(tl_mixed.isnan().all())
    assert bool(tl_nan.isnan().all())


def test_tensorlist_methods_do_not_raise():
    """Every public TensorList method is callable with default-style args
    (reference test_tensorlist_methods does the same smoke sweep)."""
    from deepinv_tpu.core.tensorlist import TensorList

    a = TensorList([jnp.ones((1, 1, 3, 3)), jnp.zeros((1, 1, 2, 2))])
    for name in ("abs", "clone", "conj", "detach", "flatten", "isnan",
                 "max", "numel", "numpy", "squeeze", "sum"):
        _ = getattr(a, name)()
    assert a.astype(jnp.float16)[0].dtype == jnp.float16
    assert a.reshape([(1, 9), (1, 4)])[0].shape == (1, 9)
    assert a.unsqueeze(0)[0].shape == (1, 1, 1, 3, 3)
    assert a.shape == [(1, 1, 3, 3), (1, 1, 2, 2)]
    assert a.dtype[0] == jnp.float32


def test_dirac_like_tensorlist():
    """dirac_like on a TensorList returns per-entry dirac images
    (reference test_dirac_like parametrizes lengths)."""
    from deepinv_tpu.core.tensorlist import TensorList
    from deepinv_tpu.utils import dirac_like

    a = TensorList([jnp.ones((1, 1, 3, 3)), jnp.ones((1, 1, 5, 5))])
    d = dirac_like(a)
    for entry in d:
        assert float(entry.sum()) == 1.0
        h, w = entry.shape[-2:]
        assert np.asarray(entry)[..., h // 2, w // 2].ravel()[0] == 1.0

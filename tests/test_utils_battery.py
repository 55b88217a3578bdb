"""Utils battery: sweep-style plotting / patch / signal-scaling tests ported
as ideas from the reference suite (deepinv/tests/test_utils.py — the
reference's largest-gap file per VERDICT r3 #2/#5).

Families covered:
- plot(...) argument sweep (reference test_plot:227): list sizes, titles,
  cmaps, rescale modes, save_fn round-trip
- scatter_plot / plot_curves / plot_parameters / plot_inset / plot_ortho3D
  (reference :284,:309,:324,:329,:362)
- dirac_comb periods and dims (reference test_dirac_comb:204)
- patchify shape/content/reconstruction sweep (reference :1202-1262)
- normalize_signal modes x batch (reference test_normalize_signals:816)
- resize_pad_square_tensor sweep (reference :442)
- get_GSPnP_params (reference :649)
- torch2cpu (reference :462)
- AverageMeter statistics (reference test_AverageMeter:670)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepinv_tpu.utils as U

# matplotlib must never try to open a display in CI
import matplotlib

matplotlib.use("Agg")


def _imgs(key, n, shape=(1, 3, 12, 10)):
    ks = jax.random.split(key, n)
    return [jax.random.uniform(k, shape) for k in ks]


@pytest.mark.parametrize("n_imgs", [1, 2, 4])
@pytest.mark.parametrize("rescale_mode", ["min_max", "clip"])
def test_plot_sweep(n_imgs, rescale_mode, tmp_path, key):
    imgs = _imgs(key, n_imgs)
    fn = str(tmp_path / f"p{n_imgs}_{rescale_mode}.png")
    titles = [f"im{i}" for i in range(n_imgs)]
    U.plot(imgs, titles=titles, save_fn=fn, rescale_mode=rescale_mode,
           suptitle="sweep")
    assert os.path.getsize(fn) > 0
    # single image, string title, gray cmap
    fn2 = str(tmp_path / "single.png")
    U.plot(imgs[0], titles="one", save_fn=fn2, cmap="viridis")
    assert os.path.getsize(fn2) > 0


def test_plot_accepts_batched_and_gray(tmp_path, key):
    """Batched (B>1) and 1-channel images render without error."""
    fn = str(tmp_path / "b.png")
    U.plot([jax.random.uniform(key, (3, 1, 8, 8))], save_fn=fn)
    assert os.path.getsize(fn) > 0


def test_scatter_and_curves(tmp_path, key):
    pts = jax.random.normal(key, (50, 2))
    fn = str(tmp_path / "sc.png")
    U.scatter_plot(pts, labels=np.arange(50) % 3, save_fn=fn)
    assert os.path.getsize(fn) > 0
    fn2 = str(tmp_path / "cur.png")
    U.plot_curves({"psnr": [[1.0, 2.0, 3.0]], "cost": [[3.0, 1.0, 0.5]]},
                  save_fn=fn2)
    assert os.path.getsize(fn2) > 0


def test_plot_parameters_and_inset(tmp_path, key):
    class _FakeModel:
        params_algo = {"stepsize": [0.1, 0.2, 0.3], "g_param": [1.0, 0.5]}

    fn = str(tmp_path / "par.png")
    U.plot_parameters(_FakeModel(), save_fn=fn)
    assert os.path.getsize(fn) > 0

    fn2 = str(tmp_path / "inset.png")
    U.plot_inset(_imgs(key, 2, (1, 3, 16, 16)), inset_loc=(0.1, 0.1),
                 extract_loc=(0.4, 0.4), extract_size=0.3, save_fn=fn2)
    assert os.path.getsize(fn2) > 0


@pytest.mark.parametrize("period", [2, 3])
@pytest.mark.parametrize("shape", [(8, 8), (6, 9)])
def test_dirac_comb_sweep(period, shape):
    comb = U.dirac_comb(shape, period=period)
    comb = np.asarray(comb)
    assert comb.shape == shape
    # exactly the decimation lattice is 1
    want = np.zeros(shape)
    want[::period, ::period] = 1.0
    assert np.array_equal(comb, want)


@pytest.mark.parametrize("hw,patch,stride", [
    ((12, 12), 4, 4),   # exact non-overlapping tiling
    ((12, 12), 4, 2),   # overlapping
    ((13, 11), 4, 4),   # needs padding
    ((8, 8), 8, 8),     # single patch
])
def test_patchify_sweep(hw, patch, stride, key):
    x = jax.random.uniform(key, (2, 3) + hw)
    patches = U.patchify(x, patch, stride=stride)
    assert patches.ndim == 6 and patches.shape[-2:] == (patch, patch)
    back = U.patches_to_image(patches, stride, img_size=x.shape[-2:],
                              reduce_overlap="mean")
    assert back.shape == x.shape
    assert float(jnp.max(jnp.abs(back - x))) < 1e-5


@pytest.mark.parametrize("mode", ["min_max", "clip"])
@pytest.mark.parametrize("batch", [1, 3])
def test_normalize_signal_sweep(mode, batch, key):
    x = 5.0 * jax.random.normal(key, (batch, 1, 8, 8)) + 2.0
    out = U.normalize_signal(x, mode=mode)
    assert out.shape == x.shape
    assert float(jnp.min(out)) >= -1e-6 and float(jnp.max(out)) <= 1 + 1e-6
    if mode == "min_max" and batch > 1:
        # normalization is per-batch-element: each sample spans [0, 1]
        for i in range(batch):
            assert float(jnp.max(out[i])) > 0.99


@pytest.mark.parametrize("in_shape,size", [
    ((1, 3, 10, 20), 16), ((1, 1, 20, 10), 8), ((1, 3, 16, 16), 16),
])
def test_resize_pad_square_sweep(in_shape, size, key):
    x = jax.random.uniform(key, in_shape)
    out = U.resize_pad_square_tensor(x, size)
    assert out.shape[-2:] == (size, size)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("problem", ["deblur", "super-resolution", "inpaint"])
def test_get_gspnp_params(problem):
    lamb, sigma_denoiser, stepsize, max_iter = U.get_GSPnP_params(
        problem, 0.03)
    assert lamb > 0 and stepsize > 0 and max_iter > 0
    assert sigma_denoiser > 0


def test_torch2cpu_converts(key):
    x = jax.random.uniform(key, (1, 3, 4, 4))
    out = U.torch2cpu(x)
    assert isinstance(out, np.ndarray)
    assert out.shape == x.shape
    assert np.allclose(out, np.asarray(x))


def test_average_meter_statistics():
    m = U.AverageMeter("loss")
    vals = [1.0, 2.0, 3.0, 4.0]
    for v in vals:
        m.update(v)
    assert abs(m.avg - np.mean(vals)) < 1e-12
    m2 = U.AverageMeter("batch")
    m2.update(1.0, n=3)
    m2.update(5.0, n=1)
    assert abs(m2.avg - (3 * 1.0 + 5.0) / 4) < 1e-12


def test_make_grid_layout(key):
    imgs = jax.random.uniform(key, (5, 3, 8, 8))
    grid = U.make_grid(imgs, nrow=3, padding=1)
    assert grid.shape[0] == 3
    # 2 rows of 8px images + 3 horizontal pads; 3 cols + 4 vertical pads
    assert grid.shape[1] == 2 * 8 + 3 * 1
    assert grid.shape[2] == 3 * 8 + 4 * 1


def test_plot_ortho3d_volume(tmp_path, key):
    vol = jax.random.uniform(key, (1, 1, 6, 8, 10))
    fn = str(tmp_path / "o3d.png")
    U.plot_ortho3D([vol], save_fn=fn)
    assert os.path.getsize(fn) > 0


def test_tiled_apply_matches_direct_on_linear(key):
    """tiled_apply on an elementwise-linear fn is exact regardless of the
    tiling (reference tiling-equivalence family, test_models test_pad /
    test_onesplit idea applied to the util)."""
    x = jax.random.uniform(key, (1, 3, 40, 56))
    fn = lambda t: 2.0 * t - 0.25
    out = U.tiled_apply(fn, x, patch_size=16, overlap=8)
    assert out.shape == x.shape
    assert float(jnp.max(jnp.abs(out - fn(x)))) < 1e-5


@pytest.mark.parametrize("rescale_mode", ["min_max", "clip"])
@pytest.mark.parametrize("n_vids", [1, 2])
def test_plot_videos_sweep(rescale_mode, n_vids, tmp_path, key):
    """plot_videos animates (B, C, T, H, W) stacks for 1..n videos and
    both rescale modes; save_videos writes a nonempty GIF (reference
    test_plot_videos:347 / test_save_videos:356)."""
    vids = [jax.random.uniform(jax.random.fold_in(key, i), (1, 1, 3, 8, 8))
            for i in range(n_vids)]
    fn = str(tmp_path / f"v{n_vids}_{rescale_mode}.gif")
    out = U.save_videos(vids, rescale_mode=rescale_mode, save_fn=fn)
    assert os.path.getsize(out) > 0


def test_save_videos_appends_extension(tmp_path, key):
    vid = jax.random.uniform(key, (1, 1, 2, 8, 8))
    out = U.save_videos([vid], save_fn=str(tmp_path / "noext"))
    assert out.endswith(".gif") and os.path.getsize(out) > 0


@pytest.mark.parametrize("mode", ["min_max", "clip"])
def test_rescale_img_modes(mode, key):
    """rescale_img: min_max maps to the full [0,1] span; clip only
    truncates (reference rescale_mode semantics)."""
    x = 3.0 * jax.random.normal(key, (1, 1, 8, 8)) + 1.0
    out = U.rescale_img(x, rescale_mode=mode)
    assert out.min() >= 0.0 and out.max() <= 1.0
    if mode == "min_max":
        assert out.min() < 1e-6 and out.max() > 1 - 1e-6
    else:
        inside = (np.asarray(x) >= 0) & (np.asarray(x) <= 1)
        assert np.allclose(out[inside], np.asarray(x)[inside])


@pytest.mark.parametrize("nrow", [1, 2, 5])
def test_make_grid_nrow_sweep(nrow, key):
    imgs = jax.random.uniform(key, (5, 3, 6, 6))
    grid = U.make_grid(imgs, nrow=nrow, padding=2)
    import math

    rows = math.ceil(5 / nrow)
    assert grid.shape[1] == rows * 6 + (rows + 1) * 2
    assert grid.shape[2] == nrow * 6 + (nrow + 1) * 2


def test_load_image_resize_and_gray(tmp_path, key):
    """load_image decodes, resizes and grayscales consistently with the
    ImageFolder path (reference test_load_image:782)."""
    from PIL import Image

    arr = (np.asarray(jax.random.uniform(key, (12, 10, 3))) * 255
           ).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)
    x = U.load_image(p, size=(8, 8))
    assert x.shape == (3, 8, 8)
    g = U.load_image(p, size=(8, 8), grayscale=True)
    assert g.shape == (1, 8, 8)
    assert 0.0 <= float(np.min(g)) and float(np.max(g)) <= 1.0

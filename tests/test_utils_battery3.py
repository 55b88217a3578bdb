"""Utils battery wave 3: prepare_images / preprocess_img, phantom dataset
matrix, meter matrices, load_image matrix, deprecation decorators, and
devices_equal — the reference's remaining test_utils.py ideas
(prepare_images :885/:924, phantoms :423, AverageMeter :669,
ProgressMeter :720, load_image :777, deprecated alias :384,
devices_equal :1298).
"""

import numpy as np
import pytest

import jax

from deepinv_tpu.utils import (
    AverageMeter, ProgressMeter, devices_equal, prepare_images,
    preprocess_img, normalize_signal,
)


# --------------------------------------------------------- preprocess_img --
def test_preprocess_min_max_per_element():
    a = np.stack([np.linspace(-2, 2, 16).reshape(1, 4, 4),
                  np.linspace(5, 9, 16).reshape(1, 4, 4)]).astype(np.float32)
    out = preprocess_img(a)
    for b in range(2):
        assert out[b].min() == pytest.approx(0.0) and out[b].max() == pytest.approx(1.0)


def test_preprocess_clip_bounds():
    a = np.linspace(-1, 3, 16).reshape(1, 1, 4, 4).astype(np.float32)
    out = preprocess_img(a, rescale_mode="clip")
    assert out.min() >= 0.0 and out.max() <= 1.0
    out2 = preprocess_img(a, rescale_mode="clip", vmin=-0.5, vmax=2.0)
    assert out2.min() == pytest.approx(-0.5) and out2.max() == pytest.approx(2.0)


def test_preprocess_complex_and_cartesian():
    z = (np.random.default_rng(0).standard_normal((2, 1, 4, 4))
         + 1j * np.random.default_rng(1).standard_normal((2, 1, 4, 4)))
    out_c = preprocess_img(z.astype(np.complex64))
    assert not np.iscomplexobj(out_c)
    # 2-channel real tensors are treated as Cartesian complex: modulus
    cart = np.stack([z.real, z.imag], 1)[:, :, 0]
    out_2ch = preprocess_img(cart.astype(np.float32))
    np.testing.assert_allclose(out_2ch, out_c, rtol=1e-5, atol=1e-6)


def test_preprocess_return_scale():
    a = np.stack([np.full((1, 4, 4), 3.0), np.full((1, 4, 4), 7.0)]).astype(np.float32)
    a[0, 0, 0, 0] = 1.0
    out, scales = preprocess_img(a, return_scale=True)
    assert scales[0] == (1.0, 3.0)
    assert scales[1] == (7.0, 7.0)
    _, cs = preprocess_img(a, rescale_mode="clip", vmin=0.2, vmax=0.8,
                           return_scale=True)
    assert cs == [(0.2, 0.8)] * 2


def test_preprocess_rejects_unknown_mode():
    with pytest.raises(ValueError):
        preprocess_img(np.zeros((1, 1, 2, 2)), rescale_mode="bogus")


# --------------------------------------------------------- prepare_images --
@pytest.mark.parametrize("with_x", [True, False])
@pytest.mark.parametrize("with_y", [True, False])
@pytest.mark.parametrize("with_net", [True, False])
@pytest.mark.parametrize("with_nl", [True, False])
def test_prepare_images_matrix(with_x, with_y, with_net, with_nl):
    """Reference :885: titles track provided inputs; y shown only when it
    matches x's shape; grid tiles everything."""
    t = lambda: np.random.default_rng(2).random((2, 3, 8, 8)).astype(np.float32)
    x = t() if with_x else None
    y = t() if with_y else None
    x_net = t() if with_net else None
    x_nl = t() if with_nl else None
    if not any([with_x, with_y, with_net, with_nl]):
        imgs, titles, grid, caption = prepare_images()
        assert imgs == [] and grid is None
        return
    imgs, titles, grid, caption = prepare_images(x=x, y=y, x_net=x_net,
                                                 x_nl=x_nl)
    expected = []
    if with_x:
        expected.append("Ground truth")
    if with_y and with_x:
        expected.append("Measurement")
    if with_nl:
        expected.append("No learning")
    if with_net:
        expected.append("Reconstruction")
    assert titles == expected
    assert len(imgs) == len(expected)
    if expected:
        assert grid is not None and grid.ndim == 3
        for im in imgs:
            assert im.min() >= 0.0 and im.max() <= 1.0 + 1e-6


def test_prepare_images_y_shape_mismatch_skips_measurement():
    x = np.zeros((1, 1, 8, 8), np.float32)
    y = np.zeros((1, 1, 4, 4), np.float32)  # downsampled: different shape
    _, titles, _, _ = prepare_images(x=x, y=y, x_net=x)
    assert "Measurement" not in titles


# --------------------------------------------------------------- phantoms --
@pytest.mark.parametrize("size", [64, 128])
@pytest.mark.parametrize("n_data", [1, 2, 3])
@pytest.mark.parametrize("length", [1, 10])
@pytest.mark.parametrize("dataset_name", ["random", "shepplogan"])
def test_phantom_datasets(size, n_data, length, dataset_name):
    """Reference :423 matrix on the synthetic phantom datasets."""
    from deepinv_tpu.utils import RandomPhantomDataset, SheppLoganDataset

    if dataset_name == "random":
        ds = RandomPhantomDataset(length=length, size=size, n_data=n_data)
    else:
        ds = SheppLoganDataset(size=size, n_data=n_data, length=length)
    assert len(ds) == length
    item = ds[0]
    x = item[0] if isinstance(item, tuple) else item
    assert np.asarray(x).shape == (n_data, size, size)
    assert np.isfinite(np.asarray(x)).all()


def test_phantom_transform_applied():
    from deepinv_tpu.utils import SheppLoganDataset

    ds = SheppLoganDataset(size=32, transform=lambda x: x * 0 + 5)
    x = ds[0][0] if isinstance(ds[0], tuple) else ds[0]
    assert float(np.asarray(x).ravel()[0]) == 5.0


def test_random_phantoms_differ_by_index():
    from deepinv_tpu.utils import RandomPhantomDataset

    ds = RandomPhantomDataset(length=3, size=32)
    get = lambda i: np.asarray(ds[i][0] if isinstance(ds[i], tuple) else ds[i])
    assert not np.allclose(get(0), get(1))
    np.testing.assert_array_equal(get(0), get(0))  # per-index deterministic


# ----------------------------------------------------------------- meters --
@pytest.mark.parametrize("to_float", [float, np.float32, np.float64])
def test_average_meter_types(to_float):
    """Reference :669: meters accumulate any float-like type."""
    m = AverageMeter("loss", ":f")
    vals = [to_float(v) for v in (1.0, 2.0, 3.0)]
    for v in vals:
        m.update(v)
    assert m.avg == pytest.approx(2.0)
    assert m.count == 3
    s = str(m)
    assert "loss" in s


def test_average_meter_weighted_updates():
    m = AverageMeter("psnr")
    m.update(10.0, n=3)
    m.update(20.0, n=1)
    assert m.avg == pytest.approx(12.5)


@pytest.mark.parametrize("prefix", ["", "dummy_prefix"])
@pytest.mark.parametrize("n_meters", [1, 2])
def test_progress_meter_display(capsys, prefix, n_meters):
    """Reference :720: display prints prefix, batch counter and every
    meter."""
    meters = [AverageMeter(f"m{i}", ":f") for i in range(n_meters)]
    for m in meters:
        m.update(1.5)
    pm = ProgressMeter(10, meters, prefix=prefix)
    pm.display(3)
    out = capsys.readouterr().out
    assert prefix in out
    assert "3" in out and "10" in out
    for i in range(n_meters):
        assert f"m{i}" in out


# -------------------------------------------------------------- load_image --
@pytest.mark.parametrize("original_size", [(16, 16), (32, 32)])
@pytest.mark.parametrize("grayscale", [False, True])
@pytest.mark.parametrize("size", [None, 8])
def test_load_image_matrix(tmp_path, original_size, grayscale, size):
    """Reference :777 matrix on a synthetic PNG."""
    from PIL import Image

    from deepinv_tpu.datasets.folder import load_image

    rgb = np.random.default_rng(3).integers(0, 255, (*original_size, 3),
                                            np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(rgb).save(p)
    out = np.asarray(load_image(p, size=size, grayscale=grayscale))
    c = 1 if grayscale else 3
    hw = (size, size) if size else original_size
    assert out.shape == (c, *hw)
    assert out.dtype == np.float32 and out.max() <= 1.0


# -------------------------------------------------------- normalize_signal --
@pytest.mark.parametrize("mode", ["min_max", "clip"])
@pytest.mark.parametrize("img_size", [(1, 8, 8), (3, 8, 8)])
def test_normalize_signal_matrix(mode, img_size):
    x = jax.random.normal(jax.random.key(0), (2, *img_size)) * 3
    out = np.asarray(normalize_signal(x, mode=mode))
    assert out.min() >= 0.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    if mode == "min_max":
        assert out.max() == pytest.approx(1.0, abs=1e-5)


# ----------------------------------------------------------- devices_equal --
def test_devices_equal():
    d = jax.devices()[0]
    assert devices_equal(d, d)
    assert devices_equal("cpu", "cpu")
    assert not devices_equal("cpu", "tpu")


# ----------------------------------------------------------- deprecations --
def test_deprecated_alias_warns_and_forwards():
    from deepinv_tpu.utils import deprecated_alias

    @deprecated_alias(old_arg="new_arg")
    def f(new_arg=0):
        return new_arg

    with pytest.warns(DeprecationWarning):
        assert f(old_arg=7) == 7
    assert f(new_arg=3) == 3


def test_deprecated_func_replaced_by():
    from deepinv_tpu.utils import deprecated_func_replaced_by

    def new(x):
        return x + 1

    @deprecated_func_replaced_by(new, redirect=True)
    def old(x):  # pragma: no cover - redirected
        return -1

    with pytest.warns(DeprecationWarning):
        assert old(4) == 5


def test_tiled_apply_one_small_dimension(key):
    """r5 review: images smaller than the patch in ONE dimension
    (panoramas/sinograms) tile as full-height strips instead of crashing."""
    from deepinv_tpu.utils.mixins import tiled_apply

    x = jax.random.uniform(key, (1, 1, 10, 64))
    out = tiled_apply(lambda v: v * 2.0, x, patch_size=16, overlap=4)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.asarray(x),
                               atol=1e-5)

"""Datasets layer (reference deepinv/tests/test_datasets.py).

Offline measurement generation round trips through HDF5 with the
reference-compatible layout (datagenerator.py:486-763), dataset containers
(Array/Tensor/Patch/Subset/DataLoader), splitting, phantoms, and the
physics-generator-params path.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.datasets import (
    generate_dataset,
    HDF5Dataset,
    ArrayDataset,
    TensorDataset,
    PatchDataset,
    DataLoader,
    random_split,
    shepp_logan,
    SheppLoganDataset,
)
from deepinv_tpu.physics import Inpainting, Denoising, GaussianNoise
from deepinv_tpu.physics.generator import SigmaGenerator


@pytest.fixture
def images():
    return np.random.default_rng(0).random((10, 1, 16, 16)).astype(np.float32)


def test_generate_dataset_roundtrip(tmp_path, images):
    """x/y pairs written to HDF5 come back with the right shapes and
    reproduce physics(x) (reference datagenerator HDF5 layout)."""
    ds = ArrayDataset(images)
    physics = Denoising(noise_model=GaussianNoise(0.05))
    path = generate_dataset(
        ds, physics, str(tmp_path), batch_size=3, train_datapoints=6,
        test_dataset=ds, test_datapoints=4,
    )
    train = HDF5Dataset(path, train=True)
    test = HDF5Dataset(path, train=False)
    assert len(train) == 6 and len(test) == 4
    x0, y0 = train[0]
    assert x0.shape == (1, 16, 16) and y0.shape == (1, 16, 16)
    # measurements are x + noise at sigma 0.05 (not equal to x)
    assert 0.0 < float(np.abs(np.asarray(y0) - np.asarray(x0)).std()) < 0.2


def test_generate_dataset_with_params(tmp_path, images):
    """PhysicsGenerator params are saved alongside and restored
    (HDF5Dataset(load_physics_generator_params=True))."""
    ds = ArrayDataset(images)
    physics = Denoising(noise_model=GaussianNoise(0.05))
    gen = SigmaGenerator(sigma_min=0.01, sigma_max=0.2)
    path = generate_dataset(
        ds, physics, str(tmp_path), physics_generator=gen,
        batch_size=2, train_datapoints=4,
    )
    train = HDF5Dataset(path, train=True, load_physics_generator_params=True)
    item = train[0]
    assert len(item) == 3
    params = item[2]
    assert "sigma" in params and 0.01 <= float(np.asarray(params["sigma"])) <= 0.2


def test_generate_dataset_multi_operator(tmp_path, images):
    """A list of physics produces one file per operator, round-robin split
    (reference datagenerator.py operators loop)."""
    ds = ArrayDataset(images)
    phys = [
        Inpainting(img_size=(1, 16, 16), mask=0.5, key=jax.random.key(0)),
        Inpainting(img_size=(1, 16, 16), mask=0.8, key=jax.random.key(1)),
    ]
    paths = generate_dataset(ds, phys, str(tmp_path), train_datapoints=6)
    assert isinstance(paths, (list, tuple)) and len(paths) == 2
    for p in paths:
        d = HDF5Dataset(p, train=True)
        assert len(d) == 3


def test_tensor_dataset_and_loader(images):
    y = images * 2.0
    ds = TensorDataset(x=images, y=y)
    assert len(ds) == 10
    x0, y0 = ds[3]
    assert np.allclose(y0, 2.0 * x0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    xb, yb = batches[0]
    assert xb.shape == (4, 1, 16, 16)
    # ground-truth-free: x placeholder is NaN
    ds2 = TensorDataset(y=y)
    x0, y0 = ds2[0]
    assert np.isnan(np.asarray(x0)).all()


def test_dataloader_shuffle_reproducible(images):
    ds = ArrayDataset(images)
    l1 = DataLoader(ds, batch_size=5, shuffle=True, seed=7)
    l2 = DataLoader(ds, batch_size=5, shuffle=True, seed=7)
    assert np.allclose(next(iter(l1)), next(iter(l2)))


def test_random_split(images):
    ds = ArrayDataset(images)
    a, b = random_split(ds, [7, 3])
    assert len(a) == 7 and len(b) == 3
    seen = {float(a[i][0, 0, 0]) for i in range(7)} | {
        float(b[i][0, 0, 0]) for i in range(3)
    }
    assert len(seen) == 10  # disjoint cover


def test_patch_dataset(images):
    ds = PatchDataset(images, patch_size=8, stride=8)
    assert len(ds) == 10 * 4
    p = ds[0]
    assert p.shape == (1, 8, 8)
    assert np.allclose(p, images[0, :, :8, :8])
    # transforms hook
    ds2 = PatchDataset(images, patch_size=8, stride=8, transforms=lambda v: v * 0)
    assert float(np.abs(ds2[0]).max()) == 0.0


def test_phantoms():
    ph = shepp_logan(32)
    assert ph.shape == (32, 32) and 0.0 <= float(np.min(ph)) and float(np.max(ph)) <= 1.0
    ds = SheppLoganDataset(size=24, length=3)
    assert len(ds) == 3
    assert np.asarray(ds[0]).shape[-2:] == (24, 24)


def test_hdf5_supports_trainer(tmp_path, images):
    """The generated dataset feeds Trainer's offline path end-to-end
    (reference trainer.py get_samples_offline)."""
    from deepinv_tpu.training import Trainer
    from deepinv_tpu.models import DnCNN
    from deepinv_tpu.loss import SupLoss
    import optax

    ds = ArrayDataset(images)
    physics = Denoising(noise_model=GaussianNoise(0.05))
    path = generate_dataset(ds, physics, str(tmp_path), train_datapoints=6)
    train = HDF5Dataset(path, train=True)
    model = DnCNN(1, 1, depth=2, nf=8, pretrained=None)
    trainer = Trainer(
        model=model,
        physics=physics,
        optimizer=optax.adam(1e-3),
        train_dataloader=DataLoader(train, batch_size=3),
        losses=SupLoss(),
        epochs=1,
        online_measurements=False,
        verbose=False,
        show_progress_bar=False,
    )
    out = trainer.train()
    assert out is not None


def test_public_dataset_shells_mocked(tmp_path):
    """Named public datasets load from fabricated local files (the
    reference's DEEPINV_MOCK_TESTS strategy, test_datasets.py:644) and
    refuse download=True in this no-egress environment."""
    from PIL import Image

    from deepinv_tpu.datasets import DIV2K, Set14HR

    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.random((12, 14, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(tmp_path, f"img_{i}.png"))

    ds = DIV2K(str(tmp_path), size=(12, 14))
    assert len(ds) == 3
    x = np.asarray(ds[0])
    assert x.shape == (3, 12, 14) and 0.0 <= x.min() and x.max() <= 1.0

    with pytest.raises(RuntimeError, match="no network"):
        Set14HR(str(tmp_path), download=True)


def _save_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_kohler_layout(tmp_path):
    """Kohler loads the published archive layout byte-correctly: printout/
    trajectory indexing, frame-count table, orderings (reference
    kohler.py:89-311)."""
    from deepinv_tpu.datasets import Kohler

    rng = np.random.default_rng(0)
    root = str(tmp_path)
    # fabricate two (printout, trajectory) cells incl. an irregular one
    cells = [(1, 1, 199), (1, 10, 198)]
    for p, t, count in cells:
        for f in (1, (count + 1) // 2, count):
            arr = (rng.random((8, 9, 3)) * 255).astype(np.uint8)
            _save_png(
                os.path.join(root, f"Image{p}", f"Kernel{t}",
                             f"GroundTruth{p}_{t}_{f}.png"), arr)
        _save_png(os.path.join(root, f"Blurry{p}_{t}.png"),
                  (rng.random((8, 9, 3)) * 255).astype(np.uint8))

    to_np = lambda im: np.asarray(im)
    ds = Kohler(root, frames="middle", ordering="printout_first",
                transform=to_np)
    assert len(ds) == 48
    # frame-count table drives "middle"/"last" selection
    assert Kohler.get_frame_count(1, 1) == 199
    assert Kohler.get_frame_count(1, 10) == 198
    assert Kohler.select_frame(1, 1, "middle") == 100
    assert Kohler.select_frame(1, 10, "middle") == 99
    assert Kohler.select_frame(1, 10, "last") == 198

    sharp, blurry = ds[0]  # printout 1, trajectory 1
    ref = to_np(__import__("PIL.Image", fromlist=["Image"]).open(
        os.path.join(root, "Image1", "Kernel1", "GroundTruth1_1_100.png")))
    assert np.array_equal(sharp, ref)
    assert blurry.shape == (8, 9, 3)

    # trajectory_first ordering maps index 9*12... index (t-1)*? : index 0
    # is (printout 1, trajectory 1) in both orderings; check a distinct one
    ds_t = Kohler(root, frames="first", ordering="trajectory_first",
                  transform=to_np)
    sharp_t, _ = ds_t.get_item(1, 10, frames="first")
    ref_t = to_np(__import__("PIL.Image", fromlist=["Image"]).open(
        os.path.join(root, "Image1", "Kernel10", "GroundTruth1_10_1.png")))
    assert np.array_equal(sharp_t, ref_t)

    # frames list & 'all' return lists
    frames_list, _ = ds.get_item(1, 10, frames=["first", "last"])
    assert len(frames_list) == 2

    with pytest.raises(RuntimeError, match="zero-egress"):
        Kohler(root, download=True)


def test_fmd_layout(tmp_path):
    """FMD pairs each noisy png with its fov's gt/avg50.png (reference
    fmd.py:206-249)."""
    from deepinv_tpu.datasets import FMD

    rng = np.random.default_rng(1)
    root = str(tmp_path)
    img_type = "Confocal_BPAE_B"
    for fov in (1, 2):
        for noise_dir in ("raw", "avg2"):
            for i in range(2):
                _save_png(
                    os.path.join(root, img_type, noise_dir, str(fov),
                                 f"HV110_P05005{i:05d}.png"),
                    (rng.random((6, 7)) * 255).astype(np.uint8))
        _save_png(os.path.join(root, img_type, "gt", str(fov), "avg50.png"),
                  (rng.random((6, 7)) * 255).astype(np.uint8))

    to_np = lambda im: np.asarray(im)
    ds = FMD(root, img_types=[img_type], noise_levels=(1, 2), fovs=(1, 2),
             transform=to_np, target_transform=to_np)
    # 1 type x 2 levels x 2 fovs x 2 imgs
    assert len(ds) == 8
    clean, noisy = ds[0]
    ref_clean = to_np(__import__("PIL.Image", fromlist=["Image"]).open(
        os.path.join(root, img_type, "gt", "1", "avg50.png")))
    assert np.array_equal(clean, ref_clean)
    assert noisy.shape == (6, 7)

    with pytest.raises(ValueError, match="img_types"):
        FMD(root, img_types=["NotAType"])
    with pytest.raises(ValueError, match="noise level"):
        FMD(root, img_types=[img_type], noise_levels=(3,))


def test_nbu_layout(tmp_path):
    """NBU loads natural-sorted MS/PAN .mat pairs with per-satellite bit
    normalization (reference satellite.py:89-176)."""
    from scipy.io import savemat

    from deepinv_tpu.datasets import NBUDataset

    rng = np.random.default_rng(2)
    root = str(tmp_path)
    sat = "gaofen-1"
    ms_ref = {}
    for name in ("1.mat", "2.mat", "10.mat"):
        ms = (rng.random((16, 16, 4)) * 1023).astype(np.uint16)
        pan = (rng.random((64, 64)) * 1023).astype(np.uint16)
        ms_ref[name] = ms
        os.makedirs(os.path.join(root, sat, "MS_256"), exist_ok=True)
        os.makedirs(os.path.join(root, sat, "PAN_1024"), exist_ok=True)
        savemat(os.path.join(root, sat, "MS_256", name), {"imgMS": ms})
        savemat(os.path.join(root, sat, "PAN_1024", name), {"imgPAN": pan})

    ds = NBUDataset(root, satellite=sat)
    assert len(ds) == 3
    # natural sort: 1.mat, 2.mat, 10.mat (lexicographic would be 1,10,2)
    assert [os.path.basename(p) for p, _ in ds.image_paths] == \
        ["1.mat", "2.mat", "10.mat"]
    x = ds[2]  # 10.mat
    assert x.shape == (4, 16, 16)
    np.testing.assert_allclose(
        x, np.moveaxis(ms_ref["10.mat"].astype(np.float32) / 1023.0, -1, 0),
        rtol=1e-6)

    ds_pan = NBUDataset(root, satellite=sat, return_pan=True)
    pair = ds_pan[0]
    assert pair[0].shape == (4, 16, 16) and pair[1].shape == (1, 64, 64)

    with pytest.raises(ValueError, match="satellite"):
        NBUDataset(root, satellite="landsat")


def _write_minimal_dicom(path, arr, slope=1.0, intercept=0.0):
    """Fabricate an explicit-VR little-endian DICOM part-10 file."""
    import struct

    def elem(group, el, vr, value):
        head = struct.pack("<HH", group, el) + vr
        if vr in (b"OB", b"OW"):
            return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
        return head + struct.pack("<H", len(value)) + value

    def ds_value(x):
        s = f"{x:g}".encode()
        return s + b" " if len(s) % 2 else s

    rows, cols = arr.shape
    body = b""
    body += elem(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += elem(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += elem(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += elem(0x0028, 0x0103, b"US", struct.pack("<H", 1))  # signed
    body += elem(0x0028, 0x1052, b"DS", ds_value(intercept))
    body += elem(0x0028, 0x1053, b"DS", ds_value(slope))
    body += elem(0x7FE0, 0x0010, b"OW", arr.astype("<i2").tobytes())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + body)


def test_lidc_idri_layout(tmp_path):
    """LIDC-IDRI walks metadata.csv CT rows (Windows-style relative paths)
    and reads DICOM slices byte-correctly with the native reader
    (reference lidc_idri.py:84-175)."""
    from deepinv_tpu.datasets import LidcIdriSliceDataset

    rng = np.random.default_rng(3)
    root = str(tmp_path)
    scan_dir = os.path.join("LIDC-IDRI", "LIDC-IDRI-0001", "study", "series")
    arrs = []
    for i in range(3):
        arr = rng.integers(-1000, 2000, (10, 12), dtype=np.int16)
        arrs.append(arr)
        _write_minimal_dicom(
            os.path.join(root, scan_dir, f"1-{i:03d}.dcm"), arr,
            slope=1.0, intercept=-1024.0)

    with open(os.path.join(root, "metadata.csv"), "w") as f:
        f.write("Subject ID,Modality,File Location\n")
        f.write(f"LIDC-IDRI-0001,CT,{scan_dir.replace(os.sep, chr(92))}\n")
        f.write("LIDC-IDRI-0002,DX,ignored\n")  # non-CT rows are filtered

    ds = LidcIdriSliceDataset(root)
    assert len(ds) == 3
    out = ds[1]
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out, arrs[1])

    ds_hu = LidcIdriSliceDataset(root, hounsfield_units=True)
    hu = ds_hu[1]
    assert hu.dtype == np.float32
    np.testing.assert_allclose(hu, arrs[1].astype(np.float32) - 1024.0)

    with pytest.raises(ValueError, match="doesn't exist"):
        LidcIdriSliceDataset(str(tmp_path / "empty"))


def test_fastmri_metadata_cache_and_transform(tmp_path):
    """FastMRI metadata cache round-trips (reference fastmri.py:309-337)
    and MRISliceTransform masks/normalizes/estimates maps."""
    import h5py

    from deepinv_tpu.datasets import FastMRISliceDataset, MRISliceTransform
    from deepinv_tpu.physics.generator import RandomMaskGenerator

    rng = np.random.default_rng(4)
    root = str(tmp_path / "data")
    os.makedirs(root)
    for i in range(2):
        ksp = (rng.standard_normal((3, 2, 16, 16))
               + 1j * rng.standard_normal((3, 2, 16, 16))).astype(np.complex64)
        with h5py.File(os.path.join(root, f"file{i}.h5"), "w") as f:
            f.create_dataset("kspace", data=ksp)

    cache = str(tmp_path / "cache.pkl")
    ds = FastMRISliceDataset(root, save_metadata_to_cache=True,
                             metadata_cache_file=cache)
    assert os.path.exists(cache)
    assert len(ds) == 6

    # loading from cache gives the identical index without rescanning
    ds2 = FastMRISliceDataset(root, load_metadata_from_cache=True,
                              metadata_cache_file=cache)
    assert ds2.samples == ds.samples

    # wrong root in cache is an explicit error
    with pytest.raises(ValueError, match="metadata"):
        FastMRISliceDataset(str(tmp_path), load_metadata_from_cache=True,
                            metadata_cache_file=cache)

    # transform: seeded mask is deterministic per sample; coil maps RSS==1
    gen = RandomMaskGenerator((2, 16, 16), acceleration=2)
    tf = MRISliceTransform(mask_generator=gen, estimate_coil_maps=8,
                           normalize=True)
    ds3 = FastMRISliceDataset(root, transform=tf)
    x, y, params = ds3[0]
    assert y.shape == (2, 2, 16, 16) and "mask" in params
    x_b, y_b, params_b = ds3[0]
    np.testing.assert_array_equal(params["mask"], params_b["mask"])
    maps = params["coil_maps"]
    assert maps.shape == (2, 16, 16) and maps.dtype == np.complex64
    rss = np.sqrt((np.abs(maps) ** 2).sum(0))
    np.testing.assert_allclose(rss[rss > 1e-6], 1.0, rtol=1e-4)
    # masked kspace is consistent with the mask
    assert np.abs(y[:, :, np.asarray(params["mask"]) == 0]).max() == 0


# ---------------------------------------------------------------------------
# CMRxRecon / SKM-TEA real archive layouts (reference cmrxrecon.py:105,
# skmtea.py:17) — fabricated on-disk fixtures, as for Kohler/FMD/NBU/LIDC.
# ---------------------------------------------------------------------------

def _save_mat73(path, name, arr):
    """Write a MATLAB-7.3-style file: HDF5 with reversed (column-major) axes
    and compound real/imag datasets for complex arrays."""
    import h5py

    with h5py.File(path, "w") as f:
        a = arr.transpose(range(arr.ndim - 1, -1, -1))
        if np.iscomplexobj(a):
            dt = np.dtype([("real", a.real.dtype), ("imag", a.imag.dtype)])
            buf = np.empty(a.shape, dt)
            buf["real"], buf["imag"] = a.real, a.imag
            f.create_dataset(name, data=buf)
        else:
            f.create_dataset(name, data=a)


def test_cmrxrecon_layout(tmp_path):
    """TrainingSet dir walk, kspace_single_full keys, provided-mask loading,
    padding + normalization (reference cmrxrecon.py:105-269)."""
    from deepinv_tpu.datasets import CMRxReconSliceDataset

    root = str(tmp_path)
    ddir = os.path.join(root, "SingleCoil/Cine/TrainingSet/FullSample/P001")
    mdir = os.path.join(root, "SingleCoil/Cine/TrainingSet/AccFactor04/P001")
    os.makedirs(ddir)
    os.makedirs(mdir)
    rng = np.random.default_rng(0)
    W, H, D, T = 24, 16, 3, 5
    ksp = rng.normal(size=(W, H, D, T)) + 1j * rng.normal(size=(W, H, D, T))
    _save_mat73(os.path.join(ddir, "cine_sax.mat"), "kspace_single_full", ksp)
    mask = (rng.random((T, W, H)) < 0.3).astype(np.float64)
    _save_mat73(os.path.join(mdir, "cine_sax_mask.mat"), "mask", mask)

    ds = CMRxReconSliceDataset(root, pad_size=(32, 20))
    assert len(ds) == D  # one item per slice
    x, y, params = ds[0]
    assert x.shape == (2, T, 32, 20)
    assert y.shape == x.shape and params["mask"].shape == x.shape
    # normalization: zero mean, unit std
    assert abs(float(x.mean())) < 1e-5 and abs(float(x.std()) - 1) < 1e-3
    # kspace is masked
    assert np.abs(y[params["mask"] == 0]).max() == 0
    # the provided mask round-trips (padded, channel-duplicated)
    m = params["mask"][0, :, 4:-4, 2:-2]
    np.testing.assert_array_equal(m, mask.astype(np.float32))
    # metadata
    md = ds.samples[0].metadata
    assert md["width"] == W and md["height"] == H and md["timeframes"] == T

    # mask generator path (exclusive with mask_dir)
    from deepinv_tpu.physics.generator import RandomMaskGenerator

    gen = RandomMaskGenerator((2, W, H), acceleration=2)
    ds2 = CMRxReconSliceDataset(
        root, mask_dir=None, mask_generator=gen, pad_size=None
    )
    x2, y2, p2 = ds2[1]
    assert x2.shape == (2, T, W, H) and p2["mask"].shape == x2.shape

    with pytest.raises(ValueError, match="Only one of"):
        CMRxReconSliceDataset(root, mask_generator=gen)


def test_skmtea_layout(tmp_path):
    """SKM-TEA h5 keys (kspace/target/maps/masks/poisson_Nx), echo
    selection, mask zero-padding, MultiCoilMRI compatibility (reference
    skmtea.py:17-190)."""
    import h5py

    from deepinv_tpu.datasets import SKMTEASliceDataset

    rng = np.random.default_rng(1)
    S, H, W, E, N = 2, 20, 16, 2, 4
    ksp = (rng.normal(size=(S, H, W, E, N))
           + 1j * rng.normal(size=(S, H, W, E, N))).astype(np.complex64)
    tgt = (rng.normal(size=(S, H, W, E, 1))
           + 1j * rng.normal(size=(S, H, W, E, 1))).astype(np.complex64)
    maps = (rng.normal(size=(S, H, W, N, 1))
            + 1j * rng.normal(size=(S, H, W, N, 1))).astype(np.complex64)
    pmask = rng.random((16, 12)) < 0.4
    with h5py.File(str(tmp_path / "scan0.h5"), "w") as f:
        f["kspace"] = ksp
        f["target"] = tgt
        f["maps"] = maps
        f["masks/poisson_6.0x"] = pmask

    ds = SKMTEASliceDataset(str(tmp_path), acc=6, echo=1)
    assert len(ds) == S
    x, y, params = ds[1]
    assert x.shape == (2, H, W)
    assert y.shape == (2, N, H, W)
    assert params["mask"].shape == (1, H, W)
    assert params["coil_maps"].shape == (N, H, W)
    assert params["coil_maps"].dtype == np.complex64
    # mask zero-pad: border rows/cols are zero
    assert params["mask"][:, :2].max() == 0 and params["mask"][:, :, :2].max() == 0
    # echo selection: y matches the raw echo-1 kspace under the mask
    raw = np.moveaxis(ksp[1, :, :, 1, :], -1, 0)
    np.testing.assert_allclose(
        y[0] + 1j * y[1], raw * params["mask"], atol=1e-6
    )
    # filter_id filters samples
    ds2 = SKMTEASliceDataset(
        str(tmp_path), acc=6, filter_id=lambda s: s.slice_ind == 0
    )
    assert len(ds2) == 1

    # plugs straight into MultiCoilMRI: physics(x) reproduces y
    from deepinv_tpu.physics import MultiCoilMRI

    physics = MultiCoilMRI(
        mask=jnp.asarray(params["mask"]),
        coil_maps=jnp.asarray(params["coil_maps"])[None],
        img_size=(H, W),
    )
    y1 = jax.jit(physics.A)(jnp.asarray(x)[None])[0]
    assert y1.shape == y.shape


def test_dataset_check_dataset_and_integrity(tmp_path, images):
    """check_dataset on every dataset class + DIV2K/LSDIR md5 integrity
    (reference datasets/base.py:22, div2k.py:131)."""
    from deepinv_tpu.datasets import ArrayDataset, TensorDataset, DIV2K
    from deepinv_tpu.datasets.utils import (
        calculate_md5,
        calculate_md5_for_folder,
    )

    ArrayDataset(images).check_dataset()
    td = TensorDataset(x=images)
    td.check_dataset()
    # x/y/params are read-only properties, as in the reference
    np.testing.assert_array_equal(td.x, images)
    assert td.y is None and td.params is None

    # md5 helpers are deterministic and content-sensitive
    p1, p2 = tmp_path / "a.bin", tmp_path / "b.bin"
    p1.write_bytes(b"hello")
    p2.write_bytes(b"world")
    assert calculate_md5(str(p1)) != calculate_md5(str(p2))
    d1 = calculate_md5_for_folder(str(tmp_path))
    p2.write_bytes(b"world!")
    assert calculate_md5_for_folder(str(tmp_path)) != d1

    # DIV2K integrity: wrong checksum -> False; folder missing -> False
    root = tmp_path / "div2k"
    (root / "DIV2K_train_HR").mkdir(parents=True)
    _save_png(str(root / "DIV2K_train_HR" / "0001.png"),
              np.zeros((8, 8, 3), np.uint8))
    ds = DIV2K.__new__(DIV2K)
    ds.root = str(root)
    assert ds.verify_split_dataset_integrity("train") is False
    ds.root = str(tmp_path / "nope")
    assert ds.verify_split_dataset_integrity("train") is False


def test_hdf5_unsupervised_flag(tmp_path, images):
    """HDF5Dataset.unsupervised detects NaN ground truths (reference
    datagenerator.py:403)."""
    import warnings as _warnings

    import h5py

    from deepinv_tpu.datasets import HDF5Dataset

    path = str(tmp_path / "ds.h5")
    with h5py.File(path, "w") as f:
        f["x_train"] = np.full((4, 1, 8, 8), np.nan, np.float32)
        f["y_train"] = np.ones((4, 1, 8, 8), np.float32)
    ds = HDF5Dataset(path, train=True)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore", DeprecationWarning)
        assert ds.unsupervised is True
    ds.close()


def test_patch_dataset_geometry_helpers(images):
    """PatchDataset inherits the TiledMixin2d geometry surface (reference
    patch_dataset.py:9)."""
    from deepinv_tpu.datasets import PatchDataset

    ds = PatchDataset(images, patch_size=8, stride=4)
    n_h, n_w = ds.get_num_patches(images.shape[-2:])
    assert (n_h, n_w) >= (ds.per_row, ds.per_col)
    patches = ds.image_to_patches(jnp.asarray(images))
    assert patches.shape[0] == images.shape[0] and patches.shape[-2:] == (8, 8)


def test_random_patch_sampler_load(tmp_path):
    """RandomPatchSampler.load slices a patch at given coords (reference
    random_sampler.py:241)."""
    from deepinv_tpu.datasets import RandomPatchSampler

    xdir = tmp_path / "x"
    xdir.mkdir()
    vol = np.arange(5 * 6 * 7, dtype=np.float32).reshape(5, 6, 7)
    np.save(str(xdir / "v.npy"), vol)
    ds = RandomPatchSampler(x_dir=str(xdir), patch_size=(2, 3, 4))
    patch = ds.load(str(xdir / "v.npy"), (1, 2, 3))
    np.testing.assert_array_equal(patch[0], vol[1:3, 2:5, 3:7])

from .logger import AverageMeter, ProgressMeter, CSVLogger
from .plotting import (
    plot, plot_curves, plot_parameters, plot_inset, scatter_plot,
    rescale_img, preprocess_img, prepare_images,
)
from .mixins import (
    TimeMixin, TiledMixin2d, tiled_apply, image_to_patches, patches_to_image,
    patchify,
)
from .io import (
    DownloadError, load_np, load_mat, load_tiff, load_url, load_example,
    load_dicom, load_nifti, load_ismrmd, load_raster,
    get_cache_home, get_data_home,
)
from .profiling import trace, compiled_cost, timeit
from .decorators import (
    deprecated_alias, deprecated_argument, deprecated_func, deprecated_class,
    deprecated_func_replaced_by, deprecate_attribute,
)
from .functional import (
    complex_abs, dirac, dirac_like, dirac_comb, dirac_comb_like,
    ones_like, zeros_like, rand_like, randn_like, get_timestamp, get_device,
    devices_equal, normalize_signal, resize_pad_square_tensor,
)
# cross-namespace conveniences matching reference deepinv.utils — resolved
# lazily via module __getattr__ so that physics/optim/datasets modules can
# import deepinv_tpu.utils.* submodules without a package cycle
from ..core.tensorlist import TensorList

_LAZY = {
    "SheppLoganDataset": ("..datasets.phantoms", "SheppLoganDataset"),
    "RandomPhantomDataset": ("..datasets.phantoms", "RandomPhantomDataset"),
    "MRIMixin": ("..physics.mri", "MRIMixin"),
    "patch_extractor": ("..optim.epll", "patch_extractor"),
    "load_image": ("..datasets.folder", "load_image"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod, __name__), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY))


# --- gated / thin counterparts of torch- or download-specific helpers ----
def _no_egress(name, url=None):
    raise RuntimeError(
        f"{name} needs network access (none in this environment); "
        "place files locally and use the load_* path helpers instead"
    )


def download_example(name, **kwargs):
    """Gated (reference utils/demo.py download_example): no egress."""
    _no_egress("download_example")


def load_url_image(url, **kwargs):
    _no_egress("load_url_image", url)


def load_np_url(url, **kwargs):
    _no_egress("load_np_url", url)


def load_torch_url(url, **kwargs):
    _no_egress("load_torch_url", url)


def load_dataset(name, **kwargs):
    _no_egress("load_dataset")


def load_degradation(name, **kwargs):
    _no_egress("load_degradation")


def get_image_url(name: str) -> str:
    """URL of a named example image on the reference's HuggingFace repo
    (reference utils/demo.py get_image_url) — string only, no download."""
    return f"https://huggingface.co/datasets/deepinv/images/resolve/main/{name}?download=true"


def get_degradation_url(name: str) -> str:
    return f"https://huggingface.co/datasets/deepinv/degradations/resolve/main/{name}?download=true"


def get_freer_gpu():
    """Torch-CUDA helper in the reference; on JAX return the default device."""
    import jax as _jax

    return _jax.devices()[0]


def load_torch(path, **kwargs):
    """Load a torch checkpoint as a tree of numpy arrays (cpu torch is
    available in this image)."""
    import torch as _torch

    obj = _torch.load(path, map_location="cpu", weights_only=False)
    import numpy as _np

    def conv(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else v

    if isinstance(obj, dict):
        return {k: conv(v) for k, v in obj.items()}
    return conv(obj)


def enable_tex():
    """Matplotlib TeX rendering on (reference utils/plotting.py)."""
    import matplotlib

    matplotlib.rcParams.update({"text.usetex": True})


def disable_tex():
    import matplotlib

    matplotlib.rcParams.update({"text.usetex": False})


def torch2cpu(x):
    """Reference moves torch tensors to cpu numpy for plotting; here any
    array-like becomes numpy."""
    import numpy as _np
    import jax as _jax

    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return _np.asarray(_jax.device_get(x))


def make_grid(imgs, nrow: int = 8, padding: int = 2):
    """Tile a batch (B, C, H, W) into one image grid (reference uses
    torchvision.utils.make_grid)."""
    import numpy as _np

    a = _np.asarray(imgs)
    B, C, H, W = a.shape
    ncol = nrow
    nr = -(-B // ncol)
    out = _np.zeros((C, nr * (H + padding) + padding, ncol * (W + padding) + padding), a.dtype)
    for i in range(B):
        r, c = divmod(i, ncol)
        out[:, padding + r * (H + padding) : padding + r * (H + padding) + H,
            padding + c * (W + padding) : padding + c * (W + padding) + W] = a[i]
    return out


from .plotting import plot_videos, save_videos, plot_ortho3D  # noqa: E402


def plot_napari(*args, **kwargs):
    raise ImportError("plot_napari requires napari (not in this image)")


def get_GSPnP_params(problem: str, noise_level_img: float):
    """Suggested (lamb, sigma_denoiser, stepsize, max_iter) for GSPnP
    experiments (reference utils/parameters.py)."""
    if problem == "deblur":
        lamb, max_iter = 0.1, 500
    elif problem == "super-resolution":
        lamb, max_iter = 0.065, 500
    elif problem == "inpaint":
        lamb, max_iter = 0.1, 100
    else:
        raise ValueError(f"unknown problem {problem!r}")
    sigma_denoiser = 1.8 * noise_level_img
    stepsize = 1.0
    return lamb, sigma_denoiser, stepsize, max_iter

from .datagenerator import generate_dataset, HDF5Dataset
from .base import (ImageDataset, ArrayDataset, TensorDataset, DataLoader, PatchDataset, RandomPatchSampler, random_split, check_dataset)
from .phantoms import (
    shepp_logan, SheppLoganDataset, RandomPhantomDataset, random_circles,
    generate_random_phantom, random_shapes,
)
from .fastmri import FastMRISliceDataset, SimpleFastMRISliceDataset
from .folder import (
    ImageFolder,
    DIV2K,
    Urban100HR,
    Set14HR,
    CBSD68,
    BSDS500,
    Flickr2kHR,
    LsdirHR,
    load_image,
)
from .fmd import FMD
from .kohler import Kohler
from .satellite import NBUDataset
from .lidc_idri import LidcIdriSliceDataset
from .fastmri import MRISliceTransform
from .mri_slices import CMRxReconSliceDataset, SKMTEASliceDataset


def download_archive(url, save_path, extract: bool = True):
    """Gated download helper (reference datasets/utils.py download_archive).
    This environment has no network egress; place the files locally and use
    the dataset classes' ``root`` argument instead."""
    raise RuntimeError(
        f"no network egress in this environment - cannot download {url}; "
        "provide the files locally instead"
    )

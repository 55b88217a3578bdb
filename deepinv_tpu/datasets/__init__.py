from .datagenerator import generate_dataset, HDF5Dataset
from .base import ArrayDataset, DataLoader, PatchDataset, random_split
from .phantoms import shepp_logan, SheppLoganDataset, random_circles
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
from .folder import FMD, Kohler, NBUDataset, LidcIdriSliceDataset
from .mri_slices import CMRxReconSliceDataset, SKMTEASliceDataset, MRISliceTransform

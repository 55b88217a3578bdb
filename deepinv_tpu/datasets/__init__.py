from .datagenerator import generate_dataset, HDF5Dataset
from .base import ArrayDataset, DataLoader, PatchDataset, random_split
from .phantoms import shepp_logan, SheppLoganDataset, random_circles

from .module import Module, update, is_array, partition_arrays, combine
from .tensorlist import TensorList, randn_like, zeros_like, ones_like, rand_like
from .linalg import (
    tree_add,
    tree_sub,
    tree_scale,
    tree_axpy,
    tree_vdot,
    tree_real_vdot,
    tree_norm,
    tree_zeros_like,
    tree_conj,
    power_method,
    transpose_primal,
)
from .rng import ensure_key, epoch_key, split_like

__all__ = [
    "Module",
    "update",
    "is_array",
    "partition_arrays",
    "combine",
    "TensorList",
    "randn_like",
    "zeros_like",
    "ones_like",
    "rand_like",
    "tree_add",
    "tree_sub",
    "tree_scale",
    "tree_axpy",
    "tree_vdot",
    "tree_real_vdot",
    "tree_norm",
    "tree_zeros_like",
    "tree_conj",
    "power_method",
    "transpose_primal",
    "ensure_key",
    "epoch_key",
    "split_like",
]

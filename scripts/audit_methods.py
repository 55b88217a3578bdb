"""Method-level API audit vs the reference.

For every public class exported by both a reference namespace and the
matching ``deepinv_tpu`` namespace, diff the *public callables* (methods
defined anywhere on the class, minus torch.nn.Module plumbing) and report
reference methods that our class lacks. Name-level parity is already
enforced by tests/test_namespace_parity.py; this digs one level deeper.

Usage: python scripts/audit_methods.py [namespace ...]
"""

import importlib
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

import test_namespace_parity as tnp  # reuse stub machinery


NAMESPACES = tnp.NAMESPACES

# torch.nn.Module / pytorch plumbing that has no meaning for a pytree module
TORCH_PLUMBING = {
    "add_module", "apply", "bfloat16", "buffers", "children", "compile",
    "cpu", "cuda", "double", "eval", "extra_repr", "float", "forward",
    "get_buffer", "get_extra_state", "get_parameter", "get_submodule",
    "half", "ipu", "load_state_dict", "modules", "mtia", "named_buffers",
    "named_children", "named_modules", "named_parameters", "parameters",
    "register_backward_hook", "register_buffer", "register_forward_hook",
    "register_forward_pre_hook", "register_full_backward_hook",
    "register_full_backward_pre_hook", "register_load_state_dict_post_hook",
    "register_load_state_dict_pre_hook", "register_module",
    "register_parameter", "register_state_dict_post_hook",
    "register_state_dict_pre_hook", "requires_grad_", "set_extra_state",
    "set_submodule", "share_memory", "state_dict", "to", "to_empty",
    "train", "type", "xpu", "zero_grad", "dump_patches", "call_super_init",
    "training", "T_destination",
    # dataset plumbing
    "check_dataset_exists", "download", "verify_str_arg",
    # misc torch-only helpers
    "device", "dtype",
}


class _FakeStubDir:
    pass


def _load_reference():
    import tempfile

    stub_root = tempfile.mkdtemp(prefix="refstubs")
    tnp._make_stubs(stub_root)
    sys.path.insert(0, stub_root)
    sys.path.insert(0, tnp.REFERENCE)
    import deepinv  # noqa: F401
    import timm  # noqa: F401
    return deepinv


def _public_methods(cls, strip_torch=False):
    if strip_torch:
        import torch

        bases = (torch.nn.Module, torch.Tensor, object)
    else:
        bases = ()
    out = set()
    for name in dir(cls):
        if name.startswith("_"):
            continue
        try:
            v = getattr(cls, name)
        except Exception:
            continue
        if not (callable(v) or isinstance(v, property)):
            continue
        # skip attributes inherited unchanged from torch plumbing bases
        if any(getattr(b, name, None) is v for b in bases if v is not None):
            continue
        out.add(name)
    return out


def collect_missing(sel=()):
    """Return {(ref_namespace, ClassName): [missing public methods]}."""
    out = {}
    for ref_name, tpu_name in sorted(NAMESPACES.items()):
        if sel and ref_name not in sel:
            continue
        try:
            ref_mod = importlib.import_module(ref_name)
            tpu_mod = importlib.import_module(tpu_name)
        except Exception as e:
            out[(ref_name, "__import__")] = [f"import failed: {e}"]
            continue
        for cname in sorted(n for n in dir(ref_mod) if not n.startswith("_")):
            ref_cls = getattr(ref_mod, cname)
            if not isinstance(ref_cls, type):
                continue
            tpu_cls = getattr(tpu_mod, cname, None)
            if tpu_cls is None or not isinstance(tpu_cls, type):
                continue
            ref_m = _public_methods(ref_cls, strip_torch=True) - TORCH_PLUMBING
            tpu_m = _public_methods(tpu_cls)
            missing = sorted(ref_m - tpu_m)
            if missing:
                out[(ref_name, cname)] = missing
    return out


def main():
    _load_reference()
    missing = collect_missing(sys.argv[1:])
    total = 0
    for (ns, cname), names in sorted(missing.items()):
        total += len(names)
        print(f"{ns}.{cname}: missing {names}")
    print(f"\ntotal missing methods: {total}")


if __name__ == "__main__":
    main()

"""Generate the markdown API reference from docstrings (offline).

The reference ships a sphinx autodoc API reference (docs/source/api/); this
environment has no sphinx, so this script introspects every public namespace
and emits one markdown page per subsystem under ``docs/api/`` plus an index
that links every public class and function (VERDICT r2 next-step #7).

Usage: python scripts/gen_api_docs.py
"""

import importlib
import inspect
import os
import sys
import textwrap

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

NAMESPACES = [
    ("deepinv_tpu.physics", "Physics operators"),
    ("deepinv_tpu.physics.generator", "Physics parameter generators"),
    ("deepinv_tpu.physics.functional", "Functional physics ops"),
    ("deepinv_tpu.optim", "Optimization"),
    ("deepinv_tpu.models", "Models & denoisers"),
    ("deepinv_tpu.sampling", "Sampling & diffusion"),
    ("deepinv_tpu.loss", "Losses"),
    ("deepinv_tpu.loss.metric", "Metrics"),
    ("deepinv_tpu.transform", "Transforms"),
    ("deepinv_tpu.datasets", "Datasets"),
    ("deepinv_tpu.training", "Training"),
    ("deepinv_tpu.unfolded", "Unfolded & DEQ"),
    ("deepinv_tpu.parallel", "Distributed / multi-chip"),
    ("deepinv_tpu.ops", "Low-level ops (FFT, wavelets, radon, ...)"),
    ("deepinv_tpu.utils", "Utilities"),
    ("deepinv_tpu.core", "Core (Module pytree, TensorList, rng)"),
]


def _public_names(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in dir(mod) if not n.startswith("_")]
    out = []
    for n in names:
        try:
            v = getattr(mod, n)
        except Exception:
            continue
        if inspect.ismodule(v):
            continue
        out.append((n, v))
    return out


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent=""):
    d = inspect.getdoc(obj)
    if not d:
        return ""
    return textwrap.indent(d, indent)


def _methods(cls):
    out = []
    for name, member in sorted(vars(cls).items()):
        if name.startswith("_") or name == "forward":
            continue
        if isinstance(member, property):
            out.append((name, member.fget, "property"))
        elif isinstance(member, staticmethod):
            out.append((name, member.__func__, "staticmethod"))
        elif isinstance(member, classmethod):
            out.append((name, member.__func__, "classmethod"))
        elif inspect.isfunction(member):
            out.append((name, member, "method"))
    return out


def render_namespace(ns, title):
    mod = importlib.import_module(ns)
    lines = [f"# `{ns}` — {title}", ""]
    if inspect.getdoc(mod):
        lines += [inspect.getdoc(mod), ""]
    classes, funcs = [], []
    for name, v in _public_names(mod):
        (classes if inspect.isclass(v) else funcs).append((name, v))

    if classes:
        lines += ["## Classes", ""]
        for name, cls in classes:
            lines += [f"### `{name}{_sig(cls)}`", ""]
            doc = _doc(cls)
            if doc:
                lines += [doc, ""]
            meths = _methods(cls)
            if meths:
                for mname, fn, kind in meths:
                    tag = f" *({kind})*" if kind != "method" else ""
                    sig = "" if kind == "property" else _sig(fn)
                    lines += [f"#### `{name}.{mname}{sig}`{tag}", ""]
                    mdoc = _doc(fn)
                    if mdoc:
                        lines += [mdoc, ""]
    if funcs:
        lines += ["## Functions", ""]
        for name, fn in funcs:
            if not callable(fn):
                continue
            lines += [f"### `{name}{_sig(fn)}`", ""]
            doc = _doc(fn)
            if doc:
                lines += [doc, ""]
    return "\n".join(lines) + "\n", [n for n, _ in classes], [n for n, _ in funcs]


def main():
    outdir = os.path.join(HERE, "docs", "api")
    os.makedirs(outdir, exist_ok=True)
    index = ["# API reference", "",
             "Generated from docstrings by `scripts/gen_api_docs.py` "
             "(no network / sphinx needed): `python scripts/gen_api_docs.py`.",
             ""]
    total_classes = 0
    for ns, title in NAMESPACES:
        text, classes, funcs = render_namespace(ns, title)
        fname = ns.replace("deepinv_tpu.", "").replace(".", "_") + ".md"
        with open(os.path.join(outdir, fname), "w") as f:
            f.write(text)
        total_classes += len(classes)
        links = ", ".join(
            f"[`{c}`]({fname}#{c.lower()}" + ")" for c in classes[:200])
        index += [f"## [`{ns}`]({fname}) — {title}", ""]
        if classes:
            index += [f"**Classes ({len(classes)}):** {links}", ""]
        if funcs:
            index += ["**Functions:** " + ", ".join(
                f"[`{x}`]({fname})" for x in funcs), ""]
    with open(os.path.join(outdir, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(NAMESPACES)} pages, {total_classes} classes -> docs/api/")


if __name__ == "__main__":
    main()

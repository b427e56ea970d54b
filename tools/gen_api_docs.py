"""Generate the markdown API reference from package docstrings.

Sphinx is not available in this environment, so the reference is produced
by introspection: one markdown page per public module, with class /
function signatures and docstrings. Regenerate with:

    python tools/gen_api_docs.py

Output: docs/api/<dotted.module>.md plus docs/api/index.md.
"""

from __future__ import annotations

import importlib
import inspect
import os
import pkgutil
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("MPLBACKEND", "Agg")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

OUT_DIR = os.path.join(ROOT, "docs", "api")

SKIP_MODULES = {
    # compiled data / import-time heavy or non-API modules
    "optiland_tpu.conftest",
}

SKIP_PREFIXES = ("optiland_tpu._native",)


def _iter_modules():
    import optiland_tpu

    yield "optiland_tpu"
    for info in pkgutil.walk_packages(
        optiland_tpu.__path__, prefix="optiland_tpu."
    ):
        name = info.name
        if name in SKIP_MODULES or name.startswith(SKIP_PREFIXES):
            continue
        if any(part.startswith("_") for part in name.split(".")[1:]):
            continue
        yield name


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent=""):
    d = inspect.getdoc(obj)
    if not d:
        return ""
    return "\n".join(indent + line for line in d.splitlines())


def _public_members(mod):
    """(classes, functions) defined in (or exported by) this module."""
    names = getattr(mod, "__all__", None)
    classes, funcs = [], []
    for name, obj in sorted(vars(mod).items()):
        if name.startswith("_"):
            continue
        if names is not None and name not in names:
            continue
        if inspect.ismodule(obj):
            continue
        owner = getattr(obj, "__module__", None)
        if names is None and owner != mod.__name__:
            continue  # re-export without __all__: skip
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            funcs.append((name, obj))
    return classes, funcs


def _class_section(name, cls):
    lines = [f"### class `{name}{_signature(cls)}`", ""]
    doc = _doc(cls)
    if doc:
        lines += [doc, ""]
    for mname, m in sorted(vars(cls).items()):
        if mname.startswith("_") and mname != "__init__":
            continue
        if isinstance(m, (staticmethod, classmethod)):
            m = m.__func__
        if isinstance(m, property):
            pdoc = inspect.getdoc(m)
            lines.append(f"- **{mname}** *(property)*"
                         + (f" — {pdoc.splitlines()[0]}" if pdoc else ""))
            continue
        if not inspect.isfunction(m):
            continue
        if mname == "__init__":
            continue  # signature already shown on the class line
        mdoc = inspect.getdoc(m)
        first = f" — {mdoc.splitlines()[0]}" if mdoc else ""
        lines.append(f"- **{mname}**`{_signature(m)}`{first}")
    lines.append("")
    return lines


def _module_page(name):
    try:
        mod = importlib.import_module(name)
    except Exception as e:  # pragma: no cover - defensive
        return f"# `{name}`\n\nImport failed during doc generation: {e}\n"
    lines = [f"# `{name}`", ""]
    doc = _doc(mod)
    if doc:
        lines += [doc, ""]
    classes, funcs = _public_members(mod)
    if classes:
        lines += ["## Classes", ""]
        for cname, cls in classes:
            lines += _class_section(cname, cls)
    if funcs:
        lines += ["## Functions", ""]
        for fname, fn in funcs:
            lines += [f"### `{fname}{_signature(fn)}`", ""]
            fdoc = _doc(fn)
            if fdoc:
                lines += [fdoc, ""]
    if not classes and not funcs and not doc:
        return None
    return "\n".join(lines) + "\n"


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    index = [
        "# optiland_tpu API reference",
        "",
        "Generated from docstrings by `tools/gen_api_docs.py`.",
        "",
    ]
    count = 0
    for name in _iter_modules():
        page = _module_page(name)
        if page is None:
            continue
        fname = name + ".md"
        with open(os.path.join(OUT_DIR, fname), "w") as fh:
            fh.write(page)
        first = ""
        try:
            mod = importlib.import_module(name)
            d = inspect.getdoc(mod)
            if d:
                first = " — " + d.splitlines()[0]
        except Exception:
            pass
        index.append(f"- [`{name}`]({fname}){first}")
        count += 1
    with open(os.path.join(OUT_DIR, "index.md"), "w") as fh:
        fh.write("\n".join(index) + "\n")
    print(f"wrote {count} module pages to {OUT_DIR}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Documentation builder: sphinx-build when available, pure-stdlib API-page
generation otherwise.

This image ships no sphinx wheel, so the fallback walks the same module list
as ``docs/api/*.rst`` and renders one markdown page per module from live
docstrings/signatures into ``docs/_build/api/`` (plus an index). The output
is intentionally plain markdown — readable in any viewer, and identical in
coverage to what autodoc would emit.

Usage:
    python scripts/build_docs.py [outdir]    # default docs/_build
"""

from __future__ import annotations

import importlib
import inspect
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODULES = [
    "sspv_tpu.config",
    "sspv_tpu.signal_processing",
    "sspv_tpu.ops.pipeline",
    "sspv_tpu.ops.windows",
    "sspv_tpu.ops.preprocessing",
    "sspv_tpu.ops.time_features",
    "sspv_tpu.ops.frequency_features",
    "sspv_tpu.ops.vad",
    "sspv_tpu.ops.pitch",
    "sspv_tpu.ops.bases",
    "sspv_tpu.runtime.engine",
    "sspv_tpu.runtime.audio_source",
    "sspv_tpu.parallel.mesh",
    "sspv_tpu.serve",
    "sspv_tpu.batch",
    "sspv_tpu.ui",
    "sspv_tpu.ui.plots",
    "sspv_tpu.ui.headless",
    "sspv_tpu.ui.qt",
]


def _try_sphinx(outdir: str) -> bool:
    if shutil.which("sphinx-build") is None:
        return False
    rc = subprocess.call(
        ["sphinx-build", "-b", "html", os.path.join(REPO, "docs"),
         os.path.join(outdir, "html")]
    )
    return rc == 0


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj) -> str:
    return inspect.getdoc(obj) or ""


def _render_module(name: str) -> str:
    mod = importlib.import_module(name)
    out = [f"# `{name}`", "", _doc(mod), ""]
    public = getattr(mod, "__all__", None)

    def wanted(n, o):
        if public is not None:
            return n in public
        return not n.startswith("_") and getattr(o, "__module__", name) == name

    for n, obj in sorted(vars(mod).items()):
        if inspect.isclass(obj) and wanted(n, obj):
            out += [f"## class `{n}{_sig(obj)}`", "", _doc(obj), ""]
            for mn, m in sorted(vars(obj).items()):
                if mn.startswith("_") and mn != "__init__":
                    continue
                if callable(m) or isinstance(m, (staticmethod, classmethod)):
                    fn = m.__func__ if isinstance(m, (staticmethod, classmethod)) else m
                    if callable(fn):
                        out += [f"### `{n}.{mn}{_sig(fn)}`", "", _doc(fn), ""]
        elif inspect.isfunction(obj) and wanted(n, obj):
            out += [f"## `{n}{_sig(obj)}`", "", _doc(obj), ""]
    return "\n".join(out)


def _fallback(outdir: str) -> None:
    api_dir = os.path.join(outdir, "api")
    os.makedirs(api_dir, exist_ok=True)
    index = ["# sspv_tpu API reference", "",
             "Generated from live docstrings by `scripts/build_docs.py` "
             "(sphinx-less fallback; with sphinx installed, `sphinx-build "
             "-b html docs docs/_build/html` builds the full site).", ""]
    for name in MODULES:
        fname = name.replace(".", "_") + ".md"
        try:
            text = _render_module(name)
        except Exception as e:  # e.g. optional UI deps
            text = f"# `{name}`\n\n(import failed at docs-build time: {e})\n"
        with open(os.path.join(api_dir, fname), "w") as f:
            f.write(text)
        index.append(f"- [{name}](api/{fname})")
    for md in ("architecture", "algorithms", "benchmarks", "development", "faq"):
        index.append(f"- [{md}](../{md}.md)")
    with open(os.path.join(outdir, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES)} API pages + index under {outdir}")


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "docs", "_build")
    os.makedirs(outdir, exist_ok=True)
    if _try_sphinx(outdir):
        print(f"sphinx-build succeeded -> {outdir}/html")
        return
    _fallback(outdir)


if __name__ == "__main__":
    main()

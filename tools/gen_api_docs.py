"""Generate the docs/api/ reference tree from the package's live docstrings.

The torch reference ships per-module API reference pages under its mkdocs
site (/root/reference/docs/en/reference/ — one page per source module,
mkdocstrings-rendered). This does the equivalent without any docs
toolchain: introspect each public module, emit one markdown page per
module with class/function signatures + docstrings, and an index page.

Run: python tools/gen_api_docs.py   (writes docs/api/*.md)
Tested by tests/test_docs.py::test_api_reference_generated.
"""

import importlib
import inspect
import os
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "docs", "api")

# public modules, grouped the way the reference's reference/ tree groups its
# pages (nn/engine/data/utils/models/trackers/solutions)
MODULES = {
    "engine": [
        "lpc_yolo_tpu.engine.model",
        "lpc_yolo_tpu.engine.trainer",
        "lpc_yolo_tpu.engine.validator",
        "lpc_yolo_tpu.engine.predictor",
        "lpc_yolo_tpu.engine.results",
        "lpc_yolo_tpu.engine.exporter",
        "lpc_yolo_tpu.engine.tuner",
        "lpc_yolo_tpu.engine.train_step",
    ],
    "nn": [
        "lpc_yolo_tpu.nn.compiler",
        "lpc_yolo_tpu.nn.modules",
        "lpc_yolo_tpu.nn.heads",
        "lpc_yolo_tpu.nn.transformer",
        "lpc_yolo_tpu.nn.fuse",
        "lpc_yolo_tpu.nn.autobackend",
    ],
    "data": [
        "lpc_yolo_tpu.data.dataset",
        "lpc_yolo_tpu.data.augment",
        "lpc_yolo_tpu.data.build",
        "lpc_yolo_tpu.data.loaders",
        "lpc_yolo_tpu.data.converter",
        "lpc_yolo_tpu.data.explorer",
    ],
    "ops": [
        "lpc_yolo_tpu.ops.postprocess",
        "lpc_yolo_tpu.ops.boxes",
        "lpc_yolo_tpu.ops.masks",
        "lpc_yolo_tpu.ops.letterbox",
        "lpc_yolo_tpu.ops.anchors",
        "lpc_yolo_tpu.ops.pallas_preprocess",
    ],
    "losses": [
        "lpc_yolo_tpu.losses.detection",
        "lpc_yolo_tpu.losses.tal",
        "lpc_yolo_tpu.losses.segment",
        "lpc_yolo_tpu.losses.pose",
        "lpc_yolo_tpu.losses.obb",
        "lpc_yolo_tpu.losses.detr",
    ],
    "utils": [
        "lpc_yolo_tpu.utils.metrics",
        "lpc_yolo_tpu.utils.cocoeval",
        "lpc_yolo_tpu.utils.checkpoint",
        "lpc_yolo_tpu.utils.callbacks",
        "lpc_yolo_tpu.utils.autobatch",
        "lpc_yolo_tpu.utils.benchmarks",
        "lpc_yolo_tpu.utils.infra",
        "lpc_yolo_tpu.utils.downloads",
        "lpc_yolo_tpu.utils.plotting",
        "lpc_yolo_tpu.utils.profilers",
        "lpc_yolo_tpu.utils.checks",
        "lpc_yolo_tpu.utils.torch_port",
    ],
    "parallel": [
        "lpc_yolo_tpu.parallel.mesh",
        "lpc_yolo_tpu.parallel.distributed",
    ],
    "models": [
        "lpc_yolo_tpu.models.sam",
        "lpc_yolo_tpu.models.fastsam",
        "lpc_yolo_tpu.models.nas",
    ],
    "trackers": [
        "lpc_yolo_tpu.trackers.byte_tracker",
        "lpc_yolo_tpu.trackers.bot_sort",
        "lpc_yolo_tpu.trackers.kalman_filter",
        "lpc_yolo_tpu.trackers.matching",
        "lpc_yolo_tpu.trackers.gmc",
    ],
    "solutions": [
        "lpc_yolo_tpu.solutions",
    ],
}


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, limit=40):
    d = inspect.getdoc(obj) or ""
    lines = d.splitlines()
    if len(lines) > limit:
        lines = lines[:limit] + ["…"]
    return "\n".join(lines)


def render_module(modname):
    mod = importlib.import_module(modname)
    parts = [f"# `{modname}`", ""]
    if mod.__doc__:
        parts += [_doc(mod), ""]
    pub = [
        (n, o)
        for n, o in vars(mod).items()
        if not n.startswith("_") and getattr(o, "__module__", None) == modname
    ]
    classes = [(n, o) for n, o in pub if inspect.isclass(o)]
    funcs = [(n, o) for n, o in pub if inspect.isfunction(o)]
    for name, cls in classes:
        parts += [f"## class `{name}{_sig(cls)}`", ""]
        if cls.__doc__:
            parts += [_doc(cls), ""]
        for mname, m in vars(cls).items():
            if mname.startswith("_") or not inspect.isfunction(m):
                continue
            parts += [f"### `{name}.{mname}{_sig(m)}`", ""]
            if m.__doc__:
                parts += [textwrap.indent(_doc(m, 20), ""), ""]
    for name, fn in funcs:
        parts += [f"## `{name}{_sig(fn)}`", ""]
        if fn.__doc__:
            parts += [_doc(fn, 20), ""]
    return "\n".join(parts) + "\n"


def main():
    os.makedirs(OUT, exist_ok=True)
    index = [
        "# API reference",
        "",
        "Generated from the live docstrings by `tools/gen_api_docs.py`",
        "(the reference renders its `docs/en/reference/` tree from docstrings",
        "with mkdocstrings; this is the dependency-free equivalent).",
        "",
    ]
    for group, mods in MODULES.items():
        index += [f"## {group}", ""]
        for modname in mods:
            fname = modname.replace("lpc_yolo_tpu.", "").replace(".", "-") + ".md"
            try:
                md = render_module(modname)
            except Exception as e:  # keep the generator total
                print(f"SKIP {modname}: {e}")
                continue
            with open(os.path.join(OUT, fname), "w") as f:
                f.write(md)
            index.append(f"- [`{modname}`]({fname})")
        index.append("")
    with open(os.path.join(OUT, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote docs/api/ ({len(os.listdir(OUT))} pages)")


if __name__ == "__main__":
    main()

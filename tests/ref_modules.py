"""Load the reference's OWN torch modules for direct-execution goldens.

`/root/reference` is public untrusted content mounted read-only. Only four
modules are loaded, each with an import surface audited by hand before
execution (torch / PIL / numpy / itertools / math, plus a stubbed
`torchvision` whose symbols the needed classes never touch —
model/model.py:10 imports it but FeatureExtractor/CorrNeigh/heads don't use
it). We execute only their public functions/classes on tensors constructed
in the tests; no code paths that touch the filesystem or network exist in
these modules.

CPU shims: the reference targets a CUDA box and calls ``.cuda()`` /
``torch.cuda.FloatTensor`` unconditionally (utils/outil.py:86,
model/ssimLoss.py:7,40,44); this image's torch is CPU-only, so those are
mapped to CPU no-ops/equivalents before loading. The shims change WHERE the
reference computes, never WHAT.
"""

import importlib.util
import os
import sys
import types

import torch

REF_ROOT = "/root/reference"

_cache = {}


def reference_available():
    return os.path.isfile(os.path.join(REF_ROOT, "utils", "outil.py"))


def _install_cpu_shims():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor


def _load(name, relpath):
    if name in _cache:
        return _cache[name]
    path = os.path.join(REF_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _cache[name] = mod
    return mod


def load_reference_modules():
    """Load and return {outil, downsample, ssim, model} reference modules."""
    _install_cpu_shims()
    outil = _load("ref_outil", "utils/outil.py")
    # model/model.py does `from downsample import Downsample`; register the
    # real reference module under that name first
    downsample = _load("downsample", "model/downsample.py")
    ssim = _load("ref_ssimLoss", "model/ssimLoss.py")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    model = _load("ref_model", "model/model.py")
    return {
        "outil": outil,
        "downsample": downsample,
        "ssim": ssim,
        "model": model,
    }


def extract_reference_functions(relpath, names, extra_globals=None):
    """AST-extract named top-level functions from a reference SCRIPT.

    The evaluation getResults.py files cannot be imported: they run an
    argparse + dataset main loop at module top level and import packages
    absent from this image (kornia, torchvision, pandas, sklearn). Their
    *metric functions*, however, are pure numpy/torch/cv2/scipy — so we
    parse the file, keep only the requested ``def`` nodes, and exec just
    those in a controlled namespace (same untrusted-content posture as
    `load_reference_modules`: only audited functions are executed, on
    tensors the tests construct).

    Returns {name: function}.
    """
    import ast

    import numpy as np

    path = os.path.join(REF_ROOT, relpath)
    with open(path) as f:
        tree = ast.parse(f.read())
    found = {
        node.name: node
        for node in tree.body
        if isinstance(node, ast.FunctionDef) and node.name in names
    }
    missing = set(names) - set(found)
    if missing:
        raise KeyError(f"{relpath}: functions not found: {sorted(missing)}")
    module = ast.Module(
        body=[found[n] for n in names], type_ignores=[]
    )
    code = compile(module, path, "exec")
    ns = {"np": np, "numpy": np, "torch": torch}
    ns.update(extra_globals or {})
    exec(code, ns)
    return {n: ns[n] for n in names}


class _F12Namespace:
    """`torch.nn.functional` with torch-1.2 defaults — the environment the
    reference ran under: grid_sample was unconditionally align_corners=True
    (the kwarg only appeared in torch 1.3); interpolate already defaulted
    to align_corners=False. Everything else passes through."""

    def __getattr__(self, name):
        import torch.nn.functional as F

        return getattr(F, name)

    @staticmethod
    def grid_sample(*a, **k):
        import torch.nn.functional as F

        return F.grid_sample(*a, align_corners=True, **k)


F12 = _F12Namespace()


class skimage_measure_shim:
    """Stand-in for `skimage.measure` (not installed): `label` with
    skimage's 2-D defaults (full 8-connectivity, background=0), built on
    scipy.ndimage. The reference's cc functions only iterate unique labels,
    so label *order* differences cannot matter."""

    @staticmethod
    def label(x, background=0):
        import numpy as np
        from scipy import ndimage

        assert background == 0
        labels, _ = ndimage.label(x, structure=np.ones((3,) * x.ndim))
        return labels

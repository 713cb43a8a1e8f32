"""Import reference (PyTorch) modules as test oracles.

The reference depends on packages absent from this environment (gin,
pyhocon, ...); we install minimal no-op stubs in sys.modules so that the
pure-math modules import cleanly on CPU. Only used in tests, only for
parity oracles — none of this code ships in robir_tpu.
"""

from __future__ import annotations

import importlib
import sys
import types

from tests.conftest import REFERENCE_ROOT


def _make_gin_stub() -> types.ModuleType:
    gin = types.ModuleType("gin")

    def _identity_decorator(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(obj):
            return obj

        return deco

    gin.configurable = _identity_decorator
    gin.register = _identity_decorator

    class _ConfigurableReference:
        def __init__(self, *a, **k):
            pass

    gin.config = types.SimpleNamespace(external_configurable=_identity_decorator)
    gin.external_configurable = lambda fn, *a, **k: fn
    gin.add_config_file_search_path = lambda *a, **k: None
    gin.parse_config_files_and_bindings = lambda *a, **k: None
    gin.operative_config_str = lambda: ""
    gin.REQUIRED = object()
    return gin


def _make_torch_scatter_stub() -> types.ModuleType:
    """CPU scatter_min equivalent of the CUDA torch_scatter extension —
    only used by reference test-oracle code paths (utils/octree.py:588)."""
    import torch

    mod = types.ModuleType("torch_scatter")

    def scatter_min(src, index, dim=0):
        n = int(index.max()) + 1 if index.numel() else 0
        out = torch.full((n,), src.max() + 1 if src.numel() else 0,
                         dtype=src.dtype)
        arg = torch.zeros(n, dtype=torch.long)
        for i in range(src.numel()):
            s, idx = src[i], index[i]
            if s < out[idx]:
                out[idx] = s
                arg[idx] = i
        return out, arg

    mod.scatter_min = scatter_min
    return mod


def _make_torchvision_stub() -> types.ModuleType:
    mod = types.ModuleType("torchvision")
    utils = types.ModuleType("torchvision.utils")

    def make_grid(tensor, nrow=8, **kw):
        return tensor  # only imported, not exercised, by oracle paths

    utils.make_grid = make_grid
    utils.save_image = lambda *a, **k: None
    mod.utils = utils
    sys.modules["torchvision.utils"] = utils
    return mod


_STUBS = {"gin": _make_gin_stub, "torch_scatter": _make_torch_scatter_stub,
          "torchvision": _make_torchvision_stub}


def patch_torch_cpu() -> None:
    """Make reference modules with hard-coded .cuda()/device='cuda' calls
    runnable on CPU-only torch (test oracles only)."""
    import torch
    if getattr(torch, "_robir_cpu_patched", False):
        return

    def _wrap(orig):
        def fn(*a, **k):
            dev = k.get("device")
            if dev == "cuda" or (isinstance(dev, torch.device) and dev.type == "cuda"):
                k["device"] = "cpu"
            return orig(*a, **k)

        return fn

    for name in ["zeros", "ones", "randn", "rand", "empty", "tensor",
                 "linspace", "arange", "full", "randperm"]:
        setattr(torch, name, _wrap(getattr(torch, name)))
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch._robir_cpu_patched = True


def _install_stubs() -> None:
    # some reference modules call imageio.plugins.freeimage.download() at
    # import time; there is no network egress here
    try:
        import imageio
        imageio.plugins.freeimage.download = lambda *a, **k: None
    except Exception:
        pass
    # the reference's plain 'datasets' directory (no __init__.py) loses to
    # the installed huggingface 'datasets' package; point the module name at
    # the reference tree explicitly
    if "datasets" not in sys.modules or not getattr(
            sys.modules["datasets"], "_robir_reference", False):
        mod = types.ModuleType("datasets")
        mod.__path__ = [REFERENCE_ROOT + "/datasets"]
        mod._robir_reference = True
        sys.modules["datasets"] = mod
    for name, maker in _STUBS.items():
        if name not in sys.modules:
            try:
                importlib.import_module(name)
            except ImportError:
                sys.modules[name] = maker()


def import_reference_module(dotted: str):
    """Import e.g. 'model.sg_render' from the reference tree (stage-2 root)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_stubs()
    return importlib.import_module(dotted)


def import_neus_module(dotted: str):
    """Import e.g. 'volume_render.sdf_render' from the reference neus/ tree.

    Note: do NOT import the neus 'model' package this way — it collides with
    the stage-2 root 'model' package. Tests duck-type ISDF instead.
    """
    neus_root = REFERENCE_ROOT + "/neus"
    if neus_root not in sys.path:
        sys.path.insert(0, neus_root)
    _install_stubs()
    return importlib.import_module(dotted)

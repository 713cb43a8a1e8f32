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


_STUBS = {"gin": _make_gin_stub}


def _install_stubs() -> None:
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

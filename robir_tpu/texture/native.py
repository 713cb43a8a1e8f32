"""ctypes bindings for the C++ geometry kernels (native/robir_native.cpp).

Builds the shared library on first use if missing (g++ is in the image;
pybind11 is not, hence the plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

# ROBIR_NATIVE_DIR points non-editable installs at a checkout of native/;
# the default resolves the repo-root layout used by `pip install -e .`.
_NATIVE_DIR = os.environ.get(
    "ROBIR_NATIVE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "librobir_native.so")
_lock = threading.Lock()
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_NATIVE_DIR, "robir_native.cpp"))):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)

        lib.marching_tetrahedra.restype = ctypes.c_int
        lib.marching_tetrahedra.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.rasterize_attributes.restype = ctypes.c_int
        lib.rasterize_attributes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.atlas_parameterize.restype = ctypes.c_int
        lib.atlas_parameterize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,  # merge_frac (tiny-chart merge threshold)
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ]
        lib.free_buffer.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def marching_tetrahedra(grid: np.ndarray, bbox_min, bbox_max,
                        iso: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """SDF grid [nx, ny, nz] -> (verts [V, 3] float32, tris [T, 3] int32).

    Replacement for PyMCubes marching cubes
    (ref neus/optimization/extraction.py:35); marching tetrahedra gives the
    same iso-surface with a simpler case table.
    """
    lib = _load()
    grid = np.ascontiguousarray(grid, np.float32)
    lo = np.asarray(bbox_min, np.float32)
    hi = np.asarray(bbox_max, np.float32)
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib.marching_tetrahedra(
        _fptr(grid), grid.shape[0], grid.shape[1], grid.shape[2],
        _fptr(lo), _fptr(hi), ctypes.c_float(iso),
        ctypes.byref(verts_p), ctypes.byref(nv),
        ctypes.byref(tris_p), ctypes.byref(nt))
    if rc != 0:
        raise RuntimeError(f"marching_tetrahedra failed rc={rc}")
    verts = np.ctypeslib.as_array(verts_p, (nv.value, 3)).copy()
    tris = np.ctypeslib.as_array(tris_p, (nt.value, 3)).copy()
    lib.free_buffer(verts_p)
    lib.free_buffer(tris_p)
    return verts, tris


def rasterize_attributes(uv: np.ndarray, tris: np.ndarray, attrs: np.ndarray,
                         h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Barycentric-rasterize per-vertex attrs into texture space.

    uv [V, 2] in [0,1], tris [T, 3], attrs [V, D] -> (img [H, W, D],
    mask [H, W]). Replacement for the GLFW/GLSL rasterizer
    (ref model/rasterizor.py:171-205).
    """
    lib = _load()
    uv = np.ascontiguousarray(uv, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    attrs = np.ascontiguousarray(attrs, np.float32)
    d = attrs.shape[1]
    img = np.zeros((h, w, d), np.float32)
    mask = np.zeros((h, w), np.float32)
    rc = lib.rasterize_attributes(_fptr(uv), _iptr(tris), tris.shape[0],
                                  _fptr(attrs), d, h, w, _fptr(img), _fptr(mask))
    if rc != 0:
        raise RuntimeError(f"rasterize_attributes failed rc={rc}")
    return img, mask


def _warn_if_overlapping(util: float, uv: np.ndarray, res: int = 1024,
                         floor: float = 0.90) -> float:
    """Cheap overlap tripwire on the winning parameterization.

    The |triangle area| utilization metric cannot see overlapping charts
    — the round-5 incomplete-pack bug produced atlases whose corrupt
    packs *scored higher* (STATUS.md). Rasterize the UV union and warn
    when covered/union falls well below the summed area (rasterization
    undercounts tiny charts slightly, hence the loose floor). Returns
    the union ratio."""
    n = uv.shape[0] // 3
    tris = np.arange(n * 3, dtype=np.int32).reshape(-1, 3)
    _, cov = rasterize_attributes(uv, tris, np.ones((n * 3, 1), np.float32),
                                  res, res)
    ratio = float(cov.sum()) / (res * res) / max(util, 1e-9)
    if ratio < floor:
        import sys
        print(f"WARNING: atlas UV union covers only {ratio:.2f} of the "
              f"summed triangle area — charts overlap; the texture bake "
              f"will bleed (atlas_parameterize internal error)",
              file=sys.stderr, flush=True)
    return ratio


def atlas_parameterize(verts: np.ndarray, tris: np.ndarray,
                       normal_thresh: float | None = None,
                       padding_px: int = 4,
                       atlas_res: int = 2048,
                       chart_mode: int = 0,
                       merge_frac: float | None = None,
                       ) -> tuple[np.ndarray, np.ndarray, int]:
    """UV-parameterize a mesh (xatlas equivalent; ref
    model/texture_model.py:14-21).

    ``normal_thresh`` None (default) runs a best-of portfolio: thresholds
    {0.55, 0.6, 0.65, 0.75} x tiny-chart merge {off, 0.002}, keeping the
    parameterization with the higher triangle-area utilization — the
    packing outcome is noisy (+-0.03) in the chart granularity and no
    value dominates across meshes (sphere best at 0.65, two_sphere at
    0.55, noisy-bump at 0.60). The merge arm is the big lever on
    TRAINED-SDF meshes, whose residual normal noise fragments growth:
    round-5 honest re-measurement (after fixing the incomplete-pack
    overlap bug that had corrupted the r4 probe numbers) reads a fresh
    593k-tri trained mesh at 0.682 merge-off vs 0.699 at merge 0.002
    with injectivity-safe 0.8 confidence — and the merge arms run ~6x
    faster (packing is chart-count-bound), so the portfolio costs ~15%
    extra. Analytic meshes prefer merge-off (noisy-bump 0.624 vs 0.619);
    best-of picks per mesh. Other shaping levers (min-rect rotation,
    boundary relocation, stronger smoothing, finer splitting) measured
    net negative or mixed and stay env-gated probes
    (tools/atlas_trained_probe.py, STATUS.md trail).

    ``chart_mode`` 0 (default) grows charts against the area-weighted
    running-mean normal over smoothed face normals; 1 clusters faces by
    dominant normal axis (compact distortion-bounded caps — MEASURED
    WORSE for packing: round caps do not nest, see STATUS.md round-4
    notes). Returns (uv [T*3, 2], vert_idx [T*3] into the original
    vertex array, n_charts). Chart boundaries split vertices, like
    xatlas.
    """
    if normal_thresh is None:
        best = None
        merge_arms = (0.0, 0.002) if merge_frac is None else (merge_frac,)
        for mf in merge_arms:
            for th in (0.55, 0.6, 0.65, 0.75):
                uv, idx, nc = atlas_parameterize(verts, tris, th,
                                                 padding_px, atlas_res,
                                                 chart_mode, mf)
                tri_uv = uv.reshape(-1, 3, 2)
                e1 = tri_uv[:, 1] - tri_uv[:, 0]
                e2 = tri_uv[:, 2] - tri_uv[:, 0]
                util = float(np.abs(e1[:, 0] * e2[:, 1]
                                    - e1[:, 1] * e2[:, 0]).sum() * 0.5)
                if best is None or util > best[0]:
                    best = (util, uv, idx, nc)
        _warn_if_overlapping(best[0], best[1])
        return best[1], best[2], best[3]
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    uv_p = ctypes.POINTER(ctypes.c_float)()
    idx_p = ctypes.POINTER(ctypes.c_int)()
    n_charts = lib.atlas_parameterize(
        _fptr(verts), verts.shape[0], _iptr(tris), tris.shape[0],
        ctypes.c_float(normal_thresh), padding_px, atlas_res, chart_mode,
        ctypes.c_float(merge_frac or 0.0),
        ctypes.byref(uv_p), ctypes.byref(idx_p))
    if n_charts < 0:
        raise RuntimeError("atlas_parameterize failed")
    n = tris.shape[0] * 3
    uv = np.ctypeslib.as_array(uv_p, (n, 2)).copy()
    idx = np.ctypeslib.as_array(idx_p, (n,)).copy()
    lib.free_buffer(uv_p)
    lib.free_buffer(idx_p)
    return uv, idx, n_charts

"""PBR texture extraction: bake learned materials into texture maps + OBJ.

Capability parity with ``scripts/tex_extract.py`` (which slices textures
out of rendered plot grids and exports a PBR ``.obj`` via trimesh,
``:15-77``). Here the materials are sampled *directly* in texture space —
every valid texel's 3D position is queried through the material network —
which is strictly more accurate than cropping plot images.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..render.stage2 import Stage2Config, Stage2Model
from ..texture.pipeline import TexSampler
from .plots import _save, tonemap


def extract_textures(params: dict, cfg: Stage2Config, mesh_path: str,
                     out_dir: str, resolution: int = 1024,
                     chunk: int = 65536) -> dict:
    """Bake albedo/roughness/metallic/normal maps and export mesh.obj +
    mesh.mtl referencing them."""
    model = Stage2Model(params, cfg)
    sampler = TexSampler(mesh_path, resolution)
    os.makedirs(out_dir, exist_ok=True)

    H = W = resolution
    u, v = np.meshgrid(np.linspace(0, 1, W, dtype=np.float32),
                       np.linspace(0, 1, H, dtype=np.float32), indexing="xy")
    from ..texture.pipeline import bilinear_sample
    uv = np.stack([u, v], -1).reshape(-1, 2)
    verts = bilinear_sample(sampler.vert, uv) * sampler.coord_scale
    mask = bilinear_sample(sampler.maskf, uv)[:, 0] > 0.1

    mat_fn = jax.jit(lambda x: model.material(x, key=None, train_spec=False))
    albedo = np.zeros((H * W, 3), np.float32)
    rough = np.zeros((H * W, 1), np.float32)
    metal = np.zeros((H * W, 1), np.float32)
    normal = np.zeros((H * W, 3), np.float32)
    for i in range(0, H * W, chunk):
        sl = slice(i, min(i + chunk, H * W))
        block = verts[sl]
        pad = chunk - block.shape[0]
        if pad:
            block = np.concatenate([block, np.zeros((pad, 3), np.float32)])
        m = mat_fn(jnp.asarray(block))
        cut = chunk - pad if pad else chunk
        albedo[sl] = np.asarray(m.diffuse_albedo)[:cut]
        rough[sl] = np.asarray(m.roughness)[:cut]
        metal[sl] = np.asarray(m.metallic)[:cut]
        normal[sl] = np.asarray(m.normal_map)[:cut]

    m3 = mask[:, None]
    maps = {
        "albedo": tonemap((albedo * m3).reshape(H, W, 3)),
        "roughness": (rough * m3).reshape(H, W, 1).repeat(3, -1),
        "metallic": (metal * m3).reshape(H, W, 1).repeat(3, -1),
        "normal": ((normal * 0.5 + 0.5) * m3).reshape(H, W, 3),
    }
    for name, img in maps.items():
        _save(os.path.join(out_dir, f"{name}.png"), img)

    # export mesh with UVs + MTL (scripts/tex_extract.py:40-77 analog)
    from ..texture.pipeline import TextureCache
    cache = TextureCache(mesh_path)
    obj_path = os.path.join(out_dir, "mesh.obj")
    cache.mesh.export_obj(obj_path, uv=cache.uv, mtl_name="mesh")
    with open(os.path.join(out_dir, "mesh.mtl"), "w") as f:
        f.write("newmtl mesh\nmap_Kd albedo.png\nmap_Ns roughness.png\n"
                "map_refl metallic.png\nmap_bump normal.png\n")
    return maps


def mutual_information(img_a: np.ndarray, img_b: np.ndarray,
                       bins: int = 64) -> float:
    """Sobel-edge mutual information between two maps — the shadow-removal
    quality metric (``scripts/mutual_info.py:19-39``): high MI between the
    lighting map and the albedo map means shadows leaked into albedo."""
    def sobel_mag(img):
        g = img.mean(-1) if img.ndim == 3 else img
        kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
        ky = kx.T
        from scipy.signal import convolve2d
        gx = convolve2d(g, kx, mode="same")
        gy = convolve2d(g, ky, mode="same")
        return np.sqrt(gx ** 2 + gy ** 2)

    ea, eb = sobel_mag(img_a).ravel(), sobel_mag(img_b).ravel()
    hist, _, _ = np.histogram2d(ea, eb, bins=bins)
    pxy = hist / np.clip(hist.sum(), 1, None)
    px = pxy.sum(1, keepdims=True)
    py = pxy.sum(0, keepdims=True)
    nz = pxy > 0
    return float(np.sum(pxy[nz] * np.log(pxy[nz] / (px @ py)[nz])))

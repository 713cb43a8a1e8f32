"""Mesh container + extraction + PLY/OBJ IO (trimesh-free).

Replaces the reference's trimesh/PyMCubes usage for mesh export
(``neus/optimization/extraction.py``, ``scripts/tex_extract.py:40-77``).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class Mesh:
    verts: np.ndarray  # [V, 3] float32
    tris: np.ndarray   # [T, 3] int32

    def vertex_normals(self) -> np.ndarray:
        v, t = self.verts, self.tris
        fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
        out = np.zeros_like(v)
        for c in range(3):
            np.add.at(out, t[:, c], fn)
        return out / np.clip(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12, None)

    def bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return self.verts.min(0), self.verts.max(0)

    # ---------------------------------------------------------------- IO --

    def export_ply(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            header = (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(self.verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element face {len(self.tris)}\n"
                "property list uchar int vertex_indices\nend_header\n")
            f.write(header.encode())
            f.write(self.verts.astype("<f4").tobytes())
            face = np.empty((len(self.tris), 13), np.uint8)
            face[:, 0] = 3
            face[:, 1:] = self.tris.astype("<i4").view(np.uint8).reshape(-1, 12)
            f.write(face.tobytes())

    def export_obj(self, path: str, uv: np.ndarray | None = None,
                   uv_idx: np.ndarray | None = None,
                   mtl_name: str | None = None) -> None:
        """OBJ with optional per-corner UVs (uv [T*3, 2] like
        atlas_parameterize output)."""
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        lines = []
        if mtl_name:
            lines.append(f"mtllib {mtl_name}.mtl")
            lines.append(f"usemtl {mtl_name}")
        for v in self.verts:
            lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
        if uv is not None:
            for t in uv:
                lines.append(f"vt {t[0]:.6f} {t[1]:.6f}")
            for i, tri in enumerate(self.tris):
                c = 3 * i
                lines.append(
                    f"f {tri[0]+1}/{c+1} {tri[1]+1}/{c+2} {tri[2]+1}/{c+3}")
        else:
            for tri in self.tris:
                lines.append(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    @classmethod
    def load_ply(cls, path: str) -> "Mesh":
        with open(path, "rb") as f:
            data = f.read()
        head_end = data.index(b"end_header\n") + len(b"end_header\n")
        header = data[:head_end].decode()
        n_v = n_f = 0
        binary = "binary_little_endian" in header
        for line in header.splitlines():
            if line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element face"):
                n_f = int(line.split()[-1])
        if binary:
            verts = np.frombuffer(data, "<f4", n_v * 3, head_end).reshape(-1, 3)
            off = head_end + n_v * 12
            face = np.frombuffer(data, np.uint8, n_f * 13, off).reshape(-1, 13)
            tris = face[:, 1:].copy().view("<i4").reshape(-1, 3)
        else:
            body = data[head_end:].decode().split()
            verts = np.array(body[:n_v * 3], np.float32).reshape(-1, 3)
            rest = body[n_v * 3:]
            tris = np.array(rest, np.int32).reshape(-1, 4)[:, 1:]
        return cls(np.ascontiguousarray(verts, np.float32),
                   np.ascontiguousarray(tris, np.int32))


def extract_mesh(sdf_fn, bbox_min=(-1.2, -1.2, -1.2), bbox_max=(1.2, 1.2, 1.2),
                 resolution: int = 128, iso: float = 0.0,
                 chunk: int = 65536) -> Mesh:
    """SDF -> mesh via chunked grid eval + native marching tetrahedra.
    Parity: ``extract_fields``/``extract_mesh``
    (neus/optimization/extraction.py:12-49)."""
    import jax
    import jax.numpy as jnp

    from .native import marching_tetrahedra

    lo = np.asarray(bbox_min, np.float32)
    hi = np.asarray(bbox_max, np.float32)
    axes = [np.linspace(lo[i], hi[i], resolution, dtype=np.float32)
            for i in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    eval_fn = jax.jit(lambda x: sdf_fn(x).reshape(-1))
    vals = []
    for i in range(0, pts.shape[0], chunk):
        block = pts[i:i + chunk]
        pad = chunk - block.shape[0]
        if pad:
            block = np.concatenate([block, np.zeros((pad, 3), np.float32)])
        v = np.asarray(eval_fn(jnp.asarray(block)))
        vals.append(v[:chunk - pad] if pad else v)
    grid = np.concatenate(vals).reshape(resolution, resolution, resolution)
    verts, tris = marching_tetrahedra(grid, lo, hi, iso)
    return Mesh(verts, tris)

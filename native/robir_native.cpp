// robir_native: host-side geometry kernels for the RobIR-TPU framework.
//
// Replaces the reference's third-party native dependencies (SURVEY.md 2.9):
//   - PyMCubes (C++ ext)       -> marching_tetrahedra(): iso-surface mesh
//                                 extraction from an SDF grid
//                                 (ref: neus/optimization/extraction.py:35)
//   - PyOpenGL + GLFW + GLSL   -> rasterize_attributes(): barycentric
//                                 triangle fill of per-vertex attributes
//                                 into texture-space float images
//                                 (ref: model/rasterizor.py:136-205)
//   - xatlas (C++ ext)         -> atlas_parameterize(): normal-clustered
//                                 chart growing + planar projection +
//                                 shelf packing
//                                 (ref: model/texture_model.py:14-21)
//
// Plain C ABI for ctypes; all buffers are caller-owned or malloc'd here and
// released via free_buffer().

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <queue>

extern "C" {

void free_buffer(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Marching tetrahedra
// ---------------------------------------------------------------------------

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 lerp_vert(const Vec3& a, const Vec3& b, float fa, float fb,
                             float iso) {
  float t = (iso - fa) / (fb - fa + 1e-20f);
  if (t < 0.f) t = 0.f;
  if (t > 1.f) t = 1.f;
  return {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y), a.z + t * (b.z - a.z)};
}

struct EdgeKey {
  int64_t a, b;
  bool operator==(const EdgeKey& o) const { return a == o.a && b == o.b; }
};
struct EdgeKeyHash {
  size_t operator()(const EdgeKey& k) const {
    return std::hash<int64_t>()(k.a * 0x9E3779B97F4A7C15LL ^ k.b);
  }
};

}  // namespace

// grid: [nx, ny, nz] row-major (x outermost). Vertices on grid nodes spanning
// [bbox_min, bbox_max]. Returns 0 on success.
int marching_tetrahedra(const float* grid, int nx, int ny, int nz,
                        const float* bbox_min, const float* bbox_max,
                        float iso, float** out_verts, int* out_n_verts,
                        int** out_tris, int* out_n_tris) {
  const float sx = (bbox_max[0] - bbox_min[0]) / (nx - 1);
  const float sy = (bbox_max[1] - bbox_min[1]) / (ny - 1);
  const float sz = (bbox_max[2] - bbox_min[2]) / (nz - 1);

  auto gid = [&](int i, int j, int k) -> int64_t {
    return (int64_t)(i * ny + j) * nz + k;
  };
  auto node = [&](int i, int j, int k) -> Vec3 {
    return {bbox_min[0] + sx * i, bbox_min[1] + sy * j, bbox_min[2] + sz * k};
  };

  // cube-corner offsets (standard MC ordering)
  static const int C[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                              {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
  // 6-tetrahedra split around the 0-6 diagonal
  static const int T[6][4] = {{0, 1, 2, 6}, {0, 2, 3, 6}, {0, 3, 7, 6},
                              {0, 7, 4, 6}, {0, 4, 5, 6}, {0, 5, 1, 6}};

  std::vector<float> verts;
  std::vector<int> tris;
  std::unordered_map<EdgeKey, int, EdgeKeyHash> edge_to_vert;
  edge_to_vert.reserve(1 << 16);

  auto edge_vertex = [&](int64_t ga, int64_t gb, const Vec3& pa, const Vec3& pb,
                         float fa, float fb) -> int {
    EdgeKey key{std::min(ga, gb), std::max(ga, gb)};
    auto it = edge_to_vert.find(key);
    if (it != edge_to_vert.end()) return it->second;
    Vec3 p = (ga <= gb) ? lerp_vert(pa, pb, fa, fb, iso)
                        : lerp_vert(pb, pa, fb, fa, iso);
    int idx = (int)(verts.size() / 3);
    verts.push_back(p.x);
    verts.push_back(p.y);
    verts.push_back(p.z);
    edge_to_vert.emplace(key, idx);
    return idx;
  };

  // central-difference gradient for orientation fixing
  auto grad = [&](float x, float y, float z, float* g) {
    int i = (int)((x - bbox_min[0]) / sx);
    int j = (int)((y - bbox_min[1]) / sy);
    int k = (int)((z - bbox_min[2]) / sz);
    i = std::max(1, std::min(nx - 2, i));
    j = std::max(1, std::min(ny - 2, j));
    k = std::max(1, std::min(nz - 2, k));
    g[0] = grid[gid(i + 1, j, k)] - grid[gid(i - 1, j, k)];
    g[1] = grid[gid(i, j + 1, k)] - grid[gid(i, j - 1, k)];
    g[2] = grid[gid(i, j, k + 1)] - grid[gid(i, j, k - 1)];
  };

  auto emit = [&](int v0, int v1, int v2) {
    // orient so the triangle normal points along +grad(sdf) (outward)
    const float* a = &verts[3 * v0];
    const float* b = &verts[3 * v1];
    const float* c = &verts[3 * v2];
    float u[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    float w[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    float nrm[3] = {u[1] * w[2] - u[2] * w[1], u[2] * w[0] - u[0] * w[2],
                    u[0] * w[1] - u[1] * w[0]};
    float cx = (a[0] + b[0] + c[0]) / 3.f;
    float cy = (a[1] + b[1] + c[1]) / 3.f;
    float cz = (a[2] + b[2] + c[2]) / 3.f;
    float g[3];
    grad(cx, cy, cz, g);
    float d = nrm[0] * g[0] + nrm[1] * g[1] + nrm[2] * g[2];
    if (d < 0) std::swap(v1, v2);
    tris.push_back(v0);
    tris.push_back(v1);
    tris.push_back(v2);
  };

  for (int i = 0; i < nx - 1; i++) {
    for (int j = 0; j < ny - 1; j++) {
      for (int k = 0; k < nz - 1; k++) {
        float f[8];
        Vec3 p[8];
        int64_t g8[8];
        bool any_neg = false, any_pos = false;
        for (int c = 0; c < 8; c++) {
          int ci = i + C[c][0], cj = j + C[c][1], ck = k + C[c][2];
          g8[c] = gid(ci, cj, ck);
          f[c] = grid[g8[c]] - iso;
          p[c] = node(ci, cj, ck);
          (f[c] < 0 ? any_neg : any_pos) = true;
        }
        if (!any_neg || !any_pos) continue;

        for (int t = 0; t < 6; t++) {
          const int* tet = T[t];
          int inside[4], n_in = 0;
          for (int v = 0; v < 4; v++)
            if (f[tet[v]] < 0) inside[n_in++] = v;

          if (n_in == 0 || n_in == 4) continue;

          auto EV = [&](int va, int vb) {
            int A = tet[va], B = tet[vb];
            return edge_vertex(g8[A], g8[B], p[A], p[B], f[A], f[B]);
          };

          if (n_in == 1) {
            int a = inside[0];
            int o[3], m = 0;
            for (int v = 0; v < 4; v++)
              if (v != a) o[m++] = v;
            emit(EV(a, o[0]), EV(a, o[1]), EV(a, o[2]));
          } else if (n_in == 3) {
            int a = -1;  // the single outside vertex
            for (int v = 0; v < 4; v++) {
              bool is_in = false;
              for (int q = 0; q < 3; q++) is_in |= (inside[q] == v);
              if (!is_in) a = v;
            }
            int o[3], m = 0;
            for (int v = 0; v < 4; v++)
              if (v != a) o[m++] = v;
            emit(EV(a, o[0]), EV(a, o[2]), EV(a, o[1]));
          } else {  // n_in == 2 -> quad = 2 triangles
            int a = inside[0], b = inside[1];
            int o[2], m = 0;
            for (int v = 0; v < 4; v++)
              if (v != a && v != b) o[m++] = v;
            int v00 = EV(a, o[0]), v01 = EV(a, o[1]);
            int v10 = EV(b, o[0]), v11 = EV(b, o[1]);
            emit(v00, v01, v10);
            emit(v10, v01, v11);
          }
        }
      }
    }
  }

  *out_n_verts = (int)(verts.size() / 3);
  *out_n_tris = (int)(tris.size() / 3);
  *out_verts = (float*)malloc(verts.size() * sizeof(float));
  *out_tris = (int*)malloc(tris.size() * sizeof(int));
  memcpy(*out_verts, verts.data(), verts.size() * sizeof(float));
  memcpy(*out_tris, tris.data(), tris.size() * sizeof(int));
  return 0;
}

// ---------------------------------------------------------------------------
// Texture-space attribute rasterizer
// ---------------------------------------------------------------------------

// uv: [n_verts, 2] in [0,1]; tris: [n_tris, 3]; attrs: [n_verts, attr_dim].
// Fills out_img [H, W, attr_dim] with barycentric-interpolated attributes and
// out_mask [H, W] with coverage. v axis maps to rows (v=0 -> row 0).
int rasterize_attributes(const float* uv, const int* tris, int n_tris,
                         const float* attrs, int attr_dim, int H, int W,
                         float* out_img, float* out_mask) {
  memset(out_img, 0, sizeof(float) * H * W * attr_dim);
  memset(out_mask, 0, sizeof(float) * H * W);

  for (int t = 0; t < n_tris; t++) {
    const int i0 = tris[3 * t], i1 = tris[3 * t + 1], i2 = tris[3 * t + 2];
    const float x0 = uv[2 * i0] * (W - 1), y0 = uv[2 * i0 + 1] * (H - 1);
    const float x1 = uv[2 * i1] * (W - 1), y1 = uv[2 * i1 + 1] * (H - 1);
    const float x2 = uv[2 * i2] * (W - 1), y2 = uv[2 * i2 + 1] * (H - 1);

    int min_x = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
    int max_x = std::min(W - 1, (int)std::ceil(std::max({x0, x1, x2})));
    int min_y = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
    int max_y = std::min(H - 1, (int)std::ceil(std::max({y0, y1, y2})));

    const float denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2);
    if (std::fabs(denom) < 1e-12f) continue;
    const float inv = 1.f / denom;

    for (int y = min_y; y <= max_y; y++) {
      for (int x = min_x; x <= max_x; x++) {
        float l0 = ((y1 - y2) * (x - x2) + (x2 - x1) * (y - y2)) * inv;
        float l1 = ((y2 - y0) * (x - x2) + (x0 - x2) * (y - y2)) * inv;
        float l2 = 1.f - l0 - l1;
        const float eps = -1e-5f;
        if (l0 < eps || l1 < eps || l2 < eps) continue;
        float* px = out_img + ((int64_t)y * W + x) * attr_dim;
        for (int d = 0; d < attr_dim; d++) {
          px[d] = l0 * attrs[(int64_t)i0 * attr_dim + d] +
                  l1 * attrs[(int64_t)i1 * attr_dim + d] +
                  l2 * attrs[(int64_t)i2 * attr_dim + d];
        }
        out_mask[(int64_t)y * W + x] = 1.f;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// UV atlas: chart growing by normal similarity + planar projection + packing
// ---------------------------------------------------------------------------

namespace {

static void face_normal(const float* verts, const int* tri, float* n) {
  const float* a = verts + 3 * tri[0];
  const float* b = verts + 3 * tri[1];
  const float* c = verts + 3 * tri[2];
  float u[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
  float w[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
  n[0] = u[1] * w[2] - u[2] * w[1];
  n[1] = u[2] * w[0] - u[0] * w[2];
  n[2] = u[0] * w[1] - u[1] * w[0];
  float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]) + 1e-20f;
  n[0] /= len;
  n[1] /= len;
  n[2] /= len;
}

}  // namespace

// verts: [n_verts, 3]; tris: [n_tris, 3]. Produces per-corner UVs
// (out_uv: [n_tris * 3, 2] in [0,1]) plus a re-indexed vertex buffer
// (out_vert_idx: [n_tris * 3] indices into the original vertex array), since
// chart boundaries split vertices — the same convention xatlas uses.
int atlas_parameterize(const float* verts, int n_verts, const int* tris,
                       int n_tris, float normal_thresh, int padding_px,
                       int atlas_res, float** out_uv, int** out_vert_idx) {
  // face adjacency via shared edges
  std::unordered_map<int64_t, std::vector<int>> edge_faces;
  edge_faces.reserve(n_tris * 3);
  auto ekey = [&](int a, int b) -> int64_t {
    int lo = std::min(a, b), hi = std::max(a, b);
    return (int64_t)lo * n_verts + hi;
  };
  for (int t = 0; t < n_tris; t++) {
    for (int e = 0; e < 3; e++) {
      edge_faces[ekey(tris[3 * t + e], tris[3 * t + (e + 1) % 3])].push_back(t);
    }
  }

  std::vector<float> normals(3 * n_tris);
  for (int t = 0; t < n_tris; t++) face_normal(verts, tris + 3 * t, &normals[3 * t]);

  // greedy chart growing
  std::vector<int> chart(n_tris, -1);
  int n_charts = 0;
  for (int seed = 0; seed < n_tris; seed++) {
    if (chart[seed] >= 0) continue;
    int id = n_charts++;
    float cn[3] = {normals[3 * seed], normals[3 * seed + 1], normals[3 * seed + 2]};
    std::queue<int> q;
    q.push(seed);
    chart[seed] = id;
    while (!q.empty()) {
      int f = q.front();
      q.pop();
      for (int e = 0; e < 3; e++) {
        auto& nb = edge_faces[ekey(tris[3 * f + e], tris[3 * f + (e + 1) % 3])];
        for (int g : nb) {
          if (chart[g] >= 0) continue;
          float d = cn[0] * normals[3 * g] + cn[1] * normals[3 * g + 1] +
                    cn[2] * normals[3 * g + 2];
          if (d > normal_thresh) {
            chart[g] = id;
            q.push(g);
          }
        }
      }
    }
  }

  // per-chart planar projection
  struct Chart {
    std::vector<int> faces;
    float axis_u[3], axis_v[3];
    float min_u = 1e30f, max_u = -1e30f, min_v = 1e30f, max_v = -1e30f;
  };
  std::vector<Chart> charts(n_charts);
  for (int t = 0; t < n_tris; t++) charts[chart[t]].faces.push_back(t);

  for (auto& ch : charts) {
    float n[3] = {0, 0, 0};
    for (int f : ch.faces) {
      n[0] += normals[3 * f];
      n[1] += normals[3 * f + 1];
      n[2] += normals[3 * f + 2];
    }
    float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]) + 1e-20f;
    n[0] /= len;
    n[1] /= len;
    n[2] /= len;
    // build tangent frame
    float up[3] = {0, 0, 1};
    if (std::fabs(n[2]) > 0.9f) {
      up[0] = 1;
      up[2] = 0;
    }
    float* U = ch.axis_u;
    float* V = ch.axis_v;
    U[0] = up[1] * n[2] - up[2] * n[1];
    U[1] = up[2] * n[0] - up[0] * n[2];
    U[2] = up[0] * n[1] - up[1] * n[0];
    float ul = std::sqrt(U[0] * U[0] + U[1] * U[1] + U[2] * U[2]) + 1e-20f;
    U[0] /= ul;
    U[1] /= ul;
    U[2] /= ul;
    V[0] = n[1] * U[2] - n[2] * U[1];
    V[1] = n[2] * U[0] - n[0] * U[2];
    V[2] = n[0] * U[1] - n[1] * U[0];

    for (int f : ch.faces) {
      for (int c = 0; c < 3; c++) {
        const float* p = verts + 3 * tris[3 * f + c];
        float u = p[0] * U[0] + p[1] * U[1] + p[2] * U[2];
        float v = p[0] * V[0] + p[1] * V[1] + p[2] * V[2];
        ch.min_u = std::min(ch.min_u, u);
        ch.max_u = std::max(ch.max_u, u);
        ch.min_v = std::min(ch.min_v, v);
        ch.max_v = std::max(ch.max_v, v);
      }
    }
  }

  // shelf packing: sort by height, place left-to-right in rows
  struct Rect {
    int chart;
    float w, h;
    float x = 0, y = 0;  // placement in world units
  };
  std::vector<Rect> rects;
  float total_area = 0;
  const float pad_frac = (float)padding_px / (float)atlas_res;
  for (int c = 0; c < n_charts; c++) {
    Rect r;
    r.chart = c;
    r.w = charts[c].max_u - charts[c].min_u;
    r.h = charts[c].max_v - charts[c].min_v;
    total_area += (r.w + 1e-6f) * (r.h + 1e-6f);
    rects.push_back(r);
  }
  float atlas_w = std::sqrt(total_area) * 1.25f + 1e-6f;
  std::sort(rects.begin(), rects.end(),
            [](const Rect& a, const Rect& b) { return a.h > b.h; });

  float pad_world = atlas_w * 0.02f;  // inter-chart gap against bleeding
  float cx = 0, cy = 0, row_h = 0, used_w = atlas_w, max_y = 0;
  for (auto& r : rects) {
    if (cx + r.w > atlas_w && cx > 0) {
      cx = 0;
      cy += row_h + pad_world;
      row_h = 0;
    }
    r.x = cx;
    r.y = cy;
    cx += r.w + pad_world;
    row_h = std::max(row_h, r.h);
    max_y = std::max(max_y, cy + r.h);
  }
  (void)used_w;
  float scale_x = 1.f / std::max(atlas_w, 1e-20f);
  float scale_y = 1.f / std::max(max_y, 1e-20f);
  float s = std::min(scale_x, scale_y);
  // leave padding_px margin around each chart by shrinking into [pad, 1-pad]
  float margin = pad_frac;
  float span = 1.f - 2.f * margin;

  std::vector<float> chart_off_x(n_charts), chart_off_y(n_charts);
  for (auto& r : rects) {
    chart_off_x[r.chart] = r.x;
    chart_off_y[r.chart] = r.y;
  }

  *out_uv = (float*)malloc(sizeof(float) * n_tris * 3 * 2);
  *out_vert_idx = (int*)malloc(sizeof(int) * n_tris * 3);
  for (int t = 0; t < n_tris; t++) {
    const Chart& ch = charts[chart[t]];
    for (int c = 0; c < 3; c++) {
      int vi = tris[3 * t + c];
      const float* p = verts + 3 * vi;
      float u = p[0] * ch.axis_u[0] + p[1] * ch.axis_u[1] + p[2] * ch.axis_u[2];
      float v = p[0] * ch.axis_v[0] + p[1] * ch.axis_v[1] + p[2] * ch.axis_v[2];
      u = (u - ch.min_u + chart_off_x[chart[t]]) * s;
      v = (v - ch.min_v + chart_off_y[chart[t]]) * s;
      (*out_uv)[(3 * t + c) * 2] = margin + u * span;
      (*out_uv)[(3 * t + c) * 2 + 1] = margin + v * span;
      (*out_vert_idx)[3 * t + c] = vi;
    }
  }
  return n_charts;
}

}  // extern "C"

// Iso-surface extraction from a boolean implicit solid by marching
// tetrahedra with bisection-refined edge crossings — the native
// counterpart of model3d.MarchingCubesSearch(solid, delta, iters)
// (reference point_cloud/main.go:127-128).
#pragma once

#include <array>
#include <cstdint>
#include <functional>
#include <map>
#include <vector>

#include "vec3.h"

struct Mesh {
  std::vector<Vec3> verts;
  std::vector<std::array<int, 3>> faces;
};

using SolidFn = std::function<bool(const Vec3 &)>;

namespace marching_detail {

// Cube corners: bit0 -> x, bit1 -> y, bit2 -> z.
inline Vec3 corner_offset(int c) {
  return Vec3{(double)(c & 1), (double)((c >> 1) & 1), (double)((c >> 2) & 1)};
}

// 6 tetrahedra sharing the main diagonal 0-7.
constexpr int TETS[6][4] = {{0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
                            {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7}};

inline bool perm_is_odd(int a, int b, int c, int d) {
  int p[4] = {a, b, c, d};
  int inv = 0;
  for (int i = 0; i < 4; i++)
    for (int j = i + 1; j < 4; j++)
      if (p[i] > p[j]) inv++;
  return inv % 2 == 1;
}

}  // namespace marching_detail

// Extract the surface of `solid` over its bbox with cell size `delta`.
// Edge crossings are found by `iters` bisection steps.  `pad` must cover
// however far the solid extends BEYOND [lo, hi] (e.g. the union-of-spheres
// thickness): padding by one cell alone leaves the shell open at the
// boundary whenever the solid reaches past the outermost sampled plane
// (the Go reference clips the solid to the bbox instead — either way the
// mesh must close).
inline Mesh marching_solid(const SolidFn &solid, Vec3 lo, Vec3 hi, double delta,
                           int iters = 8, double pad = 0.0) {
  using namespace marching_detail;
  // Pad one cell past the solid's reach so the surface closes.
  double p = pad + delta;
  lo = lo - Vec3{p, p, p};
  hi = hi + Vec3{p, p, p};
  int nx = (int)((hi.x - lo.x) / delta) + 1;
  int ny = (int)((hi.y - lo.y) / delta) + 1;
  int nz = (int)((hi.z - lo.z) / delta) + 1;

  // Sample the solid on the lattice.
  std::vector<uint8_t> occ((size_t)(nx + 1) * (ny + 1) * (nz + 1));
  auto at = [&](int x, int y, int z) -> uint8_t & {
    return occ[((size_t)x * (ny + 1) + y) * (nz + 1) + z];
  };
  for (int x = 0; x <= nx; x++)
    for (int y = 0; y <= ny; y++)
      for (int z = 0; z <= nz; z++)
        at(x, y, z) = solid(lo + Vec3{x * delta, y * delta, z * delta});

  Mesh mesh;
  std::map<std::array<int64_t, 3>, int> vert_ids;
  auto add_vert = [&](const Vec3 &v) {
    std::array<int64_t, 3> k = {(int64_t)llround(v.x * 1e7),
                                (int64_t)llround(v.y * 1e7),
                                (int64_t)llround(v.z * 1e7)};
    auto it = vert_ids.find(k);
    if (it != vert_ids.end()) return it->second;
    int id = (int)mesh.verts.size();
    mesh.verts.push_back(v);
    vert_ids.emplace(k, id);
    return id;
  };

  // Bisect the crossing on the segment inside -> outside.
  auto crossing = [&](Vec3 in, Vec3 out) {
    for (int i = 0; i < iters; i++) {
      Vec3 mid = (in + out) * 0.5;
      if (solid(mid)) in = mid;
      else out = mid;
    }
    return (in + out) * 0.5;
  };

  auto emit = [&](const Vec3 &a, const Vec3 &b, const Vec3 &c, bool flip) {
    int ia = add_vert(a), ib = add_vert(b), ic = add_vert(c);
    if (ia == ib || ib == ic || ia == ic) return;
    if (flip) mesh.faces.push_back({ia, ic, ib});
    else mesh.faces.push_back({ia, ib, ic});
  };

  for (int x = 0; x < nx; x++) {
    for (int y = 0; y < ny; y++) {
      for (int z = 0; z < nz; z++) {
        uint8_t corners = 0;
        for (int c = 0; c < 8; c++) {
          Vec3 o = corner_offset(c);
          if (at(x + (int)o.x, y + (int)o.y, z + (int)o.z)) corners |= 1 << c;
        }
        if (corners == 0 || corners == 0xFF) continue;
        Vec3 base = lo + Vec3{x * delta, y * delta, z * delta};
        for (const auto &tet : TETS) {
          Vec3 pos[4];
          bool in[4];
          int in_count = 0;
          for (int i = 0; i < 4; i++) {
            pos[i] = base + corner_offset(tet[i]) * delta;
            in[i] = (corners >> tet[i]) & 1;
            in_count += in[i];
          }
          if (in_count == 0 || in_count == 4) continue;
          if (in_count == 1 || in_count == 3) {
            int k = -1;
            for (int i = 0; i < 4; i++)
              if (in[i] == (in_count == 1)) k = i;
            int others[3], oi = 0;
            for (int i = 0; i < 4; i++)
              if (i != k) others[oi++] = i;
            Vec3 v[3];
            for (int i = 0; i < 3; i++) {
              Vec3 inside = in_count == 1 ? pos[k] : pos[others[i]];
              Vec3 outside = in_count == 1 ? pos[others[i]] : pos[k];
              v[i] = crossing(inside, outside);
            }
            bool odd = perm_is_odd(k, others[0], others[1], others[2]);
            bool flip = (in_count == 1) ? odd : !odd;
            emit(v[0], v[1], v[2], flip);
          } else {  // 2 in, 2 out -> quad
            int a = -1, b = -1, c = -1, d = -1;
            for (int i = 0; i < 4; i++) {
              if (in[i]) (a < 0 ? a : b) = i;
              else (c < 0 ? c : d) = i;
            }
            Vec3 v0 = crossing(pos[a], pos[c]);
            Vec3 v1 = crossing(pos[a], pos[d]);
            Vec3 v2 = crossing(pos[b], pos[d]);
            Vec3 v3 = crossing(pos[b], pos[c]);
            bool flip = perm_is_odd(a, b, c, d);
            emit(v0, v1, v2, flip);
            emit(v0, v2, v3, flip);
          }
        }
      }
    }
  }
  return mesh;
}

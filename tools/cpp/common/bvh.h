// Median-split BVH over triangles with Moller-Trumbore intersection —
// the native ray-cast core replacing model3d.MeshToCollider
// (reference simple_dataset/main.go:135).
#pragma once

#include <algorithm>
#include <cmath>
#include <limits>
#include <numeric>
#include <vector>

#include "stl.h"
#include "vec3.h"

struct Hit {
  double t = std::numeric_limits<double>::infinity();
  Vec3 normal;
  bool ok = false;
};

class BVH {
 public:
  explicit BVH(std::vector<Triangle> tris) : tris_(std::move(tris)) {
    indices_.resize(tris_.size());
    std::iota(indices_.begin(), indices_.end(), 0);
    nodes_.reserve(tris_.size() * 2);
    build(0, indices_.size());
  }

  Vec3 bbox_min() const { return nodes_[0].lo; }
  Vec3 bbox_max() const { return nodes_[0].hi; }

  Hit intersect(const Vec3 &origin, const Vec3 &dir) const {
    Hit hit;
    Vec3 inv_d{1.0 / (dir.x == 0 ? 1e-30 : dir.x),
               1.0 / (dir.y == 0 ? 1e-30 : dir.y),
               1.0 / (dir.z == 0 ? 1e-30 : dir.z)};
    if (!nodes_.empty()) intersect_node(0, origin, dir, inv_d, hit);
    return hit;
  }

 private:
  struct Node {
    Vec3 lo, hi;
    int left = -1, right = -1;  // children, or
    int start = 0, count = 0;   // leaf triangle range in indices_
  };

  std::vector<Triangle> tris_;
  std::vector<size_t> indices_;
  std::vector<Node> nodes_;

  int build(size_t start, size_t end) {
    Node node;
    node.lo = Vec3{1e30, 1e30, 1e30};
    node.hi = Vec3{-1e30, -1e30, -1e30};
    for (size_t i = start; i < end; i++) {
      node.lo = node.lo.min(tris_[indices_[i]].min());
      node.hi = node.hi.max(tris_[indices_[i]].max());
    }
    int id = (int)nodes_.size();
    nodes_.push_back(node);

    size_t count = end - start;
    if (count <= 4) {
      nodes_[id].start = (int)start;
      nodes_[id].count = (int)count;
      return id;
    }
    Vec3 size = node.hi - node.lo;
    int axis = size.x > size.y ? (size.x > size.z ? 0 : 2)
                               : (size.y > size.z ? 1 : 2);
    size_t mid = start + count / 2;
    std::nth_element(
        indices_.begin() + start, indices_.begin() + mid, indices_.begin() + end,
        [&](size_t a, size_t b) {
          return (tris_[a].min() + tris_[a].max())[axis] <
                 (tris_[b].min() + tris_[b].max())[axis];
        });
    int left = build(start, mid);
    int right = build(mid, end);
    nodes_[id].left = left;
    nodes_[id].right = right;
    return id;
  }

  static bool box_hit(const Node &n, const Vec3 &o, const Vec3 &inv_d,
                      double t_best) {
    double t0 = 0, t1 = t_best;
    for (int a = 0; a < 3; a++) {
      double lo = (n.lo[a] - o[a]) * inv_d[a];
      double hi = (n.hi[a] - o[a]) * inv_d[a];
      if (lo > hi) std::swap(lo, hi);
      t0 = std::max(t0, lo);
      t1 = std::min(t1, hi);
      if (t0 > t1) return false;
    }
    return true;
  }

  // inv_d computed ONCE per ray by the caller: recomputing three
  // divisions at every node visit was the hottest redundant work in
  // simple_dataset's render loop.
  void intersect_node(int id, const Vec3 &o, const Vec3 &d, const Vec3 &inv_d,
                      Hit &hit) const {
    const Node &n = nodes_[id];
    if (!box_hit(n, o, inv_d, hit.t)) return;
    if (n.count > 0) {
      for (int i = 0; i < n.count; i++) {
        const Triangle &tri = tris_[indices_[n.start + i]];
        double t;
        if (moller_trumbore(tri, o, d, t) && t < hit.t && t > 1e-9) {
          hit.t = t;
          hit.normal = tri.normal();
          hit.ok = true;
        }
      }
      return;
    }
    intersect_node(n.left, o, d, inv_d, hit);
    intersect_node(n.right, o, d, inv_d, hit);
  }

  static bool moller_trumbore(const Triangle &tri, const Vec3 &o, const Vec3 &d,
                              double &t) {
    Vec3 e1 = tri.v1 - tri.v0;
    Vec3 e2 = tri.v2 - tri.v0;
    Vec3 p = d.cross(e2);
    double det = e1.dot(p);
    if (std::fabs(det) < 1e-12) return false;
    double inv = 1.0 / det;
    Vec3 s = o - tri.v0;
    double u = s.dot(p) * inv;
    if (u < 0 || u > 1) return false;
    Vec3 q = s.cross(e1);
    double v = d.dot(q) * inv;
    if (v < 0 || u + v > 1) return false;
    t = e2.dot(q) * inv;
    return t > 0;
  }
};

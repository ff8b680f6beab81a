// 3-d k-d tree: nearest neighbour, k-NN, and distance queries — the native
// replacement for model3d.NewCoordTree (reference point_cloud/main.go:104,
// :177-187).
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <limits>
#include <numeric>
#include <queue>
#include <vector>

#include "vec3.h"

class KdTree {
 public:
  explicit KdTree(const std::vector<Vec3> &points) : pts_(points) {
    ids_.resize(pts_.size());
    std::iota(ids_.begin(), ids_.end(), 0);
    build(0, ids_.size(), 0);
  }

  // Index of the nearest point.
  size_t nearest(const Vec3 &q) const {
    size_t best = 0;
    double best_d = std::numeric_limits<double>::infinity();
    nearest_rec(q, 0, ids_.size(), 0, best, best_d);
    return best;
  }

  double dist(const Vec3 &q) const {
    size_t i = nearest(q);
    return (pts_[i] - q).norm();
  }

  // Squared distance to the k-th nearest neighbour (the query point
  // itself counts if it is in the tree, matching Go's tree.KNN).  With
  // fewer than k points in the tree this is the distance to the
  // farthest point.  k < 1 or an empty tree is a caller error — top()
  // on an empty heap would be UB, so fail loudly.
  double knn_squared_dist(const Vec3 &q, int k) const {
    std::priority_queue<double> heap;  // max-heap of the k best sq dists
    if (k >= 1) knn_rec(q, 0, ids_.size(), 0, k, heap);
    if (heap.empty()) {
      fprintf(stderr, "knn_squared_dist: k=%d on a tree of %zu points\n", k,
              ids_.size());
      abort();
    }
    return heap.top();
  }

 private:
  std::vector<Vec3> pts_;
  std::vector<size_t> ids_;

  void build(size_t start, size_t end, int depth) {
    if (end - start <= 1) return;
    size_t mid = (start + end) / 2;
    int axis = depth % 3;
    std::nth_element(ids_.begin() + start, ids_.begin() + mid,
                     ids_.begin() + end, [&](size_t a, size_t b) {
                       return pts_[a][axis] < pts_[b][axis];
                     });
    build(start, mid, depth + 1);
    build(mid + 1, end, depth + 1);
  }

  void nearest_rec(const Vec3 &q, size_t start, size_t end, int depth,
                   size_t &best, double &best_d) const {
    if (start >= end) return;
    size_t mid = (start + end) / 2;
    size_t id = ids_[mid];
    double d = q.squared_dist(pts_[id]);
    if (d < best_d) {
      best_d = d;
      best = id;
    }
    int axis = depth % 3;
    double delta = q[axis] - pts_[id][axis];
    size_t lo1 = start, hi1 = mid, lo2 = mid + 1, hi2 = end;
    if (delta > 0) {
      std::swap(lo1, lo2);
      std::swap(hi1, hi2);
    }
    nearest_rec(q, lo1, hi1, depth + 1, best, best_d);
    if (delta * delta < best_d) nearest_rec(q, lo2, hi2, depth + 1, best, best_d);
  }

  void knn_rec(const Vec3 &q, size_t start, size_t end, int depth, int k,
               std::priority_queue<double> &heap) const {
    if (start >= end) return;
    size_t mid = (start + end) / 2;
    size_t id = ids_[mid];
    double d = q.squared_dist(pts_[id]);
    if ((int)heap.size() < k) {
      heap.push(d);
    } else if (d < heap.top()) {
      heap.pop();
      heap.push(d);
    }
    int axis = depth % 3;
    double delta = q[axis] - pts_[id][axis];
    size_t lo1 = start, hi1 = mid, lo2 = mid + 1, hi2 = end;
    if (delta > 0) {
      std::swap(lo1, lo2);
      std::swap(hi1, hi2);
    }
    knn_rec(q, lo1, hi1, depth + 1, k, heap);
    if ((int)heap.size() < k || delta * delta < heap.top())
      knn_rec(q, lo2, hi2, depth + 1, k, heap);
  }
};

// STL mesh reading (binary and ASCII), matching the coverage of the Go
// tool's model3d.ReadSTL (reference simple_dataset/main.go:121-137).
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "vec3.h"

struct Triangle {
  Vec3 v0, v1, v2;
  Vec3 normal() const { return (v1 - v0).cross(v2 - v0).normalized(); }
  Vec3 min() const { return v0.min(v1).min(v2); }
  Vec3 max() const { return v0.max(v1).max(v2); }
};

inline std::vector<Triangle> read_stl(const std::string &path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::string content((std::istreambuf_iterator<char>(f)),
                      std::istreambuf_iterator<char>());

  std::vector<Triangle> tris;
  // ASCII STL starts with "solid" and contains "facet".
  bool ascii = content.rfind("solid", 0) == 0 &&
               content.find("facet") != std::string::npos;
  if (ascii) {
    std::istringstream ss(content);
    std::string tok;
    Triangle t;
    int vi = 0;
    while (ss >> tok) {
      if (tok == "vertex") {
        Vec3 v;
        ss >> v.x >> v.y >> v.z;
        if (vi == 0) t.v0 = v;
        else if (vi == 1) t.v1 = v;
        else t.v2 = v;
        if (++vi == 3) {
          tris.push_back(t);
          vi = 0;
        }
      }
    }
  } else {
    if (content.size() < 84) throw std::runtime_error("truncated STL");
    uint32_t n;
    std::memcpy(&n, content.data() + 80, 4);
    if (content.size() < 84 + (size_t)n * 50)
      throw std::runtime_error("truncated binary STL");
    tris.reserve(n);
    const char *p = content.data() + 84;
    for (uint32_t i = 0; i < n; i++, p += 50) {
      float vals[12];
      std::memcpy(vals, p + 12, 36);  // skip normal, read 3 vertices
      tris.push_back(Triangle{{vals[0], vals[1], vals[2]},
                              {vals[3], vals[4], vals[5]},
                              {vals[6], vals[7], vals[8]}});
    }
  }
  if (tris.empty()) throw std::runtime_error("no triangles in " + path);
  return tris;
}

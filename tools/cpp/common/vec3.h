// 3-D vector math shared by the native tools.
#pragma once

#include <cmath>
#include <random>

struct Vec3 {
  double x = 0, y = 0, z = 0;

  Vec3() = default;
  Vec3(double x_, double y_, double z_) : x(x_), y(y_), z(z_) {}

  Vec3 operator+(const Vec3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  Vec3 operator/(double s) const { return {x / s, y / s, z / s}; }
  Vec3 operator-() const { return {-x, -y, -z}; }

  double dot(const Vec3 &o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3 &o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
  double squared_dist(const Vec3 &o) const { return (*this - o).dot(*this - o); }
  Vec3 normalized() const {
    double n = norm();
    return n > 0 ? *this / n : Vec3{0, 0, 0};
  }
  Vec3 min(const Vec3 &o) const {
    return {std::fmin(x, o.x), std::fmin(y, o.y), std::fmin(z, o.z)};
  }
  Vec3 max(const Vec3 &o) const {
    return {std::fmax(x, o.x), std::fmax(y, o.y), std::fmax(z, o.z)};
  }
  double operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

inline Vec3 operator*(double s, const Vec3 &v) { return v * s; }

// Uniform random unit vector.
template <typename RNG> Vec3 random_unit_vector(RNG &rng) {
  std::normal_distribution<double> n(0.0, 1.0);
  while (true) {
    Vec3 v{n(rng), n(rng), n(rng)};
    double len = v.norm();
    if (len > 1e-8) return v / len;
  }
}

// Rodrigues rotation of v about unit axis by angle theta.
inline Vec3 rotate_about(const Vec3 &v, const Vec3 &axis_in, double theta) {
  Vec3 axis = axis_in.normalized();
  double c = std::cos(theta), s = std::sin(theta);
  return v * c + axis.cross(v) * s + axis * (axis.dot(v) * (1 - c));
}

// point_cloud: reconstruct a colored mesh from an RGBD dataset exported by
// learn_nerf_tpu.scripts.render_new_dataset.
//
// Native C++ replacement for the reference Go tool
// (/root/reference/point_cloud/main.go): unprojects every depth pixel along
// its camera ray (skipping the 0xffff far plane), optionally subsamples to
// -max-points (random, or keeping the densest points by k-NN distance with
// -sort-density), builds a union-of-spheres implicit solid over a k-d tree,
// extracts the surface by marching with bisection search, colors it by
// nearest-neighbour lookup, and writes a quantized-material OBJ (a .zip of
// model.obj + material.mtl when -output-path ends in .zip, else plain
// files).

#include <zlib.h>

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <map>
#include <random>
#include <string>
#include <vector>

#include "../common/json_lite.h"
#include "../common/kdtree.h"
#include "../common/marching.h"
#include "../common/png_io.h"
#include "../common/vec3.h"

namespace {

struct Color {
  double r, g, b;
};

void usage() {
  fprintf(stderr,
          "Usage: point_cloud -data-dir DIR -output-path OUT.[obj|zip] "
          "[flags]\n\n"
          "Flags:\n"
          "  -max-depth F        depth of a white pixel (default 10)\n"
          "  -thickness F        radius of each point (default 0.02)\n"
          "  -delta F            marching cubes delta (default 0.02)\n"
          "  -max-points N       maximum points to sample (default 50000)\n"
          "  -sort-density       remove lowest density samples first\n"
          "  -sort-density-k N   neighbor for density estimate (default 5)\n");
  exit(1);
}

bool file_exists(const std::string &p) {
  FILE *f = fopen(p.c_str(), "rb");
  if (f) fclose(f);
  return f != nullptr;
}

// Minimal ZIP writer with stored (uncompressed) entries.
class ZipWriter {
 public:
  explicit ZipWriter(const std::string &path) : f_(fopen(path.c_str(), "wb")) {
    if (!f_) { perror("fopen"); exit(1); }
  }

  void add(const std::string &name, const std::string &data) {
    Entry e;
    e.name = name;
    e.crc = crc32(0, (const Bytef *)data.data(), (uInt)data.size());
    e.size = (uint32_t)data.size();
    e.offset = (uint32_t)ftell(f_);
    entries_.push_back(e);

    write_u32(0x04034b50);
    write_u16(20);      // version needed
    write_u16(0);       // flags
    write_u16(0);       // method: stored
    write_u16(0);       // mod time
    write_u16(0);       // mod date
    write_u32(e.crc);
    write_u32(e.size);  // compressed
    write_u32(e.size);  // uncompressed
    write_u16((uint16_t)name.size());
    write_u16(0);  // extra len
    fwrite(name.data(), 1, name.size(), f_);
    fwrite(data.data(), 1, data.size(), f_);
  }

  void finish() {
    uint32_t cd_start = (uint32_t)ftell(f_);
    for (const Entry &e : entries_) {
      write_u32(0x02014b50);
      write_u16(20);  // version made by
      write_u16(20);  // version needed
      write_u16(0);
      write_u16(0);
      write_u16(0);
      write_u16(0);
      write_u32(e.crc);
      write_u32(e.size);
      write_u32(e.size);
      write_u16((uint16_t)e.name.size());
      write_u16(0);
      write_u16(0);
      write_u16(0);
      write_u16(0);
      write_u32(0);
      write_u32(e.offset);
      fwrite(e.name.data(), 1, e.name.size(), f_);
    }
    uint32_t cd_size = (uint32_t)ftell(f_) - cd_start;
    write_u32(0x06054b50);
    write_u16(0);
    write_u16(0);
    write_u16((uint16_t)entries_.size());
    write_u16((uint16_t)entries_.size());
    write_u32(cd_size);
    write_u32(cd_start);
    write_u16(0);
    fclose(f_);
  }

 private:
  struct Entry {
    std::string name;
    uint32_t crc, size, offset;
  };
  FILE *f_;
  std::vector<Entry> entries_;

  void write_u16(uint16_t v) { fwrite(&v, 2, 1, f_); }
  void write_u32(uint32_t v) { fwrite(&v, 4, 1, f_); }
};

}  // namespace

int main(int argc, char **argv) {
  double max_depth = 10.0, thickness = 0.02, delta = 0.02;
  int max_points = 50000, sort_density_k = 5;
  bool sort_density = false;
  std::string data_dir, output_path;

  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a.size() > 2 && a[0] == '-' && a[1] == '-') a = a.substr(1);
    auto next = [&]() -> const char * {
      if (i + 1 >= argc) usage();
      return argv[++i];
    };
    if (a == "-max-depth") max_depth = atof(next());
    else if (a == "-thickness") thickness = atof(next());
    else if (a == "-delta") delta = atof(next());
    else if (a == "-max-points") max_points = atoi(next());
    else if (a == "-sort-density") sort_density = true;
    else if (a == "-sort-density-k") sort_density_k = atoi(next());
    else if (a == "-data-dir") data_dir = next();
    else if (a == "-output-path") output_path = next();
    else usage();
  }
  if (data_dir.empty() || output_path.empty()) usage();

  fprintf(stderr, "Computing points...\n");
  std::vector<Vec3> points;
  std::vector<Color> colors;
  char name[64];
  for (int i = 0;; i++) {
    snprintf(name, sizeof(name), "/%05d.json", i);
    std::string meta_path = data_dir + name;
    if (!file_exists(meta_path)) break;
    std::string meta = json_lite::read_file(meta_path);
    Vec3 origin = json_lite::get_vec3(meta, "origin");
    Vec3 x_axis =
        json_lite::get_vec3(meta, "x") * std::tan(json_lite::get_number(meta, "x_fov") / 2);
    Vec3 y_axis =
        json_lite::get_vec3(meta, "y") * std::tan(json_lite::get_number(meta, "y_fov") / 2);
    Vec3 z_axis = json_lite::get_vec3(meta, "z");

    snprintf(name, sizeof(name), "/%05d_depth.png", i);
    pngio::Image depth = pngio::read_png(data_dir + name);
    snprintf(name, sizeof(name), "/%05d.png", i);
    pngio::Image rgb = pngio::read_png(data_dir + name);
    if (depth.width != rgb.width || depth.height != rgb.height) {
      fprintf(stderr, "mismatched size of RGB and depth images\n");
      return 1;
    }

    for (int y = 0; y < depth.height; y++) {
      double yf = 2.0 * y / (depth.height - 1) - 1.0;
      for (int x = 0; x < depth.width; x++) {
        uint16_t d = depth.gray16(x, y);
        if (d == 0xffff) continue;
        double xf = 2.0 * x / (depth.width - 1) - 1.0;
        double z_dist = (double)d / 0xffff * max_depth;
        Vec3 dir = (z_axis + x_axis * xf + y_axis * yf).normalized();
        double scale = z_dist / dir.dot(z_axis);
        points.push_back(origin + dir * scale);
        uint8_t c[3];
        rgb.rgb8(x, y, c);
        colors.push_back(Color{c[0] / 255.0, c[1] / 255.0, c[2] / 255.0});
      }
    }
  }
  if (points.empty()) {
    fprintf(stderr, "no points found in %s\n", data_dir.c_str());
    return 1;
  }

  if (max_points < 1 || sort_density_k < 1) {
    // An accidental 0 (atoi of a typo) would empty the cloud below and
    // crash on points[0] / an empty k-d tree; fail loudly instead.
    fprintf(stderr, "-max-points and -sort-density-k must be >= 1\n");
    return 1;
  }
  if ((int)points.size() > max_points) {
    fprintf(stderr, "Found %zu points. Reducing to %d...\n", points.size(),
            max_points);
    std::vector<size_t> order(points.size());
    for (size_t i = 0; i < order.size(); i++) order[i] = i;
    if (sort_density) {
      KdTree tree(points);
      std::vector<double> dists(points.size());
      for (size_t i = 0; i < points.size(); i++)
        dists[i] = tree.knn_squared_dist(points[i], sort_density_k);
      std::stable_sort(order.begin(), order.end(),
                       [&](size_t a, size_t b) { return dists[a] < dists[b]; });
    } else {
      std::mt19937_64 rng(0);
      std::shuffle(order.begin(), order.end(), rng);
    }
    std::vector<Vec3> p2;
    std::vector<Color> c2;
    for (int i = 0; i < max_points; i++) {
      p2.push_back(points[order[i]]);
      c2.push_back(colors[order[i]]);
    }
    points.swap(p2);
    colors.swap(c2);
  } else {
    fprintf(stderr, "Using all %zu points.\n", points.size());
  }

  fprintf(stderr, "Constructing solid and color function...\n");
  Vec3 lo = points[0], hi = points[0];
  for (const Vec3 &p : points) {
    lo = lo.min(p);
    hi = hi.max(p);
  }
  KdTree tree(points);
  SolidFn solid = [&](const Vec3 &c) { return tree.dist(c) < thickness; };

  fprintf(stderr, "Creating mesh...\n");
  Mesh mesh = marching_solid(solid, lo, hi, delta, 8, thickness);
  fprintf(stderr, "Mesh: %zu vertices, %zu faces\n", mesh.verts.size(),
          mesh.faces.size());

  // Per-face color by nearest point; quantize to <=125 material colors
  // (5 levels per channel), mirroring SaveQuantizedMaterialOBJ(128, ...).
  auto quantize = [](double v) { return std::min(4, (int)(v * 5)); };
  std::map<std::array<int, 3>, int> palette;
  std::vector<Color> palette_colors;
  std::vector<int> face_material(mesh.faces.size());
  for (size_t i = 0; i < mesh.faces.size(); i++) {
    const auto &f = mesh.faces[i];
    Vec3 centroid =
        (mesh.verts[f[0]] + mesh.verts[f[1]] + mesh.verts[f[2]]) / 3.0;
    Color c = colors[tree.nearest(centroid)];
    std::array<int, 3> key = {quantize(c.r), quantize(c.g), quantize(c.b)};
    auto it = palette.find(key);
    if (it == palette.end()) {
      it = palette.emplace(key, (int)palette_colors.size()).first;
      palette_colors.push_back(Color{(key[0] + 0.5) / 5.0, (key[1] + 0.5) / 5.0,
                                     (key[2] + 0.5) / 5.0});
    }
    face_material[i] = it->second;
  }

  fprintf(stderr, "Saving mesh (%zu materials)...\n", palette_colors.size());
  std::string mtl;
  for (size_t i = 0; i < palette_colors.size(); i++) {
    char buf[128];
    snprintf(buf, sizeof(buf), "newmtl mat%zu\nKd %.4f %.4f %.4f\n", i,
             palette_colors[i].r, palette_colors[i].g, palette_colors[i].b);
    mtl += buf;
  }

  std::string obj = "mtllib material.mtl\n";
  {
    char buf[160];
    for (const Vec3 &v : mesh.verts) {
      snprintf(buf, sizeof(buf), "v %.5f %.5f %.5f\n", v.x, v.y, v.z);
      obj += buf;
    }
    // Group faces by material for compact usemtl switching.
    std::vector<size_t> face_order(mesh.faces.size());
    for (size_t i = 0; i < face_order.size(); i++) face_order[i] = i;
    std::stable_sort(face_order.begin(), face_order.end(), [&](size_t a, size_t b) {
      return face_material[a] < face_material[b];
    });
    int cur = -1;
    for (size_t fi : face_order) {
      if (face_material[fi] != cur) {
        cur = face_material[fi];
        snprintf(buf, sizeof(buf), "usemtl mat%d\n", cur);
        obj += buf;
      }
      const auto &f = mesh.faces[fi];
      snprintf(buf, sizeof(buf), "f %d %d %d\n", f[0] + 1, f[1] + 1, f[2] + 1);
      obj += buf;
    }
  }

  if (output_path.size() > 4 &&
      output_path.compare(output_path.size() - 4, 4, ".zip") == 0) {
    ZipWriter zip(output_path);
    zip.add("material.mtl", mtl);
    zip.add("model.obj", obj);
    zip.finish();
  } else {
    std::string mtl_path = output_path;
    size_t slash = mtl_path.find_last_of('/');
    mtl_path = (slash == std::string::npos ? std::string()
                                           : mtl_path.substr(0, slash + 1)) +
               "material.mtl";
    FILE *f = fopen(output_path.c_str(), "w");
    if (!f) { perror("fopen"); return 1; }
    fwrite(obj.data(), 1, obj.size(), f);
    fclose(f);
    f = fopen(mtl_path.c_str(), "w");
    if (!f) { perror("fopen"); return 1; }
    fwrite(mtl.data(), 1, mtl.size(), f);
    fclose(f);
  }
  return 0;
}

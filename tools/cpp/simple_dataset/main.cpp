// simple_dataset: create a NeRF dataset from a single-color STL file.
//
// Native C++ replacement for the reference Go tool
// (/root/reference/simple_dataset/, main.go + camera_gen.go +
// vector_flag.go): loads an STL mesh, normalizes it to unit max-dimension
// centered at the origin, writes the bbox metadata.json, places N random
// point lights at distance 1000, and ray-casts `-images` views (random
// directions, or a rotating orbit with -rotate) writing %04d.png +
// %04d.json in the repo's camera JSON schema (origin/x/y/z/x_fov/y_fov,
// FOV in radians, z = x cross y).
//
// Deliberate fix vs the reference: the Go random-camera path converts the
// FOV from degrees to radians twice (main.go:86 + camera_gen.go:21); here
// the conversion happens exactly once.

#include <cmath>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <sys/stat.h>
#include <vector>

#include "../common/bvh.h"
#include "../common/png_io.h"
#include "../common/stl.h"
#include "../common/vec3.h"

namespace {

struct Camera {
  Vec3 origin, x, y, z;
  double fov;  // radians, both axes (square images)
};

struct Light {
  Vec3 origin;
  double brightness;
};

// Orthonormal basis for a look direction; up = +z preferred.
Camera look_at(const Vec3 &origin, const Vec3 &target, double fov) {
  Camera cam;
  cam.origin = origin;
  cam.z = (target - origin).normalized();
  Vec3 up{0, 0, 1};
  if (std::fabs(cam.z.dot(up)) > 0.999) up = Vec3{0, 1, 0};
  cam.x = cam.z.cross(up).normalized();
  cam.y = cam.z.cross(cam.x).normalized();
  cam.fov = fov;
  return cam;
}

// Place the camera along `direction` from the object's center so the
// bounding sphere fits inside the field of view (the behavioural
// equivalent of render3d.DirectionalCamera).
Camera directional_camera(const Vec3 &bbox_min, const Vec3 &bbox_max,
                          const Vec3 &direction, double fov) {
  Vec3 center = (bbox_min + bbox_max) * 0.5;
  double radius = (bbox_max - bbox_min).norm() * 0.5;
  double dist = radius / std::sin(fov / 2) * 1.05;
  return look_at(center + direction * dist, center, fov);
}

// Lambertian diffuse plus optional Blinn-Phong specular (view-dependent
// highlights for Ref-NeRF-style shiny scenes; specular 0 = reference look).
void render_view(const BVH &bvh, const Camera &cam,
                 const std::vector<Light> &lights, const Vec3 &albedo,
                 double specular, double shininess, int resolution,
                 std::vector<uint8_t> &out) {
  out.assign((size_t)resolution * resolution * 3, 0);
  double plane = std::tan(cam.fov / 2);
  for (int py = 0; py < resolution; py++) {
    double fy = 2.0 * py / (resolution - 1) - 1.0;
    for (int px = 0; px < resolution; px++) {
      double fx = 2.0 * px / (resolution - 1) - 1.0;
      Vec3 dir =
          (cam.z + cam.x * (fx * plane) + cam.y * (fy * plane)).normalized();
      Hit hit = bvh.intersect(cam.origin, dir);
      if (!hit.ok) continue;
      Vec3 p = cam.origin + dir * hit.t;
      Vec3 n = hit.normal;
      if (n.dot(dir) > 0) n = -n;  // face the camera
      double light_sum = 0, spec_sum = 0;
      for (const Light &l : lights) {
        Vec3 ldir = (l.origin - p).normalized();
        light_sum += l.brightness * std::fmax(0.0, n.dot(ldir));
        if (specular > 0) {
          Vec3 h = (ldir - dir).normalized();  // Blinn half vector
          spec_sum += l.brightness *
                      std::pow(std::fmax(0.0, n.dot(h)), shininess);
        }
      }
      light_sum = std::fmin(1.0, light_sum);
      spec_sum *= specular;
      size_t o = ((size_t)py * resolution + px) * 3;
      out[o + 0] = (uint8_t)std::lround(
          255 * std::fmin(1.0, albedo.x * light_sum + spec_sum));
      out[o + 1] = (uint8_t)std::lround(
          255 * std::fmin(1.0, albedo.y * light_sum + spec_sum));
      out[o + 2] = (uint8_t)std::lround(
          255 * std::fmin(1.0, albedo.z * light_sum + spec_sum));
    }
  }
}

void write_camera_json(const std::string &path, const Camera &cam) {
  FILE *f = fopen(path.c_str(), "w");
  if (!f) { perror("fopen"); exit(1); }
  Vec3 z = cam.x.cross(cam.y).normalized();
  fprintf(f,
          "{\"origin\": [%.17g, %.17g, %.17g], \"x\": [%.17g, %.17g, %.17g], "
          "\"y\": [%.17g, %.17g, %.17g], \"z\": [%.17g, %.17g, %.17g], "
          "\"x_fov\": %.17g, \"y_fov\": %.17g}\n",
          cam.origin.x, cam.origin.y, cam.origin.z, cam.x.x, cam.x.y, cam.x.z,
          cam.y.x, cam.y.y, cam.y.z, z.x, z.y, z.z, cam.fov, cam.fov);
  fclose(f);
}

bool parse_vec(const char *s, Vec3 *out) {
  return sscanf(s, "%lf,%lf,%lf", &out->x, &out->y, &out->z) == 3;
}

void usage() {
  fprintf(stderr,
          "Usage: simple_dataset [flags] <input.stl> <output-dir>\n\n"
          "Flags:\n"
          "  -fov F               field of view in degrees (default 60)\n"
          "  -resolution N        side length of images (default 800)\n"
          "  -images N            number of images (default 100)\n"
          "  -num-lights N        lights in the scene (default 5)\n"
          "  -light-brightness F  brightness of lights (default 0.5)\n"
          "  -specular F          Blinn-Phong specular strength (default 0)\n"
          "  -shininess F         specular exponent (default 32)\n"
          "  -seed N              RNG seed (default 0)\n"
          "  -no-images           only save json files\n"
          "  -rotate              rotating orbit instead of random views\n"
          "  -color r,g,b         model color (default 0.8,0.8,0.0)\n"
          "  -rotation-axis x,y,z axis for -rotate (default 0,0,1)\n"
          "  -rotation-offset x,y,z initial offset for -rotate (default 0,-1,0)\n");
  exit(1);
}

}  // namespace

int main(int argc, char **argv) {
  double fov_deg = 60.0;
  int resolution = 800;
  int num_images = 100;
  int num_lights = 5;
  double light_brightness = 0.5;
  double specular = 0.0;
  double shininess = 32.0;
  long seed = 0;
  bool no_images = false, rotate = false;
  Vec3 color{0.8, 0.8, 0.0};
  Vec3 rot_axis{0, 0, 1};
  Vec3 rot_offset{0, -1, 0};
  std::vector<std::string> positional;

  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a.size() > 2 && a[0] == '-' && a[1] == '-') a = a.substr(1);
    auto next = [&]() -> const char * {
      if (i + 1 >= argc) usage();
      return argv[++i];
    };
    if (a == "-fov") fov_deg = atof(next());
    else if (a == "-resolution") resolution = atoi(next());
    else if (a == "-images") num_images = atoi(next());
    else if (a == "-num-lights") num_lights = atoi(next());
    else if (a == "-light-brightness") light_brightness = atof(next());
    else if (a == "-specular") specular = atof(next());
    else if (a == "-shininess") shininess = atof(next());
    else if (a == "-seed") seed = atol(next());
    else if (a == "-no-images") no_images = true;
    else if (a == "-rotate") rotate = true;
    else if (a == "-color") { if (!parse_vec(next(), &color)) usage(); }
    else if (a == "-rotation-axis") { if (!parse_vec(next(), &rot_axis)) usage(); }
    else if (a == "-rotation-offset" || a == "-rotation-offest") {
      // the reference misspells this flag ("-rotation-offest"); accept both
      if (!parse_vec(next(), &rot_offset)) usage();
    } else if (a == "-h" || a == "-help") usage();
    else positional.push_back(argv[i]);
  }
  if (positional.size() != 2) usage();

  std::mt19937_64 rng(seed);
  double fov = fov_deg * M_PI / 180.0;

  fprintf(stderr, "Loading model...\n");
  std::vector<Triangle> tris = read_stl(positional[0]);

  // Normalize: center at origin, scale so the max dimension is 1
  // (reference main.go:139-144).
  Vec3 lo{1e30, 1e30, 1e30}, hi{-1e30, -1e30, -1e30};
  for (const Triangle &t : tris) {
    lo = lo.min(t.min());
    hi = hi.max(t.max());
  }
  Vec3 center = (lo + hi) * 0.5;
  for (Triangle &t : tris) {
    t.v0 = t.v0 - center;
    t.v1 = t.v1 - center;
    t.v2 = t.v2 - center;
  }
  // Scale so the max HALF-extent is 1 (bbox ~[-1, 1]) — the reference's
  // normalizeMesh divides by max(mesh.Max()) AFTER centering
  // (main.go:139-144).  Dividing by the full dimension instead halved
  // every generated world (and silently broke cross-tool comparisons).
  Vec3 half = (hi - lo) * 0.5;
  double max_dim = std::fmax(half.x, std::fmax(half.y, half.z));
  double scale = 1.0 / max_dim;
  for (Triangle &t : tris) {
    t.v0 = t.v0 * scale;
    t.v1 = t.v1 * scale;
    t.v2 = t.v2 * scale;
  }

  BVH bvh(std::move(tris));
  Vec3 bbox_min = bvh.bbox_min(), bbox_max = bvh.bbox_max();

  const std::string out_dir = positional[1];
  mkdir(out_dir.c_str(), 0755);

  fprintf(stderr, "Writing metadata...\n");
  {
    FILE *f = fopen((out_dir + "/metadata.json").c_str(), "w");
    if (!f) { perror("fopen"); return 1; }
    fprintf(f, "{\"min\": [%.17g, %.17g, %.17g], \"max\": [%.17g, %.17g, %.17g]}\n",
            bbox_min.x, bbox_min.y, bbox_min.z, bbox_max.x, bbox_max.y,
            bbox_max.z);
    fclose(f);
  }

  std::vector<Light> lights;
  Vec3 scene_center = (bbox_min + bbox_max) * 0.5;
  for (int i = 0; i < num_lights; i++) {
    lights.push_back(
        Light{scene_center + random_unit_vector(rng) * 1000.0, light_brightness});
  }

  // For -rotate: orbit at the furthest fitting distance over the circle
  // (reference camera_gen.go:37-53).
  double orbit_dist = 0;
  if (rotate) {
    for (int i = 0; i < num_images; i++) {
      double theta = 2 * M_PI * i / num_images;
      Vec3 dir = rotate_about(rot_offset, rot_axis, theta).normalized();
      Camera cam = directional_camera(bbox_min, bbox_max, dir, fov);
      orbit_dist = std::fmax(orbit_dist, (cam.origin - scene_center).norm());
    }
  }

  std::vector<uint8_t> pixels;
  char name[64];
  for (int i = 0; i < num_images; i++) {
    fprintf(stderr, "Rendering image %d/%d...\n", i + 1, num_images);
    Camera cam;
    if (rotate) {
      double theta = 2 * M_PI * i / num_images;
      Vec3 dir = rotate_about(rot_offset, rot_axis, theta).normalized();
      cam = look_at(scene_center + dir * orbit_dist, scene_center, fov);
    } else {
      cam = directional_camera(bbox_min, bbox_max, random_unit_vector(rng), fov);
    }

    if (!no_images) {
      render_view(bvh, cam, lights, color, specular, shininess, resolution,
                  pixels);
      snprintf(name, sizeof(name), "/%04d.png", i);
      pngio::write_png(out_dir + name, pixels.data(), resolution, resolution, 3, 8);
    }
    snprintf(name, sizeof(name), "/%04d.json", i);
    write_camera_json(out_dir + name, cam);
  }
  return 0;
}

// Tiny JSON value extractor for this repo's flat camera/metadata files
// (keys mapping to numbers or arrays of 3 numbers).  Not a general parser.
#pragma once

#include <cstdlib>
#include <fstream>
#include <stdexcept>
#include <string>

#include "vec3.h"

namespace json_lite {

inline std::string read_file(const std::string &path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open " + path);
  return std::string((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
}

inline size_t find_key(const std::string &s, const std::string &key) {
  std::string pat = "\"" + key + "\"";
  size_t p = s.find(pat);
  if (p == std::string::npos)
    throw std::runtime_error("missing JSON key: " + key);
  p = s.find(':', p + pat.size());
  if (p == std::string::npos) throw std::runtime_error("bad JSON near " + key);
  return p + 1;
}

inline double get_number(const std::string &s, const std::string &key) {
  return strtod(s.c_str() + find_key(s, key), nullptr);
}

inline Vec3 get_vec3(const std::string &s, const std::string &key) {
  size_t p = s.find('[', find_key(s, key));
  if (p == std::string::npos) throw std::runtime_error("expected array: " + key);
  const char *c = s.c_str() + p + 1;
  char *end;
  Vec3 v;
  v.x = strtod(c, &end);
  c = end;
  while (*c == ',' || *c == ' ') c++;
  v.y = strtod(c, &end);
  c = end;
  while (*c == ',' || *c == ' ') c++;
  v.z = strtod(c, &end);
  return v;
}

}  // namespace json_lite

// Fast parser for the LineMOD dataset's restricted YAML files.
//
// The reference's dataset startup full-parses gt.yml/info.yml with PyYAML
// for every object folder (reference: data/dataset_rgb.py:45-49 — noted as
// the startup hot path in SURVEY §3.1). These files use a tiny fixed
// grammar:
//
//   gt.yml:                         info.yml:
//     <frame>:                        <frame>:
//     - cam_R_m2c: [f, ...x9]           cam_K: [f, ...x9]
//       cam_t_m2c: [f, f, f]            depth_scale: f
//       obj_bb: [i, i, i, i]
//       obj_id: i
//
// This parser reads the whole file, walks it once, and emits flat arrays
// consumed over ctypes (pose6d_tpu/data/_native.py). ~100x faster than
// PyYAML on the real dataset. Inline flow lists may wrap across lines.
//
// Build: g++ -O3 -shared -fPIC -o liblinemod_index.so linemod_index.cpp

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct GtAnno {
  int frame_id;
  int obj_id;
  double bbox[4];
  double R[9];
  double t[3];
};

struct InfoEntry {
  int frame_id;
  double K[9];
  double depth_scale;
};

// Read a whole file into a string; empty on failure.
std::string read_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return {};
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(n > 0 ? static_cast<size_t>(n) : 0, '\0');
  if (n > 0 && std::fread(&buf[0], 1, static_cast<size_t>(n), f) != static_cast<size_t>(n)) {
    std::fclose(f);
    return {};
  }
  std::fclose(f);
  return buf;
}

// Parse a bracketed flow list starting at s[i] == '['; advances i past ']'.
// Returns false on malformed input or if more than max_out values appear.
bool parse_flow_list(const std::string& s, size_t& i, double* out, int max_out,
                     int* n_out) {
  while (i < s.size() && s[i] != '[') {
    if (s[i] == '\n' && s.find('[', i) == std::string::npos) return false;
    ++i;
  }
  if (i >= s.size()) return false;
  ++i;  // past '['
  int n = 0;
  while (i < s.size() && s[i] != ']') {
    // skip separators/whitespace/newlines (lists may wrap)
    if (s[i] == ',' || s[i] == ' ' || s[i] == '\n' || s[i] == '\r' || s[i] == '\t') {
      ++i;
      continue;
    }
    char* end = nullptr;
    double v = std::strtod(s.c_str() + i, &end);
    if (end == s.c_str() + i) return false;
    if (n >= max_out) return false;
    out[n++] = v;
    i = static_cast<size_t>(end - s.c_str());
  }
  if (i >= s.size()) return false;
  ++i;  // past ']'
  *n_out = n;
  return true;
}

// At line start: parse "<int>:" returning the frame id, or -1.
int parse_frame_header(const std::string& s, size_t i, size_t line_end) {
  if (i >= s.size() || s[i] < '0' || s[i] > '9') return -1;
  char* end = nullptr;
  long v = std::strtol(s.c_str() + i, &end, 10);
  size_t j = static_cast<size_t>(end - s.c_str());
  if (j >= line_end || s[j] != ':') return -1;
  return static_cast<int>(v);
}

bool key_at(const std::string& s, size_t i, const char* key) {
  return s.compare(i, std::strlen(key), key) == 0;
}

}  // namespace

extern "C" {

// Parses gt.yml. On success returns the annotation count and fills
// *out_data with a malloc'd double array [count * 18]:
//   [frame, obj_id, bbox(4), R(9), t(3)]  per row.
// Returns -1 on failure. Caller frees with linemod_free.
long parse_gt_yml(const char* path, double** out_data) {
  std::string s = read_file(path);
  if (s.empty()) return -1;

  std::vector<GtAnno> annos;
  int cur_frame = -1;
  GtAnno cur{};
  bool have_anno = false;
  bool valid = true;

  auto flush = [&]() {
    if (have_anno) annos.push_back(cur);
    have_anno = false;
  };

  size_t i = 0;
  while (i < s.size() && valid) {
    size_t line_end = s.find('\n', i);
    if (line_end == std::string::npos) line_end = s.size();

    int fid = parse_frame_header(s, i, line_end);
    if (fid >= 0) {
      flush();
      cur_frame = fid;
      i = line_end + 1;
      continue;
    }

    size_t j = i;
    while (j < line_end && (s[j] == ' ' || s[j] == '-')) ++j;

    bool starts_item = (j > i) && (s[i] == '-' || s.compare(i, 2, "- ") == 0 ||
                                   (s[i] == ' ' && s.find("- ", i) < j));
    // a "- " at the start of the (possibly indented) line begins a new anno
    size_t dash = s.find("- ", i);
    if (dash != std::string::npos && dash < j) {
      flush();
      std::memset(&cur, 0, sizeof(cur));
      cur.frame_id = cur_frame;
      have_anno = true;
    }
    (void)starts_item;

    if (j < line_end) {
      int n = 0;
      if (key_at(s, j, "cam_R_m2c:")) {
        size_t k = j + 10;
        valid = parse_flow_list(s, k, cur.R, 9, &n) && n == 9;
        i = k;
        // advance to next newline from k
        line_end = s.find('\n', i);
        if (line_end == std::string::npos) line_end = s.size();
      } else if (key_at(s, j, "cam_t_m2c:")) {
        size_t k = j + 10;
        valid = parse_flow_list(s, k, cur.t, 3, &n) && n == 3;
        i = k;
        line_end = s.find('\n', i);
        if (line_end == std::string::npos) line_end = s.size();
      } else if (key_at(s, j, "obj_bb:")) {
        size_t k = j + 7;
        valid = parse_flow_list(s, k, cur.bbox, 4, &n) && n == 4;
        i = k;
        line_end = s.find('\n', i);
        if (line_end == std::string::npos) line_end = s.size();
      } else if (key_at(s, j, "obj_id:")) {
        cur.obj_id = std::atoi(s.c_str() + j + 7);
      }
    }
    i = line_end + 1;
  }
  flush();
  if (!valid) return -1;

  double* data = static_cast<double*>(std::malloc(annos.size() * 18 * sizeof(double)));
  if (!data) return -1;
  for (size_t k = 0; k < annos.size(); ++k) {
    double* row = data + k * 18;
    row[0] = annos[k].frame_id;
    row[1] = annos[k].obj_id;
    std::memcpy(row + 2, annos[k].bbox, 4 * sizeof(double));
    std::memcpy(row + 6, annos[k].R, 9 * sizeof(double));
    std::memcpy(row + 15, annos[k].t, 3 * sizeof(double));
  }
  *out_data = data;
  return static_cast<long>(annos.size());
}

// Parses info.yml into rows of [frame, K(9), depth_scale] (11 doubles).
long parse_info_yml(const char* path, double** out_data) {
  std::string s = read_file(path);
  if (s.empty()) return -1;

  std::vector<InfoEntry> entries;
  InfoEntry cur{};
  bool have = false;
  bool valid = true;

  size_t i = 0;
  while (i < s.size() && valid) {
    size_t line_end = s.find('\n', i);
    if (line_end == std::string::npos) line_end = s.size();

    int fid = parse_frame_header(s, i, line_end);
    if (fid >= 0) {
      if (have) entries.push_back(cur);
      std::memset(&cur, 0, sizeof(cur));
      cur.frame_id = fid;
      cur.depth_scale = 1.0;
      have = true;
      i = line_end + 1;
      continue;
    }

    size_t j = i;
    while (j < line_end && s[j] == ' ') ++j;
    if (j < line_end) {
      int n = 0;
      if (key_at(s, j, "cam_K:")) {
        size_t k = j + 6;
        valid = parse_flow_list(s, k, cur.K, 9, &n) && n == 9;
        i = k;
        line_end = s.find('\n', i);
        if (line_end == std::string::npos) line_end = s.size();
      } else if (key_at(s, j, "depth_scale:")) {
        cur.depth_scale = std::atof(s.c_str() + j + 12);
      }
    }
    i = line_end + 1;
  }
  if (have) entries.push_back(cur);
  if (!valid) return -1;

  double* data = static_cast<double*>(std::malloc(entries.size() * 11 * sizeof(double)));
  if (!data) return -1;
  for (size_t k = 0; k < entries.size(); ++k) {
    double* row = data + k * 11;
    row[0] = entries[k].frame_id;
    std::memcpy(row + 1, entries[k].K, 9 * sizeof(double));
    row[10] = entries[k].depth_scale;
  }
  *out_data = data;
  return static_cast<long>(entries.size());
}

void linemod_free(double* p) { std::free(p); }

}  // extern "C"

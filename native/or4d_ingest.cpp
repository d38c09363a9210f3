// or4d_ingest — native data-ingest runtime for the or4d_tpu framework.
//
// The reference pipeline leans on open3d (C++) for PCD IO and voxel
// downsampling inside its DataLoader workers (or_dataset.py,
// data_preparation_utils.py:37-49). This library provides the equivalent
// host-side hot loops as a small C++ runtime consumed through ctypes:
//
//   * PCD v0.7 parsing: ascii, binary, and binary_compressed (LZF) with
//     x/y/z/rgb field extraction,
//   * LZF decompression (the PCL binary_compressed codec),
//   * voxel-grid downsample index selection (up to 8 lowest-index points per
//     voxel — the deterministic re-spec of voxel_down_sample_and_trace),
//   * fused crop + per-object mask extraction for relation-crop assembly.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>
#include <unordered_map>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// LZF decompression (PCL-compatible)
// ---------------------------------------------------------------------------
// Returns decompressed size, or -1 on malformed input.
long or4d_lzf_decompress(const unsigned char* in, long in_len,
                         unsigned char* out, long out_len) {
  const unsigned char* ip = in;
  const unsigned char* in_end = in + in_len;
  unsigned char* op = out;
  unsigned char* out_end = out + out_len;

  while (ip < in_end) {
    unsigned int ctrl = *ip++;
    if (ctrl < (1 << 5)) {  // literal run of ctrl+1 bytes
      ctrl++;
      if (op + ctrl > out_end || ip + ctrl > in_end) return -1;
      std::memcpy(op, ip, ctrl);
      op += ctrl;
      ip += ctrl;
    } else {  // back reference
      unsigned int len = ctrl >> 5;
      if (len == 7) {
        if (ip >= in_end) return -1;
        len += *ip++;
      }
      if (ip >= in_end) return -1;
      unsigned char* ref = op - ((ctrl & 0x1f) << 8) - 1;
      ref -= *ip++;
      if (ref < out || op + len + 2 > out_end) return -1;
      // overlapping copy, byte by byte by design
      for (unsigned int i = 0; i < len + 2; i++) *op++ = *ref++;
    }
  }
  return (long)(op - out);
}

// ---------------------------------------------------------------------------
// Voxel-grid downsample index selection
// ---------------------------------------------------------------------------
// Keep up to max_per_voxel lowest-index points per occupied voxel.
// out_idx must have capacity n. Returns number of kept indices.
long or4d_voxel_downsample(const float* xyz, long n, float voxel_size,
                           int max_per_voxel, int64_t* out_idx) {
  if (n <= 0 || voxel_size <= 0) return 0;
  float mn[3] = {xyz[0], xyz[1], xyz[2]};
  float mx[3] = {xyz[0], xyz[1], xyz[2]};
  for (long i = 1; i < n; i++)
    for (int d = 0; d < 3; d++) {
      mn[d] = std::min(mn[d], xyz[i * 3 + d]);
      mx[d] = std::max(mx[d], xyz[i * 3 + d]);
    }
  // collision-free mixed-radix voxel key (identical to the numpy twin in
  // data/prep.py); grids this data produces are far below the 2^64 bound,
  // checked anyway so a degenerate input fails loudly instead of colliding
  uint64_t dims[3];
  for (int d = 0; d < 3; d++)
    dims[d] = (uint64_t)std::floor((mx[d] - mn[d]) / voxel_size) + 1;
  long double total = (long double)dims[0] * dims[1] * dims[2];
  if (total > 1.8e19L) return -1;

  std::unordered_map<uint64_t, int> counts;
  counts.reserve((size_t)n / 4 + 8);
  std::vector<int64_t> kept;
  kept.reserve((size_t)n / 4 + 8);
  for (long i = 0; i < n; i++) {
    uint64_t vx = (uint64_t)std::floor((xyz[i * 3 + 0] - mn[0]) / voxel_size);
    uint64_t vy = (uint64_t)std::floor((xyz[i * 3 + 1] - mn[1]) / voxel_size);
    uint64_t vz = (uint64_t)std::floor((xyz[i * 3 + 2] - mn[2]) / voxel_size);
    uint64_t key = (vx * dims[1] + vy) * dims[2] + vz;
    int& c = counts[key];
    if (c < max_per_voxel) {
      kept.push_back(i);
      c++;
    }
  }
  std::sort(kept.begin(), kept.end());
  std::memcpy(out_idx, kept.data(), kept.size() * sizeof(int64_t));
  return (long)kept.size();
}

// The reference sweep (data_preparation_utils.py:37-49): coarsen from
// voxel 15 by 5 up to 95 until the survivor count drops to <= target; return
// the last count above target (or all indices). Returns kept count.
long or4d_downsample_sweep(const float* xyz, long n, long target,
                           int max_per_voxel, int64_t* out_idx) {
  if (n <= target) {
    for (long i = 0; i < n; i++) out_idx[i] = i;
    return n;
  }
  std::vector<int64_t> best(n);
  for (long i = 0; i < n; i++) best[i] = i;
  long best_len = n;
  std::vector<int64_t> buf(n);
  for (int vs = 15; vs < 100; vs += 5) {
    long len = or4d_voxel_downsample(xyz, n, (float)vs, max_per_voxel, buf.data());
    if (len < 0) return -1;
    if (len > target) {
      best.assign(buf.begin(), buf.begin() + len);
      best_len = len;
    } else {
      break;
    }
  }
  std::memcpy(out_idx, best.data(), best_len * sizeof(int64_t));
  return best_len;
}

// ---------------------------------------------------------------------------
// Fused crop: bbox filter + per-point membership channel
// ---------------------------------------------------------------------------
// points (n,3) xyz; labels (n) instance ids. Writes indices of points inside
// [mn, mx] to out_idx and mask channel (1 if label==sub, 2 if label==obj,
// else 0) to out_mask. Returns count.
long or4d_crop_union(const float* xyz, const int32_t* labels, long n,
                     const float* mn, const float* mx, int32_t sub,
                     int32_t obj, int64_t* out_idx, float* out_mask) {
  long k = 0;
  for (long i = 0; i < n; i++) {
    const float* p = xyz + i * 3;
    if (p[0] > mn[0] && p[0] < mx[0] && p[1] > mn[1] && p[1] < mx[1] &&
        p[2] > mn[2] && p[2] < mx[2]) {
      out_idx[k] = i;
      out_mask[k] = labels[i] == sub ? 1.0f : (labels[i] == obj ? 2.0f : 0.0f);
      k++;
    }
  }
  return k;
}

// ---------------------------------------------------------------------------
// PCD parsing
// ---------------------------------------------------------------------------
// Parses a PCD v0.7 file; extracts x, y, z and rgb (packed float or separate
// r/g/b) into out (n, 6) [xyz, rgb in 0..1]. Returns point count, or -1 on
// error. Call with out == nullptr to query the count first.
long or4d_read_pcd(const char* path, float* out, long capacity) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  char line[1024];
  std::vector<std::string> fields;
  std::vector<int> sizes, counts;
  std::vector<char> types;
  long n_points = -1;
  std::string data_mode;
  long header_end = 0;

  while (std::fgets(line, sizeof(line), f)) {
    std::string s(line);
    if (s.rfind("FIELDS", 0) == 0) {
      char buf[1024];
      std::strncpy(buf, s.c_str() + 7, sizeof(buf) - 1);
      for (char* tok = std::strtok(buf, " \r\n"); tok; tok = std::strtok(nullptr, " \r\n"))
        fields.emplace_back(tok);
    } else if (s.rfind("SIZE", 0) == 0) {
      char buf[1024];
      std::strncpy(buf, s.c_str() + 5, sizeof(buf) - 1);
      for (char* tok = std::strtok(buf, " \r\n"); tok; tok = std::strtok(nullptr, " \r\n"))
        sizes.push_back(std::atoi(tok));
    } else if (s.rfind("TYPE", 0) == 0) {
      char buf[1024];
      std::strncpy(buf, s.c_str() + 5, sizeof(buf) - 1);
      for (char* tok = std::strtok(buf, " \r\n"); tok; tok = std::strtok(nullptr, " \r\n"))
        types.push_back(tok[0]);
    } else if (s.rfind("COUNT", 0) == 0) {
      char buf[1024];
      std::strncpy(buf, s.c_str() + 6, sizeof(buf) - 1);
      for (char* tok = std::strtok(buf, " \r\n"); tok; tok = std::strtok(nullptr, " \r\n"))
        counts.push_back(std::atoi(tok));
    } else if (s.rfind("POINTS", 0) == 0) {
      n_points = std::atol(s.c_str() + 7);
    } else if (s.rfind("DATA", 0) == 0) {
      data_mode = s.substr(5);
      while (!data_mode.empty() && (data_mode.back() == '\n' || data_mode.back() == '\r'))
        data_mode.pop_back();
      header_end = std::ftell(f);
      break;
    }
  }
  if (n_points < 0 || fields.empty()) {
    std::fclose(f);
    return -1;
  }
  if (out == nullptr) {
    std::fclose(f);
    return n_points;
  }
  if (capacity < n_points) {
    std::fclose(f);
    return -1;
  }
  if (counts.empty()) counts.assign(fields.size(), 1);

  int xi = -1, yi = -1, zi = -1, rgbi = -1, ri = -1, gi = -1, bi = -1;
  std::vector<long> offsets(fields.size(), 0);
  long stride = 0;
  for (size_t i = 0; i < fields.size(); i++) {
    offsets[i] = stride;
    stride += (long)sizes[i] * counts[i];
    if (fields[i] == "x") xi = (int)i;
    else if (fields[i] == "y") yi = (int)i;
    else if (fields[i] == "z") zi = (int)i;
    else if (fields[i] == "rgb" || fields[i] == "rgba") rgbi = (int)i;
    else if (fields[i] == "r") ri = (int)i;
    else if (fields[i] == "g") gi = (int)i;
    else if (fields[i] == "b") bi = (int)i;
  }
  if (xi < 0 || yi < 0 || zi < 0) {
    std::fclose(f);
    return -1;
  }

  auto emit = [&](const unsigned char* rec, long i, bool soa, const unsigned char* base, long n) {
    auto fld = [&](int fi) -> const unsigned char* {
      if (!soa) return rec + offsets[fi];
      // binary_compressed stores fields SoA: all x, then all y, ...
      long field_bytes = (long)sizes[fi] * counts[fi];
      long soa_off = 0;
      for (int j = 0; j < fi; j++) soa_off += (long)sizes[j] * counts[j] * n;
      return base + soa_off + i * field_bytes;
    };
    float v[3];
    std::memcpy(&v[0], fld(xi), 4);
    std::memcpy(&v[1], fld(yi), 4);
    std::memcpy(&v[2], fld(zi), 4);
    out[i * 6 + 0] = v[0];
    out[i * 6 + 1] = v[1];
    out[i * 6 + 2] = v[2];
    float r = 0, g = 0, b = 0;
    if (rgbi >= 0) {
      uint32_t packed;
      std::memcpy(&packed, fld(rgbi), 4);
      r = ((packed >> 16) & 0xFF) / 255.0f;
      g = ((packed >> 8) & 0xFF) / 255.0f;
      b = (packed & 0xFF) / 255.0f;
    } else if (ri >= 0 && gi >= 0 && bi >= 0) {
      r = fld(ri)[0] / 255.0f;
      g = fld(gi)[0] / 255.0f;
      b = fld(bi)[0] / 255.0f;
    }
    out[i * 6 + 3] = r;
    out[i * 6 + 4] = g;
    out[i * 6 + 5] = b;
  };

  long result = n_points;
  if (data_mode == "ascii") {
    std::fseek(f, header_end, SEEK_SET);
    for (long i = 0; i < n_points; i++) {
      if (!std::fgets(line, sizeof(line), f)) { result = i; break; }
      std::vector<double> vals;
      for (char* tok = std::strtok(line, " \r\n"); tok; tok = std::strtok(nullptr, " \r\n"))
        vals.push_back(std::atof(tok));
      if ((int)vals.size() < (int)fields.size()) { result = -1; break; }
      out[i * 6 + 0] = (float)vals[xi];
      out[i * 6 + 1] = (float)vals[yi];
      out[i * 6 + 2] = (float)vals[zi];
      float r = 0, g = 0, b = 0;
      if (rgbi >= 0) {
        float fv = (float)vals[rgbi];
        uint32_t packed;
        std::memcpy(&packed, &fv, 4);
        r = ((packed >> 16) & 0xFF) / 255.0f;
        g = ((packed >> 8) & 0xFF) / 255.0f;
        b = (packed & 0xFF) / 255.0f;
      } else if (ri >= 0) {
        r = (float)vals[ri] / 255.0f;
        g = (float)vals[gi] / 255.0f;
        b = (float)vals[bi] / 255.0f;
      }
      out[i * 6 + 3] = r; out[i * 6 + 4] = g; out[i * 6 + 5] = b;
    }
  } else if (data_mode == "binary") {
    std::vector<unsigned char> buf((size_t)stride * n_points);
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) result = -1;
    else
      for (long i = 0; i < n_points; i++) emit(buf.data() + i * stride, i, false, nullptr, n_points);
  } else if (data_mode == "binary_compressed") {
    uint32_t comp_size = 0, uncomp_size = 0;
    if (std::fread(&comp_size, 4, 1, f) != 1 || std::fread(&uncomp_size, 4, 1, f) != 1) {
      result = -1;
    } else {
      std::vector<unsigned char> comp(comp_size), uncomp(uncomp_size);
      if (std::fread(comp.data(), 1, comp_size, f) != comp_size) result = -1;
      else if (or4d_lzf_decompress(comp.data(), comp_size, uncomp.data(), uncomp_size) != (long)uncomp_size)
        result = -1;
      else
        for (long i = 0; i < n_points; i++) emit(nullptr, i, true, uncomp.data(), n_points);
    }
  } else {
    result = -1;
  }
  std::fclose(f);
  return result;
}

}  // extern "C"

// Priority-flood watershed with compactness and watershed lines.
//
// Native replacement for the reference's skimage.segmentation.watershed call
// (hcat/segment.py:468-471: connectivity=1, compactness=0.01,
// watershed_line=True, mask-limited, seeded).  Implemented from the classic
// Meyer flooding algorithm plus the compact-watershed priority term
// (Neubert & Protzel 2014): a pixel's flood priority is
//     image[p] + compactness * ||p - source_seed(p)||
// and, with watershed lines enabled, a pixel whose resolved neighbors carry
// a different label becomes a line (label 0) and does not propagate.
//
// The volume is [X, Y, Z] C-contiguous int/float arrays; connectivity 1
// means face neighbors (6 in 3D), 2 adds edges, 3 adds corners.
//
// Exposed via a C ABI for ctypes (see hcunet_tpu/ops/watershed.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Entry {
  double prio;
  long long age;
  long long idx;
  int32_t label;
  long long src;
};

struct EntryCmp {
  bool operator()(const Entry& a, const Entry& b) const {
    if (a.prio != b.prio) return a.prio > b.prio;  // min-heap on priority
    return a.age > b.age;                          // FIFO tie-break
  }
};

}  // namespace

extern "C" {

// image: float64[n], markers(in/out): int32[n], mask: uint8[n]
// dims: int64[3] (X, Y, Z); set Z=1 for 2D.
// Returns 0 on success.
int watershed3d(const double* image, int32_t* output, const uint8_t* mask,
                const int64_t* dims, int connectivity, double compactness,
                int watershed_line) {
  const int64_t X = dims[0], Y = dims[1], Z = dims[2];
  const int64_t n = X * Y * Z;
  const int64_t sx = Y * Z, sy = Z, sz = 1;

  // neighbor offsets by connectivity (squared center distance <= conn)
  std::vector<long long> offs;
  std::vector<int> d_[3];
  for (int dx = -1; dx <= 1; ++dx)
    for (int dy = -1; dy <= 1; ++dy)
      for (int dz = -1; dz <= 1; ++dz) {
        int m = dx * dx + dy * dy + dz * dz;
        if (m == 0 || m > connectivity) continue;
        offs.push_back((long long)dx * sx + dy * sy + dz * sz);
        d_[0].push_back(dx);
        d_[1].push_back(dy);
        d_[2].push_back(dz);
      }
  const size_t n_off = offs.size();

  std::vector<uint8_t> resolved(n, 0);
  std::priority_queue<Entry, std::vector<Entry>, EntryCmp> heap;
  long long age = 0;

  auto coords = [&](long long idx, long long& x, long long& y, long long& z) {
    x = idx / sx;
    y = (idx % sx) / sy;
    z = idx % sy;
  };

  for (long long i = 0; i < n; ++i) {
    if (output[i] != 0 && (!mask || mask[i])) {
      heap.push(Entry{image[i], age++, i, output[i], i});
    } else if (mask && !mask[i]) {
      resolved[i] = 1;  // outside mask: never touched
      output[i] = 0;
    }
  }

  long long px, py, pz, qx, qy, qz, sxx, syy, szz;
  while (!heap.empty()) {
    Entry e = heap.top();
    heap.pop();
    if (resolved[e.idx]) continue;
    resolved[e.idx] = 1;

    if (watershed_line) {
      // if a resolved neighbor belongs to a different region, this pixel is
      // a watershed line: label 0, no propagation.
      bool line = false;
      coords(e.idx, px, py, pz);
      for (size_t k = 0; k < n_off; ++k) {
        qx = px + d_[0][k];
        qy = py + d_[1][k];
        qz = pz + d_[2][k];
        if (qx < 0 || qx >= X || qy < 0 || qy >= Y || qz < 0 || qz >= Z)
          continue;
        long long q = e.idx + offs[k];
        if (resolved[q] && output[q] != 0 && output[q] != e.label) {
          line = true;
          break;
        }
      }
      if (line) {
        output[e.idx] = 0;
        continue;
      }
    }
    output[e.idx] = e.label;

    coords(e.idx, px, py, pz);
    coords(e.src, sxx, syy, szz);
    for (size_t k = 0; k < n_off; ++k) {
      qx = px + d_[0][k];
      qy = py + d_[1][k];
      qz = pz + d_[2][k];
      if (qx < 0 || qx >= X || qy < 0 || qy >= Y || qz < 0 || qz >= Z) continue;
      long long q = e.idx + offs[k];
      if (resolved[q] || output[q] != 0) continue;
      double prio = image[q];
      if (compactness > 0) {
        double ddx = (double)(qx - sxx), ddy = (double)(qy - syy),
               ddz = (double)(qz - szz);
        prio += compactness * std::sqrt(ddx * ddx + ddy * ddy + ddz * ddz);
      }
      heap.push(Entry{prio, age++, q, e.label, e.src});
    }
  }
  return 0;
}

// Connected-component labeling (faces connectivity), uint8 in, int32 out.
int label3d(const uint8_t* binary, int32_t* out, const int64_t* dims) {
  const int64_t X = dims[0], Y = dims[1], Z = dims[2];
  const int64_t n = X * Y * Z;
  const int64_t sx = Y * Z, sy = Z;
  std::memset(out, 0, n * sizeof(int32_t));
  int32_t next = 0;
  std::vector<long long> stack;
  for (long long i = 0; i < n; ++i) {
    if (!binary[i] || out[i]) continue;
    ++next;
    stack.push_back(i);
    out[i] = next;
    while (!stack.empty()) {
      long long p = stack.back();
      stack.pop_back();
      long long x = p / sx, y = (p % sx) / sy, z = p % sy;
      const long long nb[6][4] = {
          {x - 1, y, z, p - sx}, {x + 1, y, z, p + sx}, {x, y - 1, z, p - sy},
          {x, y + 1, z, p + sy}, {x, y, z - 1, p - 1},  {x, y, z + 1, p + 1},
      };
      for (auto& q : nb) {
        if (q[0] < 0 || q[0] >= X || q[1] < 0 || q[1] >= Y || q[2] < 0 ||
            q[2] >= Z)
          continue;
        if (binary[q[3]] && !out[q[3]]) {
          out[q[3]] = next;
          stack.push_back(q[3]);
        }
      }
    }
  }
  return next;
}

}  // extern "C"

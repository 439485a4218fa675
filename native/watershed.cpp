// Priority-flood watershed with compactness and watershed lines.
//
// Native replacement for the reference's skimage.segmentation.watershed call
// (hcat/segment.py:468-471: connectivity=1, compactness=0.01,
// watershed_line=True, mask-limited, seeded).  Transcription of the
// published raveled priority-flood algorithm (Meyer flooding + the
// compact-watershed priority term of Neubert & Protzel 2014): a pixel's
// flood priority is
//     image[p] + compactness * ||p - source_seed(p)||
// labels are assigned at pop time from the entry's source pixel, and, with
// watershed lines enabled, a popped pixel whose scan finds an already-
// labeled neighbor of a different region becomes a line (label 0) and
// stops flooding at that neighbor.
//
// The exact semantics (marker age order, neighbor scan order, first-wins
// guard, interleaved line check with break) deliberately match
// tests/watershed_oracle.py bit-for-bit so the two can be compared on
// plateaus too — see that file's docstring for the documented choices.
//
// The volume is [X, Y, Z] C-contiguous int/float arrays; connectivity 1
// means face neighbors (6 in 3D), 2 adds edges, 3 adds corners.
//
// Exposed via a C ABI for ctypes (see hcunet_tpu/ops/watershed.py).

#include <algorithm>
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
  long long src;
};

struct EntryCmp {
  bool operator()(const Entry& a, const Entry& b) const {
    if (a.prio != b.prio) return a.prio > b.prio;  // min-heap on priority
    return a.age > b.age;                          // FIFO tie-break
  }
};

struct Offset {
  int dx, dy, dz, m;
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

  // neighbor offsets: C-order enumeration, stable-sorted by squared
  // distance (the oracle's scan order).
  std::vector<Offset> off_list;
  for (int dx = -1; dx <= 1; ++dx)
    for (int dy = -1; dy <= 1; ++dy)
      for (int dz = -1; dz <= 1; ++dz) {
        int m = dx * dx + dy * dy + dz * dz;
        if (m == 0 || m > connectivity) continue;
        off_list.push_back(Offset{dx, dy, dz, m});
      }
  std::stable_sort(off_list.begin(), off_list.end(),
                   [](const Offset& a, const Offset& b) { return a.m < b.m; });
  std::vector<long long> offs;
  std::vector<int> d_[3];
  for (const auto& o : off_list) {
    offs.push_back((long long)o.dx * sx + o.dy * sy + o.dz * sz);
    d_[0].push_back(o.dx);
    d_[1].push_back(o.dy);
    d_[2].push_back(o.dz);
  }
  const size_t n_off = offs.size();

  std::priority_queue<Entry, std::vector<Entry>, EntryCmp> heap;
  long long age = 0;

  auto coords = [&](long long idx, long long& x, long long& y, long long& z) {
    x = idx / sx;
    y = (idx % sx) / sy;
    z = idx % sy;
  };

  // markers outside the mask are cleared; the rest are pushed in raveled
  // order with strictly increasing ages.
  for (long long i = 0; i < n; ++i) {
    if (mask && !mask[i]) {
      output[i] = 0;
    } else if (output[i] != 0) {
      heap.push(Entry{image[i], age++, i, i});
    }
  }

  // watershed-line pixels are resolved with a sentinel during the flood
  // (never re-claimed, never flooded through, and not a "different region"
  // for the line test) and emitted as 0 — see tests/watershed_oracle.py.
  const int32_t LINE = -2147483647;
  long long px, py, pz, qx, qy, qz, sxx, syy, szz;
  while (!heap.empty()) {
    Entry e = heap.top();
    heap.pop();
    // first-wins: already resolved (and not its own marker) => skip
    if (output[e.idx] != 0 && e.idx != e.src) continue;
    const int32_t lab = output[e.src];
    if (lab <= 0) continue;  // source marker became a line: drop its flood
    output[e.idx] = lab;

    coords(e.idx, px, py, pz);
    coords(e.src, sxx, syy, szz);
    for (size_t k = 0; k < n_off; ++k) {
      qx = px + d_[0][k];
      qy = py + d_[1][k];
      qz = pz + d_[2][k];
      if (qx < 0 || qx >= X || qy < 0 || qy >= Y || qz < 0 || qz >= Z) continue;
      long long q = e.idx + offs[k];
      if (mask && !mask[q]) continue;
      if (watershed_line && output[q] > 0 && output[q] != lab) {
        // an already-labeled neighbor of another region: this pixel is a
        // watershed line; stop flooding from it (earlier neighbors in scan
        // order were already pushed — same as the oracle).
        output[e.idx] = LINE;
        break;
      }
      if (output[q] != 0) continue;
      double prio = image[q];
      if (compactness > 0) {
        double ddx = (double)(qx - sxx), ddy = (double)(qy - syy),
               ddz = (double)(qz - szz);
        prio += compactness * std::sqrt(ddx * ddx + ddy * ddy + ddz * ddz);
      }
      heap.push(Entry{prio, age++, q, e.src});
    }
  }
  for (long long i = 0; i < n; ++i)
    if (output[i] == LINE) output[i] = 0;
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

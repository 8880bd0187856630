// Host-side native runtime: verification, data generation, CPU oracle sort.
//
// Role-equivalent of the reference's host C++ layer: the demo-data generator
// (shuffled 0..N-1 permutation, main.cpp:117-149), the CPU verification pass
// (readback + linear is-sorted scan, ParallelSort.cpp:326-352 — which took
// 1.11 s for 1M rows, durations.txt:5), and a stable LSD radix sort that
// serves as the big-N oracle where np.sort becomes the bottleneck of the
// benchmark harness.  Loaded from Python via ctypes (no pybind11 in the
// image); every entry point is plain C ABI.
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Linear is-sorted scan.  Returns the index of the first violation, or -1 if
// sorted.  (The reference prints every violation; returning the first is
// enough for a test oracle.)
int64_t qe_first_unsorted_u32(const uint32_t* keys, int64_t n) {
  for (int64_t i = 1; i < n; ++i) {
    if (keys[i] < keys[i - 1]) return i;
  }
  return -1;
}

// splitmix64 — fast deterministic PRNG for benchmark key generation.
static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9E3779B97F4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

// Fill with uniform random uint32 keys.
void qe_random_u32(uint32_t* out, int64_t n, uint64_t seed) {
  uint64_t s = seed;
  int64_t i = 0;
  for (; i + 1 < n; i += 2) {
    uint64_t r = splitmix64(s);
    out[i] = (uint32_t)r;
    out[i + 1] = (uint32_t)(r >> 32);
  }
  if (i < n) out[i] = (uint32_t)splitmix64(s);
}

// Shuffled identity permutation 0..N-1 — the reference's demo dataset
// (main.cpp:120-125), whose sorted form is exactly arange: a bit-exact
// oracle with no reference sort needed.
void qe_shuffled_permutation(uint32_t* out, int64_t n, uint64_t seed) {
  for (int64_t i = 0; i < n; ++i) out[i] = (uint32_t)i;
  uint64_t s = seed;
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = (int64_t)(splitmix64(s) % (uint64_t)(i + 1));
    uint32_t t = out[i];
    out[i] = out[j];
    out[j] = t;
  }
}

// Stable LSD radix sort of (key, index) pairs, 8-bit digits, 4 passes.
// The CPU oracle for large-N verification (np.sort+argsort get slow and
// np.argsort(kind='stable') is memory-hungry at 1e9 rows).
void qe_radix_sort_pairs_u32(uint32_t* keys, uint32_t* idx, int64_t n) {
  std::vector<uint32_t> kbuf(n), ibuf(n);
  uint32_t* ksrc = keys;
  uint32_t* isrc = idx;
  uint32_t* kdst = kbuf.data();
  uint32_t* idst = ibuf.data();
  for (int pass = 0; pass < 4; ++pass) {
    const int shift = pass * 8;
    int64_t hist[256] = {0};
    for (int64_t i = 0; i < n; ++i) hist[(ksrc[i] >> shift) & 0xFF]++;
    int64_t off[256];
    int64_t acc = 0;
    for (int d = 0; d < 256; ++d) {
      off[d] = acc;
      acc += hist[d];
    }
    for (int64_t i = 0; i < n; ++i) {
      const int d = (ksrc[i] >> shift) & 0xFF;
      const int64_t o = off[d]++;
      kdst[o] = ksrc[i];
      idst[o] = isrc[i];
    }
    uint32_t* t;
    t = ksrc; ksrc = kdst; kdst = t;
    t = isrc; isrc = idst; idst = t;
  }
  // 4 passes = even number of swaps: data is back in keys/idx already.
  (void)0;
}

}  // extern "C"

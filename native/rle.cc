// Native COCO-RLE codec for the host data plane.
//
// Replaces the pycocotools C extension (used throughout the reference's
// dataset + benchmarks) for bulk mask decode/encode during training-data
// loading. The pure-numpy implementation in data/rle.py is the reference;
// this one is the throughput path (single pass, no intermediate repeat
// buffers). Bound via ctypes from data/rle_native.py; parity-tested against
// the numpy version.
//
// Build: bash native/build.sh  (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// Decode the COCO LEB-style counts string into int64 runs.
// Returns the number of runs written, or -1 if out_capacity is exceeded.
long long rle_decode_counts(const char* data, long long n, long long* out,
                            long long out_capacity) {
  long long m = 0;
  long long i = 0;
  while (i < n) {
    long long x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (i >= n) return -2;  // truncated input
      long long c = (long long)(data[i]) - 48;
      i++;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      k++;
      if (!more && (c & 0x10)) {
        x |= -1LL << (5 * k);
      }
    }
    if (m > 2) x += out[m - 2];
    if (m >= out_capacity) return -1;
    out[m++] = x;
  }
  return m;
}

// Expand runs into a column-major (Fortran) H x W uint8 mask, written in
// C-order row-major layout (transposed on the fly, single pass).
// Returns 0 on success, -1 if the runs do not cover h*w pixels.
int rle_runs_to_mask(const long long* runs, long long m, long long h,
                     long long w, uint8_t* mask /* h*w, row-major */) {
  long long idx = 0;  // position in F-order
  uint8_t val = 0;
  long long total = h * w;
  for (long long r = 0; r < m; r++) {
    long long cnt = runs[r];
    if (cnt < 0 || idx + cnt > total) return -1;
    if (val) {
      for (long long j = 0; j < cnt; j++) {
        long long f = idx + j;            // F-order index
        long long row = f % h, col = f / h;
        mask[row * w + col] = 1;
      }
    }
    idx += cnt;
    val ^= 1;
  }
  return idx == total ? 0 : -1;
}

// Encode a row-major H x W binary mask into runs (column-major convention).
// Returns the number of runs, or -1 on overflow.
long long rle_mask_to_runs(const uint8_t* mask, long long h, long long w,
                           long long* out, long long out_capacity) {
  long long m = 0;
  uint8_t cur = 0;
  long long run = 0;
  for (long long col = 0; col < w; col++) {
    for (long long row = 0; row < h; row++) {
      uint8_t v = mask[row * w + col] ? 1 : 0;
      if (v == cur) {
        run++;
      } else {
        if (m >= out_capacity) return -1;
        out[m++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  if (m >= out_capacity) return -1;
  out[m++] = run;
  return m;
}

}  // extern "C"

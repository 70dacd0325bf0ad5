// mtp_native: C-ABI host kernels for the data/eval hot paths.
//
// The reference's native code is CUDA/HIP compute (DCNv3); on TPU the compute
// path is XLA/Pallas, so the native layer lives where it matters on a TPU
// host: the CPU-bound data pipeline and metric merging.  Exposed via ctypes:
//
//   rle_decode(counts, n_counts, h, w, out)       COCO RLE → mask (col-major
//                                                 runs, like pycocotools)
//   rle_encode(mask, h, w, out_counts, max_out)   mask → counts; returns n
//   rbox_iou(a, n, b, m, out)                     pairwise rotated IoU via
//                                                 Sutherland–Hodgman clipping
//
// Build: g++ -O3 -shared -fPIC -o libmtp_native.so mtp_native.cc

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

void rle_decode(const int64_t* counts, int64_t n_counts, int64_t h, int64_t w,
                uint8_t* out /* h*w row-major */) {
  // runs are column-major over the h*w grid, starting with zeros
  std::memset(out, 0, h * w);
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t i = 0; i < n_counts; ++i) {
    int64_t c = counts[i];
    if (val) {
      int64_t end = std::min(pos + c, h * w);
      for (int64_t p = pos; p < end; ++p) {
        out[(p % h) * w + (p / h)] = 1;  // col-major position → row-major out
      }
    }
    pos += c;
    val ^= 1;
  }
}

int64_t rle_encode(const uint8_t* mask /* h*w row-major */, int64_t h,
                   int64_t w, int64_t* out_counts, int64_t max_out) {
  int64_t n = 0;
  int64_t run = 0;
  uint8_t cur = 0;
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y) {
      uint8_t v = mask[y * w + x] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        if (n >= max_out) return -1;
        out_counts[n++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  if (n >= max_out) return -1;
  out_counts[n++] = run;
  return n;
}

namespace {

struct Pt { double x, y; };

// rbox (cx, cy, w, h, theta) → 4 corners
void corners(const float* rb, Pt* c) {
  double cx = rb[0], cy = rb[1], hw = rb[2] * 0.5, hh = rb[3] * 0.5;
  double co = std::cos((double)rb[4]), si = std::sin((double)rb[4]);
  const double dx[4] = {-hw, hw, hw, -hw};
  const double dy[4] = {-hh, -hh, hh, hh};
  for (int i = 0; i < 4; ++i) {
    c[i].x = cx + dx[i] * co - dy[i] * si;
    c[i].y = cy + dx[i] * si + dy[i] * co;
  }
}

double polygon_area(const Pt* p, int n) {
  double a = 0;
  for (int i = 0; i < n; ++i) {
    int j = (i + 1) % n;
    a += p[i].x * p[j].y - p[j].x * p[i].y;
  }
  return std::fabs(a) * 0.5;
}

// Sutherland–Hodgman: clip subject polygon by convex clip quad
double intersect_area(const Pt* subj4, const Pt* clip4) {
  Pt buf1[16], buf2[16];
  Pt* in = buf1;
  Pt* out = buf2;
  int n_in = 4;
  std::memcpy(in, subj4, 4 * sizeof(Pt));
  // ensure counter-clockwise clip winding
  double a2 = 0;
  for (int i = 0; i < 4; ++i) {
    int j = (i + 1) % 4;
    a2 += clip4[i].x * clip4[j].y - clip4[j].x * clip4[i].y;
  }
  int order[4] = {0, 1, 2, 3};
  if (a2 < 0) { order[1] = 3; order[3] = 1; }

  for (int e = 0; e < 4 && n_in > 0; ++e) {
    Pt a = clip4[order[e]];
    Pt b = clip4[order[(e + 1) % 4]];
    double ex = b.x - a.x, ey = b.y - a.y;
    int n_out = 0;
    for (int i = 0; i < n_in; ++i) {
      Pt cur = in[i];
      Pt nxt = in[(i + 1) % n_in];
      double s_cur = ex * (cur.y - a.y) - ey * (cur.x - a.x);
      double s_nxt = ex * (nxt.y - a.y) - ey * (nxt.x - a.x);
      bool in_cur = s_cur >= 0, in_nxt = s_nxt >= 0;
      if (in_cur) out[n_out++] = cur;
      if (in_cur != in_nxt) {
        double t = s_cur / (s_cur - s_nxt);
        out[n_out++] = {cur.x + (nxt.x - cur.x) * t,
                        cur.y + (nxt.y - cur.y) * t};
      }
    }
    std::swap(in, out);
    n_in = n_out;
  }
  return n_in ? polygon_area(in, n_in) : 0.0;
}

}  // namespace

void rbox_iou(const float* a, int64_t n, const float* b, int64_t m,
              float* out /* n*m */) {
  for (int64_t i = 0; i < n; ++i) {
    Pt ca[4];
    corners(a + i * 5, ca);
    double area_a = (double)a[i * 5 + 2] * a[i * 5 + 3];
    for (int64_t j = 0; j < m; ++j) {
      Pt cb[4];
      corners(b + j * 5, cb);
      double area_b = (double)b[j * 5 + 2] * b[j * 5 + 3];
      double inter = intersect_area(ca, cb);
      double uni = area_a + area_b - inter;
      out[i * m + j] = (float)(uni > 1e-9 ? inter / uni : 0.0);
    }
  }
}

// Convex-quad IoU ((x1..y4) corner polygons) — the nms_quadri path of the
// FAIR1M multi-scale merge (eval/det_map.py np_quad_iou).  Same
// Sutherland–Hodgman core as rbox_iou; clip winding is normalized inside
// intersect_area, so raw corner order from annotations is fine.
void quad_iou(const float* a, int64_t n, const float* b, int64_t m,
              float* out /* n*m */) {
  for (int64_t i = 0; i < n; ++i) {
    Pt ca[4];
    for (int k = 0; k < 4; ++k)
      ca[k] = {(double)a[i * 8 + 2 * k], (double)a[i * 8 + 2 * k + 1]};
    double area_a = polygon_area(ca, 4);
    for (int64_t j = 0; j < m; ++j) {
      Pt cb[4];
      for (int k = 0; k < 4; ++k)
        cb[k] = {(double)b[j * 8 + 2 * k], (double)b[j * 8 + 2 * k + 1]};
      double area_b = polygon_area(cb, 4);
      double inter = intersect_area(ca, cb);
      double uni = area_a + area_b - inter;
      out[i * m + j] = (float)(uni > 1e-9 ? inter / uni : 0.0);
    }
  }
}

// Packed-bitset binary-mask IoU for COCO segm evaluation
// (eval/coco_eval.py): masks arrive bit-packed (np.packbits row-major),
// intersection = popcount(a & b) over 64-bit words — ~the RLE-IoU speed
// class of pycocotools without decoding to dense float.
// crowd gts use union = area(dt) (COCOeval crowd semantics).
void mask_iou_packed(const uint8_t* dt, int64_t D, const uint8_t* gt,
                     int64_t G, int64_t nbytes, const uint8_t* crowd,
                     double* out /* D*G */, double* d_areas /* D */,
                     double* g_areas /* G */) {
  const int64_t nw = nbytes / 8;          // whole 64-bit words
  const int64_t tail = nbytes - nw * 8;   // leftover bytes
  auto area = [&](const uint8_t* m) -> double {
    const uint64_t* w = (const uint64_t*)m;
    int64_t s = 0;
    for (int64_t k = 0; k < nw; ++k) s += __builtin_popcountll(w[k]);
    for (int64_t k = nw * 8; k < nbytes; ++k)
      s += __builtin_popcount(m[k]);
    return (double)s;
  };
  for (int64_t i = 0; i < D; ++i) d_areas[i] = area(dt + i * nbytes);
  for (int64_t j = 0; j < G; ++j) g_areas[j] = area(gt + j * nbytes);
  for (int64_t i = 0; i < D; ++i) {
    const uint64_t* a = (const uint64_t*)(dt + i * nbytes);
    const uint8_t* ab = dt + i * nbytes;
    for (int64_t j = 0; j < G; ++j) {
      const uint64_t* b = (const uint64_t*)(gt + j * nbytes);
      const uint8_t* bb = gt + j * nbytes;
      int64_t inter = 0;
      for (int64_t k = 0; k < nw; ++k)
        inter += __builtin_popcountll(a[k] & b[k]);
      for (int64_t k = nw * 8; k < nbytes; ++k)
        inter += __builtin_popcount(ab[k] & bb[k]);
      double uni = crowd[j] ? d_areas[i]
                            : d_areas[i] + g_areas[j] - (double)inter;
      out[i * G + j] = uni > 1e-12 ? (double)inter / uni : 0.0;
      (void)tail;
    }
  }
}

}  // extern "C"

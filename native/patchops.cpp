// patchops — native host-side image ops for the patch data pipeline.
//
// The reference hides ~90 ms/item of Python/PIL crop+resize work behind 16
// DataLoader worker processes (ref nuscenes.py:90-194, configs/...yaml:72).
// This build environment (and typical TPU-VM hosts) have few cores per chip,
// so the per-item hot path is implemented natively: square crop with
// zero-padded out-of-bounds handling, bilinear resize to the model input
// size, and nearest-neighbor 2D-bbox mask rasterization — one pass, no
// intermediate PIL objects. Exposed via ctypes (see
// generative_detection_tpu/data/native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC [-fopenmp])

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// PIL-compatible "bilinear" resampling = separable triangle filter whose
// support scales with the downsampling factor (Pillow's Resampling.BILINEAR,
// which the reference uses for every patch resize, is NOT point-sampled
// bilinear on downscale). Out-of-bounds crop pixels read as 0, matching
// PIL crop-then-resize.
namespace {

struct AxisPlan {
  std::vector<int> xmin;    // first source index per output coord
  std::vector<int> count;   // taps per output coord
  std::vector<float> weights;  // concatenated normalized triangle weights
  int max_taps;
};

AxisPlan plan_axis(int in_size, int out_size) {
  AxisPlan p;
  const double scale = (double)in_size / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle support = 1
  p.max_taps = (int)std::ceil(support) * 2 + 1;
  p.xmin.resize(out_size);
  p.count.resize(out_size);
  p.weights.assign((size_t)out_size * p.max_taps, 0.0f);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int lo = (int)(center - support + 0.5);
    int hi = (int)(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > in_size) hi = in_size;
    double total = 0.0;
    float* w = &p.weights[(size_t)xx * p.max_taps];
    for (int x = lo; x < hi; ++x) {
      double t = std::abs((x + 0.5 - center) / filterscale);
      double k = t < 1.0 ? 1.0 - t : 0.0;
      w[x - lo] = (float)k;
      total += k;
    }
    if (total > 0.0)
      for (int x = 0; x < hi - lo; ++x) w[x] = (float)(w[x] / total);
    p.xmin[xx] = lo;
    p.count[xx] = hi - lo;
  }
  return p;
}

}  // namespace

void crop_resize_bilinear_u8(
    const uint8_t* img, int H, int W, int C,
    int cx1, int cy1, int cw, int ch,
    float* out, int outH, int outW) {
  AxisPlan px = plan_axis(cw, outW);
  AxisPlan py = plan_axis(ch, outH);
  // horizontal pass: (ch, outW, C) temp in crop-row space
  std::vector<float> tmp((size_t)ch * outW * C, 0.0f);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < ch; ++y) {
    int sy = y + cy1;
    if (sy < 0 || sy >= H) continue;  // zero-padded rows stay 0
    const uint8_t* row = img + (size_t)sy * W * C;
    float* trow = &tmp[(size_t)y * outW * C];
    for (int ox = 0; ox < outW; ++ox) {
      const float* w = &px.weights[(size_t)ox * px.max_taps];
      int lo = px.xmin[ox], n = px.count[ox];
      for (int c = 0; c < C; ++c) {
        float acc = 0.0f;
        for (int k = 0; k < n; ++k) {
          int sx = lo + k + cx1;
          if (sx >= 0 && sx < W) acc += w[k] * (float)row[(size_t)sx * C + c];
        }
        trow[(size_t)ox * C + c] = acc;
      }
    }
  }
  // vertical pass
#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < outH; ++oy) {
    const float* w = &py.weights[(size_t)oy * py.max_taps];
    int lo = py.xmin[oy], n = py.count[oy];
    float* orow = out + (size_t)oy * outW * C;
    for (int ox = 0; ox < outW; ++ox) {
      for (int c = 0; c < C; ++c) {
        float acc = 0.0f;
        for (int k = 0; k < n; ++k)
          acc += w[k] * tmp[((size_t)(lo + k) * outW + ox) * C + c];
        orow[(size_t)ox * C + c] = acc / 255.0f;
      }
    }
  }
}

// Rasterize the 2D-bbox foreground mask directly at the output resolution.
//   bbox given in *crop-window* coordinates [bx1, by1, bx2, by2)
//   out: outH x outW float32 {0, 1}; nearest-neighbor semantics:
//   out[i] covers source pixel floor((i + 0.5) * size / out)
void bbox_mask_resize(
    int size, float bx1, float by1, float bx2, float by2,
    float* out, int outH, int outW) {
  const float scale_y = (float)size / (float)outH;
  const float scale_x = (float)size / (float)outW;
  const int ibx1 = (int)std::max(bx1, 0.0f);
  const int iby1 = (int)std::max(by1, 0.0f);
  const int ibx2 = (int)std::max(bx2, 0.0f);
  const int iby2 = (int)std::max(by2, 0.0f);
#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < outH; ++oy) {
    int sy = (int)((oy + 0.5f) * scale_y);
    bool in_y = sy >= iby1 && sy < iby2;
    for (int ox = 0; ox < outW; ++ox) {
      int sx = (int)((ox + 0.5f) * scale_x);
      out[oy * outW + ox] = (in_y && sx >= ibx1 && sx < ibx2) ? 1.0f : 0.0f;
    }
  }
}

// Whole-image bilinear resize (background-crop path, ref nuscenes.py:540).
void resize_bilinear_u8(
    const uint8_t* img, int H, int W, int C,
    float* out, int outH, int outW) {
  crop_resize_bilinear_u8(img, H, W, C, 0, 0, W, H, out, outH, outW);
}

// IoU of one candidate box against N boxes; returns max IoU. xyxy float.
float max_iou(const float* box, const float* boxes, int n) {
  float best = 0.0f;
  float a = (box[2] - box[0]) * (box[3] - box[1]);
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    float x1 = std::max(box[0], b[0]);
    float y1 = std::max(box[1], b[1]);
    float x2 = std::min(box[2], b[2]);
    float y2 = std::min(box[3], b[3]);
    float inter = std::max(x2 - x1, 0.0f) * std::max(y2 - y1, 0.0f);
    float bb = (b[2] - b[0]) * (b[3] - b[1]);
    float iou = inter / std::max(a + bb - inter, 1e-9f);
    best = std::max(best, iou);
  }
  return best;
}

}  // extern "C"

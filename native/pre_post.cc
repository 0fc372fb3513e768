// Native host-side pre/post pipeline for exported detection models.
//
// Covers the behavioral surface of the reference's C++/Rust deployment
// examples (examples/YOLOv8-CPP-Inference/inference.cpp:16-185,
// examples/YOLOv8-ONNXRuntime-CPP, examples/YOLOv8-ONNXRuntime-Rust):
// square letterbox, bilinear resize, normalize, both v5 [N,(5+nc)] and
// v8 [(4+nc),N] output layouts, class-argmax scoring, and greedy
// class-offset NMS — implemented dependency-free (no OpenCV) so it links
// anywhere the exported model runs.
//
// Exposed as a C ABI for ctypes/cffi bindings and reused by demo_main.cc.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Bilinear-resize src (h0 x w0 x 3, uint8, row-major HWC) into a letterboxed
// square dst (size x size x 3) padded with pad_value. Returns the scale gain;
// writes x/y offsets to *dw, *dh. Matches the reference LetterBox geometry
// (augment.py:726-752): centered padding, never upscale if scaleup == 0.
float letterbox_u8(const uint8_t* src, int h0, int w0, uint8_t* dst, int size,
                   uint8_t pad_value, int scaleup, float* dw, float* dh) {
  float r = std::min(static_cast<float>(size) / h0, static_cast<float>(size) / w0);
  if (!scaleup) r = std::min(r, 1.0f);
  const int new_w = static_cast<int>(std::lround(w0 * r));
  const int new_h = static_cast<int>(std::lround(h0 * r));
  const float pad_w = (size - new_w) / 2.0f;
  const float pad_h = (size - new_h) / 2.0f;
  const int top = static_cast<int>(std::lround(pad_h - 0.1f));
  const int left = static_cast<int>(std::lround(pad_w - 0.1f));

  std::memset(dst, pad_value, static_cast<size_t>(size) * size * 3);

  // Bilinear resize with half-pixel centers (cv2.INTER_LINEAR convention).
  const float sx = static_cast<float>(w0) / new_w;
  const float sy = static_cast<float>(h0) / new_h;
  for (int y = 0; y < new_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(h0 - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, h0 - 1);
    const float wy = fy - y0;
    uint8_t* out_row = dst + (static_cast<size_t>(y + top) * size + left) * 3;
    for (int x = 0; x < new_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(w0 - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, w0 - 1);
      const float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * w0 + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * w0 + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * w0 + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * w0 + x1) * 3;
      for (int c = 0; c < 3; ++c) {
        const float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                        wy * ((1 - wx) * p10[c] + wx * p11[c]);
        out_row[x * 3 + c] = static_cast<uint8_t>(std::lround(v));
      }
    }
  }
  *dw = pad_w;
  *dh = pad_h;
  return r;
}

// uint8 HWC (BGR) -> fp32 CHW or HWC (RGB), /255 — the reference predictor's
// normalize step (predictor.py:115-133) for feeding exported models.
void normalize_u8(const uint8_t* src, int h, int w, float* dst, int chw, int bgr2rgb) {
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      const int cc = bgr2rgb ? 2 - c : c;
      const float v = src[i * 3 + cc] / 255.0f;
      if (chw) {
        dst[static_cast<size_t>(c) * n + i] = v;
      } else {
        dst[i * 3 + c] = v;
      }
    }
  }
}

static inline float iou_xyxy(const float* a, const float* b) {
  const float x1 = std::max(a[0], b[0]);
  const float y1 = std::max(a[1], b[1]);
  const float x2 = std::min(a[2], b[2]);
  const float y2 = std::min(a[3], b[3]);
  const float inter = std::max(0.0f, x2 - x1) * std::max(0.0f, y2 - y1);
  const float area_a = (a[2] - a[0]) * (a[3] - a[1]);
  const float area_b = (b[2] - b[0]) * (b[3] - b[1]);
  return inter / (area_a + area_b - inter + 1e-7f);
}

// Greedy class-offset NMS over candidate rows [x1,y1,x2,y2,score,cls].
// In/out: cand (n x 6); returns number kept, indices in keep_out (<= max_det).
int nms_xyxy(const float* cand, int n, float iou_thres, int max_det,
             int agnostic, int* keep_out) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return cand[a * 6 + 4] > cand[b * 6 + 4]; });
  std::vector<char> suppressed(n, 0);
  int kept = 0;
  const float max_wh = 7680.0f;
  for (int oi = 0; oi < n && kept < max_det; ++oi) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep_out[kept++] = i;
    float bi[4];
    const float off_i = agnostic ? 0.0f : cand[i * 6 + 5] * max_wh;
    for (int k = 0; k < 4; ++k) bi[k] = cand[i * 6 + k] + off_i;
    for (int oj = oi + 1; oj < n; ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      float bj[4];
      const float off_j = agnostic ? 0.0f : cand[j * 6 + 5] * max_wh;
      for (int k = 0; k < 4; ++k) bj[k] = cand[j * 6 + k] + off_j;
      if (iou_xyxy(bi, bj) > iou_thres) suppressed[j] = 1;
    }
  }
  return kept;
}

// Decode a v8-layout head output [(4+nc), A] (xywh + class scores, already
// sigmoid) into candidate rows [x1,y1,x2,y2,score,cls] above conf_thres.
// Handles the v5 [A, (5+nc)] layout when v5_layout != 0 (obj_conf * cls_conf).
// Returns the number of candidates written (<= max_out).
int decode_head(const float* out, int A, int nc, int v5_layout, float conf_thres,
                float* cand, int max_out) {
  int n = 0;
  for (int a = 0; a < A && n < max_out; ++a) {
    float x, y, w, h, best_s = 0.0f;
    int best_c = 0;
    if (v5_layout) {
      const float* row = out + static_cast<size_t>(a) * (5 + nc);
      const float obj = row[4];
      for (int c = 0; c < nc; ++c) {
        const float s = obj * row[5 + c];
        if (s > best_s) { best_s = s; best_c = c; }
      }
      x = row[0]; y = row[1]; w = row[2]; h = row[3];
    } else {
      for (int c = 0; c < nc; ++c) {
        const float s = out[static_cast<size_t>(4 + c) * A + a];
        if (s > best_s) { best_s = s; best_c = c; }
      }
      x = out[static_cast<size_t>(0) * A + a];
      y = out[static_cast<size_t>(1) * A + a];
      w = out[static_cast<size_t>(2) * A + a];
      h = out[static_cast<size_t>(3) * A + a];
    }
    if (best_s > conf_thres) {
      float* r = cand + static_cast<size_t>(n) * 6;
      r[0] = x - w / 2; r[1] = y - h / 2; r[2] = x + w / 2; r[3] = y + h / 2;
      r[4] = best_s; r[5] = static_cast<float>(best_c);
      ++n;
    }
  }
  return n;
}

// Undo letterbox: scale boxes (n x 6 rows, xyxy in net space) back to the
// original image (ops.py:89 scale_boxes semantics incl. clipping).
void scale_boxes_inplace(float* rows, int n, float gain, float dw, float dh,
                         int w0, int h0) {
  for (int i = 0; i < n; ++i) {
    float* r = rows + static_cast<size_t>(i) * 6;
    r[0] = std::min(std::max((r[0] - dw) / gain, 0.0f), static_cast<float>(w0));
    r[1] = std::min(std::max((r[1] - dh) / gain, 0.0f), static_cast<float>(h0));
    r[2] = std::min(std::max((r[2] - dw) / gain, 0.0f), static_cast<float>(w0));
    r[3] = std::min(std::max((r[3] - dh) / gain, 0.0f), static_cast<float>(h0));
  }
}

}  // extern "C"

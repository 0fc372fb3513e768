// Standalone CLI exercising the native pre/post pipeline — the behavioral
// analog of the reference's examples/YOLOv8-CPP-Inference/main.cpp: read an
// image (binary PPM, P6), letterbox + normalize it, and if given a raw head
// output file, decode + NMS + print final detections.
//
// Usage:
//   pre_post_demo image.ppm [size]
//   pre_post_demo image.ppm size head_output.bin A nc conf iou
// where head_output.bin is fp32 [(4+nc) * A] (v8 layout) from any runtime.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
float letterbox_u8(const uint8_t*, int, int, uint8_t*, int, uint8_t, int, float*, float*);
void normalize_u8(const uint8_t*, int, int, float*, int, int);
int nms_xyxy(const float*, int, float, int, int, int*);
int decode_head(const float*, int, int, int, float, float*, int);
void scale_boxes_inplace(float*, int, float, float, float, int, int);
}

static uint8_t* read_ppm(const char* path, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); return nullptr; }
  char magic[3] = {0};
  int maxval = 0;
  if (std::fscanf(f, "%2s %d %d %d", magic, w, h, &maxval) != 4 || std::strcmp(magic, "P6")) {
    std::fprintf(stderr, "%s: not a binary P6 PPM\n", path);
    std::fclose(f);
    return nullptr;
  }
  std::fgetc(f);  // single whitespace after header
  const size_t n = static_cast<size_t>(*w) * *h * 3;
  uint8_t* data = static_cast<uint8_t*>(std::malloc(n));
  if (std::fread(data, 1, n, f) != n) {
    std::fprintf(stderr, "%s: truncated pixel data\n", path);
    std::free(data);
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);
  return data;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s image.ppm [size] [head.bin A nc conf iou]\n", argv[0]);
    return 2;
  }
  int w0 = 0, h0 = 0;
  uint8_t* img = read_ppm(argv[1], &w0, &h0);
  if (!img) return 1;
  const int size = argc > 2 ? std::atoi(argv[2]) : 640;

  std::vector<uint8_t> lb(static_cast<size_t>(size) * size * 3);
  float dw = 0, dh = 0;
  const float gain = letterbox_u8(img, h0, w0, lb.data(), size, 114, 1, &dw, &dh);
  std::printf("letterbox: %dx%d -> %dx%d gain=%.4f pad=(%.1f, %.1f)\n",
              w0, h0, size, size, gain, dw, dh);

  std::vector<float> chw(static_cast<size_t>(size) * size * 3);
  normalize_u8(lb.data(), size, size, chw.data(), /*chw=*/1, /*bgr2rgb=*/1);
  std::printf("normalized: CHW fp32, first px = %.4f %.4f %.4f\n",
              chw[0], chw[static_cast<size_t>(size) * size],
              chw[2 * static_cast<size_t>(size) * size]);

  if (argc >= 8) {
    const int A = std::atoi(argv[4]);
    const int nc = std::atoi(argv[5]);
    const float conf = std::atof(argv[6]);
    const float iou = std::atof(argv[7]);
    FILE* f = std::fopen(argv[3], "rb");
    if (!f) { std::fprintf(stderr, "cannot open %s\n", argv[3]); return 1; }
    std::vector<float> head(static_cast<size_t>(4 + nc) * A);
    if (std::fread(head.data(), 4, head.size(), f) != head.size()) {
      std::fprintf(stderr, "%s: truncated\n", argv[3]);
      return 1;
    }
    std::fclose(f);
    std::vector<float> cand(static_cast<size_t>(A) * 6);
    const int n = decode_head(head.data(), A, nc, /*v5=*/0, conf, cand.data(), A);
    std::vector<int> keep(300);
    const int k = nms_xyxy(cand.data(), n, iou, 300, /*agnostic=*/0, keep.data());
    scale_boxes_inplace(cand.data(), n, gain, dw, dh, w0, h0);
    std::printf("detections: %d candidates -> %d after NMS\n", n, k);
    for (int i = 0; i < k; ++i) {
      const float* r = cand.data() + static_cast<size_t>(keep[i]) * 6;
      std::printf("  box %.1f %.1f %.1f %.1f conf %.3f cls %d\n",
                  r[0], r[1], r[2], r[3], r[4], static_cast<int>(r[5]));
    }
  }
  std::free(img);
  return 0;
}

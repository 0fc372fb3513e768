// Native inference client that EXECUTES the exported model — the behavioral
// analog of the reference's examples/YOLOv8-CPP-Inference/inference.cpp:30-41
// and examples/YOLOv8-ONNXRuntime-CPP/inference.cpp:363 (both run the
// exported artifact natively, then post-process). Here the artifact is the
// Exporter's TF SavedModel (jax2tf-converted), executed through the
// TensorFlow C API with NO Python in the loop:
//
//   PPM image -> letterbox_u8 -> normalize (NHWC fp32 [0,1])
//             -> TF_SessionRun(serving_default)            [device inference]
//             -> (B, max_det, 6) xyxy/conf/cls detections   [decode + top-k
//                run INSIDE the exported graph — the TPU-first export bakes
//                postprocess into the artifact]
//             -> scale_boxes_inplace back to the original image -> stdout
//
// Tensor names come from the exporter's io_spec.json sidecar.
//
// Usage: tf_client <saved_model_dir> <image.ppm> <imgsz> [conf=0.25]
// Output: one detection per line: "x1 y1 x2 y2 conf cls"

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "tensorflow/c/c_api.h"

extern "C" {
float letterbox_u8(const uint8_t*, int, int, uint8_t*, int, uint8_t, int, float*, float*);
void normalize_u8(const uint8_t*, int, int, float*, int, int);
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
  std::fgetc(f);
  const size_t n = static_cast<size_t>(*w) * *h * 3;
  uint8_t* data = static_cast<uint8_t*>(std::malloc(n));
  if (std::fread(data, 1, n, f) != n) {
    std::fprintf(stderr, "%s: truncated pixels\n", path);
    std::free(data);
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);
  return data;
}

// Minimal extraction of "inputs"/"outputs" first tensor names from
// io_spec.json (format written by engine/exporter.py; flat, no escapes).
static std::string json_first_name(const std::string& text, const char* section) {
  size_t s = text.find(std::string("\"") + section + "\"");
  if (s == std::string::npos) return "";
  s = text.find('{', s);
  size_t k1 = text.find('"', s + 1);          // key open
  size_t k2 = text.find('"', k1 + 1);         // key close
  size_t v1 = text.find('"', k2 + 1);         // value open
  size_t v2 = text.find('"', v1 + 1);         // value close
  if (v2 == std::string::npos) return "";
  return text.substr(v1 + 1, v2 - v1 - 1);
}

static TF_Output resolve(TF_Graph* graph, const std::string& tensor_name) {
  std::string op = tensor_name;
  int index = 0;
  size_t colon = op.rfind(':');
  if (colon != std::string::npos) {
    index = std::atoi(op.c_str() + colon + 1);
    op = op.substr(0, colon);
  }
  TF_Output out;
  out.oper = TF_GraphOperationByName(graph, op.c_str());
  out.index = index;
  return out;
}

static void dealloc(void* data, size_t, void*) { std::free(data); }

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s <saved_model_dir> <image.ppm> <imgsz> [conf]\n", argv[0]);
    return 2;
  }
  const char* model_dir = argv[1];
  const int size = std::atoi(argv[3]);
  const float conf = argc > 4 ? std::atof(argv[4]) : 0.25f;

  int w0 = 0, h0 = 0;
  uint8_t* img = read_ppm(argv[2], &w0, &h0);
  if (!img) return 1;

  // ---- host-side preprocess (native letterbox + normalize) ----
  std::vector<uint8_t> boxed(static_cast<size_t>(size) * size * 3);
  float dw = 0.f, dh = 0.f;
  const float gain = letterbox_u8(img, h0, w0, boxed.data(), size, 114, /*scaleup=*/0, &dw, &dh);
  std::free(img);
  float* input = static_cast<float*>(std::malloc(sizeof(float) * size * size * 3));
  // PPM pixel data is RGB and the exported graph consumes RGB [0,1] NHWC
  // (the BGR->RGB swap lives in the cv2-side predict path, not the export)
  normalize_u8(boxed.data(), size, size, input, /*chw=*/0, /*bgr2rgb=*/0);

  // ---- io spec ----
  std::string spec_path = std::string(model_dir) + "/io_spec.json";
  FILE* sf = std::fopen(spec_path.c_str(), "rb");
  if (!sf) { std::fprintf(stderr, "missing %s\n", spec_path.c_str()); return 1; }
  std::string spec;
  for (int c; (c = std::fgetc(sf)) != EOF;) spec.push_back(static_cast<char>(c));
  std::fclose(sf);
  const std::string in_name = json_first_name(spec, "inputs");
  const std::string out_name = json_first_name(spec, "outputs");
  if (in_name.empty() || out_name.empty()) {
    std::fprintf(stderr, "io_spec.json missing tensor names\n");
    return 1;
  }

  // ---- load + run the SavedModel through the TF C API ----
  TF_Status* status = TF_NewStatus();
  TF_Graph* graph = TF_NewGraph();
  TF_SessionOptions* opts = TF_NewSessionOptions();
  const char* tags[] = {"serve"};
  TF_Session* session = TF_LoadSessionFromSavedModel(
      opts, nullptr, model_dir, tags, 1, graph, nullptr, status);
  if (TF_GetCode(status) != TF_OK) {
    std::fprintf(stderr, "load failed: %s\n", TF_Message(status));
    return 1;
  }

  const int64_t dims[4] = {1, size, size, 3};
  TF_Tensor* in_tensor = TF_NewTensor(
      TF_FLOAT, dims, 4, input, sizeof(float) * size * size * 3, dealloc, nullptr);
  TF_Output feed = resolve(graph, in_name);
  TF_Output fetch = resolve(graph, out_name);
  if (!feed.oper || !fetch.oper) {
    std::fprintf(stderr, "cannot resolve ops '%s' / '%s'\n", in_name.c_str(), out_name.c_str());
    return 1;
  }
  TF_Tensor* out_tensor = nullptr;
  TF_SessionRun(session, nullptr, &feed, &in_tensor, 1, &fetch, &out_tensor, 1,
                nullptr, 0, nullptr, status);
  if (TF_GetCode(status) != TF_OK) {
    std::fprintf(stderr, "run failed: %s\n", TF_Message(status));
    return 1;
  }

  // ---- postprocess: undo letterbox, threshold, print ----
  const int max_det = static_cast<int>(TF_Dim(out_tensor, 1));
  float* det = static_cast<float*>(TF_TensorData(out_tensor));
  scale_boxes_inplace(det, max_det, gain, dw, dh, w0, h0);
  for (int i = 0; i < max_det; ++i) {
    const float* r = det + i * 6;
    if (r[4] < conf) continue;
    std::printf("%.2f %.2f %.2f %.2f %.4f %d\n", r[0], r[1], r[2], r[3], r[4], static_cast<int>(r[5]));
  }

  TF_DeleteTensor(in_tensor);
  TF_DeleteTensor(out_tensor);
  TF_CloseSession(session, status);
  TF_DeleteSession(session, status);
  TF_DeleteSessionOptions(opts);
  TF_DeleteGraph(graph);
  TF_DeleteStatus(status);
  return 0;
}

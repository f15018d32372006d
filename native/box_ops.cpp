// Native host box kernels — the TPU rebuild's equivalent of the reference's
// Cython modules (detectron/utils/cython_nms.pyx, cython_bbox.pyx) and the
// CPU sides of its Caffe2 op library. Built as a plain shared library and
// bound through ctypes (no pybind11 in this image).
//
// Semantics match nafwebsod_tpu/ops/boxes.py exactly (which itself matches
// the Cython sources): +1 box areas, score-descending greedy suppression at
// IoU >= thresh, soft-NMS linear/gaussian rescoring with score pruning.
//
// Build: make -C native   (g++ -O3 -shared -fPIC box_ops.cpp -o libboxops.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Pairwise IoU with the Detectron +1 convention.
// boxes: (n, 4), query: (k, 4), out: (n, k)
void bbox_overlaps(const float* boxes, int64_t n, const float* query,
                   int64_t k, float* out) {
  for (int64_t j = 0; j < k; ++j) {
    const float qx1 = query[j * 4 + 0], qy1 = query[j * 4 + 1];
    const float qx2 = query[j * 4 + 2], qy2 = query[j * 4 + 3];
    const float box_area = (qx2 - qx1 + 1.f) * (qy2 - qy1 + 1.f);
    for (int64_t i = 0; i < n; ++i) {
      const float x1 = boxes[i * 4 + 0], y1 = boxes[i * 4 + 1];
      const float x2 = boxes[i * 4 + 2], y2 = boxes[i * 4 + 3];
      const float iw = std::min(x2, qx2) - std::max(x1, qx1) + 1.f;
      float v = 0.f;
      if (iw > 0.f) {
        const float ih = std::min(y2, qy2) - std::max(y1, qy1) + 1.f;
        if (ih > 0.f) {
          const float ua =
              (x2 - x1 + 1.f) * (y2 - y1 + 1.f) + box_area - iw * ih;
          v = iw * ih / ua;
        }
      }
      out[i * k + j] = v;
    }
  }
}

// Greedy NMS. dets: (n, 5) [x1 y1 x2 y2 score]; keep_out: caller-allocated
// (n,) int64 buffer. Returns the number of kept indices.
int64_t nms(const float* dets, int64_t n, float thresh, int64_t* keep_out) {
  if (n == 0) return 0;
  std::vector<float> areas(n);
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) {
    areas[i] = (dets[i * 5 + 2] - dets[i * 5 + 0] + 1.f) *
               (dets[i * 5 + 3] - dets[i * 5 + 1] + 1.f);
  }
  std::iota(order.begin(), order.end(), 0);
  // match numpy argsort()[::-1] of the python/cython path: stable ascending
  // sort reversed (ties keep the LAST index first after reversal)
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return dets[a * 5 + 4] < dets[b * 5 + 4];
  });
  std::reverse(order.begin(), order.end());

  std::vector<uint8_t> suppressed(n, 0);
  int64_t num_keep = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[num_keep++] = i;
    const float ix1 = dets[i * 5 + 0], iy1 = dets[i * 5 + 1];
    const float ix2 = dets[i * 5 + 2], iy2 = dets[i * 5 + 3];
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float xx1 = std::max(ix1, dets[j * 5 + 0]);
      const float yy1 = std::max(iy1, dets[j * 5 + 1]);
      const float xx2 = std::min(ix2, dets[j * 5 + 2]);
      const float yy2 = std::min(iy2, dets[j * 5 + 3]);
      const float w = std::max(0.f, xx2 - xx1 + 1.f);
      const float h = std::max(0.f, yy2 - yy1 + 1.f);
      const float inter = w * h;
      const float ovr = inter / (areas[i] + areas[j] - inter);
      if (ovr >= thresh) suppressed[j] = 1;
    }
  }
  return num_keep;
}

// Soft-NMS (Bodla et al.). dets (n,5) is modified in place (rescored and
// reordered as in cython_nms.soft_nms); keep_out gets original indices of
// the surviving rows. method: 0 hard, 1 linear, 2 gaussian.
int64_t soft_nms(float* dets, int64_t n, float sigma, float overlap_thresh,
                 float score_thresh, int method, int64_t* keep_out) {
  std::vector<int64_t> inds(n);
  std::iota(inds.begin(), inds.end(), 0);
  int64_t N = n;
  for (int64_t i = 0; i < N; ++i) {
    // max-score selection among [i, N)
    int64_t maxpos = i;
    for (int64_t p = i + 1; p < N; ++p) {
      if (dets[p * 5 + 4] > dets[maxpos * 5 + 4]) maxpos = p;
    }
    for (int c = 0; c < 5; ++c) std::swap(dets[i * 5 + c], dets[maxpos * 5 + c]);
    std::swap(inds[i], inds[maxpos]);

    const float ix1 = dets[i * 5 + 0], iy1 = dets[i * 5 + 1];
    const float ix2 = dets[i * 5 + 2], iy2 = dets[i * 5 + 3];
    const float iarea = (ix2 - ix1 + 1.f) * (iy2 - iy1 + 1.f);

    for (int64_t p = i + 1; p < N;) {
      const float x1 = dets[p * 5 + 0], y1 = dets[p * 5 + 1];
      const float x2 = dets[p * 5 + 2], y2 = dets[p * 5 + 3];
      const float area = (x2 - x1 + 1.f) * (y2 - y1 + 1.f);
      const float iw = std::min(ix2, x2) - std::max(ix1, x1) + 1.f;
      float weight = 1.f;
      if (iw > 0.f) {
        const float ih = std::min(iy2, y2) - std::max(iy1, y1) + 1.f;
        if (ih > 0.f) {
          const float ov = iw * ih / (iarea + area - iw * ih);
          if (method == 1) {               // linear
            weight = (ov > overlap_thresh) ? 1.f - ov : 1.f;
          } else if (method == 2) {        // gaussian
            weight = std::exp(-(ov * ov) / sigma);
          } else {                          // hard nms
            weight = (ov > overlap_thresh) ? 0.f : 1.f;
          }
        }
      }
      dets[p * 5 + 4] *= weight;
      if (dets[p * 5 + 4] < score_thresh) {
        // drop: copy last box into position p
        for (int c = 0; c < 5; ++c) dets[p * 5 + c] = dets[(N - 1) * 5 + c];
        inds[p] = inds[N - 1];
        --N;
      } else {
        ++p;
      }
    }
  }
  for (int64_t i = 0; i < N; ++i) keep_out[i] = inds[i];
  return N;
}

}  // extern "C"

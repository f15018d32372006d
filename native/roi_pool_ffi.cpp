// XLA FFI custom-call RoIPool for CPU — the native counterpart of the
// Pallas TPU kernel (ops/pallas/roi_pool_pallas.py) and the pure-XLA
// fallback (ops/roi_pool.py:roi_pool_xla). Reproduces Caffe2 RoIPoolF
// max-pool semantics exactly (round-half-away coordinate scaling,
// integer bin boundaries, empty bins -> 0):
//   reference: Caffe2's roi_pool_f_op (used by detectron RoIFeatureTransform,
//   detectron/modeling/detector.py:268-331).
//
// Exports:
//   RoiPoolFwd(feat (H,W,C) f32, rois (R,5) f32; attrs pooled_h/pooled_w
//              i64, spatial_scale f32) -> out (R,PH,PW,C) f32,
//              argmax (R,PH,PW,C) i32 (flat y*W+x into the feature plane,
//              -1 for empty bins) — argmax feeds the Python-side VJP
//              scatter, mirroring RoIPoolF's saved-argmax backward.
//
// Build: make -C native libroipoolffi.so JAX_INCLUDE=<jax.ffi.include_dir()>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

static inline int64_t RoundHalfAway(float v) {
  return static_cast<int64_t>(std::roundf(v));
}

static ffi::Error RoiPoolFwdImpl(int64_t pooled_h, int64_t pooled_w,
                                 float spatial_scale,
                                 ffi::Buffer<ffi::F32> feat,
                                 ffi::Buffer<ffi::F32> rois,
                                 ffi::ResultBuffer<ffi::F32> out,
                                 ffi::ResultBuffer<ffi::S32> argmax) {
  auto fdims = feat.dimensions();
  auto rdims = rois.dimensions();
  if (fdims.size() != 3 || rdims.size() != 2 || rdims[1] != 5) {
    return ffi::Error(ffi::ErrorCode::kInvalidArgument,
                      "feat must be (H,W,C) and rois (R,5)");
  }
  const int64_t H = fdims[0], W = fdims[1], C = fdims[2];
  const int64_t R = rdims[0];
  const float* f = feat.typed_data();
  const float* rb = rois.typed_data();
  float* o = out->typed_data();
  int32_t* am = argmax->typed_data();

  for (int64_t r = 0; r < R; ++r) {
    const float* roi = rb + r * 5;
    const int64_t x1 = RoundHalfAway(roi[1] * spatial_scale);
    const int64_t y1 = RoundHalfAway(roi[2] * spatial_scale);
    const int64_t x2 = RoundHalfAway(roi[3] * spatial_scale);
    const int64_t y2 = RoundHalfAway(roi[4] * spatial_scale);
    const int64_t roi_h = std::max<int64_t>(y2 - y1 + 1, 1);
    const int64_t roi_w = std::max<int64_t>(x2 - x1 + 1, 1);

    for (int64_t ph = 0; ph < pooled_h; ++ph) {
      // integer bin boundaries: floor(ph*roi/pool), ceil((ph+1)*roi/pool)
      const int64_t hstart =
          std::min<int64_t>(std::max<int64_t>(ph * roi_h / pooled_h + y1, 0),
                            H);
      const int64_t hend = std::min<int64_t>(
          std::max<int64_t>(((ph + 1) * roi_h + pooled_h - 1) / pooled_h + y1,
                            0),
          H);
      for (int64_t pw = 0; pw < pooled_w; ++pw) {
        const int64_t wstart = std::min<int64_t>(
            std::max<int64_t>(pw * roi_w / pooled_w + x1, 0), W);
        const int64_t wend = std::min<int64_t>(
            std::max<int64_t>(
                ((pw + 1) * roi_w + pooled_w - 1) / pooled_w + x1, 0),
            W);
        float* ocell = o + ((r * pooled_h + ph) * pooled_w + pw) * C;
        int32_t* acell = am + ((r * pooled_h + ph) * pooled_w + pw) * C;
        if (hstart >= hend || wstart >= wend) {
          for (int64_t c = 0; c < C; ++c) {
            ocell[c] = 0.0f;
            acell[c] = -1;
          }
          continue;
        }
        for (int64_t c = 0; c < C; ++c) {
          ocell[c] = -std::numeric_limits<float>::infinity();
          acell[c] = -1;
        }
        for (int64_t y = hstart; y < hend; ++y) {
          const float* frow = f + (y * W) * C;
          for (int64_t x = wstart; x < wend; ++x) {
            const float* fcell = frow + x * C;
            const int32_t flat = static_cast<int32_t>(y * W + x);
            for (int64_t c = 0; c < C; ++c) {
              if (fcell[c] > ocell[c]) {
                ocell[c] = fcell[c];
                acell[c] = flat;
              }
            }
          }
        }
      }
    }
  }
  return ffi::Error::Success();
}

XLA_FFI_DEFINE_HANDLER_SYMBOL(RoiPoolFwd, RoiPoolFwdImpl,
                              ffi::Ffi::Bind()
                                  .Attr<int64_t>("pooled_h")
                                  .Attr<int64_t>("pooled_w")
                                  .Attr<float>("spatial_scale")
                                  .Arg<ffi::Buffer<ffi::F32>>()
                                  .Arg<ffi::Buffer<ffi::F32>>()
                                  .Ret<ffi::Buffer<ffi::F32>>()
                                  .Ret<ffi::Buffer<ffi::S32>>());

// framepack: native host-side frame-buffer runtime for the video pipeline.
//
// The device pipeline consumes contiguous (N, H, W, 3) uint8 chunks; the
// decoder hands back N separate frame buffers. Python-side np.stack tops
// out well below memory bandwidth on this host (~0.3 GB/s measured); these
// routines are plain tight loops the compiler vectorizes, giving several
// GB/s, and they fuse the optional channel reversal (BGR<->RGB, the ball
// tracker's replicated reference quirk) into the same pass so the bytes
// are touched once.
//
// Exposed via ctypes (no pybind11 in the build image); see
// padel_analytics_tpu/io/native.py.

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// Copy n frames (each frame_bytes long) into one contiguous dst buffer.
void pack_frames(const uint8_t** srcs, int64_t n, int64_t frame_bytes,
                 uint8_t* dst) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(dst + i * frame_bytes, srcs[i],
                static_cast<size_t>(frame_bytes));
  }
}

// Same, but reverse the last (channel) axis of selected frames while
// copying: swap[i] != 0 means frame i is channel-reversed (3 channels).
void pack_frames_swap(const uint8_t** srcs, const uint8_t* swap, int64_t n,
                      int64_t pixels, uint8_t* dst) {
  const int64_t frame_bytes = pixels * 3;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* src = srcs[i];
    uint8_t* out = dst + i * frame_bytes;
    if (!swap[i]) {
      std::memcpy(out, src, static_cast<size_t>(frame_bytes));
    } else {
      for (int64_t p = 0; p < pixels; ++p) {
        out[3 * p + 0] = src[3 * p + 2];
        out[3 * p + 1] = src[3 * p + 1];
        out[3 * p + 2] = src[3 * p + 0];
      }
    }
  }
}

// In-place-free BGR->RGB conversion of one frame into dst.
void bgr_to_rgb(const uint8_t* src, int64_t pixels, uint8_t* dst) {
  for (int64_t p = 0; p < pixels; ++p) {
    dst[3 * p + 0] = src[3 * p + 2];
    dst[3 * p + 1] = src[3 * p + 1];
    dst[3 * p + 2] = src[3 * p + 0];
  }
}

}  // extern "C"

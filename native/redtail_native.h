// redtail_native: host-side native runtime for the redtail-tpu framework.
//
// The reference kept its host runtime in C++ (image preprocessing in
// ros/packages/caffe_ros/src/tensor_net.cpp:303-336, weight loading in
// stereoDNN/sample_app/main.cpp:111-134, the ROS transport layer). This
// library is the TPU-framework counterpart: frame preprocessing on the
// host CPU feeding the device, a lock-free latest-wins frame mailbox (the
// queue-size-1 ROS subscriber semantics), and fast weight/golden-file
// parsers. Exposed as a plain C ABI for ctypes.

#ifndef REDTAIL_NATIVE_H
#define REDTAIL_NATIVE_H

#include <cstdint>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------- preprocess

// Bilinear resize u8 HWC -> f32 HWC with optional channel swap (BGR<->RGB)
// and affine normalization: out = in * scale + shift.
void rn_preprocess_bilinear(const uint8_t* src, int src_h, int src_w,
                            int channels, float* dst, int dst_h, int dst_w,
                            int swap_rb, float scale, float shift);

// Area-average resize (cv2 INTER_AREA semantics for integer downscale),
// falling back to bilinear when not an integer downscale.
void rn_preprocess_area(const uint8_t* src, int src_h, int src_w,
                        int channels, float* dst, int dst_h, int dst_w,
                        int swap_rb, float scale, float shift);

// HWC f32 -> CHW f32 (the reference's final transpose step).
void rn_hwc_to_chw(const float* src, int h, int w, int c, float* dst);

// Fused serving-ingest pack: u8 HWC frame -> u8 space-to-depth(2) packed
// frame (ceil(h/2), ceil(w/2), 4c) with optional BGR<->RGB swap, zero
// padding odd edges. Phase-major channel layout matching
// ops/space_to_depth.py:space_to_depth2_np: output channel group
// (py*2+px)*c..+c holds src[2y+py, 2x+px, :]. One pass, no float
// conversion — the H2D payload stays uint8.
void rn_pack_s2d(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                 int swap_rb);

// ------------------------------------------------- latest-wins mailbox

// Single-producer single-consumer triple-buffered mailbox holding frames
// of fixed byte size. publish() never blocks and overwrites the oldest
// unread frame; take() returns the newest unseen frame or 0.
typedef struct rn_mailbox rn_mailbox;

rn_mailbox* rn_mailbox_create(size_t frame_bytes);
void rn_mailbox_destroy(rn_mailbox* mb);
// Copies frame_bytes from src; stamps with seq. Returns the sequence no.
uint64_t rn_mailbox_publish(rn_mailbox* mb, const void* src);
// Copies the newest frame into dst if its seq > last_seq; returns its
// seq, or 0 if nothing newer.
uint64_t rn_mailbox_take(rn_mailbox* mb, void* dst, uint64_t last_seq);

// ------------------------------------------------------------- weights

// Parse a TRT-format weight blob (name\0 + u32 count + raw fp32/fp16).
// Returns the number of tensors, or -1 on parse error. For each tensor i,
// names[i] points into `data`, offsets[i]/counts[i] describe the payload.
// Caller provides arrays of capacity max_tensors.
int rn_parse_trt_weights(const uint8_t* data, size_t size, int elem_size,
                         const char** names, size_t* offsets,
                         uint32_t* counts, int max_tensors);

// Parse a golden-data .bin header (i32 rank + i32 dims). Returns rank or
// -1; fills dims (capacity 8) and sets *payload_offset.
int rn_parse_golden_bin(const uint8_t* data, size_t size, int32_t* dims,
                        size_t* payload_offset);

}  // extern "C"

#endif  // REDTAIL_NATIVE_H

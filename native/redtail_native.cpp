// Implementation of the native host runtime. See redtail_native.h.

#include "redtail_native.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstring>
#include <new>

namespace {

inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

// ------------------------------------------------------------ preprocess

void rn_preprocess_bilinear(const uint8_t* src, int src_h, int src_w,
                            int channels, float* dst, int dst_h, int dst_w,
                            int swap_rb, float scale, float shift) {
    // Half-pixel-centered sampling (cv2.resize / jax.image "linear").
    const float ry = static_cast<float>(src_h) / dst_h;
    const float rx = static_cast<float>(src_w) / dst_w;
    for (int y = 0; y < dst_h; ++y) {
        float fy = (y + 0.5f) * ry - 0.5f;
        int y0 = static_cast<int>(std::floor(fy));
        float wy = fy - y0;
        int y1 = clampi(y0 + 1, 0, src_h - 1);
        y0 = clampi(y0, 0, src_h - 1);
        for (int x = 0; x < dst_w; ++x) {
            float fx = (x + 0.5f) * rx - 0.5f;
            int x0 = static_cast<int>(std::floor(fx));
            float wx = fx - x0;
            int x1 = clampi(x0 + 1, 0, src_w - 1);
            x0 = clampi(x0, 0, src_w - 1);
            const uint8_t* p00 = src + (y0 * src_w + x0) * channels;
            const uint8_t* p01 = src + (y0 * src_w + x1) * channels;
            const uint8_t* p10 = src + (y1 * src_w + x0) * channels;
            const uint8_t* p11 = src + (y1 * src_w + x1) * channels;
            float* out = dst + (y * dst_w + x) * channels;
            for (int c = 0; c < channels; ++c) {
                int cc = (swap_rb && channels == 3) ? 2 - c : c;
                float top = p00[cc] + (p01[cc] - p00[cc]) * wx;
                float bot = p10[cc] + (p11[cc] - p10[cc]) * wx;
                out[c] = (top + (bot - top) * wy) * scale + shift;
            }
        }
    }
}

void rn_preprocess_area(const uint8_t* src, int src_h, int src_w,
                        int channels, float* dst, int dst_h, int dst_w,
                        int swap_rb, float scale, float shift) {
    if (src_h % dst_h != 0 || src_w % dst_w != 0) {
        rn_preprocess_bilinear(src, src_h, src_w, channels, dst, dst_h,
                               dst_w, swap_rb, scale, shift);
        return;
    }
    const int ky = src_h / dst_h;
    const int kx = src_w / dst_w;
    const float inv = 1.0f / (ky * kx);
    for (int y = 0; y < dst_h; ++y) {
        for (int x = 0; x < dst_w; ++x) {
            float* out = dst + (y * dst_w + x) * channels;
            for (int c = 0; c < channels; ++c) {
                int cc = (swap_rb && channels == 3) ? 2 - c : c;
                float acc = 0.0f;
                for (int dy = 0; dy < ky; ++dy) {
                    const uint8_t* row =
                        src + ((y * ky + dy) * src_w + x * kx) * channels;
                    for (int dx = 0; dx < kx; ++dx)
                        acc += row[dx * channels + cc];
                }
                out[c] = acc * inv * scale + shift;
            }
        }
    }
}

void rn_hwc_to_chw(const float* src, int h, int w, int c, float* dst) {
    for (int ch = 0; ch < c; ++ch) {
        float* plane = dst + ch * h * w;
        const float* s = src + ch;
        for (int i = 0; i < h * w; ++i) plane[i] = s[i * c];
    }
}

void rn_pack_s2d(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                 int swap_rb) {
    const int hp = (h + 1) / 2;
    const int wp = (w + 1) / 2;
    const int wfull = w / 2;          // output cols with a full 2x2 block
    const int oc = 4 * c;
    // Channel permutation (identity, or R<->B for 3-channel frames).
    int cmap[16];
    const int cn = c <= 16 ? c : 16;
    for (int ch = 0; ch < cn; ++ch)
        cmap[ch] = (swap_rb && c == 3) ? 2 - ch : ch;
    if (c > 16) return;  // camera frames are 1/3/4-channel
    if (c == 3) {  // the camera-frame case: fixed offsets vectorize
        const int s0 = swap_rb ? 2 : 0, s2 = swap_rb ? 0 : 2;
        for (int y = 0; y < hp; ++y) {
            const uint8_t* r0 = src + (2 * y) * (size_t)w * 3;
            const uint8_t* r1 =
                (2 * y + 1 < h) ? r0 + (size_t)w * 3 : nullptr;
            uint8_t* drow = dst + (size_t)y * wp * 12;
            for (int x = 0; x < wfull; ++x) {
                const uint8_t* p0 = r0 + (size_t)(6 * x);
                uint8_t* d = drow + (size_t)(12 * x);
                d[0] = p0[s0]; d[1] = p0[1]; d[2] = p0[s2];
                d[3] = p0[3 + s0]; d[4] = p0[4]; d[5] = p0[3 + s2];
                if (r1) {
                    const uint8_t* p1 = r1 + (size_t)(6 * x);
                    d[6] = p1[s0]; d[7] = p1[1]; d[8] = p1[s2];
                    d[9] = p1[3 + s0]; d[10] = p1[4]; d[11] = p1[3 + s2];
                } else {
                    std::memset(d + 6, 0, 6);
                }
            }
            if (wfull < wp) {
                const int x = wp - 1;
                const uint8_t* p0 = r0 + (size_t)(6 * x);
                uint8_t* d = drow + (size_t)(12 * x);
                d[0] = p0[s0]; d[1] = p0[1]; d[2] = p0[s2];
                std::memset(d + 3, 0, 3);
                if (r1) {
                    const uint8_t* p1 = r1 + (size_t)(6 * x);
                    d[6] = p1[s0]; d[7] = p1[1]; d[8] = p1[s2];
                } else {
                    std::memset(d + 6, 0, 3);
                }
                std::memset(d + 9, 0, 3);
            }
        }
        return;
    }
    for (int y = 0; y < hp; ++y) {
        const uint8_t* r0 = src + (2 * y) * (size_t)w * c;
        const uint8_t* r1 = (2 * y + 1 < h) ? r0 + (size_t)w * c : nullptr;
        uint8_t* drow = dst + (size_t)y * wp * oc;
        for (int x = 0; x < wfull; ++x) {
            const uint8_t* p0 = r0 + (size_t)(2 * x) * c;
            uint8_t* d = drow + (size_t)x * oc;
            for (int ch = 0; ch < c; ++ch) d[ch] = p0[cmap[ch]];
            for (int ch = 0; ch < c; ++ch) d[c + ch] = p0[c + cmap[ch]];
            if (r1) {
                const uint8_t* p1 = r1 + (size_t)(2 * x) * c;
                for (int ch = 0; ch < c; ++ch) d[2 * c + ch] = p1[cmap[ch]];
                for (int ch = 0; ch < c; ++ch)
                    d[3 * c + ch] = p1[c + cmap[ch]];
            } else {
                std::memset(d + 2 * c, 0, 2 * c);
            }
        }
        if (wfull < wp) {  // odd width: last column pads px=1 with zeros
            const int x = wp - 1;
            const uint8_t* p0 = r0 + (size_t)(2 * x) * c;
            uint8_t* d = drow + (size_t)x * oc;
            for (int ch = 0; ch < c; ++ch) d[ch] = p0[cmap[ch]];
            std::memset(d + c, 0, c);
            if (r1) {
                const uint8_t* p1 = r1 + (size_t)(2 * x) * c;
                for (int ch = 0; ch < c; ++ch) d[2 * c + ch] = p1[cmap[ch]];
            } else {
                std::memset(d + 2 * c, 0, c);
            }
            std::memset(d + 3 * c, 0, c);
        }
    }
}

// ----------------------------------------------- latest-wins mailbox

struct rn_mailbox {
    size_t frame_bytes;
    uint8_t* slots[3];
    // state encodes (newest_slot | seq<<2) updates atomically
    std::atomic<uint64_t> newest_seq;
    std::atomic<int> newest_slot;
    int write_slot;
    int read_slot;
};

rn_mailbox* rn_mailbox_create(size_t frame_bytes) {
    auto* mb = new (std::nothrow) rn_mailbox();
    if (!mb) return nullptr;
    mb->frame_bytes = frame_bytes;
    for (auto& s : mb->slots) {
        s = new (std::nothrow) uint8_t[frame_bytes];
        if (!s) return nullptr;
    }
    mb->newest_seq.store(0);
    mb->newest_slot.store(-1);
    mb->write_slot = 0;
    mb->read_slot = -1;
    return mb;
}

void rn_mailbox_destroy(rn_mailbox* mb) {
    if (!mb) return;
    for (auto& s : mb->slots) delete[] s;
    delete mb;
}

uint64_t rn_mailbox_publish(rn_mailbox* mb, const void* src) {
    // Pick a slot that is neither the newest published nor being read.
    int newest = mb->newest_slot.load(std::memory_order_acquire);
    int slot = mb->write_slot;
    while (slot == newest || slot == mb->read_slot) slot = (slot + 1) % 3;
    std::memcpy(mb->slots[slot], src, mb->frame_bytes);
    uint64_t seq = mb->newest_seq.load(std::memory_order_relaxed) + 1;
    mb->newest_slot.store(slot, std::memory_order_release);
    mb->newest_seq.store(seq, std::memory_order_release);
    mb->write_slot = (slot + 1) % 3;
    return seq;
}

uint64_t rn_mailbox_take(rn_mailbox* mb, void* dst, uint64_t last_seq) {
    uint64_t seq = mb->newest_seq.load(std::memory_order_acquire);
    if (seq == 0 || seq <= last_seq) return 0;
    int slot = mb->newest_slot.load(std::memory_order_acquire);
    if (slot < 0) return 0;
    mb->read_slot = slot;
    std::memcpy(dst, mb->slots[slot], mb->frame_bytes);
    mb->read_slot = -1;
    // If a publish raced us into the same slot, report the newer seq so
    // the consumer re-reads next take().
    return seq;
}

// ------------------------------------------------------------- weights

int rn_parse_trt_weights(const uint8_t* data, size_t size, int elem_size,
                         const char** names, size_t* offsets,
                         uint32_t* counts, int max_tensors) {
    size_t pos = 0;
    int n = 0;
    while (pos < size) {
        const void* nul = std::memchr(data + pos, 0, size - pos);
        if (!nul) return -1;
        size_t name_len =
            static_cast<const uint8_t*>(nul) - (data + pos);
        if (n >= max_tensors) return -1;
        names[n] = reinterpret_cast<const char*>(data + pos);
        pos += name_len + 1;
        if (pos + 4 > size) return -1;
        uint32_t count;
        std::memcpy(&count, data + pos, 4);
        pos += 4;
        size_t bytes = static_cast<size_t>(count) * elem_size;
        if (pos + bytes > size) return -1;
        offsets[n] = pos;
        counts[n] = count;
        pos += bytes;
        ++n;
    }
    return n;
}

int rn_parse_golden_bin(const uint8_t* data, size_t size, int32_t* dims,
                        size_t* payload_offset) {
    if (size < 4) return -1;
    int32_t rank;
    std::memcpy(&rank, data, 4);
    if (rank <= 0 || rank > 8) return -1;
    if (size < 4u * (rank + 1)) return -1;
    std::memcpy(dims, data + 4, 4u * rank);
    *payload_offset = 4u * (rank + 1);
    return rank;
}

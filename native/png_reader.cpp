// Native data-path: PNG decode + batch worker pool.
//
// The reference's native layer is CUDA compute kernels plus a JIT plugin
// loader (torch_utils/ops/*.cu, custom_ops.py); on TPU the compute path is
// XLA/Pallas, so the native component that actually matters for end-to-end
// training throughput is the host input pipeline: this file implements a
// minimal, dependency-light PNG decoder (zlib inflate + per-scanline
// defilter, 8-bit gray/RGB/RGBA/palette) and a pthread worker pool that
// decodes a batch of in-memory PNG buffers in parallel.  Exposed via a C ABI
// consumed with ctypes (pix2pix3d_tpu/train/native_loader.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC png_reader.cpp -lz)

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <thread>
#include <atomic>
#include <zlib.h>

namespace {

struct Reader {
    const uint8_t* p;
    size_t n;
    size_t off = 0;
    bool ok = true;

    uint32_t u32() {
        if (off + 4 > n) { ok = false; return 0; }
        uint32_t v = (uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                     (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]);
        off += 4;
        return v;
    }
};

inline int paeth(int a, int b, int c) {
    int pv = a + b - c;
    int pa = abs(pv - a), pb = abs(pv - b), pc = abs(pv - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

// Decode one PNG from memory.  Returns 0 on success.  Output is tightly
// packed H*W*C uint8; C preserved from the file (palette -> 3).
int decode_png_impl(const uint8_t* data, size_t len, uint8_t* out,
                    int* out_w, int* out_h, int* out_c, size_t out_cap) {
    static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (len < 8 || memcmp(data, magic, 8) != 0) return -1;
    Reader r{data, len, 8};

    uint32_t w = 0, h = 0;
    int bit_depth = 0, color_type = -1;
    std::vector<uint8_t> idat;
    std::vector<uint8_t> palette;

    while (r.ok && r.off + 8 <= r.n) {
        uint32_t clen = r.u32();
        if (r.off + 4 > r.n) return -2;
        char tag[5] = {0};
        memcpy(tag, r.p + r.off, 4);
        r.off += 4;
        if (r.off + clen + 4 > r.n) return -2;
        const uint8_t* body = r.p + r.off;

        if (!strcmp(tag, "IHDR")) {
            if (clen < 13) return -2;
            w = (uint32_t(body[0]) << 24) | (body[1] << 16) | (body[2] << 8) | body[3];
            h = (uint32_t(body[4]) << 24) | (body[5] << 16) | (body[6] << 8) | body[7];
            bit_depth = body[8];
            color_type = body[9];
            if (body[10] != 0 || body[11] != 0) return -3;  // compression/filter
            if (body[12] != 0) return -4;                   // interlace unsupported
            if (bit_depth != 8) return -5;                  // 8-bit only
        } else if (!strcmp(tag, "PLTE")) {
            palette.assign(body, body + clen);
        } else if (!strcmp(tag, "IDAT")) {
            idat.insert(idat.end(), body, body + clen);
        } else if (!strcmp(tag, "IEND")) {
            break;
        }
        r.off += clen + 4;  // skip body + crc
    }
    if (w == 0 || h == 0 || idat.empty()) return -2;

    int nch;  // channels in the raw scanlines
    switch (color_type) {
        case 0: nch = 1; break;  // gray
        case 2: nch = 3; break;  // rgb
        case 3: nch = 1; break;  // palette index
        case 4: nch = 2; break;  // gray+alpha
        case 6: nch = 4; break;  // rgba
        default: return -6;
    }

    const size_t stride = size_t(w) * nch;
    std::vector<uint8_t> raw((stride + 1) * h);
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
        return -7;
    if (raw_len != raw.size()) return -7;

    // Defilter in place into `img`.
    std::vector<uint8_t> img(stride * h);
    const int bpp = nch;
    for (uint32_t y = 0; y < h; y++) {
        const uint8_t* src = raw.data() + y * (stride + 1);
        uint8_t filter = src[0];
        src++;
        uint8_t* dst = img.data() + y * stride;
        const uint8_t* up = y ? img.data() + (y - 1) * stride : nullptr;
        switch (filter) {
            case 0:
                memcpy(dst, src, stride);
                break;
            case 1:
                for (size_t x = 0; x < stride; x++)
                    dst[x] = src[x] + (x >= size_t(bpp) ? dst[x - bpp] : 0);
                break;
            case 2:
                for (size_t x = 0; x < stride; x++)
                    dst[x] = src[x] + (up ? up[x] : 0);
                break;
            case 3:
                for (size_t x = 0; x < stride; x++) {
                    int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
                    int b = up ? up[x] : 0;
                    dst[x] = src[x] + uint8_t((a + b) >> 1);
                }
                break;
            case 4:
                for (size_t x = 0; x < stride; x++) {
                    int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
                    int b = up ? up[x] : 0;
                    int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
                    dst[x] = src[x] + uint8_t(paeth(a, b, c));
                }
                break;
            default:
                return -8;
        }
    }

    // Palette expansion.
    int final_c = (color_type == 3) ? 3 : nch;
    if (out_cap < size_t(w) * h * final_c) return -9;
    if (color_type == 3) {
        if (palette.empty()) return -6;
        for (size_t i = 0; i < size_t(w) * h; i++) {
            uint8_t idx = img[i];
            size_t po = size_t(idx) * 3;
            if (po + 2 >= palette.size()) return -6;
            out[i * 3 + 0] = palette[po + 0];
            out[i * 3 + 1] = palette[po + 1];
            out[i * 3 + 2] = palette[po + 2];
        }
    } else {
        memcpy(out, img.data(), img.size());
    }
    *out_w = int(w);
    *out_h = int(h);
    *out_c = final_c;
    return 0;
}

}  // namespace

extern "C" {

int p2p3d_decode_png(const uint8_t* data, size_t len, uint8_t* out,
                     size_t out_cap, int* w, int* h, int* c) {
    return decode_png_impl(data, len, out, w, h, c, out_cap);
}

// Batch decode with a thread pool.  bufs/lens: array of `count` PNG blobs.
// outs: per-item output buffers of out_cap bytes.  whc: [count*3] ints.
// Returns number of failures.
int p2p3d_decode_png_batch(const uint8_t** bufs, const size_t* lens,
                           uint8_t** outs, size_t out_cap, int* whc,
                           int count, int num_threads) {
    std::atomic<int> next(0), failures(0);
    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= count) break;
            int rc = decode_png_impl(bufs[i], lens[i], outs[i],
                                     &whc[i * 3 + 0], &whc[i * 3 + 1],
                                     &whc[i * 3 + 2], out_cap);
            if (rc != 0) failures.fetch_add(1);
        }
    };
    if (num_threads <= 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < num_threads; t++) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    return failures.load();
}

// 3x3 box blur on inverted grayscale (the edge-map preprocessing hot path,
// ref `dataset.py:495-505`), reflect-101 borders like cv2.blur.
void p2p3d_edge_preprocess(const uint8_t* in, uint8_t* out, int h, int w) {
    std::vector<float> inv(size_t(h) * w);
    for (size_t i = 0; i < inv.size(); i++) inv[i] = 255.0f - in[i];
    auto at = [&](int y, int x) -> float {
        if (y < 0) y = -y;
        if (y >= h) y = 2 * h - 2 - y;
        if (x < 0) x = -x;
        if (x >= w) x = 2 * w - 2 - x;
        return inv[size_t(y) * w + x];
    };
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            float s = 0;
            for (int dy = -1; dy <= 1; dy++)
                for (int dx = -1; dx <= 1; dx++) s += at(y + dy, x + dx);
            float v = s / 9.0f + 0.5f;
            out[size_t(y) * w + x] = uint8_t(v < 0 ? 0 : (v > 255 ? 255 : v));
        }
    }
}

}  // extern "C"

// Native host-side runtime for avir_tpu.
//
// The reference is a header-only C++ library whose CLI links turbojpeg/
// libpng/zlib for image I/O (/root/reference/README.md:239-243).  This
// module is the TPU framework's native host runtime: the pieces that
// belong on the CPU next to the device pipeline —
//
//   * PNG codec (8/16-bit, 1-4 channels, all scanline filters) built on
//     zlib, so 16-bit ("PNG-48") I/O does not depend on Python imaging
//     libraries;
//   * the error-diffusion ditherer: an inherently serial scan
//     (cf. CImageResizerDithererErrdINL, /root/reference/avir.h:4440-4525,
//     serialized by the reference onto one thread at avir.h:5047-5068).
//     On host it runs at memory speed; the device keeps the parallel
//     default ditherer.
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).
//
// Build: g++ -O2 -shared -fPIC -o libavir_host.so avir_host.cpp -lz

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Error-diffusion dither.
//
// img: float64 [h, w*c] scanline-major, modified in place to quantized
// values in [0, out_max].  Weight semantics match the reference
// (avir.h:4504-4524): current row right 0.364842; next row left
// 0.207305, center 0.364842, right 0.063011; same channel.

static inline double round_biased(double d)
{
    return d < 0.0 ? -std::floor(0.5 - d) : std::floor(d + 0.5);
}

int avir_errdiff_dither(double* img, int64_t h, int64_t w, int64_t c,
                        int trunc_bits, double out_max)
{
    if (h <= 0 || w <= 0 || c <= 0 || out_max <= 0.0) return -1;
    const int64_t n = w * c;
    const int64_t out_range = (int64_t)out_max;
    const double tr_mul =
        trunc_bits > 0 ? out_max / (double)(out_range >> trunc_bits) : 1.0;
    const double tr_mul_i = 1.0 / tr_mul;

    std::vector<double> carry((size_t)(n + c), 0.0);
    std::vector<double> row((size_t)n);

    for (int64_t y = 0; y < h; y++) {
        double* line = img + y * n;
        for (int64_t j = 0; j < n; j++) row[(size_t)j] = line[j] + carry[(size_t)(c + j)];
        std::memset(carry.data(), 0, carry.size() * sizeof(double));
        for (int64_t j = 0; j < n; j++) {
            const double v = row[(size_t)j];
            const double z0 = round_biased(v * tr_mul_i) * tr_mul;
            const double noise = v - z0;
            line[j] = z0 < 0.0 ? 0.0 : (z0 > out_max ? out_max : z0);
            const double nm1 = noise * 0.364842;
            if (j + c < n) {
                row[(size_t)(j + c)] += nm1;
                carry[(size_t)(c + j + c)] += noise * 0.063011;
            }
            carry[(size_t)j] += noise * 0.207305;
            carry[(size_t)(c + j)] += nm1;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// PNG codec (no interlace).  Greyscale / grey+alpha / RGB / RGBA,
// 8- or 16-bit.  Data is interleaved row-major, 16-bit values native
// endian.

static void put_u32(std::vector<uint8_t>& v, uint32_t x)
{
    v.push_back((uint8_t)(x >> 24));
    v.push_back((uint8_t)(x >> 16));
    v.push_back((uint8_t)(x >> 8));
    v.push_back((uint8_t)x);
}

static void put_chunk(std::vector<uint8_t>& out, const char type[4],
                      const uint8_t* data, size_t len)
{
    put_u32(out, (uint32_t)len);
    size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    if (len) out.insert(out.end(), data, data + len);
    uint32_t crc = (uint32_t)crc32(0L, out.data() + start, (uInt)(len + 4));
    put_u32(out, crc);
}

static inline uint8_t paeth(int a, int b, int cc)
{
    int p = a + b - cc;
    int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - cc);
    if (pa <= pb && pa <= pc) return (uint8_t)a;
    if (pb <= pc) return (uint8_t)b;
    return (uint8_t)cc;
}

// Encode: pixels [h][w][channels], bit_depth 8 or 16 (16-bit passed as
// uint16 native endian).  Returns malloc'd buffer in *out (caller frees
// with avir_free), length as return value, or -1 on error.
int64_t avir_png_encode(const uint8_t* pixels, int64_t w, int64_t h,
                        int channels, int bit_depth, uint8_t** out)
{
    if (w <= 0 || h <= 0 || channels < 1 || channels > 4 ||
        (bit_depth != 8 && bit_depth != 16))
        return -1;
    static const uint8_t color_type[5] = {0, 0, 4, 2, 6};
    const int bpp = channels * (bit_depth / 8);
    const size_t stride = (size_t)w * bpp;

    // Raw stream: per row, filter byte (1 = Sub) + filtered bytes.
    std::vector<uint8_t> raw((stride + 1) * (size_t)h);
    for (int64_t y = 0; y < h; y++) {
        const uint8_t* src = pixels + y * stride;
        uint8_t* dst = raw.data() + (size_t)y * (stride + 1);
        dst[0] = 1; // Sub filter: good ratio, cheap
        if (bit_depth == 8) {
            for (size_t i = 0; i < stride; i++)
                dst[1 + i] =
                    (uint8_t)(src[i] - (i >= (size_t)bpp ? src[i - bpp] : 0));
        } else {
            // Convert native-endian u16 to big-endian before filtering.
            std::vector<uint8_t> be(stride);
            const uint16_t* s16 = (const uint16_t*)src;
            for (size_t i = 0; i < stride / 2; i++) {
                be[2 * i] = (uint8_t)(s16[i] >> 8);
                be[2 * i + 1] = (uint8_t)s16[i];
            }
            for (size_t i = 0; i < stride; i++)
                dst[1 + i] =
                    (uint8_t)(be[i] - (i >= (size_t)bpp ? be[i - bpp] : 0));
        }
    }

    uLongf comp_cap = compressBound((uLong)raw.size());
    std::vector<uint8_t> comp(comp_cap);
    if (compress2(comp.data(), &comp_cap, raw.data(), (uLong)raw.size(), 6) !=
        Z_OK)
        return -1;

    std::vector<uint8_t> png;
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    png.insert(png.end(), sig, sig + 8);
    uint8_t ihdr[13];
    ihdr[0] = (uint8_t)((uint32_t)w >> 24);
    ihdr[1] = (uint8_t)((uint32_t)w >> 16);
    ihdr[2] = (uint8_t)((uint32_t)w >> 8);
    ihdr[3] = (uint8_t)w;
    ihdr[4] = (uint8_t)((uint32_t)h >> 24);
    ihdr[5] = (uint8_t)((uint32_t)h >> 16);
    ihdr[6] = (uint8_t)((uint32_t)h >> 8);
    ihdr[7] = (uint8_t)h;
    ihdr[8] = (uint8_t)bit_depth;
    ihdr[9] = color_type[channels];
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    put_chunk(png, "IHDR", ihdr, 13);
    put_chunk(png, "IDAT", comp.data(), comp_cap);
    put_chunk(png, "IEND", nullptr, 0);

    *out = (uint8_t*)std::malloc(png.size());
    if (!*out) return -1;
    std::memcpy(*out, png.data(), png.size());
    return (int64_t)png.size();
}

// Decode header: fills w/h/channels/bit_depth.  Returns 0 on success.
int avir_png_info(const uint8_t* data, int64_t len, int64_t* w, int64_t* h,
                  int* channels, int* bit_depth)
{
    if (len < 33) return -1;
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (std::memcmp(data, sig, 8) != 0) return -1;
    if (std::memcmp(data + 12, "IHDR", 4) != 0) return -1;
    const uint8_t* p = data + 16;
    *w = ((int64_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
    *h = ((int64_t)p[4] << 24) | (p[5] << 16) | (p[6] << 8) | p[7];
    *bit_depth = p[8];
    int ct = p[9];
    if (p[12] != 0) return -2; // interlaced unsupported
    switch (ct) {
        case 0: *channels = 1; break;
        case 2: *channels = 3; break;
        case 4: *channels = 2; break;
        case 6: *channels = 4; break;
        default: return -3; // palette unsupported
    }
    if (*bit_depth != 8 && *bit_depth != 16) return -4;
    return 0;
}

// Decode into caller-allocated out ([h][w][channels], u8 or native u16).
int avir_png_decode(const uint8_t* data, int64_t len, uint8_t* out)
{
    int64_t w, h;
    int channels, bit_depth;
    int rc = avir_png_info(data, len, &w, &h, &channels, &bit_depth);
    if (rc != 0) return rc;
    const int bpp = channels * (bit_depth / 8);
    const size_t stride = (size_t)w * bpp;

    // Concatenate IDAT payloads.
    std::vector<uint8_t> idat;
    const uint8_t* p = data + 8;
    const uint8_t* end = data + len;
    while (p + 8 <= end) {
        uint32_t clen = ((uint32_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) |
                        p[3];
        if (p + 12 + clen > end) return -5;
        if (std::memcmp(p + 4, "IDAT", 4) == 0)
            idat.insert(idat.end(), p + 8, p + 8 + clen);
        if (std::memcmp(p + 4, "IEND", 4) == 0) break;
        p += 12 + clen;
    }
    if (idat.empty()) return -5;

    std::vector<uint8_t> raw((stride + 1) * (size_t)h);
    uLongf rawlen = (uLongf)raw.size();
    if (uncompress(raw.data(), &rawlen, idat.data(), (uLong)idat.size()) !=
            Z_OK ||
        rawlen != raw.size())
        return -6;

    std::vector<uint8_t> prev(stride, 0);
    std::vector<uint8_t> cur(stride);
    for (int64_t y = 0; y < h; y++) {
        const uint8_t* rp = raw.data() + (size_t)y * (stride + 1);
        const int filt = rp[0];
        const uint8_t* rd = rp + 1;
        for (size_t i = 0; i < stride; i++) {
            const int a = i >= (size_t)bpp ? cur[i - bpp] : 0;
            const int b = prev[i];
            const int cc = i >= (size_t)bpp ? prev[i - bpp] : 0;
            int v;
            switch (filt) {
                case 0: v = rd[i]; break;
                case 1: v = rd[i] + a; break;
                case 2: v = rd[i] + b; break;
                case 3: v = rd[i] + ((a + b) >> 1); break;
                case 4: v = rd[i] + paeth(a, b, cc); break;
                default: return -7;
            }
            cur[i] = (uint8_t)v;
        }
        uint8_t* dst = out + (size_t)y * stride;
        if (bit_depth == 8) {
            std::memcpy(dst, cur.data(), stride);
        } else {
            uint16_t* d16 = (uint16_t*)dst;
            for (size_t i = 0; i < stride / 2; i++)
                d16[i] = (uint16_t)((cur[2 * i] << 8) | cur[2 * i + 1]);
        }
        std::swap(prev, cur);
    }
    return 0;
}

void avir_free(uint8_t* p) { std::free(p); }

// ---------------------------------------------------------------------------
// xorshift128 word stream — bit-exact mirror of the golden generator's
// XS128 PRNG (tests/golden/src/gen_golden.cpp) and of the pure-Python
// fallback in tests/conftest.py.  Test infrastructure: the Python loop
// costs ~9 minutes for a 16K source (805M iterations), which pushed the
// 2-process mesh test past its timeout.

void avir_xs128_fill(uint32_t* out, int64_t n, uint32_t seed)
{
    uint32_t x = 123456789u ^ (seed * 2654435761u);
    uint32_t y = 362436069u ^ (seed * 0x9E3779B9u);
    uint32_t z = 521288629u + seed;
    uint32_t w = 88675123u ^ (seed << 7);
    for (int64_t i = 0; i < n; i++) {
        uint32_t t = x ^ (x << 11);
        x = y; y = z; z = w;
        w = w ^ (w >> 19) ^ t ^ (t >> 8);
        out[i] = w;
    }
}

}  // extern "C"

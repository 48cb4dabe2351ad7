// Geogrid flat-binary tile reader (shared library, C ABI).
//
// ref capability: src/core_init_atmosphere/read_geogrid.c (153 LoC) — reads
// WPS geographical static-data tiles: raw arrays of fixed-width integers
// (1..4 bytes), big- or little-endian, optionally signed, scaled by
// `scalefactor`, dimensioned nx*ny*nz. This C++ implementation exposes the
// same contract through a C ABI for ctypes (no Fortran interop layer).
//
// Return codes: 0 ok, 1 cannot open, 2 short read, 3 bad wordsize.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

int read_geogrid(const char *fname, float *rarray, int nx, int ny, int nz,
                 int isigned, int endian, float scalefactor, int wordsize) {
    if (wordsize < 1 || wordsize > 4) return 3;
    const size_t n = static_cast<size_t>(nx) * ny * nz;
    const size_t nbytes = n * wordsize;

    std::FILE *f = std::fopen(fname, "rb");
    if (!f) return 1;
    std::vector<unsigned char> buf(nbytes);
    const size_t got = std::fread(buf.data(), 1, nbytes, f);
    std::fclose(f);
    if (got != nbytes) return 2;

    for (size_t i = 0; i < n; ++i) {
        const unsigned char *p = &buf[i * wordsize];
        uint32_t u = 0;
        if (endian == 0) {               // big-endian (WPS default)
            for (int b = 0; b < wordsize; ++b)
                u = (u << 8) | p[b];
        } else {                         // little-endian
            for (int b = wordsize - 1; b >= 0; --b)
                u = (u << 8) | p[b];
        }
        int64_t v = u;
        if (isigned) {                   // sign-extend
            const int64_t half = 1LL << (8 * wordsize - 1);
            if (v >= half) v -= (half << 1);
        }
        rarray[i] = static_cast<float>(v) * scalefactor;
    }
    return 0;
}

// Inverse: write a tile (used by tests and by static-field generation).
int write_geogrid(const char *fname, const float *rarray, int nx, int ny,
                  int nz, int isigned, int endian, float scalefactor,
                  int wordsize) {
    if (wordsize < 1 || wordsize > 4) return 3;
    const size_t n = static_cast<size_t>(nx) * ny * nz;
    std::vector<unsigned char> buf(n * wordsize);
    for (size_t i = 0; i < n; ++i) {
        int64_t v = static_cast<int64_t>(rarray[i] / scalefactor);
        uint32_t u = static_cast<uint32_t>(v);
        unsigned char *p = &buf[i * wordsize];
        if (endian == 0) {
            for (int b = 0; b < wordsize; ++b)
                p[b] = (u >> (8 * (wordsize - 1 - b))) & 0xFF;
        } else {
            for (int b = 0; b < wordsize; ++b)
                p[b] = (u >> (8 * b)) & 0xFF;
        }
    }
    std::FILE *f = std::fopen(fname, "wb");
    if (!f) return 1;
    const size_t put = std::fwrite(buf.data(), 1, buf.size(), f);
    std::fclose(f);
    return put == buf.size() ? 0 : 2;
}

}  // extern "C"

// Native Gadget-2 snapshot reader/writer (the framework's data loader).
//
// C++ companion to photons_tpu/io/gadget.py for multi-GB snapshots:
// single-pass buffered streaming of the position/velocity blocks straight
// into caller-provided (numpy) buffers, and slice reads so each shard can
// load only its own particle range without touching the rest of the file
// (the reference instead streams the whole file on every rank,
// snapshot.c:211-293).
//
// Format: Fortran-style 4-byte record markers; 256-byte header; float32
// pos block; float32 vel block; uint32 ids (optional on read).
//
// Build: part of libphotons_native.so (see native/Makefile).

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

bool read_marker(std::FILE* f, uint32_t* size) {
    return std::fread(size, 4, 1, f) == 1;
}

bool skip(std::FILE* f, long n) { return std::fseek(f, n, SEEK_CUR) == 0; }

}  // namespace

extern "C" {

// Reads the 256-byte header block into `header`.  Returns 0 on success.
int photons_gadget_read_header(const char* path, unsigned char* header) {
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    uint32_t m0, m1;
    int rc = 1;
    if (read_marker(f, &m0) && m0 >= 256 &&
        std::fread(header, 1, 256, f) == 256 && skip(f, m0 - 256) &&
        read_marker(f, &m1)) {
        rc = 0;
    }
    std::fclose(f);
    return rc;
}

// Reads `count` particles starting at `start` from the pos and vel blocks
// into float32 buffers (count, 3).  n_total = particles in this file.
// Returns 0 on success.
int photons_gadget_read_slice(const char* path, int64_t n_total,
                              int64_t start, int64_t count,
                              float* pos, float* vel) {
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    int rc = 1;
    uint32_t m;
    do {
        if (!read_marker(f, &m) || !skip(f, m) || !read_marker(f, &m)) break;
        // positions
        if (!read_marker(f, &m)) break;
        if ((int64_t)m != n_total * 12) break;
        if (!skip(f, start * 12)) break;
        if (std::fread(pos, 12, count, f) != (size_t)count) break;
        if (!skip(f, (n_total - start - count) * 12)) break;
        if (!read_marker(f, &m)) break;
        // velocities
        if (!read_marker(f, &m)) break;
        if ((int64_t)m != n_total * 12) break;
        if (!skip(f, start * 12)) break;
        if (std::fread(vel, 12, count, f) != (size_t)count) break;
        rc = 0;
    } while (false);
    std::fclose(f);
    return rc;
}

// Writes a full snapshot: header (256 bytes), pos, vel, ids.
int photons_gadget_write(const char* path, const unsigned char* header,
                         int64_t n, const float* pos, const float* vel,
                         const uint32_t* ids) {
    std::FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    auto rec = [&](const void* data, uint32_t size) {
        return std::fwrite(&size, 4, 1, f) == 1 &&
               std::fwrite(data, 1, size, f) == size &&
               std::fwrite(&size, 4, 1, f) == 1;
    };
    int rc = 1;
    if (rec(header, 256) && rec(pos, (uint32_t)(n * 12)) &&
        rec(vel, (uint32_t)(n * 12)) && rec(ids, (uint32_t)(n * 4))) {
        rc = 0;
    }
    std::fclose(f);
    return rc;
}

}  // extern "C"

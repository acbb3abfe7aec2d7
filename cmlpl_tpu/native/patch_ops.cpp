// Native patch-extraction kernels for the offline/interop path.
//
// The reference materialises the full (K, n_PC, w, w) patch tensor with a
// K-iteration Python loop (hyper_tools.py:226-243, K = 207,400 for
// PaviaU).  The TPU pipeline never materialises patches (it gathers them
// on device), but writing the reference-compatible XP.npy
// (cli/sample_generation.py --materialize_patches) still needs the big
// host-side copy — this C++ kernel does it with row memcpys instead of
// Python slicing, parallelised over patches.
//
// Layouts (row-major float32):
//   padded : (prows, pcols, ch)   symmetric-padded cube
//   NHWC   : (K, w, w, ch)        framework layout
//   NCHW   : (K, ch, w, w)        reference XP.npy layout
// Patch k covers padded[r : r+w, c : c+w, :] with r = k / cols,
// c = k % cols (see data/patches.py for the derivation from the
// reference's index arithmetic).

#include <cstring>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

void extract_patches_nhwc_f32(const float* padded, float* out,
                              int64_t rows, int64_t cols,
                              int64_t pcols, int64_t ch, int64_t w) {
    const int64_t K = rows * cols;
    const int64_t row_bytes = static_cast<int64_t>(w) * ch * sizeof(float);
    const int64_t patch_elems = w * w * ch;
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < K; ++k) {
        const int64_t r = k / cols;
        const int64_t c = k % cols;
        float* dst = out + k * patch_elems;
        const float* src = padded + (r * pcols + c) * ch;
        for (int64_t i = 0; i < w; ++i) {
            std::memcpy(dst + i * w * ch, src + i * pcols * ch, row_bytes);
        }
    }
}

// Stage the cube channels-first once (one cheap transpose of ~50 MB),
// then every (patch, channel) plane is w contiguous row segments: writes
// stream sequentially through the 19.9 GB output and reads hit cache
// (the 20-row working set of one channel plane is ~30 KB).
void extract_patches_nchw_f32(const float* padded, float* out,
                              int64_t rows, int64_t cols,
                              int64_t pcols, int64_t ch, int64_t w) {
    const int64_t prows = rows + (w % 2 == 0 ? w : w - 1);
    // channels-first staging buffer (ch, prows, pcols)
    float* cf = new float[ch * prows * pcols];
#pragma omp parallel for schedule(static)
    for (int64_t d = 0; d < ch; ++d) {
        float* plane = cf + d * prows * pcols;
        for (int64_t i = 0; i < prows; ++i) {
            const float* src = padded + i * pcols * ch + d;
            float* dst = plane + i * pcols;
            for (int64_t j = 0; j < pcols; ++j) {
                dst[j] = src[j * ch];
            }
        }
    }

    const int64_t K = rows * cols;
    const int64_t patch_elems = w * w * ch;
    const int64_t seg_bytes = static_cast<int64_t>(w) * sizeof(float);
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < K; ++k) {
        const int64_t r = k / cols;
        const int64_t c = k % cols;
        float* dst = out + k * patch_elems;  // (ch, w, w), sequential
        for (int64_t d = 0; d < ch; ++d) {
            const float* plane = cf + (d * prows + r) * pcols + c;
            for (int64_t i = 0; i < w; ++i) {
                std::memcpy(dst, plane + i * pcols, seg_bytes);
                dst += w;
            }
        }
    }
    delete[] cf;
}

// Symmetric (edge-inclusive reflect) pad of the two leading dims:
// in (rows, cols, ch) -> out (rows + 2hw, cols + 2hw, ch).
// Equivalent to np.pad(mode="symmetric") / the reference's MirrowCut
// (hyper_tools.py:35-55) for hw <= min(rows, cols).
void pad_symmetric_f32(const float* in, float* out,
                       int64_t rows, int64_t cols, int64_t ch,
                       int64_t hw) {
    const int64_t prows = rows + 2 * hw;
    const int64_t pcols = cols + 2 * hw;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < prows; ++i) {
        int64_t si = i - hw;
        if (si < 0) si = -si - 1;          // symmetric reflect
        if (si >= rows) si = 2 * rows - si - 1;
        for (int64_t j = 0; j < pcols; ++j) {
            int64_t sj = j - hw;
            if (sj < 0) sj = -sj - 1;
            if (sj >= cols) sj = 2 * cols - sj - 1;
            std::memcpy(out + (i * pcols + j) * ch,
                        in + (si * cols + sj) * ch,
                        ch * sizeof(float));
        }
    }
}

}  // extern "C"

// tpcg native host library: compressed block-tridiagonal (cbtd) packing and
// ingestion.
//
// This is the TPU rebuild's equivalent of the reference's host-side C++
// layer (the orchestration in /root/reference/include/interface.cuh — the
// part of the reference that is NOT device code). The device math lives in
// Pallas kernels; what belongs in native code here is the host data plumbing
// the reference's consumers do before launch: packing problem data into the
// cbtd layout and ingesting sparse formats (the CSR entry point the
// reference declared and stubbed out with exit(12), interface.cuh:9-20).
//
// Loaded via ctypes from tpcg/utils/native.py, which carries bit-identical
// numpy fallbacks. All buffers are caller-allocated; all functions return 0
// on success, nonzero error codes otherwise (no exit() calls — unlike
// gpuassert.cuh:14).
//
// Build: `make -C csrc` -> libtpcg_host.so.

#include <cstdint>
#include <cstring>

extern "C" {

// CSR (int64 indices, f64 values) -> canonical cbtd blocks (K, 3, n, n),
// row-major within blocks. out must be zero-initialized, size K*3*n*n.
// Returns 0 ok; 1 = entry outside the block-tridiagonal band;
// 2 = bad argument.
int tpcg_csr_to_cbtd(const int64_t* row_ptr, const int64_t* col_ind,
                     const double* val, int64_t n, int64_t K, double* out) {
  if (n <= 0 || K <= 0) return 2;
  const int64_t N = K * n;
  for (int64_t row = 0; row < N; ++row) {
    const int64_t brow = row / n;
    const int64_t r = row - brow * n;
    for (int64_t idx = row_ptr[row]; idx < row_ptr[row + 1]; ++idx) {
      const int64_t col = col_ind[idx];
      if (col < 0 || col >= N) return 2;
      const int64_t bcol = col / n;
      const int64_t c = col - bcol * n;
      const int64_t d = bcol - brow + 1;  // 0=left, 1=diag, 2=right
      if (d < 0 || d > 2) {
        if (val[idx] != 0.0) return 1;  // structural zero outside band: ok
        continue;
      }
      out[((brow * 3 + d) * n + r) * n + c] = val[idx];
    }
  }
  return 0;
}

// Reference flat layout (column-major within blocks; row-0 left and
// row-(K-1) right slots are padding) -> canonical blocks (row-major).
// out size K*3*n*n. Returns 0.
int tpcg_refflat_to_cbtd(const double* flat, int64_t n, int64_t K,
                         double* out) {
  if (n <= 0 || K <= 0) return 2;
  const int64_t nsq = n * n;
  for (int64_t k = 0; k < K; ++k) {
    for (int64_t d = 0; d < 3; ++d) {
      const bool pad = (k == 0 && d == 0) || (k == K - 1 && d == 2);
      const double* src = flat + (k * 3 + d) * nsq;
      double* dst = out + (k * 3 + d) * nsq;
      if (pad) {
        std::memset(dst, 0, sizeof(double) * nsq);
        continue;
      }
      for (int64_t c = 0; c < n; ++c)
        for (int64_t r = 0; r < n; ++r) dst[r * n + c] = src[c * n + r];
    }
  }
  return 0;
}

// Canonical blocks -> reference flat layout (inverse of the above, pads
// written as zeros). Returns 0.
int tpcg_cbtd_to_refflat(const double* blocks, int64_t n, int64_t K,
                         double* out) {
  if (n <= 0 || K <= 0) return 2;
  const int64_t nsq = n * n;
  for (int64_t k = 0; k < K; ++k) {
    for (int64_t d = 0; d < 3; ++d) {
      const double* src = blocks + (k * 3 + d) * nsq;
      double* dst = out + (k * 3 + d) * nsq;
      for (int64_t r = 0; r < n; ++r)
        for (int64_t c = 0; c < n; ++c) dst[c * n + r] = src[r * n + c];
    }
  }
  return 0;
}

// Dense (N x N, row-major, N = K*n) -> canonical cbtd blocks.
// Returns 0 ok; 1 = nonzero outside the band.
int tpcg_dense_to_cbtd(const double* dense, int64_t n, int64_t K,
                       double* out) {
  if (n <= 0 || K <= 0) return 2;
  const int64_t N = K * n;
  for (int64_t i = 0; i < N; ++i) {
    const int64_t brow = i / n, r = i - (i / n) * n;
    for (int64_t j = 0; j < N; ++j) {
      const double v = dense[i * N + j];
      const int64_t bcol = j / n, c = j - (j / n) * n;
      const int64_t d = bcol - brow + 1;
      if (d < 0 || d > 2) {
        if (v != 0.0) return 1;
        continue;
      }
      out[((brow * 3 + d) * n + r) * n + c] = v;
    }
  }
  return 0;
}

// Structural validation of canonical blocks: pad slots zero, symmetry
// S_{k,k+1} == S_{k+1,k}^T within tol. Returns 0 ok, 1 = nonzero pad,
// 2 = bad argument, 3 = asymmetric.
int tpcg_validate_cbtd(const double* blocks, int64_t n, int64_t K,
                       double tol) {
  if (n <= 0 || K <= 0) return 2;
  const int64_t nsq = n * n;
  for (int64_t i = 0; i < nsq; ++i)
    if (blocks[0 * 3 * nsq + 0 * nsq + i] != 0.0) return 1;
  for (int64_t i = 0; i < nsq; ++i)
    if (blocks[((K - 1) * 3 + 2) * nsq + i] != 0.0) return 1;
  for (int64_t k = 0; k + 1 < K; ++k) {
    const double* right = blocks + (k * 3 + 2) * nsq;          // S_{k,k+1}
    const double* left = blocks + ((k + 1) * 3 + 0) * nsq;     // S_{k+1,k}
    for (int64_t r = 0; r < n; ++r)
      for (int64_t c = 0; c < n; ++c) {
        const double diff = right[r * n + c] - left[c * n + r];
        if (diff > tol || diff < -tol) return 3;
      }
  }
  return 0;
}

}  // extern "C"

// Flat exact-L2 index — host-side FAISS IndexFlatL2 analog.
//
// The reference's prototype search runs through FAISS's C++ flat index
// (reference: src/adaptive_classifier/memory.py:34,114).  On TPU the index
// lives in HBM and is searched by the Pallas kernel (ops/knn.py); this
// native index is the host-side counterpart: a verification oracle for
// kernel parity tests and a CPU fallback when no accelerator is attached.
// Returns squared L2 distances like FAISS flat.
//
// Build: see native/Makefile.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <utility>
#include <vector>

namespace {

struct FlatIndex {
  int64_t dim;
  std::vector<float> data;  // row-major [n, dim]
  int64_t ntotal() const { return static_cast<int64_t>(data.size()) / dim; }
};

}  // namespace

extern "C" {

void* fi_create(int64_t dim) {
  auto* idx = new FlatIndex();
  idx->dim = dim;
  return idx;
}

void fi_free(void* handle) { delete static_cast<FlatIndex*>(handle); }

int64_t fi_ntotal(void* handle) {
  return static_cast<FlatIndex*>(handle)->ntotal();
}

void fi_add(void* handle, int64_t n, const float* vecs) {
  auto* idx = static_cast<FlatIndex*>(handle);
  idx->data.insert(idx->data.end(), vecs, vecs + n * idx->dim);
}

void fi_reset(void* handle) { static_cast<FlatIndex*>(handle)->data.clear(); }

// Remove row `row` (shifts later rows down, like IndexFlatL2::remove_ids
// renumbering).
void fi_remove(void* handle, int64_t row) {
  auto* idx = static_cast<FlatIndex*>(handle);
  if (row < 0 || row >= idx->ntotal()) return;
  idx->data.erase(idx->data.begin() + row * idx->dim,
                  idx->data.begin() + (row + 1) * idx->dim);
}

// Exact search: squared L2, ascending.  ids padded with -1 when k > ntotal.
void fi_search(void* handle, int64_t nq, const float* queries, int64_t k,
               float* out_d, int64_t* out_i) {
  const auto* idx = static_cast<FlatIndex*>(handle);
  const int64_t n = idx->ntotal(), d = idx->dim;
  std::vector<std::pair<float, int64_t>> heap;
  for (int64_t q = 0; q < nq; ++q) {
    const float* qv = queries + q * d;
    heap.clear();
    heap.reserve(n);
    for (int64_t i = 0; i < n; ++i) {
      const float* v = idx->data.data() + i * d;
      float acc = 0.f;
      for (int64_t j = 0; j < d; ++j) {
        const float diff = qv[j] - v[j];
        acc += diff * diff;
      }
      heap.emplace_back(acc, i);
    }
    const int64_t kk = std::min<int64_t>(k, n);
    std::partial_sort(heap.begin(), heap.begin() + kk, heap.end());
    for (int64_t j = 0; j < k; ++j) {
      if (j < kk) {
        out_d[q * k + j] = heap[j].first;
        out_i[q * k + j] = heap[j].second;
      } else {
        out_d[q * k + j] = std::numeric_limits<float>::max();
        out_i[q * k + j] = -1;
      }
    }
  }
}

}  // extern "C"

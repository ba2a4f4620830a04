// roar_native: CPU runtime for roargraph-tpu.
//
// An OpenMP data-parallel best-first beam-search engine over the padded
// adjacency produced by the TPU build. Two roles:
//   1. CPU serving path (feature parity with the reference's 16/64-thread
//      query drivers, SURVEY.md L2/L6) for deployments without a TPU;
//   2. the measured CPU baseline for bench.py's vs_baseline ratio.
//
// Semantics match roargraph_tpu.search.beam_search_batch: fixed-capacity
// queue ordered by (score, id) with smaller-is-better scores (IP negated by
// the engine, cosine = caller-normalized IP), visited-on-scan, entry point
// visited at init, expand-until-exhausted, cmps/hops counters.
//
// This file is an original implementation; it deliberately shares only the
// *behavior* of the reference engine (see SURVEY.md §3.2), not its code.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline float dot_f32(const float* a, const float* b, int64_t d) {
  float s = 0.f;
#pragma omp simd reduction(+ : s)
  for (int64_t i = 0; i < d; ++i) s += a[i] * b[i];
  return s;
}

inline float l2_f32(const float* a, const float* b, int64_t d) {
  float s = 0.f;
#pragma omp simd reduction(+ : s)
  for (int64_t i = 0; i < d; ++i) {
    const float t = a[i] - b[i];
    s += t * t;
  }
  return s;
}

struct Cand {
  float score;
  int32_t id;
  bool expanded;
};

inline bool cand_lt(float d1, int32_t i1, float d2, int32_t i2) {
  return d1 < d2 || (d1 == d2 && i1 < i2);
}

// Sorted fixed-capacity candidate pool with an unexpanded-cursor.
class Beam {
 public:
  explicit Beam(int cap) : cap_(cap) { data_.resize(cap + 1); }

  void insert(float score, int32_t id) {
    if (size_ == cap_ &&
        !cand_lt(score, id, data_[size_ - 1].score, data_[size_ - 1].id))
      return;
    int lo = 0, hi = size_;
    while (lo < hi) {
      const int mid = (lo + hi) >> 1;
      if (cand_lt(score, id, data_[mid].score, data_[mid].id))
        hi = mid;
      else
        lo = mid + 1;
    }
    if (lo < cap_)
      std::memmove(&data_[lo + 1], &data_[lo], sizeof(Cand) * (size_ - lo));
    data_[lo] = Cand{score, id, false};
    if (size_ < cap_) ++size_;
    if (lo < cursor_) cursor_ = lo;
  }

  bool has_unexpanded() const { return cursor_ < size_; }

  const Cand& expand_closest() {
    data_[cursor_].expanded = true;
    const int p = cursor_;
    while (cursor_ < size_ && data_[cursor_].expanded) ++cursor_;
    return data_[p];
  }

  int size() const { return size_; }
  const Cand& operator[](int i) const { return data_[i]; }

 private:
  std::vector<Cand> data_;
  int cap_ = 0;
  int size_ = 0;
  int cursor_ = 0;
};

}  // namespace

extern "C" {

// metric: 0 = squared L2, 1 = negated inner product.
void roar_search_batch(const float* base, int64_t n, int64_t dim,
                       const int32_t* adj, int64_t width, int32_t ep,
                       const float* queries, int64_t nq, int32_t k, int32_t L,
                       int32_t metric, int32_t num_threads, int32_t* out_ids,
                       float* out_dists, int32_t* out_cmps,
                       int32_t* out_hops) {
#ifdef _OPENMP
  if (num_threads > 0) omp_set_num_threads(num_threads);
#endif
#pragma omp parallel
  {
    // per-thread epoch-tagged visited array: O(1) reset between queries
    std::vector<uint32_t> visit_tag(n, 0u);
    uint32_t tag = 0u;

#pragma omp for schedule(dynamic, 1)
    for (int64_t q = 0; q < nq; ++q) {
      const float* qv = queries + q * dim;
      if (++tag == 0u) {
        std::fill(visit_tag.begin(), visit_tag.end(), 0u);
        tag = 1u;
      }
      auto score = [&](int32_t id) -> float {
        const float* v = base + static_cast<int64_t>(id) * dim;
        return metric == 0 ? l2_f32(v, qv, dim) : -dot_f32(v, qv, dim);
      };

      Beam beam(L);
      beam.insert(score(ep), ep);
      visit_tag[ep] = tag;
      int32_t cmps = 1, hops = 0;

      while (beam.has_unexpanded()) {
        const Cand& cur = beam.expand_closest();
        ++hops;
        const int32_t* nb = adj + static_cast<int64_t>(cur.id) * width;
        for (int64_t j = 0; j < width; ++j) {
          const int32_t nbr = nb[j];
          if (nbr < 0) break;  // padded tail
          if (visit_tag[nbr] == tag) continue;
          visit_tag[nbr] = tag;
          beam.insert(score(nbr), nbr);
          ++cmps;
        }
      }

      const int kk = std::min<int>(k, beam.size());
      for (int i = 0; i < kk; ++i) {
        out_ids[q * k + i] = beam[i].id;
        out_dists[q * k + i] = beam[i].score;
      }
      for (int i = kk; i < k; ++i) {
        out_ids[q * k + i] = -1;
        out_dists[q * k + i] = INFINITY;
      }
      if (out_cmps) out_cmps[q] = cmps;
      if (out_hops) out_hops[q] = hops;
    }
  }
}

// Exact brute-force k-NN (CPU fallback for the groundtruth step; the TPU
// path is roargraph_tpu.ops.topk).
void roar_brute_knn(const float* base, int64_t n, int64_t dim,
                    const float* queries, int64_t nq, int32_t k,
                    int32_t metric, int32_t num_threads, int32_t* out_ids,
                    float* out_dists) {
#ifdef _OPENMP
  if (num_threads > 0) omp_set_num_threads(num_threads);
#endif
#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t q = 0; q < nq; ++q) {
    const float* qv = queries + q * dim;
    std::vector<std::pair<float, int32_t>> heap;  // max-heap by (score,id)
    heap.reserve(k + 1);
    auto worse = [](const std::pair<float, int32_t>& a,
                    const std::pair<float, int32_t>& b) {
      return a.first < b.first ||
             (a.first == b.first && a.second < b.second);
    };
    for (int64_t i = 0; i < n; ++i) {
      const float* v = base + i * dim;
      const float s = metric == 0 ? l2_f32(v, qv, dim) : -dot_f32(v, qv, dim);
      const std::pair<float, int32_t> c{s, static_cast<int32_t>(i)};
      if (static_cast<int32_t>(heap.size()) < k) {
        heap.push_back(c);
        std::push_heap(heap.begin(), heap.end(), worse);
      } else if (worse(c, heap.front())) {
        std::pop_heap(heap.begin(), heap.end(), worse);
        heap.back() = c;
        std::push_heap(heap.begin(), heap.end(), worse);
      }
    }
    std::sort_heap(heap.begin(), heap.end(), worse);
    for (int i = 0; i < k; ++i) {
      out_ids[q * k + i] = i < static_cast<int>(heap.size()) ? heap[i].second : -1;
      out_dists[q * k + i] =
          i < static_cast<int>(heap.size()) ? heap[i].first : INFINITY;
    }
  }
}

void roar_max_threads(int32_t* out) {
#ifdef _OPENMP
  *out = omp_get_max_threads();
#else
  *out = 1;
#endif
}

}  // extern "C"

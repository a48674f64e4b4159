// Native BM25 scorer — host-side hot loop for stage-1 lexical search.
//
// The reference scores every document per query in pure Python
// (src/stage1_retriever.py:103-112). The Python layer here already
// vectorizes with scipy; this C++ engine goes further: incremental
// postings with contiguous per-term arrays, scoring only documents that
// contain a query term, no scipy materialization. Same Okapi math:
// k1=1.2 b=0.75, idf = ln((N - df + 0.5)/(df + 0.5) + 1).
//
// C ABI (ctypes):
//   bm25_create(k1, b) -> handle
//   bm25_add_doc(handle, term_ids, term_freqs, n_terms, doc_len)
//   bm25_score_query(handle, term_ids, term_counts, n_terms,
//                    out_scores /* [n_docs] */) -> n_docs
//   bm25_num_docs(handle), bm25_destroy(handle)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Posting {
  std::vector<int32_t> docs;
  std::vector<float> tfs;
};

struct Index {
  double k1 = 1.2;
  double b = 0.75;
  std::vector<Posting> postings;  // term id -> postings
  std::vector<int32_t> doc_lens;
  double total_len = 0.0;
};

}  // namespace

extern "C" {

void* bm25_create(double k1, double b) {
  auto* idx = new Index();
  idx->k1 = k1;
  idx->b = b;
  return idx;
}

void bm25_add_doc(void* handle, const int64_t* term_ids,
                  const double* term_freqs, int64_t n_terms,
                  int64_t doc_len) {
  auto* idx = static_cast<Index*>(handle);
  int32_t doc = static_cast<int32_t>(idx->doc_lens.size());
  idx->doc_lens.push_back(static_cast<int32_t>(doc_len));
  idx->total_len += static_cast<double>(doc_len);
  for (int64_t i = 0; i < n_terms; ++i) {
    int64_t t = term_ids[i];
    if (t < 0) continue;  // mirror the scoring-side id guard
    if (t >= static_cast<int64_t>(idx->postings.size()))
      idx->postings.resize(t + 1);
    idx->postings[t].docs.push_back(doc);
    idx->postings[t].tfs.push_back(static_cast<float>(term_freqs[i]));
  }
}

int64_t bm25_num_docs(void* handle) {
  return static_cast<Index*>(handle)->doc_lens.size();
}

int64_t bm25_score_query(void* handle, const int64_t* term_ids,
                         const double* term_counts, int64_t n_terms,
                         double* out_scores) {
  auto* idx = static_cast<Index*>(handle);
  const int64_t n_docs = idx->doc_lens.size();
  std::memset(out_scores, 0, n_docs * sizeof(double));
  if (n_docs == 0) return 0;
  // Guard against an all-empty corpus (avg 0 would divide the norm
  // term by zero); matches the Python path's `avg_doc_len or 1.0`.
  const double avg =
      idx->total_len > 0 ? idx->total_len / static_cast<double>(n_docs) : 1.0;
  const double k1 = idx->k1, b = idx->b;
  for (int64_t i = 0; i < n_terms; ++i) {
    int64_t t = term_ids[i];
    if (t < 0 || t >= static_cast<int64_t>(idx->postings.size())) continue;
    const Posting& p = idx->postings[t];
    if (p.docs.empty()) continue;
    const double df = static_cast<double>(p.docs.size());
    const double idf =
        std::log((static_cast<double>(n_docs) - df + 0.5) / (df + 0.5) + 1.0);
    const double qw = term_counts[i] * idf * (k1 + 1.0);
    for (size_t j = 0; j < p.docs.size(); ++j) {
      const int32_t d = p.docs[j];
      const double tf = p.tfs[j];
      const double norm =
          k1 * (1.0 - b + b * static_cast<double>(idx->doc_lens[d]) / avg);
      out_scores[d] += qw * tf / (tf + norm);
    }
  }
  return n_docs;
}

void bm25_destroy(void* handle) { delete static_cast<Index*>(handle); }

}  // extern "C"

// Native byte-pair-encoding merge kernel for utils/bpe.py (GPT2BPE).
//
// The BPE merge loop (greedy lowest-rank adjacent-pair fusion, the exact
// algorithm of utils/bpe.py::GPT2BPE._bpe) is the hot path of corpus
// tokenization — a pure-python implementation walks each piece O(n^2) times
// through dict lookups.  Here the same algorithm runs over int32 SYMBOL IDS
// (the python wrapper maps the byte-level strings to vocabulary ids, a
// bijection, so outputs are token-for-token identical — pinned by the
// differential test in tests/test_bpe.py).
//
// State: one handle per tokenizer holding the (a, b) -> (rank, merged_id)
// hash; encode calls process a batch of pieces per crossing.

#include <cstddef>
#include <cstdint>
#include <limits>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {
struct BPE {
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> ranks;
};
inline uint64_t pair_key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}
}  // namespace

extern "C" {

// triples: n rows of (a_id, b_id, merged_id) in MERGE-RANK order.
void* bpe_new(const int32_t* triples, int32_t n) {
  BPE* bpe = new BPE();
  bpe->ranks.reserve(static_cast<size_t>(n) * 2);
  for (int32_t i = 0; i < n; ++i) {
    bpe->ranks.emplace(pair_key(triples[3 * i], triples[3 * i + 1]),
                       std::make_pair(i, triples[3 * i + 2]));
  }
  return bpe;
}

void bpe_free(void* h) { delete static_cast<BPE*>(h); }

// symbols: concatenated base-symbol ids of all pieces; offsets: (n_pieces+1)
// prefix offsets into symbols.  out must hold >= offsets[n_pieces] ids (the
// merged sequence is never longer than the input); out_offsets: n_pieces+1.
// Returns the total number of output ids.
int64_t bpe_encode(void* h, const int32_t* symbols, const int64_t* offsets,
                   int64_t n_pieces, int32_t* out, int64_t* out_offsets) {
  BPE* bpe = static_cast<BPE*>(h);
  int64_t w = 0;
  out_offsets[0] = 0;
  std::vector<int32_t> word;
  for (int64_t p = 0; p < n_pieces; ++p) {
    word.assign(symbols + offsets[p], symbols + offsets[p + 1]);
    while (word.size() > 1) {
      int32_t best_rank = std::numeric_limits<int32_t>::max();
      int32_t best_merged = -1, best_a = 0, best_b = 0;
      for (size_t i = 0; i + 1 < word.size(); ++i) {
        auto it = bpe->ranks.find(pair_key(word[i], word[i + 1]));
        if (it != bpe->ranks.end() && it->second.first < best_rank) {
          best_rank = it->second.first;
          best_merged = it->second.second;
          best_a = word[i];
          best_b = word[i + 1];
        }
      }
      if (best_merged < 0) break;
      size_t j = 0;
      for (size_t i = 0; i < word.size();) {
        if (i + 1 < word.size() && word[i] == best_a &&
            word[i + 1] == best_b) {
          word[j++] = best_merged;
          i += 2;
        } else {
          word[j++] = word[i++];
        }
      }
      word.resize(j);
    }
    for (int32_t t : word) out[w++] = t;
    out_offsets[p + 1] = w;
  }
  return w;
}

}  // extern "C"

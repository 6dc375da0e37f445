// Native BPE merge engine: the hot inner loop of tokenization.
//
// The reference's tokenizer is C++ (/root/reference/src/tokenizer.cpp
// llm_bpe_tokenizer); the Python rank-queue merge in
// chatllm_tpu/tokenizer/processor.py:_merge_ranked is ~70% of encode time
// on long prompts.  This is the exact same algorithm behind a C ABI: a
// per-tokenizer context holds the piece→id map and the (left,right)→rank
// merge table; encode runs the lowest-rank-first bigram merge with the
// SAME tie-breaking as Python's heapq tuples (rank, left, right, bytes)
// and the same byte-fallback semantics (per raw byte in Sequence mode,
// per mapped UTF-8 char otherwise).
//
// Exposed via ctypes (chatllm_tpu/native/__init__.py NativeBPE); any
// failure returns <0 and the caller falls back to the Python path.
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct BpeCtx {
    std::unordered_map<std::string, int32_t> vocab;
    std::unordered_map<std::string, int32_t> merge_rank;
    std::vector<float> scores;     // by token id (SP-score BPE only)
};

inline std::string pair_key(const char* l, size_t ln, const char* r, size_t rn) {
    std::string k;
    k.reserve(ln + rn + 5);
    uint32_t n = (uint32_t)ln;
    k.append((const char*)&n, 4);
    k.append(l, ln);
    k.append(r, rn);
    return k;
}

// UTF-8 char length from the leading byte's high nibble — the EXACT table
// processor.py uses (_UTF8_LEN: continuation bytes -> 1, 0xC/0xD -> 2,
// 0xE -> 3, 0xF -> 4); callers clip to the remaining length like
// utf8_char_lengths' min(n - off, ln).
inline int u8len(uint8_t b) {
    static const int tab[16] = {1, 1, 1, 1, 1, 1, 1, 1,
                                1, 1, 1, 1, 2, 2, 3, 4};
    return tab[b >> 4];
}

struct Bigram {
    int32_t rank;
    int32_t left, right;
    std::string text;
    bool operator>(const Bigram& o) const {
        if (rank != o.rank) return rank > o.rank;
        if (left != o.left) return left > o.left;
        if (right != o.right) return right > o.right;
        return text > o.text;
    }
};

}  // namespace

extern "C" {

void* bpe_new(const uint8_t* pieces, const int64_t* piece_off,
              const int32_t* piece_ids, int64_t n_pieces,
              const uint8_t* ml, const int64_t* ml_off,
              const uint8_t* mr, const int64_t* mr_off, int64_t n_merges) {
    auto* ctx = new BpeCtx();
    ctx->vocab.reserve((size_t)n_pieces * 2);
    for (int64_t i = 0; i < n_pieces; i++) {
        std::string p((const char*)pieces + piece_off[i],
                      (size_t)(piece_off[i + 1] - piece_off[i]));
        // duplicate pieces: LAST id wins (Python dict-assignment parity,
        // processor.py load_vocab_list:95)
        ctx->vocab[std::move(p)] = piece_ids[i];
    }
    ctx->merge_rank.reserve((size_t)n_merges * 2);
    for (int64_t i = 0; i < n_merges; i++) {
        std::string k = pair_key(
            (const char*)ml + ml_off[i], (size_t)(ml_off[i + 1] - ml_off[i]),
            (const char*)mr + mr_off[i], (size_t)(mr_off[i + 1] - mr_off[i]));
        ctx->merge_rank.emplace(std::move(k), (int32_t)i);
    }
    return ctx;
}

void bpe_free(void* p) { delete (BpeCtx*)p; }

// Attach per-id piece scores (SP-score BPE, processor.py BPEProcessor1).
void bpe_set_scores(void* pctx, const float* scores, int64_t n) {
    auto* ctx = (BpeCtx*)pctx;
    ctx->scores.assign(scores, scores + n);
}

// SentencePiece-score BPE over ONE text span (llama_sp_tokenizer parity:
// higher score first, tie -> smaller left index, then insertion order;
// byte-fallback id = byte + 3).  Returns ids written, -1 on overflow.
int64_t spm_encode(void* pctx, const uint8_t* text, int64_t tlen,
                   int32_t* out, int64_t cap) {
    auto* ctx = (BpeCtx*)pctx;
    if (tlen == 0) return 0;
    const char* word = (const char*)text;
    std::vector<int32_t> starts, length, prev, nxt;
    for (int64_t off = 0; off < tlen;) {
        int l = u8len((uint8_t)word[off]);
        if (off + l > tlen) l = (int)(tlen - off);
        starts.push_back((int32_t)off);
        length.push_back(l);
        off += l;
    }
    const int n = (int)starts.size();
    prev.resize(n); nxt.resize(n);
    for (int i = 0; i < n; i++) {
        prev[i] = i - 1;
        nxt[i] = (starts[i] + length[i] < tlen) ? i + 1 : -1;
    }
    struct Cand {
        float negscore;
        int32_t left, counter, right, size;
        bool operator>(const Cand& o) const {
            if (negscore != o.negscore) return negscore > o.negscore;
            if (left != o.left) return left > o.left;
            return counter > o.counter;
        }
    };
    std::priority_queue<Cand, std::vector<Cand>, std::greater<Cand>> heap;
    int32_t counter = 0;
    auto try_add = [&](int left, int right) {
        if (left < 0 || right < 0) return;
        int32_t sz = starts[right] + length[right] - starts[left];
        auto it = ctx->vocab.find(std::string(word + starts[left], (size_t)sz));
        if (it == ctx->vocab.end() ||
            (size_t)it->second >= ctx->scores.size()) return;
        heap.push({-ctx->scores[(size_t)it->second], (int32_t)left, counter++,
                   (int32_t)right, sz});
    };
    for (int i = 1; i < n; i++) try_add(i - 1, i);
    while (!heap.empty()) {
        Cand c = heap.top();
        heap.pop();
        if (length[c.left] == 0 || length[c.right] == 0 ||
            length[c.left] + length[c.right] != c.size)
            continue;
        length[c.left] += length[c.right];
        length[c.right] = 0;
        nxt[c.left] = nxt[c.right];
        if (nxt[c.right] >= 0) prev[nxt[c.right]] = c.left;
        try_add(prev[c.left], c.left);
        try_add(c.left, nxt[c.left]);
    }
    int64_t n_out = 0;
    for (int i = 0; i != -1; i = nxt[i]) {
        if (length[i] == 0) continue;
        auto it = ctx->vocab.find(
            std::string(word + starts[i], (size_t)length[i]));
        if (it != ctx->vocab.end()) {
            if (n_out >= cap) return -1;
            out[n_out++] = it->second;
        } else {
            for (int j = 0; j < length[i]; j++) {
                if (n_out >= cap) return -1;
                out[n_out++] = (int32_t)(uint8_t)word[starts[i] + j] + 3;
            }
        }
    }
    return n_out;
}

// Encode a batch of pre-tokenized words.  Returns the number of ids
// written, or -1 on overflow / unknown fallback unit (caller reverts to
// the Python path).
int64_t bpe_encode(void* pctx, const uint8_t* blob, const int64_t* word_off,
                   int64_t n_words, int32_t seq_mode,
                   int32_t* out, int64_t cap) {
    auto* ctx = (BpeCtx*)pctx;
    int64_t n_out = 0;
    std::vector<int32_t> starts, length, prev, nxt;
    std::priority_queue<Bigram, std::vector<Bigram>, std::greater<Bigram>> heap;

    for (int64_t wi = 0; wi < n_words; wi++) {
        const char* word = (const char*)blob + word_off[wi];
        const int64_t wlen = word_off[wi + 1] - word_off[wi];
        if (wlen == 0) continue;
        starts.clear(); length.clear();
        for (int64_t off = 0; off < wlen;) {
            int l = u8len((uint8_t)word[off]);
            if (off + l > wlen) l = (int)(wlen - off);   // min(n-off, ln)
            starts.push_back((int32_t)off);
            length.push_back(l);
            off += l;
        }
        const int n = (int)starts.size();
        prev.resize(n); nxt.resize(n);
        for (int i = 0; i < n; i++) {
            prev[i] = i - 1;
            nxt[i] = (starts[i] + length[i] < wlen) ? i + 1 : -1;
        }
        while (!heap.empty()) heap.pop();

        auto add_bigram = [&](int left, int right) {
            if (left < 0 || right < 0) return;
            auto k = pair_key(word + starts[left], (size_t)length[left],
                              word + starts[right], (size_t)length[right]);
            auto it = ctx->merge_rank.find(k);
            if (it == ctx->merge_rank.end()) return;
            heap.push({it->second, left, right,
                       std::string(word + starts[left], (size_t)length[left])
                       + std::string(word + starts[right], (size_t)length[right])});
        };
        for (int i = 1; i < n; i++) add_bigram(i - 1, i);

        while (!heap.empty()) {
            Bigram b = heap.top();
            heap.pop();
            if (length[b.left] == 0 || length[b.right] == 0) continue;
            if ((size_t)(length[b.left] + length[b.right]) != b.text.size() ||
                memcmp(word + starts[b.left], b.text.data(),
                       (size_t)length[b.left]) != 0 ||
                memcmp(word + starts[b.right], b.text.data() + length[b.left],
                       (size_t)length[b.right]) != 0)
                continue;
            length[b.left] += length[b.right];
            length[b.right] = 0;
            nxt[b.left] = nxt[b.right];
            if (nxt[b.right] >= 0) prev[nxt[b.right]] = b.left;
            add_bigram(prev[b.left], b.left);
            add_bigram(b.left, nxt[b.left]);
        }

        for (int i = 0; i != -1; i = nxt[i]) {
            if (length[i] == 0) continue;
            std::string piece(word + starts[i], (size_t)length[i]);
            auto it = ctx->vocab.find(piece);
            if (it != ctx->vocab.end()) {
                if (n_out >= cap) return -1;
                out[n_out++] = it->second;
                continue;
            }
            // byte fallback: raw bytes (Sequence mode) / utf8 chars
            for (int64_t off = 0; off < (int64_t)piece.size();) {
                int l = seq_mode ? 1 : u8len((uint8_t)piece[off]);
                if (off + l > (int64_t)piece.size())
                    l = (int)((int64_t)piece.size() - off);
                auto cit = ctx->vocab.find(piece.substr((size_t)off, (size_t)l));
                if (cit == ctx->vocab.end()) return -1;
                if (n_out >= cap) return -1;
                out[n_out++] = cit->second;
                off += l;
            }
        }
    }
    return n_out;
}

}  // extern "C"

// 13-gram decontamination scrubber fast path.
//
// The reference's lm_eval/decontamination/janitor.py references a
// janitor_util.cpp fast path that is absent from its repo (SURVEY.md §2.4);
// this implementation provides the real thing: given a document and a set
// of contaminating n-gram hashes, find the positions of matching n-grams so
// the Python layer can window them out.  Tokenization here matches the
// janitor's contract: lowercase words, punctuation stripped.
//
// Exposed via ctypes; python falls back to the pure implementation.

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// FNV-1a 64-bit over the normalized n-gram (words joined by single spaces).
inline uint64_t fnv1a(const char* s, size_t n, uint64_t h) {
    for (size_t i = 0; i < n; ++i) {
        h ^= static_cast<unsigned char>(s[i]);
        h *= 1099511628211ull;
    }
    return h;
}

struct Word {
    size_t begin;  // char offset in original text
    size_t end;
    std::string norm;
};

void split_words(const char* text, size_t len, std::vector<Word>* words) {
    size_t i = 0;
    while (i < len) {
        while (i < len && std::isspace(static_cast<unsigned char>(text[i]))) ++i;
        if (i >= len) break;
        const size_t start = i;
        std::string norm;
        while (i < len && !std::isspace(static_cast<unsigned char>(text[i]))) {
            const unsigned char c = static_cast<unsigned char>(text[i]);
            if (std::isalnum(c)) norm.push_back(static_cast<char>(std::tolower(c)));
            ++i;
        }
        if (!norm.empty()) words->push_back({start, i, std::move(norm)});
    }
}

}  // namespace

extern "C" {

// Hash every n-gram of `text`; writes up to `cap` hashes; returns count.
int64_t janitor_ngram_hashes(const char* text, int64_t len, int n,
                             uint64_t* out, int64_t cap) {
    std::vector<Word> words;
    split_words(text, static_cast<size_t>(len), &words);
    if (static_cast<int64_t>(words.size()) < n) return 0;
    int64_t cnt = 0;
    for (size_t i = 0; i + n <= words.size() && cnt < cap; ++i) {
        uint64_t h = 1469598103934665603ull;
        for (int j = 0; j < n; ++j) {
            if (j) h = fnv1a(" ", 1, h);
            h = fnv1a(words[i + j].norm.data(), words[i + j].norm.size(), h);
        }
        out[cnt++] = h;
    }
    return cnt;
}

// Mark contaminated word windows: for each n-gram whose hash is in the
// sorted `bad` array, mark words [i - window, i + n + window).
// Returns number of contaminated n-grams found; fills `mark` (one byte per
// word, caller-allocated, zeroed) and writes word char spans.
int64_t janitor_mark(const char* text, int64_t len, int n,
                     const uint64_t* bad, int64_t nbad, int window,
                     uint8_t* mark, int64_t mark_cap,
                     int64_t* word_begin, int64_t* word_end,
                     int64_t* nwords_out) {
    std::vector<Word> words;
    split_words(text, static_cast<size_t>(len), &words);
    const int64_t nwords = static_cast<int64_t>(words.size());
    *nwords_out = nwords;
    if (nwords > mark_cap) return -1;
    for (int64_t i = 0; i < nwords; ++i) {
        word_begin[i] = static_cast<int64_t>(words[i].begin);
        word_end[i] = static_cast<int64_t>(words[i].end);
    }
    auto contains = [&](uint64_t h) {
        int64_t lo = 0, hi = nbad;
        while (lo < hi) {
            const int64_t mid = (lo + hi) / 2;
            if (bad[mid] < h) lo = mid + 1; else hi = mid;
        }
        return lo < nbad && bad[lo] == h;
    };
    int64_t found = 0;
    for (int64_t i = 0; i + n <= nwords; ++i) {
        uint64_t h = 1469598103934665603ull;
        for (int j = 0; j < n; ++j) {
            if (j) h = fnv1a(" ", 1, h);
            h = fnv1a(words[i + j].norm.data(), words[i + j].norm.size(), h);
        }
        if (contains(h)) {
            ++found;
            const int64_t lo = std::max<int64_t>(0, i - window);
            const int64_t hi = std::min<int64_t>(nwords, i + n + window);
            for (int64_t k = lo; k < hi; ++k) mark[k] = 1;
        }
    }
    return found;
}

}  // extern "C"

// Native BM25 full-text index (≙ tantivy in the reference,
// src/storage/text_indexer.rs). Semantics mirror the Python oracle
// sema_tpu/index/text_index.py exactly:
//   - tokenizer: split on non-word codepoints (generated BMP table matches
//     Python [^\W_]), unicode lowercase (sparse BMP table), drop tokens
//     longer than 40 chars (tantivy RemoveLongFilter);
//   - BM25 k1=1.2 b=0.75, OR-of-terms, idf = ln(1 + (N-df+.5)/(df+.5)),
//     df/avg-len over live docs only;
//   - quoted phrases filter candidates to docs whose token stream contains
//     the phrase tokens consecutively;
//   - tombstone deletion by file path; durable binary serialization.
//
// C ABI with the same [u64 len][payload] result convention as
// sema_native.cpp. Handles are opaque pointers.

#include "unicode_lower_table.h"
#include "unicode_word_table.h"

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "common.h"

namespace {

struct Doc {
    std::string id, path, content;
    uint64_t start_line = 0, end_line = 0;
    bool alive = true;
};

struct TextIndex {
    std::vector<Doc> docs;
    std::vector<uint32_t> doc_len;
    std::unordered_map<std::string,
                       std::vector<std::pair<uint32_t, uint32_t>>> postings;
    uint32_t live = 0;
    uint64_t live_len_sum = 0;
};

// -- utf8 tokenizer ----------------------------------------------------------

inline uint32_t decode_utf8(const std::string& s, size_t& i) {
    uint8_t c = s[i];
    if (c < 0x80) { i += 1; return c; }
    if ((c >> 5) == 0x6 && i + 1 < s.size()) {
        uint32_t cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
        i += 2; return cp;
    }
    if ((c >> 4) == 0xE && i + 2 < s.size()) {
        uint32_t cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6)
                      | (s[i + 2] & 0x3F);
        i += 3; return cp;
    }
    if ((c >> 3) == 0x1E && i + 3 < s.size()) {
        uint32_t cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12)
                      | ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
        i += 4; return cp;
    }
    i += 1;
    return 0xFFFD;
}

inline void append_utf8(std::string& out, uint32_t cp) {
    if (cp < 0x80) out += (char)cp;
    else if (cp < 0x800) {
        out += (char)(0xC0 | (cp >> 6));
        out += (char)(0x80 | (cp & 0x3F));
    } else if (cp < 0x10000) {
        out += (char)(0xE0 | (cp >> 12));
        out += (char)(0x80 | ((cp >> 6) & 0x3F));
        out += (char)(0x80 | (cp & 0x3F));
    } else {
        out += (char)(0xF0 | (cp >> 18));
        out += (char)(0x80 | ((cp >> 12) & 0x3F));
        out += (char)(0x80 | ((cp >> 6) & 0x3F));
        out += (char)(0x80 | (cp & 0x3F));
    }
}

std::vector<std::string> tokenize(const std::string& text) {
    std::vector<std::string> out;
    std::string cur;
    size_t cur_chars = 0;
    size_t i = 0;
    while (i < text.size()) {
        uint32_t cp = decode_utf8(text, i);
        if (is_word_cp(cp)) {
            append_utf8(cur, to_lower_cp(cp));
            cur_chars++;
        } else if (!cur.empty()) {
            if (cur_chars <= 40) out.push_back(cur);   // RemoveLongFilter(40)
            cur.clear(); cur_chars = 0;
        }
    }
    if (!cur.empty() && cur_chars <= 40) out.push_back(cur);
    return out;
}

constexpr double K1 = 1.2, B = 0.75;

// -- io helpers ----------------------------------------------------------------

struct Reader {
    const uint8_t* p;
    size_t n, off = 0;
    uint32_t u32() { uint32_t v; memcpy(&v, p + off, 4); off += 4; return v; }
    uint64_t u64() { uint64_t v; memcpy(&v, p + off, 8); off += 8; return v; }
    std::string str() {
        uint32_t len = u32();
        std::string s(reinterpret_cast<const char*>(p + off), len);
        off += len;
        return s;
    }
};

void write_str(std::ofstream& f, const std::string& s) {
    uint32_t n = (uint32_t)s.size();
    f.write((char*)&n, 4);
    f.write(s.data(), n);
}

std::string read_str(std::ifstream& f) {
    uint32_t n = 0;
    f.read((char*)&n, 4);
    std::string s(n, '\0');
    f.read(s.data(), n);
    return s;
}

}  // namespace

extern "C" {

void* sema_text_new() { return new TextIndex(); }

void sema_text_free_index(void* h) { delete static_cast<TextIndex*>(h); }

// blob: u32 n; per doc: str id, str path, u64 start, u64 end, str content
void sema_text_add(void* h, const uint8_t* blob, uint64_t blob_len) {
    auto* idx = static_cast<TextIndex*>(h);
    Reader r{blob, blob_len};
    uint32_t n = r.u32();
    for (uint32_t i = 0; i < n; i++) {
        Doc d;
        d.id = r.str();
        d.path = r.str();
        d.start_line = r.u64();
        d.end_line = r.u64();
        d.content = r.str();
        uint32_t doc_id = (uint32_t)idx->docs.size();
        auto toks = tokenize(d.content);
        std::unordered_map<std::string, uint32_t> tf;
        for (auto& t : toks) tf[t]++;
        for (auto& [term, count] : tf)
            idx->postings[term].emplace_back(doc_id, count);
        idx->doc_len.push_back((uint32_t)toks.size());
        idx->live++;
        idx->live_len_sum += toks.size();
        idx->docs.push_back(std::move(d));
    }
}

uint64_t sema_text_remove_file(void* h, const char* path) {
    auto* idx = static_cast<TextIndex*>(h);
    uint64_t removed = 0;
    for (size_t i = 0; i < idx->docs.size(); i++) {
        if (idx->docs[i].alive && idx->docs[i].path == path) {
            idx->docs[i].alive = false;
            idx->live--;
            idx->live_len_sum -= idx->doc_len[i];
            removed++;
        }
    }
    return removed;
}

uint64_t sema_text_num_live(void* h) {
    return static_cast<TextIndex*>(h)->live;
}

// payload: u32 n; per hit: str id, str path, u64 start, u64 end,
//          str content, f64 score (bits)
uint8_t* sema_text_search(void* h, const char* query_utf8, uint32_t limit) {
    auto* idx = static_cast<TextIndex*>(h);
    std::string query(query_utf8);

    // split out "quoted phrases"
    std::vector<std::string> phrases;
    std::string bare;
    size_t pos = 0;
    while (pos < query.size()) {
        size_t open = query.find('"', pos);
        if (open == std::string::npos) { bare += query.substr(pos); break; }
        size_t close = query.find('"', open + 1);
        if (close == std::string::npos) { bare += query.substr(pos); break; }
        bare += query.substr(pos, open - pos);
        bare += ' ';
        phrases.push_back(query.substr(open + 1, close - open - 1));
        pos = close + 1;
    }

    std::vector<std::string> terms = tokenize(bare);
    for (auto& p : phrases)
        for (auto& t : tokenize(p)) terms.push_back(t);

    std::string payload;
    if (terms.empty() || idx->live == 0) {
        put_u32(payload, 0);
        return make_result(payload);
    }

    double avg = idx->live ? (double)idx->live_len_sum / idx->live : 1.0;
    if (avg == 0.0) avg = 1.0;
    std::unordered_map<uint32_t, double> scores;
    for (auto& term : terms) {
        auto it = idx->postings.find(term);
        if (it == idx->postings.end()) continue;
        uint32_t df = 0;
        for (auto& [doc, tf] : it->second)
            if (idx->docs[doc].alive) df++;
        if (df == 0) continue;
        double idf = std::log(1.0 + (idx->live - df + 0.5) / (df + 0.5));
        for (auto& [doc, tf] : it->second) {
            if (!idx->docs[doc].alive) continue;
            double dl = idx->doc_len[doc];
            double denom = tf + K1 * (1 - B + B * dl / avg);
            scores[doc] += idf * tf * (K1 + 1) / denom;
        }
    }

    std::vector<std::pair<uint32_t, double>> ranked(scores.begin(),
                                                    scores.end());
    if (!phrases.empty()) {
        std::vector<std::vector<std::string>> ptoks;
        for (auto& p : phrases) ptoks.push_back(tokenize(p));
        // sentinel-wrapped join: '\x00' on BOTH sides of every token so a
        // phrase term never matches a substring of a longer token ("bar"
        // must not match "barometer"); identical to the Python oracle
        auto has_phrases = [&](const Doc& d) {
            auto toks = tokenize(d.content);
            std::string joined(1, '\x00');
            for (auto& t : toks) { joined += t; joined += '\x00'; }
            for (auto& pt : ptoks) {
                if (pt.empty()) continue;  // no-token phrase: no
                                           // constraint (matches oracle)
                std::string needle(1, '\x00');
                for (auto& t : pt) { needle += t; needle += '\x00'; }
                if (joined.find(needle) == std::string::npos) return false;
            }
            return true;
        };
        ranked.erase(std::remove_if(ranked.begin(), ranked.end(),
                                    [&](auto& kv) {
                                        return !has_phrases(idx->docs[kv.first]);
                                    }),
                     ranked.end());
    }

    std::sort(ranked.begin(), ranked.end(), [](auto& a, auto& b) {
        if (a.second != b.second) return a.second > b.second;
        return a.first < b.first;
    });
    if (ranked.size() > limit) ranked.resize(limit);

    put_u32(payload, (uint32_t)ranked.size());
    for (auto& [doc_id, score] : ranked) {
        const Doc& d = idx->docs[doc_id];
        put_str(payload, d.id);
        put_str(payload, d.path);
        put_u64(payload, d.start_line);
        put_u64(payload, d.end_line);
        put_str(payload, d.content);
        uint64_t bits;
        memcpy(&bits, &score, 8);
        put_u64(payload, bits);
    }
    return make_result(payload);
}

static const uint32_t kMagic = 0x53454D54;  // "SEMT" (legacy full snapshot)
static const uint32_t kSegMagic = 0x53454D53;  // "SEMS" (immutable segment)
static const uint32_t kVersion = 1;

uint64_t sema_text_num_docs(void* h) {
    return static_cast<TextIndex*>(h)->docs.size();
}

// Immutable segment holding docs [from, end): the incremental-commit unit
// (≙ tantivy's segment files, reference text_indexer.rs:58-73 — a commit
// writes only the new docs, never the whole index). Postings doc ids are
// stored relative to `from`; per-term lists are appended in doc order, so
// the >=from tail is found by binary search (O(vocab·log) per commit, not
// O(total postings)).
int sema_text_save_segment(void* h, const char* path, uint64_t from) {
    auto* idx = static_cast<TextIndex*>(h);
    if (from > idx->docs.size()) return -3;
    std::string tmp = std::string(path) + ".tmp";
    {
        std::ofstream f(tmp, std::ios::binary | std::ios::trunc);
        if (!f) return -1;
        f.write((char*)&kSegMagic, 4);
        f.write((char*)&kVersion, 4);
        uint64_t n = idx->docs.size() - from;
        f.write((char*)&n, 8);
        for (size_t i = from; i < idx->docs.size(); i++) {
            const Doc& d = idx->docs[i];
            write_str(f, d.id);
            write_str(f, d.path);
            f.write((char*)&d.start_line, 8);
            f.write((char*)&d.end_line, 8);
            write_str(f, d.content);
            f.write((char*)&idx->doc_len[i], 4);
        }
        // count terms with entries in the window first (format wants the
        // term count up front)
        uint64_t nterms = 0;
        for (auto& [term, plist] : idx->postings) {
            auto it = std::lower_bound(
                plist.begin(), plist.end(), from,
                [](const std::pair<uint32_t, uint32_t>& e, uint64_t v) {
                    return e.first < v;
                });
            if (it != plist.end()) nterms++;
        }
        f.write((char*)&nterms, 8);
        for (auto& [term, plist] : idx->postings) {
            auto it = std::lower_bound(
                plist.begin(), plist.end(), from,
                [](const std::pair<uint32_t, uint32_t>& e, uint64_t v) {
                    return e.first < v;
                });
            if (it == plist.end()) continue;
            write_str(f, term);
            uint64_t np = plist.end() - it;
            f.write((char*)&np, 8);
            for (; it != plist.end(); ++it) {
                uint32_t rel = it->first - (uint32_t)from, tf = it->second;
                f.write((char*)&rel, 4);
                f.write((char*)&tf, 4);
            }
        }
        if (!f) return -1;
    }
    return rename(tmp.c_str(), path) == 0 ? 0 : -1;
}

// Append a segment; doc ids rebase onto the current doc count (segments
// must be loaded in manifest order).
int sema_text_load_segment(void* h, const char* path) {
    auto* idx = static_cast<TextIndex*>(h);
    std::ifstream f(path, std::ios::binary);
    if (!f) return -1;
    uint32_t magic = 0, version = 0;
    f.read((char*)&magic, 4);
    f.read((char*)&version, 4);
    if (magic != kSegMagic || version != kVersion) return -2;
    uint64_t base = idx->docs.size(), n = 0;
    f.read((char*)&n, 8);
    for (uint64_t i = 0; i < n; i++) {
        Doc d;
        d.id = read_str(f);
        d.path = read_str(f);
        f.read((char*)&d.start_line, 8);
        f.read((char*)&d.end_line, 8);
        d.content = read_str(f);
        uint32_t dl = 0;
        f.read((char*)&dl, 4);
        idx->doc_len.push_back(dl);
        idx->live++;
        idx->live_len_sum += dl;
        idx->docs.push_back(std::move(d));
    }
    uint64_t nterms = 0;
    f.read((char*)&nterms, 8);
    for (uint64_t i = 0; i < nterms; i++) {
        std::string term = read_str(f);
        uint64_t np = 0;
        f.read((char*)&np, 8);
        auto& plist = idx->postings[term];
        plist.reserve(plist.size() + np);
        for (uint64_t j = 0; j < np; j++) {
            uint32_t rel = 0, tf = 0;
            f.read((char*)&rel, 4);
            f.read((char*)&tf, 4);
            plist.emplace_back((uint32_t)(base + rel), tf);
        }
    }
    return f ? 0 : -1;
}

// payload: u64 n, then u32 global doc ids of tombstoned docs
uint8_t* sema_text_deleted_ids(void* h) {
    auto* idx = static_cast<TextIndex*>(h);
    std::string payload;
    uint64_t n = idx->docs.size() - idx->live;
    put_u64(payload, n);
    for (size_t i = 0; i < idx->docs.size(); i++)
        if (!idx->docs[i].alive) put_u32(payload, (uint32_t)i);
    return make_result(payload);
}

// blob: u64 n, then u32 global doc ids to tombstone (idempotent)
void sema_text_set_deleted(void* h, const uint8_t* blob, uint64_t blob_len) {
    auto* idx = static_cast<TextIndex*>(h);
    Reader r{blob, blob_len};
    uint64_t n = r.u64();
    for (uint64_t i = 0; i < n; i++) {
        uint32_t doc = r.u32();
        if (doc < idx->docs.size() && idx->docs[doc].alive) {
            idx->docs[doc].alive = false;
            idx->live--;
            idx->live_len_sum -= idx->doc_len[doc];
        }
    }
}

// Drop tombstoned docs and remap ids (the wrapper re-saves the survivors
// as one fresh segment afterwards). Returns the new doc count.
uint64_t sema_text_compact(void* h) {
    auto* idx = static_cast<TextIndex*>(h);
    std::vector<uint32_t> remap(idx->docs.size(), UINT32_MAX);
    std::vector<Doc> docs;
    std::vector<uint32_t> doc_len;
    docs.reserve(idx->live);
    doc_len.reserve(idx->live);
    for (size_t i = 0; i < idx->docs.size(); i++) {
        if (!idx->docs[i].alive) continue;
        remap[i] = (uint32_t)docs.size();
        docs.push_back(std::move(idx->docs[i]));
        doc_len.push_back(idx->doc_len[i]);
    }
    for (auto it = idx->postings.begin(); it != idx->postings.end();) {
        auto& plist = it->second;
        size_t w = 0;
        for (auto& [doc, tf] : plist)
            if (remap[doc] != UINT32_MAX) plist[w++] = {remap[doc], tf};
        plist.resize(w);
        if (w == 0) it = idx->postings.erase(it);
        else ++it;
    }
    idx->docs = std::move(docs);
    idx->doc_len = std::move(doc_len);
    return idx->docs.size();
}

int sema_text_save(void* h, const char* path) {
    auto* idx = static_cast<TextIndex*>(h);
    std::string tmp = std::string(path) + ".tmp";
    {
        std::ofstream f(tmp, std::ios::binary | std::ios::trunc);
        if (!f) return -1;
        f.write((char*)&kMagic, 4);
        f.write((char*)&kVersion, 4);
        uint64_t n = idx->docs.size();
        f.write((char*)&n, 8);
        for (size_t i = 0; i < idx->docs.size(); i++) {
            const Doc& d = idx->docs[i];
            uint8_t alive = d.alive;
            f.write((char*)&alive, 1);
            write_str(f, d.id);
            write_str(f, d.path);
            f.write((char*)&d.start_line, 8);
            f.write((char*)&d.end_line, 8);
            write_str(f, d.content);
            f.write((char*)&idx->doc_len[i], 4);
        }
        uint64_t nterms = idx->postings.size();
        f.write((char*)&nterms, 8);
        for (auto& [term, plist] : idx->postings) {
            write_str(f, term);
            uint64_t np = plist.size();
            f.write((char*)&np, 8);
            for (auto& [doc, tf] : plist) {
                f.write((char*)&doc, 4);
                f.write((char*)&tf, 4);
            }
        }
        if (!f) return -1;
    }
    return rename(tmp.c_str(), path) == 0 ? 0 : -1;
}

int sema_text_load(void* h, const char* path) {
    auto* idx = static_cast<TextIndex*>(h);
    std::ifstream f(path, std::ios::binary);
    if (!f) return -1;
    uint32_t magic = 0, version = 0;
    f.read((char*)&magic, 4);
    f.read((char*)&version, 4);
    if (magic != kMagic || version != kVersion) return -2;
    uint64_t n = 0;
    f.read((char*)&n, 8);
    idx->docs.clear();
    idx->doc_len.clear();
    idx->postings.clear();
    idx->live = 0;
    idx->live_len_sum = 0;
    for (uint64_t i = 0; i < n; i++) {
        Doc d;
        uint8_t alive = 0;
        f.read((char*)&alive, 1);
        d.alive = alive;
        d.id = read_str(f);
        d.path = read_str(f);
        f.read((char*)&d.start_line, 8);
        f.read((char*)&d.end_line, 8);
        d.content = read_str(f);
        uint32_t dl = 0;
        f.read((char*)&dl, 4);
        idx->doc_len.push_back(dl);
        if (d.alive) { idx->live++; idx->live_len_sum += dl; }
        idx->docs.push_back(std::move(d));
    }
    uint64_t nterms = 0;
    f.read((char*)&nterms, 8);
    for (uint64_t i = 0; i < nterms; i++) {
        std::string term = read_str(f);
        uint64_t np = 0;
        f.read((char*)&np, 8);
        auto& plist = idx->postings[term];
        plist.reserve(np);
        for (uint64_t j = 0; j < np; j++) {
            uint32_t doc = 0, tf = 0;
            f.read((char*)&doc, 4);
            f.read((char*)&tf, 4);
            plist.emplace_back(doc, tf);
        }
    }
    return f ? 0 : -1;
}

}  // extern "C"

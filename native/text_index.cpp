// Native BM25 full-text engine over disk-resident v2/v3 segments
// (≙ tantivy in the reference, src/storage/text_indexer.rs: immutable
// mmap'd segments, content left on disk and read per hit).
//
// The on-disk format is shared with the Python/numpy engine — see
// sema_tpu/index/text_segment.py for the authoritative layout spec.
// This file provides the two hot operations:
//   sema_tseg_build   — tokenize a doc batch and write one segment
//   sema_tseg_search  — BM25 OR-of-terms + phrase filter over a list of
//                       mmap'd segments, df/avg over live docs only
// Semantics (tokenizer, scoring constants, tie-breaks, phrase sentinel
// convention) are bit-compatible with the Python oracle
// sema_tpu/index/text_index.py; the parity suite asserts identical
// rankings and scores.
//
// C ABI with the same [u64 len][payload] result convention as
// sema_native.cpp.

#include "unicode_lower_table.h"
#include "unicode_word_table.h"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>

#include "common.h"

namespace {

// -- utf8 tokenizer (tantivy default analyzer semantics) ---------------------

inline uint32_t decode_utf8(std::string_view s, size_t& i) {
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

std::vector<std::string> tokenize(std::string_view text) {
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

// -- v2/v3 segment format --------------------------------------------------------

constexpr uint32_t kMagic = 0x32544D53;   // "SMT2" (shared by v2 and v3)
constexpr uint32_t kVersion = 3;
constexpr int kNumSectionsV2 = 11;
constexpr int kNumSections = 13;  // v3 adds pos_term_idx + positions
// header: u32 magic, u32 version, u64 n_docs, u64 total_len, u64 n_terms,
//         u64 n_files, u64 off[n_sections]
constexpr size_t kHeaderSizeV2 = 4 + 4 + 8 * 4 + 8 * kNumSectionsV2;
constexpr size_t kHeaderSize = 4 + 4 + 8 * 4 + 8 * kNumSections;

uint64_t fnv1a64(std::string_view s) {
    uint64_t h = 0xCBF29CE484222325ULL;
    for (unsigned char c : s) {
        h ^= c;
        h *= 0x100000001B3ULL;
    }
    return h;
}

struct Reader {
    const uint8_t* p;
    size_t n, off = 0;
    uint32_t u32() { uint32_t v; memcpy(&v, p + off, 4); off += 4; return v; }
    uint64_t u64() { uint64_t v; memcpy(&v, p + off, 8); off += 8; return v; }
    double f64() { double v; memcpy(&v, p + off, 8); off += 8; return v; }
    std::string str() {
        uint32_t len = u32();
        std::string s(reinterpret_cast<const char*>(p + off), len);
        off += len;
        return s;
    }
    std::string_view sv() {   // zero-copy view; valid while blob lives
        uint32_t len = u32();
        std::string_view s(reinterpret_cast<const char*>(p + off), len);
        off += len;
        return s;
    }
    const uint8_t* bytes(uint64_t len) {
        const uint8_t* b = p + off;
        off += len;
        return b;
    }
};

void pad8(std::string& s) {
    while (s.size() % 8) s += '\0';
}

// -- segment build ------------------------------------------------------------

struct FileRun {
    uint64_t hash;
    uint32_t start, count;
};

// Worker count for the parallel tokenize+postings phase.
// SEMA_TPU_BUILD_THREADS forces a count (tests pin it to prove the
// threaded build is byte-identical); otherwise hardware_concurrency,
// and small batches stay single-threaded — per-doc work is µs-scale,
// so thread spawn would dominate.
unsigned build_threads(uint32_t n_docs) {
    const char* e = getenv("SEMA_TPU_BUILD_THREADS");
    long v = e ? strtol(e, nullptr, 10) : 0;
    if (v > 0) return (unsigned)std::min<long>(v, 64);
    if (n_docs < 2048) return 1;
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? std::min(hw, 16u) : 1;
}

// blob: u32 n; per doc: str id, str path, u64 start, u64 end, str content
int build_segment(const uint8_t* blob, uint64_t blob_len, const char* path) {
    Reader r{blob, blob_len};
    uint32_t n = r.u32();

    // parse pass: zero-copy views into the blob (it outlives the build)
    struct DocRec { std::string_view id, path, body; uint64_t start, end; };
    std::vector<DocRec> docs(n);
    for (uint32_t i = 0; i < n; i++) {
        docs[i].id = r.sv();
        docs[i].path = r.sv();
        docs[i].start = r.u64();
        docs[i].end = r.u64();
        docs[i].body = r.sv();
        // the meta record stores u16 lengths; silently wrapping would
        // desync every later offset in the segment (the Python engine
        // raises struct.error for the same input) — refuse instead
        if (docs[i].id.size() > 0xFFFF || docs[i].path.size() > 0xFFFF)
            return -3;
    }

    struct PostList {
        std::vector<std::pair<uint32_t, uint32_t>> entries;  // (doc, tf)
        std::vector<uint32_t> pos;  // token positions, run per entry = tf
    };
    // tokenize + postings run sharded over contiguous doc ranges (the
    // compute phase — ~8M tokens/s/core, docs/PERF.md; everything else
    // in this function is memcpy/IO). Each shard fills a LOCAL hash map
    // (O(1) per token vs O(log T) string compares in a std::map); the
    // format's bytewise term order is imposed once by sorting the key
    // list at the end. Doc ids are GLOBAL, so stitching shard results
    // in shard order preserves the per-term ascending-doc invariant and
    // the output is byte-identical at any thread count (pinned by
    // tests/test_text_index_native.py).
    unsigned T = std::min<unsigned>(std::max(build_threads(n), 1u),
                                    std::max(n, 1u));
    struct Shard {
        std::vector<uint32_t> doc_len;
        std::unordered_map<std::string, PostList> postings;
        uint64_t total_len = 0;
    };
    std::vector<Shard> shards(T);
    auto work = [&](unsigned t) {
        uint32_t d0 = (uint32_t)((uint64_t)n * t / T);
        uint32_t d1 = (uint32_t)((uint64_t)n * (t + 1) / T);
        Shard& sh = shards[t];
        sh.doc_len.reserve(d1 - d0);
        for (uint32_t i = d0; i < d1; i++) {
            auto toks = tokenize(docs[i].body);
            sh.doc_len.push_back((uint32_t)toks.size());
            sh.total_len += toks.size();
            // append (pos) runs straight into the term's PostList: a
            // new doc for a term opens a fresh (doc, tf=0) entry;
            // repeats bump the tf and push the position — no per-doc
            // side map, and positions stay grouped per (term, doc) in
            // ascending order because tokens are scanned in order
            for (uint32_t p = 0; p < (uint32_t)toks.size(); p++) {
                auto& pl = sh.postings[toks[p]];
                if (pl.entries.empty() || pl.entries.back().first != i)
                    pl.entries.emplace_back(i, 0u);
                pl.entries.back().second++;
                pl.pos.push_back(p);
            }
        }
    };
    std::vector<std::thread> pool;
    if (T > 1)
        for (unsigned t = 0; t < T; t++) pool.emplace_back(work, t);

    // meanwhile on this thread: the sequential memcpy sections
    std::string doc_len, meta_idx, meta, content_idx, content;
    std::vector<FileRun> runs;
    std::string_view prev_path;
    uint64_t moff = 0, coff = 0;
    put_u64(meta_idx, 0);
    put_u64(content_idx, 0);
    for (uint32_t i = 0; i < n; i++) {
        const DocRec& d = docs[i];
        put_u32(meta, (uint32_t)d.start);
        put_u32(meta, (uint32_t)d.end);
        uint16_t idl = (uint16_t)d.id.size(), pl = (uint16_t)d.path.size();
        meta.append(reinterpret_cast<const char*>(&idl), 2);
        meta.append(reinterpret_cast<const char*>(&pl), 2);
        meta.append(d.id.data(), d.id.size());
        meta.append(d.path.data(), d.path.size());
        moff += 12 + idl + pl;
        put_u64(meta_idx, moff);

        content.append(d.body.data(), d.body.size());
        coff += d.body.size();
        put_u64(content_idx, coff);

        if (runs.empty() || d.path != prev_path) {
            runs.push_back({fnv1a64(d.path), i, 1});
            prev_path = d.path;
        } else {
            runs.back().count++;
        }
    }

    if (T > 1)
        for (auto& th : pool) th.join();
    else
        work(0);

    // stitch shards (shard order == doc order): doc_len concatenates;
    // per-term postings append, keeping doc ids ascending
    uint64_t total_len = 0;
    for (auto& sh : shards) {
        total_len += sh.total_len;
        for (uint32_t L : sh.doc_len) put_u32(doc_len, L);
    }
    auto& postings = shards[0].postings;
    for (unsigned t = 1; t < T; t++) {
        for (auto& kv : shards[t].postings) {
            auto& base = postings[kv.first];
            base.entries.insert(base.entries.end(),
                                kv.second.entries.begin(),
                                kv.second.entries.end());
            base.pos.insert(base.pos.end(), kv.second.pos.begin(),
                            kv.second.pos.end());
        }
        shards[t].postings.clear();
    }

    // postings doc ids are ascending per term by construction (docs are
    // processed in order); the format's term order (bytewise) is
    // imposed here by sorting the key list once
    std::vector<const std::string*> sorted_terms;
    sorted_terms.reserve(postings.size());
    for (auto& kv : postings) sorted_terms.push_back(&kv.first);
    std::sort(sorted_terms.begin(), sorted_terms.end(),
              [](const std::string* a, const std::string* b) {
                  return *a < *b;
              });
    std::string term_idx, terms, post_idx, post_ids, post_tfs;
    std::string pos_term_idx, pos_blob;
    uint64_t toff = 0, pcount = 0, poscount = 0;
    put_u64(term_idx, 0);
    put_u64(post_idx, 0);
    put_u64(pos_term_idx, 0);
    for (const std::string* tp : sorted_terms) {
        const std::string& term = *tp;
        const PostList& plist = postings[term];
        terms += term;
        toff += term.size();
        put_u64(term_idx, toff);
        for (auto& [doc, tf] : plist.entries) {
            put_u32(post_ids, doc);
            put_u32(post_tfs, tf);
        }
        pcount += plist.entries.size();
        put_u64(post_idx, pcount);
        for (uint32_t p : plist.pos) put_u32(pos_blob, p);
        poscount += plist.pos.size();
        put_u64(pos_term_idx, poscount);
    }

    std::stable_sort(runs.begin(), runs.end(),
                     [](const FileRun& a, const FileRun& b) {
                         return a.hash < b.hash;
                     });
    std::string files;
    for (auto& fr : runs) {
        put_u64(files, fr.hash);
        put_u32(files, fr.start);
        put_u32(files, fr.count);
    }

    const std::string* sections[kNumSections] = {
        &doc_len, &meta_idx, &meta, &content_idx, &content,
        &term_idx, &terms, &post_idx, &post_ids, &post_tfs, &files,
        &pos_term_idx, &pos_blob,
    };
    std::string out(kHeaderSize, '\0');
    pad8(out);
    uint64_t offs[kNumSections];
    for (int s = 0; s < kNumSections; s++) {
        offs[s] = out.size();
        out += *sections[s];
        pad8(out);
    }
    size_t o = 0;
    memcpy(out.data() + o, &kMagic, 4); o += 4;
    memcpy(out.data() + o, &kVersion, 4); o += 4;
    uint64_t n64 = n, nterms = postings.size(), nfiles = runs.size();
    memcpy(out.data() + o, &n64, 8); o += 8;
    memcpy(out.data() + o, &total_len, 8); o += 8;
    memcpy(out.data() + o, &nterms, 8); o += 8;
    memcpy(out.data() + o, &nfiles, 8); o += 8;
    memcpy(out.data() + o, offs, 8 * kNumSections);

    std::string tmp = std::string(path) + ".tmp";
    FILE* f = fopen(tmp.c_str(), "wb");
    if (!f) return -1;
    bool ok = fwrite(out.data(), 1, out.size(), f) == out.size();
    ok = fflush(f) == 0 && ok;
    ok = fsync(fileno(f)) == 0 && ok;
    fclose(f);
    if (!ok) return -1;
    return rename(tmp.c_str(), path) == 0 ? 0 : -1;
}

// -- segment view (mmap) ------------------------------------------------------

struct SegView {
    int fd = -1;
    const uint8_t* map = nullptr;
    size_t map_len = 0;
    uint64_t n_docs = 0, total_len = 0, n_terms = 0, n_files = 0;
    uint64_t off[kNumSections] = {0};
    uint32_t version = 0;
    uint64_t base = 0;                 // global doc-id offset
    const uint8_t* del_bits = nullptr; // packed bitmap or null
    // lazily-built tokenized path per file run (immutable after build):
    // path_clause_rows re-tokenized EVERY path in the segment once per
    // clause per query without it (review finding, r3)
    mutable std::vector<std::vector<std::string>> path_toks;
    mutable std::mutex path_mu;
    mutable bool path_cached = false;

    bool has_positions() const { return version >= 3; }

    bool open(const std::string& path) {
        fd = ::open(path.c_str(), O_RDONLY);
        if (fd < 0) return false;
        struct stat st;
        if (fstat(fd, &st) != 0 || (size_t)st.st_size < kHeaderSizeV2) {
            ::close(fd); fd = -1;
            return false;
        }
        map_len = st.st_size;
        void* m = mmap(nullptr, map_len, PROT_READ, MAP_SHARED, fd, 0);
        if (m == MAP_FAILED) { ::close(fd); fd = -1; return false; }
        map = static_cast<const uint8_t*>(m);
        uint32_t magic;
        memcpy(&magic, map, 4);
        memcpy(&version, map + 4, 4);
        if (magic != kMagic || (version != 2 && version != 3)) return false;
        int nsec = version >= 3 ? kNumSections : kNumSectionsV2;
        if (version >= 3 && (size_t)st.st_size < kHeaderSize) return false;
        memcpy(&n_docs, map + 8, 8);
        memcpy(&total_len, map + 16, 8);
        memcpy(&n_terms, map + 24, 8);
        memcpy(&n_files, map + 32, 8);
        memcpy(off, map + 40, 8 * nsec);
        return true;
    }

    ~SegView() {
        if (map) munmap(const_cast<uint8_t*>(map), map_len);
        if (fd >= 0) ::close(fd);
    }

    bool live(uint32_t i) const {
        return !del_bits || ((del_bits[i >> 3] >> (i & 7)) & 1) == 0;
    }
    const uint32_t* doc_len() const {
        return reinterpret_cast<const uint32_t*>(map + off[0]);
    }
    const uint64_t* meta_idx() const {
        return reinterpret_cast<const uint64_t*>(map + off[1]);
    }
    const uint64_t* content_idx() const {
        return reinterpret_cast<const uint64_t*>(map + off[3]);
    }
    const uint64_t* term_idx() const {
        return reinterpret_cast<const uint64_t*>(map + off[5]);
    }
    const uint64_t* post_idx() const {
        return reinterpret_cast<const uint64_t*>(map + off[7]);
    }
    const uint32_t* post_ids() const {
        return reinterpret_cast<const uint32_t*>(map + off[8]);
    }
    const uint32_t* post_tfs() const {
        return reinterpret_cast<const uint32_t*>(map + off[9]);
    }
    const uint64_t* pos_term_idx() const {   // v3 only
        return reinterpret_cast<const uint64_t*>(map + off[11]);
    }
    const uint32_t* positions() const {      // v3 only
        return reinterpret_cast<const uint32_t*>(map + off[12]);
    }

    // bytewise binary search over the sorted term blob; -1 when absent
    int64_t find_term(const std::string& term) const {
        const uint64_t* tix = term_idx();
        const char* blob = reinterpret_cast<const char*>(map + off[6]);
        int64_t lo = 0, hi = (int64_t)n_terms;
        while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            size_t a = tix[mid], b = tix[mid + 1];
            int c = std::char_traits<char>::compare(
                blob + a, term.data(), std::min(b - a, term.size()));
            if (c == 0) c = (b - a < term.size()) ? -1
                            : (b - a > term.size()) ? 1 : 0;
            if (c < 0) lo = mid + 1;
            else if (c > 0) hi = mid;
            else return mid;
        }
        return -1;
    }

    std::string content(uint32_t i) const {
        const uint64_t* cix = content_idx();
        return std::string(
            reinterpret_cast<const char*>(map + off[4] + cix[i]),
            cix[i + 1] - cix[i]);
    }

    void meta(uint32_t i, std::string& id, std::string& path,
              uint32_t& start, uint32_t& end) const {
        const uint64_t* mix = meta_idx();
        const uint8_t* rec = map + off[2] + mix[i];
        uint16_t idl, pl;
        memcpy(&start, rec, 4);
        memcpy(&end, rec + 4, 4);
        memcpy(&idl, rec + 8, 2);
        memcpy(&pl, rec + 10, 2);
        id.assign(reinterpret_cast<const char*>(rec + 12), idl);
        path.assign(reinterpret_cast<const char*>(rec + 12 + idl), pl);
    }

    // file-run table (section 10): one (hash, row_start, row_count) per
    // contiguous run of docs sharing a path; 16-byte packed records in
    // an 8-aligned section
    struct FileRunRec { uint64_t hash; uint32_t start, count; };
    const FileRunRec* files() const {
        return reinterpret_cast<const FileRunRec*>(map + off[10]);
    }
};

// Rows of `sv` whose file path satisfies one path: field clause
// (grammar spec: text_index.py::_Query — path clauses FILTER on the
// path's analyzer tokens; a quoted path phrase needs its tokens
// consecutive in order). The file table stores only hashes, so each
// run's path string is read from its first doc's meta record.
std::vector<uint32_t> path_clause_rows(const SegView& sv,
                                       const std::vector<std::string>& toks,
                                       bool is_phrase) {
    std::vector<uint32_t> rows;
    const auto* runs = sv.files();
    {
        std::lock_guard<std::mutex> lk(sv.path_mu);
        if (!sv.path_cached) {
            sv.path_toks.resize(sv.n_files);
            std::string id_, path_;
            uint32_t a_, b_;
            for (uint64_t j = 0; j < sv.n_files; j++) {
                sv.meta(runs[j].start, id_, path_, a_, b_);
                sv.path_toks[j] = tokenize(path_);
            }
            sv.path_cached = true;
        }
    }
    for (uint64_t j = 0; j < sv.n_files; j++) {
        const auto& ptoks = sv.path_toks[j];
        bool ok;
        if (is_phrase) {
            ok = false;
            for (size_t i = 0; !ok && i + toks.size() <= ptoks.size(); i++)
                ok = std::equal(toks.begin(), toks.end(),
                                ptoks.begin() + i);
        } else {
            ok = true;
            for (auto& t : toks)
                if (std::find(ptoks.begin(), ptoks.end(), t)
                        == ptoks.end()) {
                    ok = false;
                    break;
                }
        }
        if (ok)
            for (uint32_t r = 0; r < runs[j].count; r++)
                rows.push_back(runs[j].start + r);
    }
    std::sort(rows.begin(), rows.end());
    return rows;
}

// Rows of `sv` satisfying ALL phrases, answered from v3 positional
// postings (≙ tantivy PhraseQuery; content never read). Per phrase,
// term k's occurrences become keys (doc << 32) | (pos - k) — ascending
// by construction (docs ascend, positions ascend within a doc) — and a
// set_intersection across the phrase's terms leaves the valid start
// positions. Semantics identical to the content re-tokenize check: the
// positions index the token LIST, with >40-char tokens dropped before
// position assignment by both writers.
std::vector<uint32_t> phrase_rows_positional(
        const SegView& sv,
        const std::vector<std::vector<std::string>>& ptoks) {
    std::vector<uint32_t> rows_all;
    bool first_phrase = true;
    for (auto& pt : ptoks) {
        std::vector<uint64_t> keys;
        bool first = true;
        for (size_t k = 0; k < pt.size(); k++) {
            int64_t t = sv.find_term(pt[k]);
            if (t < 0) return {};
            const uint64_t* pix = sv.post_idx();
            const uint32_t* ids = sv.post_ids();
            const uint32_t* tfs = sv.post_tfs();
            const uint64_t* qix = sv.pos_term_idx();
            const uint32_t* pos = sv.positions();
            std::vector<uint64_t> kk;
            uint64_t poff = qix[t];
            for (uint64_t e = pix[t]; e < pix[t + 1]; e++)
                for (uint32_t j = 0; j < tfs[e]; j++, poff++) {
                    int64_t adj = (int64_t)pos[poff] - (int64_t)k;
                    if (adj >= 0)
                        kk.push_back(((uint64_t)ids[e] << 32)
                                     | (uint64_t)adj);
                }
            if (first) {
                keys = std::move(kk);
                first = false;
            } else {
                std::vector<uint64_t> out;
                std::set_intersection(keys.begin(), keys.end(),
                                      kk.begin(), kk.end(),
                                      std::back_inserter(out));
                keys = std::move(out);
            }
            if (keys.empty()) return {};
        }
        std::vector<uint32_t> prows;
        for (uint64_t kv : keys) {
            uint32_t d = (uint32_t)(kv >> 32);
            if (prows.empty() || prows.back() != d) prows.push_back(d);
        }
        if (first_phrase) {
            rows_all = std::move(prows);
            first_phrase = false;
        } else {
            std::vector<uint32_t> out;
            std::set_intersection(rows_all.begin(), rows_all.end(),
                                  prows.begin(), prows.end(),
                                  std::back_inserter(out));
            rows_all = std::move(out);
        }
        if (rows_all.empty()) return {};
    }
    return rows_all;
}

// Local doc ids containing EVERY token of one clause (postings only —
// works on v2 segments too). Mirrors the Python _term_rows_all.
std::vector<uint32_t> term_rows(const SegView& sv,
                                const std::vector<std::string>& toks) {
    std::vector<uint32_t> rows;
    bool first = true;
    for (auto& t : toks) {
        int64_t ti = sv.find_term(t);
        if (ti < 0) return {};
        const uint64_t* pix = sv.post_idx();
        const uint32_t* ids = sv.post_ids();
        std::vector<uint32_t> cur(ids + pix[ti], ids + pix[ti + 1]);
        if (first) {
            rows = std::move(cur);
            first = false;
        } else {
            std::vector<uint32_t> out;
            std::set_intersection(rows.begin(), rows.end(),
                                  cur.begin(), cur.end(),
                                  std::back_inserter(out));
            rows = std::move(out);
        }
        if (rows.empty()) return {};
    }
    return rows;
}

}  // namespace

extern "C" {

int sema_tseg_build(const uint8_t* blob, uint64_t blob_len,
                    const char* path) {
    return build_segment(blob, blob_len, path);
}

// Open a persistent mmap handle over a segment. The mapping stays valid
// after the file is unlinked (compaction), matching the Python engine's
// eager-memmap reader semantics. NULL on failure.
void* sema_tseg_open(const char* path) {
    auto* sv = new SegView();
    if (!sv->open(path)) {
        delete sv;
        return nullptr;
    }
    return sv;
}

void sema_tseg_close(void* h) { delete static_cast<SegView*>(h); }

// blob: f64 avg_len, u64 n_live, u32 n_segs;
//       per seg: u64 handle (from sema_tseg_open), u64 base,
//                u64 del_bytes, bitmap
// payload: u32 n; per hit: str id, str path, u64 start, u64 end,
//          str content, f64 score (bits)
uint8_t* sema_tseg_search(const uint8_t* blob, uint64_t blob_len,
                          const char* query_utf8, uint32_t limit) {
    Reader r{blob, blob_len};
    double avg = r.f64();
    uint64_t n_live = r.u64();
    uint32_t n_segs = r.u32();
    std::vector<SegView*> segs(n_segs);
    std::string payload;
    for (uint32_t i = 0; i < n_segs; i++) {
        segs[i] = reinterpret_cast<SegView*>(r.u64());
        segs[i]->base = r.u64();
        uint64_t del_bytes = r.u64();
        segs[i]->del_bits = del_bytes ? r.bytes(del_bytes) : nullptr;
    }

    // Parse the tantivy-QueryParser subset — the grammar spec and the
    // token-for-token reference implementation live in the Python
    // engine (sema_tpu/index/text_index.py, class _Query): [+|-]
    // clause occurs, standalone UPPERCASE AND/OR, quoted phrases
    // (sequential find('"') pairing; an unmatched quote stays bare).
    std::string query(query_utf8);
    // sanitize the in-band phrase placeholder (mirrors the Python
    // parser: a literal \x01 must not alter AND promotion)
    for (auto& ch : query)
        if (ch == '\x01') ch = ' ';
    std::vector<std::vector<std::string>> req_ptoks, not_ptoks;
    std::vector<double> req_pboosts;
    // path: field clauses — (tokens, is_phrase); spec in the Python
    // engine's _Query docstring (filters, never score)
    std::vector<std::pair<std::vector<std::string>, bool>> path_must,
        path_not;
    // ^boost parsing (tantivy grammar) — mirrors the Python regexes
    // character for character: digits(.digits), longest match
    auto match_boost = [](const std::string& s, size_t p, double& boost) {
        // returns the end of a ^boost starting at p, or p when absent
        if (p >= s.size() || s[p] != '^') return p;
        size_t t = p + 1, d0 = t;
        while (t < s.size() && isdigit((unsigned char)s[t])) t++;
        if (t == d0) return p;
        // optional .digits — only consumed when at least one digit
        // follows the dot (regex (?:\.\d+)? backtracking)
        if (t + 1 < s.size() && s[t] == '.'
            && isdigit((unsigned char)s[t + 1])) {
            t++;
            while (t < s.size() && isdigit((unsigned char)s[t])) t++;
        }
        // parse EXACTLY the matched span (strtod from p+1 would also
        // eat exponents the grammar does not allow). NOT std::stod: it
        // throws out_of_range on ~310+ digits, which would escape the
        // extern "C" boundary and SIGABRT the serving daemon on one
        // malformed query. strtod saturates to HUGE_VAL — matching the
        // Python engine's float() -> inf.
        boost = strtod(s.substr(p + 1, t - p - 1).c_str(), nullptr);
        return t;
    };
    std::string bare;
    size_t pos = 0;
    while (pos < query.size()) {
        size_t open = query.find('"', pos);
        if (open == std::string::npos) { bare += query.substr(pos); break; }
        size_t close = query.find('"', open + 1);
        if (close == std::string::npos) { bare += query.substr(pos); break; }
        std::string pre = query.substr(pos, open - pos);
        // field prefix binds tighter than the occur char: +path:"a b".
        // Must start at a token boundary: `filepath:"..."` is NOT a
        // path clause. Boundary rule (byte-identical with the Python
        // parser): preceded by start or an ASCII non-word byte; any
        // non-ASCII byte blocks too.
        unsigned char pb = pre.size() > 5
            ? (unsigned char)pre[pre.size() - 6] : 0;
        bool is_path = pre.size() >= 5
            && pre.compare(pre.size() - 5, 5, "path:") == 0
            && (pre.size() == 5
                || !(isalnum(pb) || pb == '_' || pb >= 0x80));
        if (is_path) pre.resize(pre.size() - 5);
        char occ = 0;
        if (!pre.empty() && (pre.back() == '+' || pre.back() == '-')) {
            occ = pre.back();
            pre.pop_back();
        }
        auto pt = tokenize(query.substr(open + 1, close - open - 1));
        // ^boost immediately after the closing quote ("a b"^1.5);
        // consumed whether used or not
        pos = close + 1;
        double pboost = 1.0;
        pos = match_boost(query, pos, pboost);
        bare += pre;
        bare += ' ';
        if (!pt.empty()) {
            if (is_path) {
                if (occ == '-') {
                    path_not.emplace_back(std::move(pt), true);
                } else {
                    bare += "\x01 ";   // adjacency marker, like phrases
                    path_must.emplace_back(std::move(pt), true);
                }
            } else if (occ == '-') {
                not_ptoks.push_back(std::move(pt));
            } else {
                bare += "\x01 ";   // adjacency marker for AND promotion
                req_ptoks.push_back(std::move(pt));
                req_pboosts.push_back(pboost);
            }
        }
    }

    // bare clauses in order (whitespace split), then AND promotion
    struct Clause { char occ; std::vector<std::string> toks;
                    double boost; };
    struct Item { int kind; int clause; };  // 0=clause 1=AND 2=OR 3=marker
    std::vector<Clause> clauses;
    std::vector<Item> items;
    {
        size_t i = 0;
        while (i < bare.size()) {
            while (i < bare.size() && isspace((unsigned char)bare[i])) i++;
            size_t j = i;
            while (j < bare.size() && !isspace((unsigned char)bare[j])) j++;
            if (j > i) {
                std::string piece = bare.substr(i, j - i);
                if (piece == "AND") items.push_back({1, -1});
                else if (piece == "OR") items.push_back({2, -1});
                else if (piece == "\x01") items.push_back({3, -1});
                else {
                    char occ = 0;
                    if (piece[0] == '+' || piece[0] == '-') {
                        occ = piece[0];
                        piece.erase(0, 1);
                    }
                    // end-anchored ^boost suffix (term^2); malformed
                    // suffixes are not boosts (mirrors _SBOOST_RE)
                    double boost = 1.0;
                    {
                        size_t c = piece.rfind('^');
                        if (c != std::string::npos) {
                            double b2 = 1.0;
                            if (match_boost(piece, c, b2)
                                    == piece.size()) {
                                boost = b2;
                                piece.resize(c);
                            }
                        }
                    }
                    if (piece.rfind("path:", 0) == 0) {
                        // path clauses are filters: they take an
                        // adjacency marker like required phrases (AND
                        // promotion is a no-op on them but must not
                        // walk past to a farther clause)
                        auto toks = tokenize(piece.substr(5));
                        if (!toks.empty()) {
                            items.push_back({3, -1});
                            if (occ == '-')
                                path_not.emplace_back(std::move(toks),
                                                      false);
                            else
                                path_must.emplace_back(std::move(toks),
                                                       false);
                        }
                    } else {
                        auto toks = tokenize(piece);
                        if (!toks.empty()) {
                            items.push_back({0, (int)clauses.size()});
                            clauses.push_back({occ, std::move(toks),
                                               boost});
                        }
                    }
                }
            }
            i = j;
        }
    }
    for (size_t i = 0; i < items.size(); i++) {
        if (items[i].kind != 1) continue;   // AND
        for (int dir = 0; dir < 2; dir++) {
            for (size_t k = i; ; ) {
                if (dir == 0) { if (k == 0) break; k--; }
                else { k++; if (k >= items.size()) break; }
                if (items[k].kind == 0) {
                    Clause& c = clauses[items[k].clause];
                    if (c.occ == 0) c.occ = '+';
                    break;
                }
                if (items[k].kind == 3) break;  // required phrase: no-op
            }
        }
    }

    // scoring tokens with their clause boosts, in order
    std::vector<std::pair<std::string, double>> terms;
    std::vector<std::vector<std::string>> must_sets, not_sets;
    for (auto& it : items) {
        if (it.kind != 0) continue;
        Clause& c = clauses[it.clause];
        if (c.occ == '-') { not_sets.push_back(c.toks); continue; }
        for (auto& t : c.toks) terms.emplace_back(t, c.boost);
        if (c.occ == '+') must_sets.push_back(c.toks);
    }
    for (size_t pi = 0; pi < req_ptoks.size(); pi++)
        for (auto& t : req_ptoks[pi])
            terms.emplace_back(t, req_pboosts[pi]);

    // empty / pure-negative queries match nothing
    if (n_live == 0 || (terms.empty() && path_must.empty())) {
        put_u32(payload, 0);
        return make_result(payload);
    }
    if (terms.empty()) {
        // filter-only query (just path: requirements): score 0.0,
        // global doc order — mirrors TextIndex._search_filter_only
        std::string hits;
        uint32_t n_hits = 0;
        for (uint32_t s = 0; s < n_segs && n_hits < limit; s++) {
            const SegView& sv = *segs[s];
            std::vector<uint32_t> req;
            bool first = true;
            for (auto& [ptoks2, isp] : path_must) {
                auto r = path_clause_rows(sv, ptoks2, isp);
                if (first) { req = std::move(r); first = false; }
                else {
                    std::vector<uint32_t> out;
                    std::set_intersection(req.begin(), req.end(),
                                          r.begin(), r.end(),
                                          std::back_inserter(out));
                    req = std::move(out);
                }
                if (req.empty()) break;
            }
            if (req.empty()) continue;
            std::vector<uint32_t> ex;
            for (auto& [ptoks2, isp] : path_not) {
                auto r = path_clause_rows(sv, ptoks2, isp);
                ex.insert(ex.end(), r.begin(), r.end());
            }
            std::sort(ex.begin(), ex.end());
            for (uint32_t row : req) {
                if (n_hits >= limit) break;
                if (!sv.live(row)) continue;
                if (!ex.empty()
                    && std::binary_search(ex.begin(), ex.end(), row))
                    continue;
                std::string id, path;
                uint32_t st, en;
                sv.meta(row, id, path, st, en);
                put_str(hits, id);
                put_str(hits, path);
                put_u64(hits, st);
                put_u64(hits, en);
                put_str(hits, sv.content(row));
                double z = 0.0;
                uint64_t bits;
                memcpy(&bits, &z, 8);
                put_u64(hits, bits);
                n_hits++;
            }
        }
        put_u32(payload, n_hits);
        payload += hits;
        return make_result(payload);
    }
    if (avg == 0.0) avg = 1.0;

    const std::vector<std::vector<std::string>>& ptoks = req_ptoks;
    bool has_filters = !must_sets.empty() || !not_sets.empty()
                       || !req_ptoks.empty() || !not_ptoks.empty()
                       || !path_must.empty() || !path_not.empty();

    // pass 1: global live df per term (cache per-seg term indexes)
    struct TermHits {
        double idf;
        double boost;
        std::vector<std::pair<uint32_t, int64_t>> found;  // (seg, t idx)
    };
    std::vector<TermHits> hits_by_term;
    uint64_t total_docs = 0;
    for (uint32_t s = 0; s < n_segs; s++)
        total_docs = std::max(total_docs, segs[s]->base + segs[s]->n_docs);
    uint64_t sum_df = 0;
    for (auto& [term, tboost] : terms) {
        TermHits th;
        th.boost = tboost;
        uint64_t df = 0;
        for (uint32_t s = 0; s < n_segs; s++) {
            int64_t t = segs[s]->find_term(term);
            if (t < 0) continue;
            const uint64_t* pix = segs[s]->post_idx();
            const uint32_t* ids = segs[s]->post_ids();
            for (uint64_t e = pix[t]; e < pix[t + 1]; e++)
                if (segs[s]->live(ids[e])) df++;
            th.found.emplace_back(s, t);
        }
        if (df == 0) continue;
        sum_df += df;
        th.idf = std::log(1.0 + (n_live - df + 0.5) / (df + 0.5));
        hits_by_term.push_back(std::move(th));
    }

    // pass 2: accumulate scores term-major. High-match queries (stop-
    // word-like terms over millions of docs) use a DENSE accumulator +
    // nth_element selection instead of a hashmap + full sort — ~10×
    // cheaper at corpus scale; per-doc contributions sum in the same
    // term-major order either way, so scores are bit-identical. Phrase
    // queries keep the sparse path (verification walks the full rank
    // order).
    auto cmp = [](const std::pair<uint64_t, double>& a,
                  const std::pair<uint64_t, double>& b) {
        if (a.second != b.second) return a.second > b.second;
        return a.first < b.first;
    };
    bool dense = !has_filters && sum_df * 8 >= total_docs;
    std::vector<std::pair<uint64_t, double>> ranked;
    auto score_into = [&](auto&& add) {
        for (auto& th : hits_by_term) {
            for (auto& [s, t] : th.found) {
                const SegView& sv = *segs[s];
                const uint64_t* pix = sv.post_idx();
                const uint32_t* ids = sv.post_ids();
                const uint32_t* tfs = sv.post_tfs();
                const uint32_t* dls = sv.doc_len();
                for (uint64_t e = pix[t]; e < pix[t + 1]; e++) {
                    uint32_t doc = ids[e];
                    if (!sv.live(doc)) continue;
                    double tf = tfs[e];
                    double dl = dls[doc];
                    double denom = tf + K1 * (1 - B + B * dl / avg);
                    // boost outermost — identical expression tree to
                    // the Python engine (1.0 * c == c exactly)
                    add(sv.base + doc,
                        th.boost * (th.idf * tf * (K1 + 1) / denom));
                }
            }
        }
    };
    if (dense) {
        std::vector<double> acc(total_docs, 0.0);
        score_into([&](uint64_t gid, double c) { acc[gid] += c; });
        ranked.reserve(sum_df);  // upper bound on candidates
        for (uint64_t gid = 0; gid < total_docs; gid++)
            if (acc[gid] > 0.0) ranked.emplace_back(gid, acc[gid]);
        if (ranked.size() > limit) {
            std::nth_element(ranked.begin(), ranked.begin() + limit,
                             ranked.end(), cmp);
            ranked.resize(limit);
        }
        std::sort(ranked.begin(), ranked.end(), cmp);
    } else {
        std::unordered_map<uint64_t, double> scores;
        score_into([&](uint64_t gid, double c) { scores[gid] += c; });
        ranked.reserve(scores.size());
        // drop zero-total docs (term^0) like the dense path — the
        // dense/sparse switch must not be observable
        for (auto& [gid, sc] : scores)
            if (sc > 0.0) ranked.emplace_back(gid, sc);
        std::sort(ranked.begin(), ranked.end(), cmp);
    }

    // candidates verified in rank order until `limit` accepted.
    // Filtering (combined per segment, computed lazily on first touch —
    // content is never read for index-rejected candidates): the MUST
    // requirement is the intersection of every must-clause's term rows
    // and (on v3) the required-phrase rows; the MUST_NOT exclusion is
    // the union of not-clause / not-phrase rows. v2 segments without
    // positions apply the term-set parts here and fall back to content
    // checks for the phrase parts below.
    std::vector<char> flt_done(n_segs, 0), req_active(n_segs, 0);
    std::vector<std::vector<uint32_t>> req_rows(n_segs),
        excl_rows(n_segs);
    std::string hits;
    uint32_t n_hits = 0;
    for (auto& [gid, score] : ranked) {
        if (n_hits >= limit) break;
        // locate the owning segment (bases ascend)
        uint32_t s = n_segs - 1;
        while (s > 0 && segs[s]->base > gid) s--;
        const SegView& sv = *segs[s];
        uint32_t row = (uint32_t)(gid - sv.base);
        if (has_filters) {
            if (!flt_done[s]) {
                bool has_req = !must_sets.empty() || !path_must.empty()
                    || (!ptoks.empty() && sv.has_positions());
                if (has_req) {
                    std::vector<uint32_t> req;
                    bool first = true;
                    auto fold = [&](std::vector<uint32_t>&& r) {
                        if (first) { req = std::move(r); first = false; }
                        else {
                            std::vector<uint32_t> out;
                            std::set_intersection(
                                req.begin(), req.end(), r.begin(),
                                r.end(), std::back_inserter(out));
                            req = std::move(out);
                        }
                    };
                    for (auto& toks : must_sets)
                        fold(term_rows(sv, toks));
                    for (auto& [ptoks2, isp] : path_must)
                        fold(path_clause_rows(sv, ptoks2, isp));
                    if (!ptoks.empty() && sv.has_positions())
                        fold(phrase_rows_positional(sv, ptoks));
                    req_rows[s] = std::move(req);
                    req_active[s] = 1;
                }
                std::vector<uint32_t> ex;
                for (auto& toks : not_sets) {
                    auto r = term_rows(sv, toks);
                    ex.insert(ex.end(), r.begin(), r.end());
                }
                if (!not_ptoks.empty() && sv.has_positions())
                    for (auto& np : not_ptoks) {
                        std::vector<std::vector<std::string>> one{np};
                        auto r = phrase_rows_positional(sv, one);
                        ex.insert(ex.end(), r.begin(), r.end());
                    }
                for (auto& [ptoks2, isp] : path_not) {
                    auto r = path_clause_rows(sv, ptoks2, isp);
                    ex.insert(ex.end(), r.begin(), r.end());
                }
                std::sort(ex.begin(), ex.end());
                ex.erase(std::unique(ex.begin(), ex.end()), ex.end());
                excl_rows[s] = std::move(ex);
                flt_done[s] = 1;
            }
            if (req_active[s]
                && !std::binary_search(req_rows[s].begin(),
                                       req_rows[s].end(), row))
                continue;
            if (!excl_rows[s].empty()
                && std::binary_search(excl_rows[s].begin(),
                                      excl_rows[s].end(), row))
                continue;
        }
        std::string body = sv.content(row);
        if (!sv.has_positions()
            && (!ptoks.empty() || !not_ptoks.empty())) {
            auto toks = tokenize(body);
            // sentinel-wrapped join: '\x00' on BOTH sides of every token
            // so a phrase term never matches a substring of a longer
            // token; identical to the Python engine
            std::string joined(1, '\x00');
            for (auto& t : toks) { joined += t; joined += '\x00'; }
            bool ok = true;
            for (auto& pt : ptoks) {
                std::string needle(1, '\x00');
                for (auto& t : pt) { needle += t; needle += '\x00'; }
                if (joined.find(needle) == std::string::npos) {
                    ok = false;
                    break;
                }
            }
            if (ok)
                for (auto& pt : not_ptoks) {
                    std::string needle(1, '\x00');
                    for (auto& t : pt) { needle += t; needle += '\x00'; }
                    if (joined.find(needle) != std::string::npos) {
                        ok = false;
                        break;
                    }
                }
            if (!ok) continue;
        }
        std::string id, path;
        uint32_t start, end;
        sv.meta(row, id, path, start, end);
        put_str(hits, id);
        put_str(hits, path);
        put_u64(hits, start);
        put_u64(hits, end);
        put_str(hits, body);
        uint64_t bits;
        memcpy(&bits, &score, 8);
        put_u64(hits, bits);
        n_hits++;
    }
    put_u32(payload, n_hits);
    payload += hits;
    return make_result(payload);
}

}  // extern "C"

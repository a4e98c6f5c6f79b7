// sema_tpu native runtime — host-side hot loops.
//
// The reference delegates these to native Rust crates (SURVEY.md §2):
//   crawler  ≙ `ignore` crate       (reference src/crawler/mod.rs)
//   chunker  ≙ rayon + processor.rs (reference src/storage/processor.rs)
//   hashing  ≙ xxhash-rust          (reference src/storage/mod.rs:72-94)
// This library implements the same behavior in C++17 behind a plain C ABI
// consumed via ctypes (sema_tpu/native/bindings.py). The pure-Python
// implementations in sema_tpu/{crawl,ingest} are the semantic oracles; the
// test suite asserts byte-identical outputs between the two.
//
// Wire format: every function returns a malloc'd buffer
//   [u64 payload_len][payload bytes]
// freed by sema_free(). Payload layouts are documented per function.

#define XXH_INLINE_ALL
#include "xxhash.h"

#include <sys/stat.h>
#include <sys/types.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <set>
#include <string>
#include <thread>
#include <vector>

namespace fs = std::filesystem;

#include "common.h"

extern "C" void sema_free(uint8_t* p) { free(p); }

// ------------------------------------------------------------------ hashing --
// Parity: xxh3-128, lowercase unpadded hex (Rust format!("{:x}", u128),
// reference storage/mod.rs:78,92). Streamed in 128 KiB blocks.

static std::string hex128(XXH128_hash_t h) {
    char buf[33];
    snprintf(buf, sizeof buf, "%llx", (unsigned long long)h.high64);
    std::string out;
    if (h.high64 != 0) {
        out = buf;
        snprintf(buf, sizeof buf, "%016llx", (unsigned long long)h.low64);
        out += buf;
    } else {
        snprintf(buf, sizeof buf, "%llx", (unsigned long long)h.low64);
        out = buf;
    }
    return out;
}

static bool hash_file_impl(const std::string& path, std::string& out) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    XXH3_state_t* st = XXH3_createState();
    XXH3_128bits_reset(st);
    std::vector<char> buf(131072);
    while (f) {
        f.read(buf.data(), buf.size());
        std::streamsize got = f.gcount();
        if (got > 0) XXH3_128bits_update(st, buf.data(), (size_t)got);
    }
    XXH128_hash_t h = XXH3_128bits_digest(st);
    XXH3_freeState(st);
    out = hex128(h);
    return true;
}

// payload: hex string (empty on error)
extern "C" uint8_t* sema_hash_file(const char* path) {
    std::string out;
    hash_file_impl(path, out);
    return make_result(out);
}

// ------------------------------------------------------------------ chunker --
// Parity: byte-window chunking with the exact boundary rules of the
// reference processor.rs:31-85 (see sema_tpu/ingest/chunker.py for the
// rule-by-rule citation). Operates on UTF-8 bytes; invalid-UTF-8 files are
// skipped (read_to_string parity).

static const size_t CHUNK_SIZE = 1000;
static const size_t OVERLAP_SIZE = 100;
static const size_t MIN_CHUNK_SIZE = 50;

static bool is_char_boundary(const std::string& d, size_t i) {
    if (i == 0 || i == d.size()) return true;
    return (static_cast<uint8_t>(d[i]) & 0xC0) != 0x80;
}

static bool valid_utf8(const std::string& s) {
    const uint8_t* p = reinterpret_cast<const uint8_t*>(s.data());
    size_t n = s.size();
    size_t i = 0;
    while (i < n) {
        uint8_t c = p[i];
        size_t len;
        uint32_t cp;
        if (c < 0x80) { i++; continue; }
        else if ((c >> 5) == 0x6) { len = 2; cp = c & 0x1F; }
        else if ((c >> 4) == 0xE) { len = 3; cp = c & 0x0F; }
        else if ((c >> 3) == 0x1E) { len = 4; cp = c & 0x07; }
        else return false;
        if (i + len > n) return false;
        for (size_t j = 1; j < len; j++) {
            if ((p[i + j] & 0xC0) != 0x80) return false;
            cp = (cp << 6) | (p[i + j] & 0x3F);
        }
        // overlongs, surrogates, > U+10FFFF
        if (len == 2 && cp < 0x80) return false;
        if (len == 3 && (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF))) return false;
        if (len == 4 && (cp < 0x10000 || cp > 0x10FFFF)) return false;
        i += len;
    }
    return true;
}

struct ChunkRec {
    uint32_t ordinal;
    uint64_t start_line, end_line;
    size_t start, end;  // byte offsets into content
};

static void create_chunks(const std::string& content,
                          std::vector<ChunkRec>& out) {
    size_t n = content.size();
    if (n < MIN_CHUNK_SIZE) return;
    size_t start = 0;
    uint32_t chunk_id = 0;
    // incremental newline counting: newlines in [0, start)
    uint64_t newlines_before = 0;
    size_t counted_to = 0;

    while (start < n) {
        size_t end = std::min(start + CHUNK_SIZE, n);
        size_t safe_end = end;
        while (safe_end > start && !is_char_boundary(content, safe_end))
            safe_end--;
        if (safe_end < n) {
            // rfind('\n') within [start, safe_end)
            size_t pos = content.rfind('\n', safe_end ? safe_end - 1 : 0);
            if (pos != std::string::npos && pos >= start)
                safe_end = pos + 1;
        }
        size_t len = safe_end - start;
        if (len >= MIN_CHUNK_SIZE || chunk_id == 0) {
            while (counted_to < start) {
                if (content[counted_to] == '\n') newlines_before++;
                counted_to++;
            }
            uint64_t start_line = newlines_before + 1;
            uint64_t inner = (uint64_t)std::count(
                content.begin() + start, content.begin() + safe_end, '\n');
            out.push_back({chunk_id, start_line, start_line + inner,
                           start, safe_end});
            chunk_id++;
        }
        size_t next_start = safe_end > OVERLAP_SIZE ? safe_end - OVERLAP_SIZE : 0;
        // snap back to char boundary (deviation shared with the Python
        // implementation: the reference would panic mid-character)
        while (next_start > 0 && !is_char_boundary(content, next_start))
            next_start--;
        if (counted_to > next_start) {  // moved backwards: recount window
            counted_to = 0; newlines_before = 0;
        }
        start = next_start <= start ? safe_end : next_start;
        if (start >= n) break;
    }
}

// input: paths joined by '\n'
// payload: u32 n_chunks, then per chunk:
//   str path, u32 ordinal, u64 start_line, u64 end_line, str content
extern "C" uint8_t* sema_chunk_files(const char* paths_nl, int n_threads) {
    std::vector<std::string> paths;
    {
        const char* p = paths_nl;
        while (*p) {
            const char* nl = strchr(p, '\n');
            if (!nl) { paths.emplace_back(p); break; }
            if (nl != p) paths.emplace_back(p, nl - p);
            p = nl + 1;
        }
    }
    size_t nfiles = paths.size();
    std::vector<std::string> contents(nfiles);
    std::vector<std::vector<ChunkRec>> recs(nfiles);

    unsigned hw = std::thread::hardware_concurrency();
    unsigned workers = n_threads > 0 ? (unsigned)n_threads
                                     : (hw ? hw : 1);
    workers = std::min<unsigned>(workers, nfiles ? (unsigned)nfiles : 1);
    std::atomic<size_t> next{0};
    auto work = [&]() {
        size_t i;
        while ((i = next.fetch_add(1)) < nfiles) {
            std::ifstream f(paths[i], std::ios::binary);
            if (!f) continue;  // per-file error swallowing (processor.rs:18)
            std::string data((std::istreambuf_iterator<char>(f)),
                             std::istreambuf_iterator<char>());
            if (!valid_utf8(data)) continue;  // read_to_string parity
            contents[i] = std::move(data);
            create_chunks(contents[i], recs[i]);
        }
    };
    std::vector<std::thread> pool;
    for (unsigned t = 1; t < workers; t++) pool.emplace_back(work);
    work();
    for (auto& t : pool) t.join();

    uint32_t total = 0;
    for (auto& r : recs) total += (uint32_t)r.size();
    std::string payload;
    put_u32(payload, total);
    for (size_t i = 0; i < nfiles; i++) {
        for (auto& c : recs[i]) {
            put_str(payload, paths[i]);
            put_u32(payload, c.ordinal);
            put_u64(payload, c.start_line);
            put_u64(payload, c.end_line);
            put_str(payload, contents[i].substr(c.start, c.end - c.start));
        }
    }
    return make_result(payload);
}

// ------------------------------------------------------------------ crawler --
// Parity notes in sema_tpu/crawl/crawler.py (hidden/symlink/size/extension
// filters, per-directory .gitignore with negation and deepest-wins,
// same-filesystem, sorted deterministic output).

// gitignore glob matcher: '*' not crossing '/', '?', '[...]', '**'
static bool glob_match(const std::string& pat, size_t pi,
                       const std::string& str, size_t si) {
    while (pi < pat.size()) {
        char c = pat[pi];
        if (c == '*') {
            bool dstar = pi + 1 < pat.size() && pat[pi + 1] == '*';
            if (dstar) {
                size_t pj = pi;
                while (pj < pat.size() && pat[pj] == '*') pj++;
                bool slash_after = pj < pat.size() && pat[pj] == '/';
                // "**" at segment boundary spans directories
                if (slash_after) {
                    // try consuming zero or more whole segments
                    size_t s = si;
                    while (true) {
                        if (glob_match(pat, pj + 1, str, s)) return true;
                        size_t nl = str.find('/', s);
                        if (nl == std::string::npos) return false;
                        s = nl + 1;
                    }
                }
                // trailing or infix "**": match anything
                for (size_t s = si; s <= str.size(); s++)
                    if (glob_match(pat, pj, str, s)) return true;
                return false;
            }
            for (size_t s = si; s <= str.size(); s++) {
                if (s > si && str[s - 1] == '/') break;  // '*' stops at '/'
                if (glob_match(pat, pi + 1, str, s)) return true;
            }
            return false;
        } else if (c == '\\' && pi + 1 < pat.size()) {
            // backslash escapes the next char ('\#', '\!', '\ ')
            if (si >= str.size() || str[si] != pat[pi + 1]) return false;
            pi += 2; si++;
        } else if (c == '?') {
            if (si >= str.size() || str[si] == '/') return false;
            pi++; si++;
        } else if (c == '[') {
            size_t close = pat.find(']', pi + 1);
            if (close == std::string::npos) {
                if (si >= str.size() || str[si] != '[') return false;
                pi++; si++;
                continue;
            }
            if (si >= str.size()) return false;
            std::string cls = pat.substr(pi + 1, close - pi - 1);
            bool neg = !cls.empty() && (cls[0] == '!' || cls[0] == '^');
            if (neg) cls = cls.substr(1);
            bool hit = false;
            for (size_t j = 0; j < cls.size(); j++) {
                if (j + 2 < cls.size() && cls[j + 1] == '-') {
                    if (str[si] >= cls[j] && str[si] <= cls[j + 2]) hit = true;
                    j += 2;
                } else if (cls[j] == str[si]) hit = true;
            }
            if (hit == neg) return false;
            pi = close + 1; si++;
        } else {
            if (si >= str.size() || str[si] != c) return false;
            pi++; si++;
        }
    }
    return si == str.size();
}

struct GitignoreRule {
    std::string pattern;
    bool negated = false, dir_only = false, anchored = false;
};

struct GitignoreFile {
    std::string dir_rel;  // "" for crawl root
    std::vector<GitignoreRule> rules;
    // non-empty for .gitignore files in ANCESTORS of the crawl root
    // (the ignore crate's parents(true) default): the crawl root's path
    // relative to the file's directory, prepended before matching
    std::string prefix;
};

static std::vector<GitignoreRule> parse_gitignore(const std::string& text) {
    std::vector<GitignoreRule> rules;
    size_t pos = 0;
    while (pos <= text.size()) {
        size_t nl = text.find('\n', pos);
        std::string line = text.substr(
            pos, nl == std::string::npos ? std::string::npos : nl - pos);
        pos = nl == std::string::npos ? text.size() + 1 : nl + 1;
        if (!line.empty() && line.back() == '\r') line.pop_back();
        // skip blank/comment
        size_t first = line.find_first_not_of(" \t");
        if (first == std::string::npos || line[first] == '#') continue;
        // strip unescaped trailing spaces
        while (!line.empty() && line.back() == ' ' &&
               !(line.size() >= 2 && line[line.size() - 2] == '\\'))
            line.pop_back();
        GitignoreRule r;
        if (!line.empty() && line[0] == '!') { r.negated = true; line = line.substr(1); }
        if (!line.empty() && line.back() == '/') { r.dir_only = true; line.pop_back(); }
        if (line.empty()) continue;
        r.anchored = line[0] == '/' || line.find('/') != std::string::npos;
        if (line[0] == '/') line = line.substr(1);
        r.pattern = line;
        rules.push_back(std::move(r));
    }
    return rules;
}

static bool rule_matches(const GitignoreRule& r, const std::string& rel) {
    if (r.anchored) return glob_match(r.pattern, 0, rel, 0);
    // unanchored: match against every suffix starting at a segment
    size_t s = 0;
    while (true) {
        if (glob_match(r.pattern, 0, rel.substr(s), 0)) return true;
        size_t nl = rel.find('/', s);
        if (nl == std::string::npos) return false;
        s = nl + 1;
    }
}

// deepest file wins; within a file the last rule wins
static bool stack_ignored(const std::vector<GitignoreFile>& stack,
                          const std::string& rel, bool is_dir) {
    bool verdict = false;
    for (const auto& gi : stack) {
        std::string sub;
        if (!gi.prefix.empty()) sub = gi.prefix + "/" + rel;
        else if (gi.dir_rel.empty()) sub = rel;
        else if (rel.size() > gi.dir_rel.size() &&
                 rel.compare(0, gi.dir_rel.size(), gi.dir_rel) == 0 &&
                 rel[gi.dir_rel.size()] == '/')
            sub = rel.substr(gi.dir_rel.size() + 1);
        else continue;
        for (const auto& r : gi.rules) {
            if (r.dir_only && !is_dir) continue;
            if (rule_matches(r, sub)) verdict = !r.negated;
        }
    }
    return verdict;
}

struct CrawlConfig {
    uint64_t max_file_size;
    bool follow_symlinks, include_hidden, ignore_gitignore;
    std::set<std::string> extensions;  // normalized, empty = allow all
    std::vector<std::string> excludes;
};

static bool excluded(const CrawlConfig& cfg, const std::string& rel,
                     const std::string& name) {
    for (const auto& pat : cfg.excludes) {
        if (glob_match(pat, 0, name, 0)) return true;
        if (glob_match(pat, 0, rel, 0)) return true;
        if (pat.find('/') == std::string::npos) {
            size_t s = 0;
            while (true) {
                size_t nl = rel.find('/', s);
                std::string comp = rel.substr(
                    s, nl == std::string::npos ? std::string::npos : nl - s);
                if (glob_match(pat, 0, comp, 0)) return true;
                if (nl == std::string::npos) break;
                s = nl + 1;
            }
        }
    }
    return false;
}

static void crawl_dir(const fs::path& dir, const std::string& dir_rel,
                      const CrawlConfig& cfg, dev_t root_dev,
                      std::vector<GitignoreFile>& stack,
                      std::set<std::pair<dev_t, ino_t>>& visited,
                      std::vector<std::string>& out) {
    // ancestor-chain cycle breaking, not global dedup: the key is
    // removed on exit, so a directory reachable via two distinct
    // non-cyclic paths (sibling symlinks) is indexed under both, like
    // the reference's walker (crawler/mod.rs:46)
    std::pair<dev_t, ino_t> key{0, 0};
    bool tracked = false;
    if (cfg.follow_symlinks) {
        struct stat st;
        if (stat(dir.c_str(), &st) != 0) return;
        key = std::make_pair(st.st_dev, st.st_ino);
        if (visited.count(key)) return;
        visited.insert(key);
        tracked = true;
    }
    size_t stack_base = stack.size();
    if (cfg.ignore_gitignore) {
        std::ifstream gi(dir / ".gitignore", std::ios::binary);
        if (gi) {
            std::string text((std::istreambuf_iterator<char>(gi)),
                             std::istreambuf_iterator<char>());
            stack.push_back({dir_rel, parse_gitignore(text)});
        }
    }

    std::vector<fs::directory_entry> entries;
    std::error_code ec;
    for (auto it = fs::directory_iterator(dir, ec);
         !ec && it != fs::directory_iterator(); it.increment(ec)) {
        entries.push_back(*it);
    }
    std::sort(entries.begin(), entries.end(),
              [](const fs::directory_entry& a, const fs::directory_entry& b) {
                  return a.path().filename() < b.path().filename();
              });

    for (const auto& entry : entries) {
        std::string name = entry.path().filename().string();
        std::string rel = dir_rel.empty() ? name : dir_rel + "/" + name;
        if (!cfg.include_hidden && !name.empty() && name[0] == '.') continue;
        if (excluded(cfg, rel, name)) continue;

        std::error_code ec2;
        bool is_sym = entry.is_symlink(ec2);
        if (is_sym && !cfg.follow_symlinks) continue;

        struct stat st;
        int rc = cfg.follow_symlinks ? stat(entry.path().c_str(), &st)
                                     : lstat(entry.path().c_str(), &st);
        if (rc != 0) continue;

        if (S_ISDIR(st.st_mode)) {
            if (cfg.ignore_gitignore && stack_ignored(stack, rel, true))
                continue;
            if (st.st_dev != root_dev) continue;  // same_file_system
            crawl_dir(entry.path(), rel, cfg, root_dev, stack, visited, out);
            // the child pops its own frame before returning
        } else if (S_ISREG(st.st_mode)) {
            if (cfg.ignore_gitignore && stack_ignored(stack, rel, false))
                continue;
            if (st.st_size == 0 || (uint64_t)st.st_size > cfg.max_file_size)
                continue;
            if (!cfg.extensions.empty()) {
                size_t dot = name.rfind('.');
                if (dot == std::string::npos || dot == 0) continue;
                std::string ext = name.substr(dot + 1);
                std::transform(ext.begin(), ext.end(), ext.begin(), ::tolower);
                if (!cfg.extensions.count(ext)) continue;
            }
            out.push_back(entry.path().string());
        }
    }
    stack.resize(stack_base);
    if (tracked) visited.erase(key);
}

// .gitignore files from the crawl root's ancestors, outermost first,
// stopping at the repository boundary (the first ancestor containing
// .git, itself included)
static void ancestor_gitignores(const fs::path& root,
                                std::vector<GitignoreFile>& stack) {
    std::vector<GitignoreFile> chain;
    fs::path cur = fs::path(root);
    std::string prefix;
    while (true) {
        std::error_code ec;
        if (fs::exists(cur / ".git", ec))
            break;  // repository boundary: nothing above applies
        fs::path parent = cur.parent_path();
        if (parent == cur || cur.filename().empty()) break;
        prefix = prefix.empty() ? cur.filename().string()
                                : cur.filename().string() + "/" + prefix;
        cur = parent;
        std::ifstream gi(cur / ".gitignore", std::ios::binary);
        if (gi) {
            std::string text((std::istreambuf_iterator<char>(gi)),
                             std::istreambuf_iterator<char>());
            GitignoreFile f{"", parse_gitignore(text), prefix};
            chain.insert(chain.begin(), std::move(f));
        }
    }
    for (auto& f : chain) stack.push_back(std::move(f));
}

// input strings are '\n'-joined lists
// payload: paths joined by '\n'
extern "C" uint8_t* sema_crawl(const char* root, uint64_t max_file_size,
                               int follow_symlinks, int include_hidden,
                               int ignore_gitignore,
                               const char* extensions_nl,
                               const char* excludes_nl) {
    CrawlConfig cfg;
    cfg.max_file_size = max_file_size;
    cfg.follow_symlinks = follow_symlinks != 0;
    cfg.include_hidden = include_hidden != 0;
    cfg.ignore_gitignore = ignore_gitignore != 0;

    auto split_nl = [](const char* s) {
        std::vector<std::string> v;
        const char* p = s;
        while (*p) {
            const char* nl = strchr(p, '\n');
            if (!nl) { v.emplace_back(p); break; }
            if (nl != p) v.emplace_back(p, nl - p);
            p = nl + 1;
        }
        return v;
    };
    for (auto& e : split_nl(extensions_nl)) {
        // normalization parity (crawler/mod.rs:33-37)
        std::string x = e;
        if (x.rfind("*.", 0) == 0) x = x.substr(2);
        while (!x.empty() && x[0] == '.') x = x.substr(1);
        std::transform(x.begin(), x.end(), x.begin(), ::tolower);
        cfg.extensions.insert(x);
    }
    cfg.excludes = split_nl(excludes_nl);

    std::vector<std::string> out;
    struct stat st;
    if (stat(root, &st) == 0) {
        std::vector<GitignoreFile> stack;
        if (cfg.ignore_gitignore) ancestor_gitignores(fs::path(root), stack);
        std::set<std::pair<dev_t, ino_t>> visited;
        crawl_dir(fs::path(root), "", cfg, st.st_dev, stack, visited, out);
    }
    std::sort(out.begin(), out.end());
    std::string payload;
    for (size_t i = 0; i < out.size(); i++) {
        if (i) payload += '\n';
        payload += out[i];
    }
    return make_result(payload);
}

// Shared result-buffer helpers: every exported function returns a malloc'd
// [u64 payload_len][payload] buffer, freed by sema_free().
#pragma once

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>

static inline uint8_t* make_result(const std::string& payload) {
    uint8_t* buf = static_cast<uint8_t*>(malloc(8 + payload.size()));
    uint64_t n = payload.size();
    memcpy(buf, &n, 8);
    memcpy(buf + 8, payload.data(), payload.size());
    return buf;
}

static inline void put_u32(std::string& s, uint32_t v) {
    s.append(reinterpret_cast<const char*>(&v), 4);
}
static inline void put_u64(std::string& s, uint64_t v) {
    s.append(reinterpret_cast<const char*>(&v), 8);
}
static inline void put_str(std::string& s, const std::string& v) {
    put_u32(s, (uint32_t)v.size());
    s.append(v);
}

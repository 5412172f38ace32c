// frostdb_tpu native runtime — host-side hot loops in C++.
//
// The reference is pure Go (SURVEY.md: no native code exists in FrostDB);
// in this engine the device compute path is XLA/Pallas, and the host-side
// hot loops that remain — table-global dictionary encoding at ingest
// (the analogue of the reference's per-row dictionary building in
// pqarrow/builder), 64-bit string hashing for pre-hashed columns
// (dynparquet/hashed.go:86 HashArray), and WAL frame checksumming
// (wal/wal.go) — live here behind a C ABI consumed via ctypes
// (frostdb_tpu/native.py).
//
// Build: g++ -O3 -shared -fPIC -o libfrostdb_native.so frostdb_native.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

// 64-bit string hash: xxhash-style avalanche over 8-byte lanes.
// Deterministic across processes (used for pre-hashed columns).
inline uint64_t mix64(uint64_t x) {
  x ^= x >> 33;
  x *= 0xff51afd7ed558ccdULL;
  x ^= x >> 33;
  x *= 0xc4ceb9fe1a85ec53ULL;
  x ^= x >> 33;
  return x;
}

inline uint64_t hash_bytes(const char* data, int64_t len) {
  uint64_t h = 0x9e3779b97f4a7c15ULL ^ (uint64_t)len;
  int64_t i = 0;
  while (i + 8 <= len) {
    uint64_t k;
    std::memcpy(&k, data + i, 8);
    h = mix64(h ^ k) * 0x9ddfea08eb382d69ULL;
    i += 8;
  }
  uint64_t tail = 0;
  int shift = 0;
  while (i < len) {
    tail |= (uint64_t)(uint8_t)data[i] << shift;
    shift += 8;
    ++i;
  }
  return mix64(h ^ tail);
}

struct Dict {
  // Arena of all values, plus offsets; index maps view-into-arena -> code.
  std::string arena;
  std::vector<uint64_t> offsets;  // size = count+1
  std::unordered_map<std::string_view, int32_t> index;
  std::vector<int64_t> hashes;

  int64_t count() const { return (int64_t)offsets.size() - 1; }

  int32_t get_or_add(const char* data, int64_t len) {
    std::string_view key(data, (size_t)len);
    auto it = index.find(key);
    if (it != index.end()) return it->second;
    // Append to arena. Rehash-safety: string_views point into the arena,
    // which may reallocate — reserve aggressively and reindex on realloc.
    const char* old_base = arena.data();
    uint64_t start = arena.size();
    arena.append(data, (size_t)len);
    if (arena.data() != old_base) {
      // arena moved: rebuild the index views
      index.clear();
      for (int64_t i = 0; i + 1 < (int64_t)offsets.size(); ++i) {
        index.emplace(
            std::string_view(arena.data() + offsets[i],
                             (size_t)(offsets[i + 1] - offsets[i])),
            (int32_t)i);
      }
    }
    int32_t code = (int32_t)count();
    offsets.push_back(start + (uint64_t)len);
    index.emplace(
        std::string_view(arena.data() + start, (size_t)len), code);
    hashes.push_back((int64_t)hash_bytes(data, len));
    return code;
  }
};

// crc32 (IEEE, zlib-compatible) with a lazily built table.
uint32_t crc_table[256];
bool crc_init_done = false;
void crc_init() {
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? 0xedb88320u ^ (c >> 1) : c >> 1;
    crc_table[i] = c;
  }
  crc_init_done = true;
}

}  // namespace

extern "C" {

void* fdb_dict_new() {
  Dict* d = new Dict();
  d->arena.reserve(1 << 16);
  d->offsets.push_back(0);
  return d;
}

void fdb_dict_free(void* h) { delete (Dict*)h; }

int64_t fdb_dict_size(void* h) { return ((Dict*)h)->count(); }

// Encode n strings (concatenated bytes + offsets[n+1]; is_null[i] skips).
// out_codes[i] = code (0 for null slots).
void fdb_dict_encode(void* h, const char* bytes, const int64_t* offsets,
                     const uint8_t* is_null, int64_t n, int32_t* out_codes) {
  Dict* d = (Dict*)h;
  for (int64_t i = 0; i < n; ++i) {
    if (is_null != nullptr && is_null[i]) {
      out_codes[i] = 0;
      continue;
    }
    out_codes[i] =
        d->get_or_add(bytes + offsets[i], offsets[i + 1] - offsets[i]);
  }
}

// Look up a single value's code; -1 if absent.
int32_t fdb_dict_lookup(void* h, const char* data, int64_t len) {
  Dict* d = (Dict*)h;
  auto it = d->index.find(std::string_view(data, (size_t)len));
  return it == d->index.end() ? -1 : it->second;
}

// Copy out the arena + offsets so Python can materialize values.
int64_t fdb_dict_arena_size(void* h) { return (int64_t)((Dict*)h)->arena.size(); }

void fdb_dict_export(void* h, char* arena_out, uint64_t* offsets_out) {
  Dict* d = (Dict*)h;
  std::memcpy(arena_out, d->arena.data(), d->arena.size());
  std::memcpy(offsets_out, d->offsets.data(),
              d->offsets.size() * sizeof(uint64_t));
}

void fdb_dict_hashes(void* h, int64_t* out) {
  Dict* d = (Dict*)h;
  std::memcpy(out, d->hashes.data(), d->hashes.size() * sizeof(int64_t));
}

int64_t fdb_hash64(const char* data, int64_t len) {
  return (int64_t)hash_bytes(data, len);
}

void fdb_hash64_batch(const char* bytes, const int64_t* offsets, int64_t n,
                      int64_t* out) {
  for (int64_t i = 0; i < n; ++i)
    out[i] = (int64_t)hash_bytes(bytes + offsets[i], offsets[i + 1] - offsets[i]);
}

uint32_t fdb_crc32(const uint8_t* data, int64_t len, uint32_t seed) {
  if (!crc_init_done) crc_init();
  uint32_t c = seed ^ 0xffffffffu;
  for (int64_t i = 0; i < len; ++i)
    c = crc_table[(c ^ data[i]) & 0xff] ^ (c >> 8);
  return c ^ 0xffffffffu;
}

}  // extern "C"

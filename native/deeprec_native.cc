// deeprec_tpu native host runtime: sharded host KV row store + batched
// Criteo parser.
//
// TPU-native counterparts of the reference's host-side C++ (built from
// scratch, same roles):
//   * HostKV  — the DRAM/PMEM storage tier behind EmbeddingVariable
//     multi-tier storage (reference: tensorflow/core/framework/embedding/
//     kv_interface.h:27 KVInterface, dense_hash_map.h mutex-sharded map,
//     embedding/config.proto StorageType{DRAM,PMEM,SSD}). Holds evicted /
//     long-tail rows in host memory; batched lookup/upsert/erase/export.
//   * criteo_parse — the input-pipeline hot path (reference: tf.data CSV
//     kernels + modelzoo train.py pipelines): parses label + 13 ints +
//     26 hex-categorical TSV rows into dense numpy-ready buffers, hashing
//     tokens to stable 64-bit ids.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Build: g++ -O3 -march=native -shared -fPIC -o libdeeprec_native.so
//        deeprec_native.cc -lpthread
#include <fcntl.h>
#include <sys/mman.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// 64-bit mix hash (splitmix64 finalizer) — stable across runs/platforms.
static inline uint64_t mix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ull;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
  return x ^ (x >> 31);
}

// FNV-1a over bytes -> int64 id; -1 (the EMPTY sentinel) remapped to -2,
// empty token -> -2 (matches data/criteo.py _hash_token semantics).
static inline int64_t hash_token(const char* s, size_t n) {
  if (n == 0) return -2;
  uint64_t h = 1469598103934665603ull;
  for (size_t i = 0; i < n; ++i) {
    h ^= (unsigned char)s[i];
    h *= 1099511628211ull;
  }
  h = mix64(h);
  int64_t v = (int64_t)h;
  return v == -1 ? -2 : v;
}

// ---------------------------------------------------------------------------
// FileArena: mmap-backed block allocator for the SSD storage tier
// (reference embedding/config.proto StorageType SSD + ssd_hash kv). Rows
// live in page-cache-backed file segments; the kernel writes cold pages
// out, so the working set is bounded by RAM while capacity is bounded by
// disk.

struct FileArena {
  int fd = -1;
  std::mutex mu;
  std::vector<float*> maps;  // one mapping per block
  size_t block_bytes = 0;
  int64_t file_rows = 0;

  bool open_file(const char* path, size_t bytes_per_block) {
    fd = ::open(path, O_RDWR | O_CREAT, 0644);
    block_bytes = bytes_per_block;
    return fd >= 0;
  }

  float* alloc_block() {
    std::lock_guard<std::mutex> g(mu);
    size_t off = maps.size() * block_bytes;
    if (ftruncate(fd, (off_t)(off + block_bytes)) != 0) return nullptr;
    void* p = mmap(nullptr, block_bytes, PROT_READ | PROT_WRITE, MAP_SHARED,
                   fd, (off_t)off);
    if (p == MAP_FAILED) return nullptr;
    maps.push_back((float*)p);
    return (float*)p;
  }

  ~FileArena() {
    for (float* m : maps) munmap(m, block_bytes);
    if (fd >= 0) ::close(fd);
  }
};

// ---------------------------------------------------------------------------
// HostKV: sharded open-addressing map key -> row index into a block arena.

struct Shard {
  std::mutex mu;
  std::vector<int64_t> keys;   // capacity-sized, EMPTY = INT64_MIN
  std::vector<uint32_t> slot;  // row index into arena
  std::vector<float*> blocks;  // arena blocks of kRowsPerBlock rows
  size_t size = 0;
  size_t mask = 0;
  int64_t dim = 0;

  static constexpr int64_t kEmpty = INT64_MIN;
  static constexpr size_t kRowsPerBlock = 4096;
  FileArena* arena = nullptr;  // non-null: disk-backed blocks (SSD tier)
  bool owns_blocks = true;

  void init(int64_t d, size_t cap_pow2, FileArena* a = nullptr) {
    dim = d;
    arena = a;
    owns_blocks = (a == nullptr);
    keys.assign(cap_pow2, kEmpty);
    slot.assign(cap_pow2, 0);
    mask = cap_pow2 - 1;
  }

  float* row_ptr(uint32_t idx) {
    return blocks[idx / kRowsPerBlock] + (size_t)(idx % kRowsPerBlock) * dim;
  }

  void grow() {
    std::vector<int64_t> old_keys = std::move(keys);
    std::vector<uint32_t> old_slot = std::move(slot);
    size_t cap = (mask + 1) * 2;
    keys.assign(cap, kEmpty);
    slot.assign(cap, 0);
    mask = cap - 1;
    for (size_t i = 0; i < old_keys.size(); ++i) {
      if (old_keys[i] == kEmpty) continue;
      size_t j = mix64((uint64_t)old_keys[i]) & mask;
      while (keys[j] != kEmpty) j = (j + 1) & mask;
      keys[j] = old_keys[i];
      slot[j] = old_slot[i];
    }
  }

  // returns row pointer; creates if absent
  float* upsert(int64_t key, bool* created) {
    if (size * 10 >= (mask + 1) * 7) grow();
    size_t j = mix64((uint64_t)key) & mask;
    while (keys[j] != kEmpty) {
      if (keys[j] == key) { *created = false; return row_ptr(slot[j]); }
      j = (j + 1) & mask;
    }
    if (size % kRowsPerBlock == 0)
      blocks.push_back(arena ? arena->alloc_block()
                             : new float[kRowsPerBlock * dim]);
    keys[j] = key;
    slot[j] = (uint32_t)size++;
    *created = true;
    return row_ptr(slot[j]);
  }

  float* find(int64_t key) {
    size_t j = mix64((uint64_t)key) & mask;
    while (keys[j] != kEmpty) {
      if (keys[j] == key) return row_ptr(slot[j]);
      j = (j + 1) & mask;
    }
    return nullptr;
  }

  // erase by tombstone-free backward-shift deletion
  bool erase(int64_t key) {
    size_t j = mix64((uint64_t)key) & mask;
    while (keys[j] != kEmpty) {
      if (keys[j] == key) break;
      j = (j + 1) & mask;
    }
    if (keys[j] == kEmpty) return false;
    // note: arena row is leaked until compaction; size tracks live rows
    size_t i = j;
    for (;;) {
      size_t k = (i + 1) & mask;
      while (keys[k] != kEmpty) {
        size_t home = mix64((uint64_t)keys[k]) & mask;
        // can keys[k] move into slot i? (its home must not lie after i in
        // the probe order)
        bool wraps = (k < i);
        bool fits = wraps ? (home <= i && home > k) : (home <= i || home > k);
        if (fits) break;
        k = (k + 1) & mask;
      }
      if (keys[k] == kEmpty) { keys[i] = kEmpty; break; }
      keys[i] = keys[k];
      slot[i] = slot[k];
      i = k;
    }
    return true;
  }

  ~Shard() {
    if (owns_blocks)
      for (float* b : blocks) delete[] b;
  }
};

struct HostKV {
  static constexpr int kShards = 16;
  Shard shards[kShards];
  int64_t dim;
  std::atomic<int64_t> live{0};
  FileArena* arena = nullptr;  // non-null for the disk-backed variant

  HostKV(int64_t d, int64_t cap_hint, const char* disk_path = nullptr)
      : dim(d) {
    if (disk_path && disk_path[0]) {
      arena = new FileArena();
      if (!arena->open_file(disk_path,
                            Shard::kRowsPerBlock * (size_t)d * sizeof(float))) {
        delete arena;  // fall back to heap blocks
        arena = nullptr;
      }
    }
    size_t per = 64;
    while ((int64_t)(per * kShards) < cap_hint) per <<= 1;
    for (auto& s : shards) s.init(d, per, arena);
  }

  ~HostKV() { delete arena; }

  Shard& shard_of(int64_t key) {
    return shards[mix64((uint64_t)key ^ 0xABCDull) & (kShards - 1)];
  }
};

// split a batch across worker threads
template <typename F>
static void parallel_for(int64_t n, F f, int max_threads = 8) {
  int nt = (int)std::min<int64_t>(max_threads, std::max<int64_t>(1, n / 4096));
  if (nt <= 1) {
    f(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] { f(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

HostKV* hostkv_create(int64_t dim, int64_t capacity_hint) {
  return new HostKV(dim, capacity_hint);
}

// disk-backed variant: rows live in an mmap'd file arena (the SSD storage
// tier). Same API as the DRAM store.
HostKV* hostkv_create_disk(int64_t dim, int64_t capacity_hint,
                           const char* path) {
  return new HostKV(dim, capacity_hint, path);
}

// 1 if the store is file-backed (its arena opened successfully)
int64_t hostkv_is_disk(HostKV* kv) { return kv->arena != nullptr; }

void hostkv_destroy(HostKV* kv) { delete kv; }

int64_t hostkv_size(HostKV* kv) { return kv->live.load(); }

int64_t hostkv_dim(HostKV* kv) { return kv->dim; }

// batched upsert (insert-or-overwrite) of n rows
void hostkv_upsert(HostKV* kv, const int64_t* keys, const float* rows,
                   int64_t n) {
  const int64_t dim = kv->dim;
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      Shard& s = kv->shard_of(keys[i]);
      std::lock_guard<std::mutex> g(s.mu);
      bool created = false;
      float* dst = s.upsert(keys[i], &created);
      std::memcpy(dst, rows + i * dim, sizeof(float) * dim);
      if (created) kv->live.fetch_add(1, std::memory_order_relaxed);
    }
  });
}

// batched lookup: found[i]=1 and out_rows[i*dim..] filled on hit.
// Returns the hit count.
int64_t hostkv_lookup(HostKV* kv, const int64_t* keys, float* out_rows,
                      uint8_t* found, int64_t n) {
  const int64_t dim = kv->dim;
  std::atomic<int64_t> hits{0};
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    int64_t h = 0;
    for (int64_t i = lo; i < hi; ++i) {
      Shard& s = kv->shard_of(keys[i]);
      std::lock_guard<std::mutex> g(s.mu);
      float* src = s.find(keys[i]);
      if (src) {
        std::memcpy(out_rows + i * dim, src, sizeof(float) * dim);
        found[i] = 1;
        ++h;
      } else {
        found[i] = 0;
      }
    }
    hits.fetch_add(h, std::memory_order_relaxed);
  });
  return hits.load();
}

void hostkv_erase(HostKV* kv, const int64_t* keys, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    Shard& s = kv->shard_of(keys[i]);
    std::lock_guard<std::mutex> g(s.mu);
    if (s.erase(keys[i])) kv->live.fetch_sub(1, std::memory_order_relaxed);
  }
}

// export all live rows; returns the number written (<= max_n)
int64_t hostkv_export(HostKV* kv, int64_t* keys_out, float* rows_out,
                      int64_t max_n) {
  const int64_t dim = kv->dim;
  int64_t w = 0;
  for (auto& s : kv->shards) {
    std::lock_guard<std::mutex> g(s.mu);
    for (size_t j = 0; j <= s.mask; ++j) {
      if (s.keys[j] == Shard::kEmpty) continue;
      if (w >= max_n) return w;
      keys_out[w] = s.keys[j];
      std::memcpy(rows_out + w * dim, s.row_ptr(s.slot[j]),
                  sizeof(float) * dim);
      ++w;
    }
  }
  return w;
}

// export all live keys plus ONE row column (the version stamp): the spill
// path of the DRAM->SSD cascade ranks rows by coldness without paying the
// full-row export bandwidth (width x fewer bytes than hostkv_export)
int64_t hostkv_export_col(HostKV* kv, int64_t* keys_out, float* col_out,
                          int64_t col, int64_t max_n) {
  int64_t w = 0;
  for (auto& s : kv->shards) {
    std::lock_guard<std::mutex> g(s.mu);
    for (size_t j = 0; j <= s.mask; ++j) {
      if (s.keys[j] == Shard::kEmpty) continue;
      if (w >= max_n) return w;
      keys_out[w] = s.keys[j];
      col_out[w] = s.row_ptr(s.slot[j])[col];
      ++w;
    }
  }
  return w;
}

// ---------------------------------------------------------------------------
// Criteo TSV parser: label \t 13 ints \t 26 hex tokens per line.
// Parses up to max_rows complete lines from buf[0..len); returns rows
// parsed; *consumed = bytes of complete lines eaten.
int64_t criteo_parse(const char* buf, int64_t len, int64_t max_rows,
                     float* labels, float* dense, int64_t* cats,
                     int64_t* consumed) {
  int64_t rows = 0;
  const char* p = buf;
  const char* end = buf + len;
  const char* row_start = p;
  while (rows < max_rows) {
    // find line end
    const char* nl = (const char*)memchr(p, '\n', (size_t)(end - p));
    if (!nl) break;
    // split into fields
    const char* f = p;
    int field = 0;
    float lab = 0.f;
    float* drow = dense + rows * 13;
    int64_t* crow = cats + rows * 26;
    for (int i = 0; i < 13; ++i) drow[i] = 0.f;
    for (int i = 0; i < 26; ++i) crow[i] = -2;
    while (f <= nl && field < 40) {
      const char* tab = f;
      while (tab < nl && *tab != '\t') ++tab;
      size_t flen = (size_t)(tab - f);
      if (field == 0) {
        lab = (flen && *f == '1') ? 1.f : 0.f;
      } else if (field <= 13) {
        if (flen) {
          // integer (possibly negative) parse
          bool neg = (*f == '-');
          const char* q = f + (neg ? 1 : 0);
          long v = 0;
          while (q < tab && *q >= '0' && *q <= '9') v = v * 10 + (*q++ - '0');
          drow[field - 1] = (float)(neg ? -v : v);
        }
      } else {
        crow[field - 14] = hash_token(f, flen);
      }
      ++field;
      f = tab + 1;
    }
    labels[rows] = lab;
    ++rows;
    p = nl + 1;
    row_start = p;
  }
  *consumed = (int64_t)(row_start - buf);
  return rows;
}

}  // extern "C"

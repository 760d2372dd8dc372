// mnn_tpu native runtime components (C ABI, loaded via ctypes).
//
// TPU-native equivalents of the reference's native host-side runtime
// (SURVEY.md §2.1/§2.19): where MNN uses C++ for file IO / mmap weight
// loading (source/core/FileLoader, MNNFileUtils: mmap external weights)
// and for generation-time host data structures (speculative n-gram lookup,
// transformers/llm/engine/src/speculative_decoding/ngram.hpp), this library
// provides:
//
//  1. a zero-copy mmap'd safetensors reader: parses the header once and
//     hands tensor base pointers straight out of the page cache, so a 7B
//     checkpoint "load" is O(#tensors) metadata work and jax reads bytes
//     lazily while copying to device;
//  2. an n-gram suffix index (first-occurrence semantics identical to
//     mnn_tpu.runtime.speculative.NgramDraft) for the per-token host path
//     of lookahead decoding.
//
// Plain C ABI; built with `make` (g++ -O3 -shared). No dependencies.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// 1. mmap safetensors reader
// ---------------------------------------------------------------------------

struct StTensor {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0, end = 0;  // relative to data section
};

struct StFile {
  int fd = -1;
  uint8_t* base = nullptr;
  size_t size = 0;
  size_t data_off = 0;
  std::vector<StTensor> tensors;
  std::string header;  // raw JSON header (metadata access from python)
};

// Minimal JSON scanning for the safetensors header: a flat object of
// "name": {"dtype": "...", "shape": [...], "data_offsets": [a, b]}.
// The header is machine-generated; this parser handles exactly that shape
// (plus the "__metadata__" string map, which is skipped here and exposed
// raw via mnnst_header).
static bool parse_header(StFile* f) {
  const std::string& h = f->header;
  size_t i = 0, n = h.size();
  auto skip_ws = [&] { while (i < n && (h[i]==' '||h[i]=='\n'||h[i]=='\t'||h[i]=='\r'||h[i]==',')) i++; };
  auto parse_string = [&](std::string& out) -> bool {
    skip_ws();
    if (i >= n || h[i] != '"') return false;
    i++;
    out.clear();
    while (i < n && h[i] != '"') {
      if (h[i] == '\\' && i + 1 < n) { out += h[i+1]; i += 2; }
      else out += h[i++];
    }
    if (i >= n) return false;
    i++;  // closing quote
    return true;
  };
  auto skip_value = [&]() {
    // skips a JSON value (string/number/object/array) generically
    skip_ws();
    int depth = 0;
    bool in_str = false;
    do {
      if (i >= n) return;
      char c = h[i];
      if (in_str) {
        if (c == '\\') i++;
        else if (c == '"') in_str = false;
      } else if (c == '"') in_str = true;
      else if (c == '{' || c == '[') depth++;
      else if (c == '}' || c == ']') depth--;
      else if ((c == ',') && depth == 0) return;
      i++;
      if (depth == 0 && !in_str && (h[i-1] == '}' || h[i-1] == ']' )) return;
    } while (depth > 0 || in_str || (h[i-1] != ',' ));
  };

  skip_ws();
  if (i >= n || h[i] != '{') return false;
  i++;
  while (true) {
    skip_ws();
    if (i < n && h[i] == '}') break;
    std::string key;
    if (!parse_string(key)) return false;
    skip_ws();
    if (i >= n || h[i] != ':') return false;
    i++;
    skip_ws();
    if (key == "__metadata__") { skip_value(); continue; }
    if (i >= n || h[i] != '{') return false;
    i++;
    StTensor t;
    t.name = key;
    while (true) {
      skip_ws();
      if (i < n && h[i] == '}') { i++; break; }
      std::string field;
      if (!parse_string(field)) return false;
      skip_ws();
      if (i >= n || h[i] != ':') return false;
      i++;
      skip_ws();
      if (field == "dtype") {
        if (!parse_string(t.dtype)) return false;
      } else if (field == "shape" || field == "data_offsets") {
        if (i >= n || h[i] != '[') return false;
        i++;
        std::vector<int64_t> vals;
        while (true) {
          skip_ws();
          if (i < n && h[i] == ']') { i++; break; }
          int64_t v = 0;
          bool neg = false;
          if (h[i] == '-') { neg = true; i++; }
          while (i < n && h[i] >= '0' && h[i] <= '9') v = v * 10 + (h[i++] - '0');
          vals.push_back(neg ? -v : v);
          skip_ws();
          if (i < n && h[i] == ',') i++;
        }
        if (field == "shape") t.shape = vals;
        else if (vals.size() == 2) { t.begin = vals[0]; t.end = vals[1]; }
      } else {
        skip_value();
      }
      skip_ws();
      if (i < n && h[i] == ',') i++;
    }
    f->tensors.push_back(std::move(t));
    skip_ws();
    if (i < n && h[i] == ',') i++;
  }
  return true;
}

void* mnnst_open(const char* path) {
  StFile* f = new StFile();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) { delete f; return nullptr; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) { close(f->fd); delete f; return nullptr; }
  f->size = (size_t)st.st_size;
  f->base = (uint8_t*)mmap(nullptr, f->size, PROT_READ, MAP_SHARED, f->fd, 0);
  if (f->base == MAP_FAILED) { close(f->fd); delete f; return nullptr; }
  uint64_t hlen = 0;
  memcpy(&hlen, f->base, 8);
  if (8 + hlen > f->size) { munmap(f->base, f->size); close(f->fd); delete f; return nullptr; }
  f->header.assign((const char*)f->base + 8, hlen);
  f->data_off = 8 + hlen;
  if (!parse_header(f)) { munmap(f->base, f->size); close(f->fd); delete f; return nullptr; }
  return f;
}

int mnnst_num_tensors(void* handle) {
  return (int)((StFile*)handle)->tensors.size();
}

const char* mnnst_name(void* handle, int idx) {
  return ((StFile*)handle)->tensors[idx].name.c_str();
}

const char* mnnst_dtype(void* handle, int idx) {
  return ((StFile*)handle)->tensors[idx].dtype.c_str();
}

int mnnst_ndim(void* handle, int idx) {
  return (int)((StFile*)handle)->tensors[idx].shape.size();
}

void mnnst_shape(void* handle, int idx, int64_t* out) {
  auto& s = ((StFile*)handle)->tensors[idx].shape;
  for (size_t i = 0; i < s.size(); i++) out[i] = s[i];
}

const void* mnnst_data(void* handle, int idx, uint64_t* nbytes) {
  StFile* f = (StFile*)handle;
  auto& t = f->tensors[idx];
  if (nbytes) *nbytes = t.end - t.begin;
  return f->base + f->data_off + t.begin;
}

const char* mnnst_header(void* handle) {
  return ((StFile*)handle)->header.c_str();
}

void mnnst_close(void* handle) {
  StFile* f = (StFile*)handle;
  if (f->base) munmap(f->base, f->size);
  if (f->fd >= 0) close(f->fd);
  delete f;
}

// ---------------------------------------------------------------------------
// 2. n-gram suffix index (lookahead speculative decoding host path)
// ---------------------------------------------------------------------------

struct NgramIndex {
  int max_n;
  int draft_len;
  std::vector<int32_t> history;
  // key: packed n-gram -> position AFTER the ngram (first occurrence)
  std::unordered_map<uint64_t, int32_t> index;
};

static inline uint64_t pack_key(const int32_t* toks, int k) {
  // FNV-1a over k tokens plus length tag; collisions only cost a bad draft
  uint64_t hsh = 1469598103934665603ull ^ (uint64_t)k;
  for (int i = 0; i < k; i++) {
    hsh ^= (uint64_t)(uint32_t)toks[i];
    hsh *= 1099511628211ull;
  }
  return hsh;
}

void* mnnng_create(int max_n, int draft_len) {
  NgramIndex* g = new NgramIndex();
  g->max_n = max_n;
  g->draft_len = draft_len;
  return g;
}

void mnnng_extend(void* handle, const int32_t* toks, int count) {
  NgramIndex* g = (NgramIndex*)handle;
  for (int t = 0; t < count; t++) {
    g->history.push_back(toks[t]);
    int n = (int)g->history.size();
    for (int k = 2; k <= g->max_n; k++) {
      if (n >= k) {
        uint64_t key = pack_key(g->history.data() + n - k, k);
        g->index.emplace(key, n);  // emplace keeps first occurrence
      }
    }
  }
}

// returns number of draft tokens written to out (0 = no match)
int mnnng_propose(void* handle, int32_t* out) {
  NgramIndex* g = (NgramIndex*)handle;
  int n = (int)g->history.size();
  for (int k = g->max_n; k >= 2; k--) {
    if (n < k) continue;
    uint64_t key = pack_key(g->history.data() + n - k, k);
    auto it = g->index.find(key);
    if (it != g->index.end() && it->second < n) {
      int pos = it->second;
      int cnt = 0;
      for (; cnt < g->draft_len && pos + cnt < n; cnt++) {
        out[cnt] = g->history[pos + cnt];
      }
      if (cnt > 0) return cnt;
    }
  }
  return 0;
}

int mnnng_history_len(void* handle) {
  return (int)((NgramIndex*)handle)->history.size();
}

void mnnng_destroy(void* handle) {
  delete (NgramIndex*)handle;
}

}  // extern "C"

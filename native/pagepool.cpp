// Native page allocator for the paged KV cache — the C++ twin of
// tpu_llama/runtime/paged.PagePool (same semantics, same policy:
// full reservation at admission, page 0 reserved as the trash page,
// reference-counted pages for vLLM-style prefix sharing).
//
// The reference has no allocator at all (one flat fp32 cache,
// llama2.ts:160-161); this is the TPU build's serving-runtime native
// piece: admission-path bookkeeping that runs at O(pages) per request
// with no Python object churn.  C ABI + ctypes (no pybind11 in image).
//
// Memory layout shared with Python: the page table lives in a buffer the
// CALLER owns (a numpy int32 array) so the host mirror uploads to device
// without a copy.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Pool {
  int32_t page_size;
  int32_t num_pages;
  int32_t max_pages_per_slot;
  int32_t slots;
  std::vector<int32_t> free_list;        // LIFO, back() is next
  std::vector<int32_t> refs;             // live holds per page
  std::vector<std::vector<int32_t>> by_slot;  // pages held per slot
  int32_t* table;                        // caller-owned [slots, mpps]
};

int32_t pages_needed(const Pool* p, int32_t n_tokens) {
  int64_t n = n_tokens > 1 ? n_tokens : 1;
  return static_cast<int32_t>((n + p->page_size - 1) / p->page_size);
}

}  // namespace

extern "C" {

void* pool_create(int32_t num_pages, int32_t page_size, int32_t slots,
                  int32_t max_pages_per_slot, int32_t* table) {
  if (num_pages < 2) return nullptr;  // page 0 is the trash page
  auto* p = new Pool();
  p->page_size = page_size;
  p->num_pages = num_pages;
  p->max_pages_per_slot = max_pages_per_slot;
  p->slots = slots;
  p->free_list.reserve(num_pages - 1);
  // back() pops 1, 2, 3, ... — the Python pool's order exactly
  for (int32_t i = num_pages - 1; i >= 1; --i) p->free_list.push_back(i);
  p->refs.assign(num_pages, 0);
  p->by_slot.assign(slots, {});
  p->table = table;
  std::memset(table, 0, sizeof(int32_t) * slots * max_pages_per_slot);
  return p;
}

void pool_destroy(void* h) { delete static_cast<Pool*>(h); }

int32_t pool_pages_needed(void* h, int32_t n_tokens) {
  return pages_needed(static_cast<Pool*>(h), n_tokens);
}

int32_t pool_free_pages(void* h) {
  return static_cast<int32_t>(static_cast<Pool*>(h)->free_list.size());
}

int32_t pool_can_reserve(void* h, int32_t n_tokens) {
  auto* p = static_cast<Pool*>(h);
  int32_t n = pages_needed(p, n_tokens);
  return n <= static_cast<int32_t>(p->free_list.size()) &&
         n <= p->max_pages_per_slot;
}

int32_t pool_refcount(void* h, int32_t page) {
  return static_cast<Pool*>(h)->refs[page];
}

int32_t pool_held(void* h, int32_t slot) {
  auto* p = static_cast<Pool*>(h);
  if (slot < 0 || slot >= p->slots) return 0;
  return static_cast<int32_t>(p->by_slot[slot].size());
}

// Take one page with refcount 1; returns -1 when the free list is empty.
int32_t pool_alloc_page(void* h) {
  auto* p = static_cast<Pool*>(h);
  if (p->free_list.empty()) return -1;
  int32_t pg = p->free_list.back();
  p->free_list.pop_back();
  p->refs[pg] = 1;
  return pg;
}

// Add one hold to each page; returns 0 on success, -1 on a dead page.
int32_t pool_retain(void* h, const int32_t* pages, int32_t n) {
  auto* p = static_cast<Pool*>(h);
  for (int32_t i = 0; i < n; ++i)
    if (p->refs[pages[i]] <= 0) return -1;
  for (int32_t i = 0; i < n; ++i) p->refs[pages[i]] += 1;
  return 0;
}

// Drop one hold from each page; zero-ref pages return to the free list.
// Returns 0 on success, -1 on a double free.
int32_t pool_release_pages(void* h, const int32_t* pages, int32_t n) {
  auto* p = static_cast<Pool*>(h);
  for (int32_t i = 0; i < n; ++i)
    if (p->refs[pages[i]] <= 0) return -1;
  for (int32_t i = 0; i < n; ++i) {
    if (--p->refs[pages[i]] == 0) p->free_list.push_back(pages[i]);
  }
  return 0;
}

// Reserve pages covering [0, n_tokens) for a slot.  Writes the row into
// the shared table and returns the page count, or -1 (cannot satisfy) or
// -2 (slot already holds pages).
int32_t pool_reserve(void* h, int32_t slot, int32_t n_tokens) {
  auto* p = static_cast<Pool*>(h);
  if (!p->by_slot[slot].empty()) return -2;
  int32_t n = pages_needed(p, n_tokens);
  if (n > static_cast<int32_t>(p->free_list.size()) ||
      n > p->max_pages_per_slot)
    return -1;
  auto& held = p->by_slot[slot];
  int32_t* row = p->table + static_cast<int64_t>(slot) * p->max_pages_per_slot;
  std::memset(row, 0, sizeof(int32_t) * p->max_pages_per_slot);
  for (int32_t i = 0; i < n; ++i) {
    int32_t pg = p->free_list.back();
    p->free_list.pop_back();
    p->refs[pg] = 1;
    held.push_back(pg);
    row[i] = pg;
  }
  return n;
}

// Reserve with a shared prefix (vLLM-style).  prefix_pages[0:n_prefix]
// are the snapshot's pin list covering prefix_len positions.  Fully
// covered pages are shared (ref+1); the boundary page stays private (a
// fresh page; *copy_src/*copy_dst tell the caller which device page copy
// to issue, or -1).  Returns the page count, -1 (cannot satisfy) or
// -2 (slot busy) or -3 (bad prefix list).
int32_t pool_reserve_with_prefix(void* h, int32_t slot, int32_t n_tokens,
                                 const int32_t* prefix_pages,
                                 int32_t n_prefix, int32_t prefix_len,
                                 int32_t* copy_src, int32_t* copy_dst) {
  auto* p = static_cast<Pool*>(h);
  *copy_src = -1;
  *copy_dst = -1;
  if (!p->by_slot[slot].empty()) return -2;
  int32_t need_tokens = n_tokens > prefix_len ? n_tokens : prefix_len;
  int32_t n = pages_needed(p, need_tokens);
  int32_t n_shared = prefix_len / p->page_size;  // full pages only
  bool boundary = (prefix_len % p->page_size) != 0;
  if (n_prefix < n_shared + (boundary ? 1 : 0)) return -3;
  int32_t n_fresh = n - n_shared;
  if (n > p->max_pages_per_slot ||
      n_fresh > static_cast<int32_t>(p->free_list.size()))
    return -1;
  for (int32_t i = 0; i < n_shared; ++i)
    if (p->refs[prefix_pages[i]] <= 0) return -3;

  auto& held = p->by_slot[slot];
  int32_t* row = p->table + static_cast<int64_t>(slot) * p->max_pages_per_slot;
  std::memset(row, 0, sizeof(int32_t) * p->max_pages_per_slot);
  for (int32_t i = 0; i < n_shared; ++i) {
    p->refs[prefix_pages[i]] += 1;
    held.push_back(prefix_pages[i]);
    row[i] = prefix_pages[i];
  }
  for (int32_t i = 0; i < n_fresh; ++i) {
    int32_t pg = p->free_list.back();
    p->free_list.pop_back();
    p->refs[pg] = 1;
    held.push_back(pg);
    row[n_shared + i] = pg;
  }
  if (boundary && n_fresh > 0) {
    *copy_src = prefix_pages[n_shared];
    *copy_dst = row[n_shared];
  }
  return n;
}

// Drop the slot's hold on all pages; zeroes its table row.  Returns the
// number of pages it held (0 if none).
int32_t pool_release(void* h, int32_t slot) {
  auto* p = static_cast<Pool*>(h);
  auto& held = p->by_slot[slot];
  int32_t n = static_cast<int32_t>(held.size());
  for (int32_t pg : held) {
    if (--p->refs[pg] == 0) p->free_list.push_back(pg);
  }
  held.clear();
  std::memset(p->table + static_cast<int64_t>(slot) * p->max_pages_per_slot,
              0, sizeof(int32_t) * p->max_pages_per_slot);
  return n;
}

}  // extern "C"

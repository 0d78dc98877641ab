// Minimal implementations of the two hwy runtime symbols the harness links
// against (declared in hwy/aligned_allocator.h; the TF-vendored Highway
// ships headers only).  Semantics per the header contract: allocation
// aligned to >= HWY_ALIGNMENT, original pointer recoverable for free.
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "hwy/aligned_allocator.h"

namespace hwy {

static constexpr size_t kAlign = HWY_ALIGNMENT;  // 128; >= any vector size

void* AllocateAlignedBytes(size_t payload_size, AllocPtr alloc_ptr,
                           void* opaque_ptr) {
  const size_t total = payload_size + kAlign + sizeof(void*);
  void* raw = alloc_ptr ? alloc_ptr(opaque_ptr, total) : malloc(total);
  if (raw == nullptr) return nullptr;
  uintptr_t aligned = (reinterpret_cast<uintptr_t>(raw) + sizeof(void*) +
                       kAlign - 1) & ~(kAlign - 1);
  memcpy(reinterpret_cast<void**>(aligned) - 1, &raw, sizeof(void*));
  return reinterpret_cast<void*>(aligned);
}

void FreeAlignedBytes(const void* aligned_pointer, FreePtr free_ptr,
                      void* opaque_ptr) {
  if (aligned_pointer == nullptr) return;
  void* raw;
  memcpy(&raw, reinterpret_cast<void* const*>(aligned_pointer) - 1,
         sizeof(void*));
  if (free_ptr) {
    free_ptr(opaque_ptr, raw);
  } else {
    free(raw);
  }
}

}  // namespace hwy

// Multithreaded positional file reader (maps io/io.h IOBatch + the
// parallel weight loading of gemma/weights.cc:676-694, ">5x from parallel
// reads").  Plain C ABI consumed from Python via ctypes
// (gemma_tpu/io/native_io.py).

#include <fcntl.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>

namespace {

struct Chunk {
  uint64_t offset;
  uint64_t size;
  unsigned char* dst;
};

// Read one chunk fully, retrying partial reads.
bool ReadChunk(int fd, const Chunk& c) {
  uint64_t done = 0;
  while (done < c.size) {
    const ssize_t n = pread(fd, c.dst + done, c.size - done,
                            static_cast<off_t>(c.offset + done));
    if (n <= 0) return false;
    done += static_cast<uint64_t>(n);
  }
  return true;
}

}  // namespace

extern "C" {

// Reads n (offset, size) ranges of `path` into caller-provided buffers.
// Large ranges are split into `chunk_bytes` pieces and spread over
// `threads` workers.  Returns 0 on success, -1 on any failure.
__attribute__((visibility("default"))) int gemma_parallel_read(
    const char* path, const uint64_t* offsets, const uint64_t* sizes,
    unsigned char** dsts, int n, int threads, uint64_t chunk_bytes) {
  if (threads < 1) threads = 1;
  if (chunk_bytes == 0) chunk_bytes = 8ull << 20;

  std::vector<Chunk> chunks;
  for (int i = 0; i < n; ++i) {
    for (uint64_t off = 0; off < sizes[i]; off += chunk_bytes) {
      const uint64_t len = std::min(chunk_bytes, sizes[i] - off);
      chunks.push_back(Chunk{offsets[i] + off, len, dsts[i] + off});
    }
  }

  std::atomic<size_t> next{0};
  std::atomic<bool> ok{true};
  auto worker = [&]() {
    const int fd = open(path, O_RDONLY);
    if (fd < 0) {
      ok = false;
      return;
    }
    for (;;) {
      const size_t i = next.fetch_add(1);
      if (i >= chunks.size() || !ok.load(std::memory_order_relaxed)) break;
      if (!ReadChunk(fd, chunks[i])) {
        ok = false;
        break;
      }
    }
    close(fd);
  };

  std::vector<std::thread> pool;
  const int n_threads = std::min<int>(threads, chunks.size());
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok ? 0 : -1;
}

}  // extern "C"

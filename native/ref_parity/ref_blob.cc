// Weights-free byte-parity oracle for the .sbs BLOB CONTAINER: drives the
// REFERENCE's own BlobWriter/BlobReader, compiled directly from the
// read-only tree (io/blob_store.cc:36-145 V1/V2 layout, 256-B blob
// alignment, trailing directory+header, 64 KiB end padding; io/io.cc file
// layer), so gemma_tpu/io/blob_store.py can be byte-compared against the
// original C++ (VERDICT r4 #4).
//
// This file contains NO transcribed reference logic — it only calls the
// reference's public Blob API and marshals bytes across stdin/stdout:
//
//   ref_blob write <path>
//     stdin:  u32 n, then n x { u32 klen, key, u64 dlen, data }
//     effect: writes a V2 .sbs at <path> via the reference BlobWriter
//   ref_blob read <path>
//     stdout: u32 n, then n x { u32 klen, key, u64 dlen, data }
//             in the file's directory order, via the reference BlobReader
//             (reads BOTH the V1 and V2 layouts)
//
// Built by native/ref_parity/build.sh with the serial-ParallelFor shim
// (shim/util/threading_context.h — scheduling stand-in; all format logic
// comes from the reference TU itself).
#include <stdint.h>
#include <stdio.h>

#include <string>
#include <vector>

#include "io/blob_store.h"
#include "io/io.h"
#include "util/threading_context.h"

namespace {

template <typename T>
T ReadPod() {
  T v;
  if (fread(&v, sizeof(v), 1, stdin) != 1) {
    fprintf(stderr, "ref_blob: short read on stdin\n");
    exit(2);
  }
  return v;
}

std::vector<uint8_t> ReadBytes(size_t n) {
  std::vector<uint8_t> buf(n);
  if (n != 0 && fread(buf.data(), 1, n, stdin) != n) {
    fprintf(stderr, "ref_blob: short read on stdin (%zu bytes)\n", n);
    exit(2);
  }
  return buf;
}

template <typename T>
void WritePod(T v) {
  if (fwrite(&v, sizeof(v), 1, stdout) != 1) exit(2);
}

void WriteBytes(const void* p, size_t n) {
  if (n != 0 && fwrite(p, 1, n, stdout) != n) exit(2);
}

int DoWrite(const char* path) {
  gcpp::ThreadingContext ctx;
  gcpp::BlobWriter writer(gcpp::Path(path), ctx);
  const uint32_t n = ReadPod<uint32_t>();
  // BlobWriter::Add keeps no copy of the data (writes immediately), so a
  // per-blob buffer is safe.
  for (uint32_t i = 0; i < n; ++i) {
    const uint32_t klen = ReadPod<uint32_t>();
    const std::vector<uint8_t> key = ReadBytes(klen);
    const uint64_t dlen = ReadPod<uint64_t>();
    const std::vector<uint8_t> data = ReadBytes(dlen);
    writer.Add(std::string(key.begin(), key.end()), data.data(), data.size());
  }
  writer.Finalize();
  return 0;
}

int DoRead(const char* path) {
  gcpp::BlobReader reader((gcpp::Path(path)));
  const std::vector<std::string>& keys = reader.Keys();
  WritePod<uint32_t>(static_cast<uint32_t>(keys.size()));
  for (size_t i = 0; i < keys.size(); ++i) {
    WritePod<uint32_t>(static_cast<uint32_t>(keys[i].size()));
    WriteBytes(keys[i].data(), keys[i].size());
    const gcpp::BlobRange& range = reader.Range(i);
    std::vector<uint8_t> data(range.bytes);
    if (!reader.file().Read(range.offset, range.bytes, data.data())) {
      fprintf(stderr, "ref_blob: read failed for %s\n", keys[i].c_str());
      return 2;
    }
    WritePod<uint64_t>(static_cast<uint64_t>(data.size()));
    WriteBytes(data.data(), data.size());
  }
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: ref_blob {write|read} <path>\n");
    return 2;
  }
  const std::string mode = argv[1];
  if (mode == "write") return DoWrite(argv[2]);
  if (mode == "read") return DoRead(argv[2]);
  fprintf(stderr, "ref_blob: unknown mode %s\n", mode.c_str());
  return 2;
}

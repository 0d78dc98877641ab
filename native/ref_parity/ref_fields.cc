// Wire-format parity oracle: serializes the REFERENCE's own ModelConfig
// tables (gemma/configs.cc:43-430) through its fields.h writer
// (io/fields.h:36-51 version-less u32 wire format), so gemma_tpu's
// io/fields.py + models/configs.py serialization can be byte-compared
// against the original (VERDICT r3 next #2).
//
// No reference logic is transcribed here — configs.cc and fields.cc are
// compiled from the read-only tree; this file only marshals.
//
//   ref_fields <specifier>     e.g. "gemma2-2b-sfp"
//     stdout: the serialized config as little-endian u32 bytes.
#include <stdint.h>
#include <stdio.h>

#include <string>
#include <vector>

#include "gemma/configs.h"

int main(int argc, char** argv) {
  if (argc != 2) {
    fprintf(stderr, "usage: ref_fields <specifier>\n");
    return 2;
  }
  const gcpp::ModelConfig config((std::string(argv[1])));
  const std::vector<uint32_t> storage = config.Write();
  fwrite(storage.data(), 4, storage.size(), stdout);
  return 0;
}

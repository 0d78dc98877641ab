#!/bin/bash
# Build the reference-parity harnesses against the read-only reference tree
# and the TF-vendored Highway headers.  Produces ref_codec and ref_fields
# next to this script.  Idempotent; used by tests/test_ref_parity.py.
#
# ref_codec:  drives the reference's SFP/NUQ/I8 codecs (stdin/stdout).
# ref_fields: serializes the reference's ModelConfig via its fields.h
#             wire format.
# ref_blob:   writes/reads .sbs blob containers via the reference's
#             BlobWriter/BlobReader (V1+V2 layout byte-parity).
# ref_ops:    drives the reference's CE-load-bearing elementwise ops
#             (Gelu/RMSNorm/Rope/Softmax/LogitsSoftCap) from ops-inl.h,
#             with a lane-wise-libm math shim (documented divergence).
set -eu
cd "$(dirname "$0")"
REF=${REF:-/root/reference}
HWY=${HWY:-$(python - <<'EOF'
import pathlib, tensorflow as tf  # noqa
print(pathlib.Path(tf.__file__).parent / "include/external/com_google_highway")
EOF
)}
CXXFLAGS="-std=c++17 -O2 -DHWY_HEADER_ONLY -w"
g++ $CXXFLAGS -I shim -I "$HWY" -I "$REF" \
    ref_codec.cc shim/hwy_alloc_shim.cc -o ref_codec
g++ $CXXFLAGS -DGEMMA_DISABLE_TOPOLOGY=1 -ffunction-sections -fdata-sections \
    -I shim -I "$HWY" -I "$REF" \
    ref_fields.cc "$REF/gemma/configs.cc" "$REF/io/fields.cc" \
    shim/hwy_alloc_shim.cc -Wl,--gc-sections -o ref_fields
g++ $CXXFLAGS -DGEMMA_DISABLE_TOPOLOGY=1 -ffunction-sections -fdata-sections \
    -I shim -I "$HWY" -I "$REF" \
    ref_blob.cc "$REF/io/blob_store.cc" "$REF/io/io.cc" \
    shim/hwy_alloc_shim.cc -Wl,--gc-sections -o ref_blob
g++ $CXXFLAGS -DGEMMA_DISABLE_TOPOLOGY=1 -ffunction-sections -fdata-sections \
    -I shim -I "$HWY" -I "$REF" \
    ref_ops.cc "$REF/io/fields.cc" "$REF/gemma/tensor_info.cc" \
    shim/hwy_alloc_shim.cc -Wl,--gc-sections -o ref_ops
echo "built $(pwd)/{ref_codec,ref_fields,ref_blob,ref_ops}"

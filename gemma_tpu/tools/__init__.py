"""Model-file tools (maps io/migrate_weights.cc, io/blob_compare.cc,
python/convert_from_safetensors.py)."""

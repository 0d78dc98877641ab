from gemma_tpu.io.blob_store import BlobReader, BlobWriter  # noqa: F401
from gemma_tpu.io.fields import Fields, read_fields, write_fields  # noqa: F401

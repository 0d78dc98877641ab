"""Embedding bindings (maps gemma/bindings/): GemmaContext named-conversation
management + a C ABI (native/c_api.cc) for host applications."""

from gemma_tpu.bindings.context import GemmaContext

__all__ = ["GemmaContext"]

"""PaliGemma/Gemma3 vision input (maps paligemma/)."""

from gemma_tpu.paligemma.image import Image

__all__ = ["Image"]

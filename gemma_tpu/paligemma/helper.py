"""Image+text query harness for tests and tools
(maps paligemma/paligemma_helper.{h,cc}).
"""

from __future__ import annotations

from gemma_tpu.models.configs import PromptWrapping
from gemma_tpu.models.tokenizer import wrap_and_tokenize
from gemma_tpu.models.vit import generate_image_tokens
from gemma_tpu.paligemma.image import Image


class PaliGemmaHelper:
    def __init__(self, gemma):
        self.gemma = gemma
        assert gemma.config.wrapping in (PromptWrapping.PALIGEMMA,
                                         PromptWrapping.GEMMA_VLM), \
            "model has no vision wrapping"

    def image_tokens(self, image_path_or_image):
        g = self.gemma
        image = image_path_or_image
        if not isinstance(image, Image):
            image = Image.read_ppm(image)
        size = g.config.vit_config.image_size
        return generate_image_tokens(g.params, image.resize(size, size),
                                     g.config, mesh=g.engine.mesh)

    def query(self, image, prompt: str, max_generated_tokens: int = 64) -> str:
        """Full image QA round trip (PaliGemmaHelper::QueryModel)."""
        g = self.gemma
        tokens = self.image_tokens(image)
        ids = wrap_and_tokenize(g.tokenizer, g.chat_template,
                                g.config.wrapping, 0, prompt,
                                image_batch_size=tokens.shape[0])
        prefix_end = len(ids) \
            if g.config.wrapping == PromptWrapping.PALIGEMMA else 0
        out = g.generate(ids, max_generated_tokens=max_generated_tokens,
                         prefix_end=prefix_end, image_embeddings=tokens)
        return g.tokenizer.decode([t for t in out
                                   if not g.config.is_eos(t)])

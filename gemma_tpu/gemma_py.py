"""`GemmaModel` — drop-in analog of the reference's pybind11 Python API
(python/gemma_py.cc:46-290): snake_case methods generate / generate_ex /
generate_batch / set_image / generate_with_image / cross_entropy with
accept-token constraints and streaming callbacks.

gemma_tpu is already Python, so this is a thin veneer over the Gemma
facade for users porting gemma.cpp's `import gemma` scripts:

    from gemma_tpu.gemma_py import GemmaModel
    model = GemmaModel("tokenizer.model", "weights.sbs")
    print(model.generate("Hi", max_generated_tokens=64))
"""

from __future__ import annotations

from typing import Callable, Sequence

from gemma_tpu.engine.engine import RuntimeConfig
from gemma_tpu.gemma import Gemma
from gemma_tpu.models.tokenizer import wrap_and_tokenize


class GemmaModel:
    def __init__(self, tokenizer_path: str, weights_path: str,
                 max_generated_tokens: int = 2048, seq_len: int = 8192):
        self._gemma = Gemma.load(
            weights_path, tokenizer_path=tokenizer_path or None,
            runtime=RuntimeConfig(max_generated_tokens=max_generated_tokens,
                                  seq_len=seq_len))
        self._image_tokens = None

    # --- text generation (gemma_py.cc:53-160) ---

    def generate_ex(self, prompt: str,
                    stream: Callable[[int, float], bool] | None = None,
                    accept: Callable[[int, float], bool] | None = None,
                    max_generated_tokens: int = 1024,
                    temperature: float = 1.0, top_k: int = 1,
                    seed: int = 0) -> list[int]:
        """Streaming generation with optional accept-token constraints;
        returns the generated token ids."""
        g = self._gemma
        rt = g.runtime
        old = (rt.temperature, rt.top_k, rt.seed)
        rt.temperature, rt.top_k, rt.seed = temperature, top_k, seed
        try:
            ids = wrap_and_tokenize(g.tokenizer, g.chat_template,
                                    g.config.wrapping, 0, prompt)

            def stream_token(qi, pos, token, prob):
                if stream is not None:
                    return stream(token, prob)
                return True

            return g.generate(
                ids, max_generated_tokens=max_generated_tokens,
                stream_token=stream_token if stream else None,
                accept_token=(lambda t, l: accept(t, l)) if accept else None,
            )
        finally:
            rt.temperature, rt.top_k, rt.seed = old

    def generate(self, prompt: str, max_generated_tokens: int = 1024,
                 temperature: float = 1.0, top_k: int = 1,
                 seed: int = 0) -> str:
        g = self._gemma
        out = self.generate_ex(prompt,
                               max_generated_tokens=max_generated_tokens,
                               temperature=temperature, top_k=top_k,
                               seed=seed)
        return g.tokenizer.decode(
            [t for t in out if not g.config.is_eos(t)])

    def generate_batch(self, inputs: Sequence[str],
                       max_generated_tokens: int = 1024) -> list[str]:
        g = self._gemma
        prompts = [wrap_and_tokenize(g.tokenizer, g.chat_template,
                                     g.config.wrapping, 0, p)
                   for p in inputs]
        outs = g.generate_batch(prompts,
                                max_generated_tokens=max_generated_tokens)
        return [g.tokenizer.decode([t for t in out
                                    if not g.config.is_eos(t)])
                for out in outs]

    # --- vision (gemma_py.cc:163-230) ---

    def set_image(self, image) -> None:
        """image: [H, W, 3] array (0..255) or paligemma.image.Image."""
        from gemma_tpu.models.vit import generate_image_tokens
        from gemma_tpu.paligemma.image import Image

        g = self._gemma
        if not g.config.vit_config.layer_configs:
            raise ValueError("model has no vision encoder")
        if not isinstance(image, Image):
            image = Image.from_array(image)
        size = g.config.vit_config.image_size
        image = image.resize(size, size)
        self._image_tokens = generate_image_tokens(g.params, image, g.config,
                                                   mesh=g.engine.mesh)

    def generate_with_image(self, prompt: str,
                            max_generated_tokens: int = 1024
                            ) -> tuple[str, list[int]]:
        if self._image_tokens is None:
            raise ValueError("call set_image first")
        g = self._gemma
        n_img = self._image_tokens.shape[0]
        ids = wrap_and_tokenize(g.tokenizer, g.chat_template,
                                g.config.wrapping, 0, prompt,
                                image_batch_size=n_img)
        from gemma_tpu.models.configs import PromptWrapping

        prefix_end = len(ids) \
            if g.config.wrapping == PromptWrapping.PALIGEMMA else 0
        out = g.generate(ids, max_generated_tokens=max_generated_tokens,
                         prefix_end=prefix_end,
                         image_embeddings=self._image_tokens)
        text = g.tokenizer.decode([t for t in out
                                   if not g.config.is_eos(t)])
        return text, out

    # --- evaluation ---

    def cross_entropy(self, text: str) -> float:
        """Bits per byte (evals/cross_entropy.cc semantics)."""
        from gemma_tpu.evals.benchmark_helper import GemmaEnv

        return GemmaEnv(self._gemma).cross_entropy(text)

    def detokenize(self, ids: Sequence[int]) -> str:
        return self._gemma.tokenizer.decode(list(ids))

    def tokenize(self, text: str) -> list[int]:
        return self._gemma.tokenizer.encode(text)

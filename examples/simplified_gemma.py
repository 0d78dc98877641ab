"""One-class convenience wrapper (maps examples/simplified_gemma:
a single object that hides loader/inference/threading plumbing).

    from examples.simplified_gemma import SimplifiedGemma
    g = SimplifiedGemma("model.sbs")
    print(g("Tell me a joke"))
"""

from __future__ import annotations

from gemma_tpu.engine.engine import RuntimeConfig
from gemma_tpu.gemma import Gemma


class SimplifiedGemma:
    def __init__(self, weights: str, tokenizer: str | None = None,
                 max_generated_tokens: int = 1024, temperature: float = 1.0,
                 top_k: int = 1, seq_len: int = 4096):
        self._gemma = Gemma.load(
            weights, tokenizer_path=tokenizer,
            runtime=RuntimeConfig(
                max_generated_tokens=max_generated_tokens,
                temperature=temperature, top_k=top_k, seq_len=seq_len,
            ),
        )

    def __call__(self, prompt: str, **kw) -> str:
        return self._gemma.chat(prompt, **kw)


if __name__ == "__main__":
    import sys

    g = SimplifiedGemma(sys.argv[1])
    print(g(sys.argv[2] if len(sys.argv) > 2 else "Hello!"))

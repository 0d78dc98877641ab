"""Top-level `Gemma` facade (maps class Gemma, gemma/gemma.{h,cc}:233-284).

Construction mirrors the reference ctor (SURVEY.md §3.1):
BlobReader -> ModelStore (config/tokenizer/TOC) -> device Params -> engine.

    gemma = Gemma.load("model.sbs")
    text = gemma.chat("Hi!")             # IT models
    ids  = gemma.generate_text("2+2=")   # raw completion
"""

from __future__ import annotations

from typing import Callable, Sequence

from gemma_tpu.engine.engine import GemmaEngine, RuntimeConfig
from gemma_tpu.engine.timing import TimingInfo
from gemma_tpu.io.blob_store import BlobReader
from gemma_tpu.io.model_store import ModelStore, write_model
from gemma_tpu.models.configs import ModelConfig, PromptWrapping
from gemma_tpu.models.gemma import Params, load_params
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.models.tokenizer import (
    BOS_ID,
    ChatTemplate,
    GemmaTokenizer,
    wrap_and_tokenize,
)


class Gemma:
    """Owns store-derived config, tokenizer, device params and the engine."""

    def __init__(self, config: ModelConfig, params: Params,
                 tokenizer: GemmaTokenizer,
                 runtime: RuntimeConfig | None = None,
                 store: ModelStore | None = None, mesh=None):
        self.config = config
        self.tokenizer = tokenizer
        self.chat_template = ChatTemplate(tokenizer)
        self.engine = GemmaEngine(params, config, runtime, mesh=mesh)
        self.params = self.engine.params  # sharded when mesh is set
        self._store = store

    # --- construction ---

    @classmethod
    def load(cls, weights_path: str, tokenizer_path: str | None = None,
             kind_override: str | None = None,
             runtime: RuntimeConfig | None = None,
             wrapping: PromptWrapping | None = None, mesh=None) -> "Gemma":
        """Load a .sbs model file (single-file or pre-2025 + tokenizer)."""
        from gemma_tpu.utils import profiler

        with profiler.zone("Startup.open"):
            reader = BlobReader(weights_path)
            store = ModelStore(reader, tokenizer_path=tokenizer_path,
                               wrapping=wrapping)
        with profiler.zone("Startup.weights"):
            params = load_params(store, kind_override=kind_override)
        if store.config.vit_config.layer_configs and \
                "img_emb_kernel" in store.tensors:
            from gemma_tpu.models.vit import load_vit_params

            params.vit = load_vit_params(store, kind_override)
        with profiler.zone("Startup.tokenizer"):
            tokenizer = GemmaTokenizer(store.tokenizer_bytes())
        return cls(store.config, params, tokenizer, runtime, store,
                   mesh=mesh)

    def save(self, path: str) -> None:
        """Gemma::Save analog (gemma/gemma.cc:655-661): single-file .sbs."""
        if self._store is None:
            raise ValueError("save() requires a store-backed model")
        tensors = []
        for name in self._store.tensors:
            pt = self._store.read_tensor(name)
            if pt is not None:
                tensors.append(pt)
        write_model(path, self.config, tensors,
                    tokenizer_proto=self.tokenizer.serialize())

    # --- generation ---

    @property
    def runtime(self) -> RuntimeConfig:
        return self.engine.runtime

    def new_cache(self, batch: int = 1, seq_len: int | None = None,
                  min_local_slack: int = 0) -> KVCache:
        return self.engine.new_cache(batch, seq_len,
                                     min_local_slack=min_local_slack)

    def generate(self, prompt_ids: Sequence[int], **kw) -> list[int]:
        return self.engine.generate(prompt_ids, **kw)

    def generate_batch(self, prompts: Sequence[Sequence[int]], **kw):
        return self.engine.generate_batch(prompts, **kw)

    def generate_text(
        self,
        prompt: str,
        pos: int = 0,
        max_generated_tokens: int | None = None,
        stream: Callable[[str], bool] | None = None,
        cache: KVCache | None = None,
        timing_info: TimingInfo | None = None,
        image_batch_size: int | None = None,
    ) -> tuple[str, int, int]:
        """Wrap + tokenize + generate + detokenize (run.cc ReplGemma path)."""
        ids = wrap_and_tokenize(
            self.tokenizer, self.chat_template, self.config.wrapping, pos,
            prompt, image_batch_size=image_batch_size,
        )
        out_ids: list[int] = []

        def stream_token(qi: int, p: int, token: int, prob: float) -> bool:
            if p < pos + len(ids):
                return True  # prompt tokens
            if self.config.is_eos(token):
                return True
            out_ids.append(token)
            if stream is not None:
                return stream(self.tokenizer.decode([token]))
            return True

        self.engine.generate(
            ids, max_generated_tokens=max_generated_tokens,
            stream_token=stream_token, cache=cache, start_pos=pos,
            timing_info=timing_info,
        )
        return self.tokenizer.decode(out_ids), len(ids), len(out_ids)

    def chat(self, prompt: str, **kw) -> str:
        text, _, _ = self.generate_text(prompt, **kw)
        return text

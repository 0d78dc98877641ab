"""Tokenizer + chat template (maps gemma/tokenizer.{h,cc}).

The reference wraps SentencePiece and stores the serialized model proto as a
blob inside the weights file (gemma/tokenizer.cc:39-47, model_store).  Here
the proto is loaded through one of:

  1. `sentencepiece` (bit-exact, if installed),
  2. HF `tokenizers` via transformers' GemmaConverter (handles Gemma's
     byte-fallback + whitespace rules; this is the default in this image),
  3. the `kMockTokenizer` placeholder used by tests (gemma/tokenizer.h:34).

Chat template semantics are mirrored from GemmaChatTemplate
(gemma/tokenizer.cc:108-173): BOS or <end_of_turn> continuation prefix,
<start_of_turn>user/model turns, PaliGemma image-slot prefixes, Gemma3 VLM
<start_of_image> blocks of -2 placeholders.
"""

from __future__ import annotations

import os
import tempfile
from typing import Sequence

from gemma_tpu.models.configs import PromptWrapping

BOS_ID = 2  # gemma/tokenizer.h:29
MOCK_TOKENIZER = b"unavailable"  # gemma/tokenizer.h:34


class GemmaTokenizer:
    """SentencePiece wrapper over a serialized model proto."""

    def __init__(self, proto: bytes | None):
        self._proto = proto or MOCK_TOKENIZER
        self._spm = None
        self._hf = None
        if self._proto == MOCK_TOKENIZER:
            return
        try:
            import sentencepiece  # type: ignore

            self._spm = sentencepiece.SentencePieceProcessor()
            self._spm.LoadFromSerializedProto(self._proto)
            return
        except ImportError:
            pass
        self._hf = _hf_tokenizer_from_proto(self._proto)

    @property
    def available(self) -> bool:
        return self._spm is not None or self._hf is not None

    def serialize(self) -> bytes:
        return self._proto

    def encode(self, text: str) -> list[int]:
        """Text -> ids, no BOS/EOS (SentencePieceProcessor::Encode)."""
        if self._spm is not None:
            return list(self._spm.EncodeAsIds(text))
        if self._hf is not None:
            return list(self._hf.encode(text, add_special_tokens=False).ids)
        return []

    def decode(self, ids: Sequence[int]) -> str:
        if self._spm is not None:
            return self._spm.DecodeIds(list(ids))
        if self._hf is not None:
            return self._hf.decode(list(ids), skip_special_tokens=False)
        return ""

    def id_to_piece(self, token_id: int) -> str:
        if self._spm is not None:
            return self._spm.IdToPiece(token_id)
        if self._hf is not None:
            return self._hf.id_to_token(token_id) or ""
        return ""


def _hf_tokenizer_from_proto(proto: bytes):
    """Build a HF fast tokenizer with transformers' Gemma SPM converter."""
    from transformers.convert_slow_tokenizer import GemmaConverter

    class _Shim:
        # The converter only touches these attributes.
        pad_token = "<pad>"
        eos_token = "<eos>"
        bos_token = "<bos>"
        unk_token = "<unk>"
        vocab_file = None

    with tempfile.NamedTemporaryFile(suffix=".model", delete=False) as f:
        f.write(proto)
        path = f.name
    try:
        shim = _Shim()
        shim.vocab_file = path
        return GemmaConverter(shim).converted()
    finally:
        os.unlink(path)


class ChatTemplate:
    """GemmaChatTemplate (gemma/tokenizer.cc:108-173)."""

    def __init__(self, tokenizer: GemmaTokenizer):
        self.sot_user = tokenizer.encode("<start_of_turn>user\n")
        self.sot_model = tokenizer.encode("<start_of_turn>model\n")
        self.eot = tokenizer.encode("<end_of_turn>\n")
        self.pali_sep = tokenizer.encode("\n")
        self.vlm_soi = tokenizer.encode("\n\n<start_of_image>")
        self.vlm_eoi = tokenizer.encode("<end_of_image>\n\n")

    def apply(self, pos: int, ids: Sequence[int]) -> list[int]:
        """BOS/eot continuation + user turn + model turn header."""
        out = [BOS_ID] if pos == 0 else list(self.eot)
        out += self.sot_user
        out += list(ids)
        out += self.eot
        out += self.sot_model
        return out

    def wrap_pali(self, text_ids: Sequence[int],
                  image_batch_size: int) -> list[int]:
        """image_batch_size zero-tokens, BOS, text, separator (prefix-LM)."""
        return [0] * image_batch_size + [BOS_ID] + list(text_ids) + self.pali_sep

    def wrap_vlm(self, text_ids: Sequence[int],
                 image_batch_size: int) -> list[int]:
        """text + <start_of_image> + -2 placeholders + <end_of_image>."""
        return (list(text_ids) + self.vlm_soi + [-2] * image_batch_size
                + self.vlm_eoi)


def wrap_and_tokenize(
    tokenizer: GemmaTokenizer,
    template: ChatTemplate,
    wrapping: PromptWrapping,
    pos: int,
    prompt: str,
    image_batch_size: int | None = None,
) -> list[int]:
    """WrapAndTokenize (gemma/tokenizer.cc:176-218)."""
    ids = tokenizer.encode(prompt)
    if image_batch_size is not None:
        if wrapping == PromptWrapping.PALIGEMMA:
            assert pos == 0
            return template.wrap_pali(ids, image_batch_size)
        if wrapping == PromptWrapping.GEMMA_VLM:
            return template.apply(pos, template.wrap_vlm(ids, image_batch_size))
        raise ValueError("variant does not support vision prompts")
    if wrapping in (PromptWrapping.GEMMA_IT, PromptWrapping.GEMMA_VLM):
        return template.apply(pos, ids)
    if pos == 0:
        return [BOS_ID] + ids
    return ids

"""Continuous batching scheduler for serving.

The reference serves with a static decode_qbatch (gemma/gemma.cc:588-606):
a wave of queries runs to completion before the next starts, so one long
reply stalls the whole wave.  This scheduler keeps a fixed number of
decode slots hot and admits queued requests into slots as they free up —
the TPU-native upgrade called out in SURVEY.md §2.7/§7 stage 5:

  - fixed shapes: the decode step is compiled once for `slots` queries;
    admission prefills only the new slots (per-slot valid masks).
  - per-slot ring KV caches inside one batched cache tensor.
  - streaming callbacks + EOS/max-token retirement per slot.

Usage:
    batcher = ContinuousBatcher(engine, slots=16)
    batcher.submit(Request(prompt_ids, max_tokens=128, on_token=cb))
    batcher.run_until_idle()
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import deque
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from gemma_tpu.engine.engine import GemmaEngine

_ids = itertools.count()


@dataclasses.dataclass
class Request:
    prompt_ids: Sequence[int]
    max_tokens: int = 256
    on_token: Callable[["Request", int], bool] | None = None
    request_id: int = dataclasses.field(default_factory=lambda: next(_ids))
    output: list = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class _Slot:
    request: Request | None = None
    pos: int = 0            # next decode position (last prompt token first)
    prev_token: int = 0
    remaining: int = 0


class ContinuousBatcher:
    def __init__(self, engine: GemmaEngine, slots: int | None = None,
                 seq_len: int | None = None):
        self.engine = engine
        self.slots = slots or engine.runtime.decode_qbatch_size
        self.seq_len = seq_len or engine.runtime.seq_len
        self.cache = engine.new_cache(self.slots, self.seq_len)
        self._slots = [_Slot() for _ in range(self.slots)]
        self._queue: deque[Request] = deque()

    # --- public API ---

    def submit(self, request: Request) -> Request:
        self._queue.append(request)
        return request

    @property
    def active(self) -> int:
        return sum(1 for s in self._slots if s.request is not None)

    @property
    def pending(self) -> int:
        return len(self._queue)

    def run_until_idle(self) -> None:
        while self.pending or self.active:
            self.step()

    # --- scheduling ---

    def _admit(self) -> None:
        """Prefill queued requests into free slots (one batched pass)."""
        new: list[tuple[int, Request]] = []
        for i, slot in enumerate(self._slots):
            if slot.request is None and self._queue:
                new.append((i, self._queue.popleft()))
        if not new:
            return
        # Fake single-token prompts for untouched slots: prefill() runs all
        # slots, but valid masks confine KV writes to the new ones.
        prompts = [[0] for _ in range(self.slots)]
        start_pos = [0] * self.slots
        for i, req in new:
            prompts[i] = list(req.prompt_ids)
        cache, last = self.engine.prefill(prompts, self.cache,
                                          start_pos=start_pos)
        self.cache.assign(cache)
        for i, req in new:
            slot = self._slots[i]
            slot.request = req
            slot.pos = len(req.prompt_ids) - 1
            slot.prev_token = last[i]
            slot.remaining = req.max_tokens

    def step(self) -> None:
        """One scheduler tick: admit + one decode step for all slots."""
        self._admit()
        if self.active == 0:
            return
        prev = np.asarray([s.prev_token for s in self._slots], np.int32)
        pos = [s.pos for s in self._slots]
        decode = self.engine._decode_fn(self.slots)
        logits, cache = decode(
            self.engine.params, jnp.asarray(prev[:, None]),
            jnp.asarray(np.asarray(pos, np.int32)[:, None]), self.cache)
        self.cache.assign(cache)
        tokens, probs = self.engine._sample(logits, pos, None)
        config = self.engine.config
        for i, slot in enumerate(self._slots):
            req = slot.request
            if req is None:
                continue
            tok = int(tokens[i])
            keep = True
            if req.on_token is not None:
                keep = req.on_token(req, tok)
            req.output.append(tok)
            slot.prev_token = tok
            slot.pos += 1
            slot.remaining -= 1
            if config.is_eos(tok) or slot.remaining <= 0 or not keep:
                req.done = True
                slot.request = None

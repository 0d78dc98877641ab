"""Generation engine (maps gemma/gemma.{h,cc} GenerateT and SURVEY.md 3.2).

Two jitted step functions over fixed shapes:

  prefill_step: [B, C] token chunk -> updated cache  (big-M matmuls; padded
                slots route their KV writes to the cache's garbage row)
  decode_step:  [B, 1] prev tokens -> logits [B, V] + updated cache

and around them:
  - `generate` / `generate_batch`: host loop with per-token `stream_token`
    callbacks (return False to stop a query -- the reference's StreamToken
    protocol, gemma/gemma.h RuntimeConfig), EOS tracking, `accept_token`
    constraints, TimingInfo.
  - `generate_fast`: the whole decode loop inside one jit via lax.scan for
    benchmarking (no streaming).

Sampling: top-1 fused argmax or top-k/temperature with the per-(query, pos)
counter PRNG (gemma.cc:459-485).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gemma_tpu.engine.timing import TimingInfo
from gemma_tpu.utils import profiler
from gemma_tpu.models.configs import ModelConfig
from gemma_tpu.models.gemma import Params, forward
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops import sampling
from gemma_tpu.utils.basics import sample_key

StreamFunc = Callable[[int, int, int, float], bool]
AcceptFunc = Callable[[int, float], bool]


@dataclasses.dataclass
class RuntimeConfig:
    """Maps InferenceArgs/RuntimeConfig (gemma/gemma_args.h:114-265)."""

    max_generated_tokens: int = 2048
    # 0 = auto-select by batch from the measured winners (docs/PERF.md §5:
    # 1024 at batch 1, 512 at batch >= 2, capped to the prompt length and
    # the cache's local ring slack).  >0 pins the chunk like the
    # reference's flag (gemma/gemma_args.h:199-207).
    prefill_tbatch_size: int = 0
    decode_qbatch_size: int = 16
    temperature: float = 1.0
    top_k: int = 1
    seed: int = 0
    verbosity: int = 1
    seq_len: int = 8192
    # Decode steps per device dispatch: >1 amortizes host/dispatch latency
    # (streaming callbacks then fire in bursts of up to this many tokens;
    # outputs are bit-identical to stepwise decode).  1 = per-token
    # streaming like the reference.
    decode_chunk: int = 4
    # KV cache element kind: "bf16" (default), "f32" (the reference's KV_t,
    # gemma/kv_cache.h:30 — for cross-entropy parity runs), or "i8"
    # (per-(position, head) symmetric quantization, ops/kv_quant.py —
    # halves KV HBM traffic again).
    kv_kind: str = "bf16"
    # Greedy decode computes the winner's softmax prob for StreamToken
    # parity (gemma.h:103-116 — the callback's second argument).  False
    # skips the softcap tanh + softmax exp over [B, vocab] in the fused
    # top1 head (callbacks then receive prob=1.0) — pure-VPU work the TPU
    # cannot overlap with the MXU, worth skipping when the caller ignores
    # probs.  Tokens are the exact-real greedy winner (raw-logits argmax;
    # identical to the capped path except where f32 tanh saturation
    # collapses distinct logits into exact ties — see matmul_top1).
    stream_probs: bool = True


class GemmaEngine:
    """Owns params + jitted step functions (the `Gemma` class analog).

    With `mesh` set, params are sharded Megatron-style over the "model"
    axis and queries over "data" (parallel/tp.py); the host loop is
    unchanged — only the jitted steps become shard_map programs.
    """

    def __init__(self, params: Params, config: ModelConfig,
                 runtime: RuntimeConfig | None = None, mesh=None):
        self.config = config
        self.runtime = runtime or RuntimeConfig()
        self.mesh = mesh
        if mesh is not None:
            from gemma_tpu.parallel import shard_params

            params = shard_params(params, config, mesh)
        self.params = params
        self._prefill_fns: dict = {}
        self._decode_fns: dict = {}
        self._decode_chunk_fns: dict = {}
        self._generate_fns: dict = {}

    @property
    def scan_params(self):
        """Stacked [T, ...] params for the scan-over-layers decode
        (engine/scan_decode.py: one lax.scan body instead of L unrolled
        layers), built lazily on first decode.  Opt-in via
        GEMMA_SCAN_DECODE=1: the scan halves compile time and shrinks the
        program 8x (852 vs 7038 HLO instructions at 2B), but measures
        0.93x step time on v5e (scalar-prefetch indirection across ~180
        kernels/step; scripts/scan_ablate.py) — so the default decode
        stays unrolled and scan is for compile-bound/many-shape serving.
        None when ineligible: mesh mode (TP shards per-layer), per-layer
        codec scales that cannot stack (load with --kind i8/--kind i4),
        or non-periodic layer patterns."""
        if not hasattr(self, "_scan_params_cache"):
            sp = None
            if self.mesh is None and \
                    os.environ.get("GEMMA_SCAN_DECODE", "0") == "1":
                from gemma_tpu.engine.scan_decode import build_scan_params

                sp = build_scan_params(self.params, self.config)
            self._scan_params_cache = sp
        return self._scan_params_cache

    # --- jitted steps ---

    def _prefill_fn(self, batch: int, chunk: int, with_image: bool = False):
        key = (batch, chunk, with_image)
        if key not in self._prefill_fns:
            config = self.config

            if self.mesh is not None:
                from gemma_tpu.parallel import build_tp_step

                tp_step = build_tp_step(self.params, config, self.mesh,
                                        return_logits="none",
                                        seq_len=self.runtime.seq_len,
                                        with_image=with_image)

                def step(params, tokens, positions, valid, prefix_end,
                         cache, *image_args):
                    return tp_step(params, tokens, positions, valid,
                                   prefix_end, cache, *image_args)

                self._prefill_fns[key] = step
                return step

            if with_image:

                @jax.jit
                def step(params, tokens, positions, valid, prefix_end, cache,
                         image_embeddings, image_slot_mask):
                    _, cache = forward(
                        params, tokens, positions, cache, config,
                        prefix_end=prefix_end, return_logits="none",
                        valid=valid, image_embeddings=image_embeddings,
                        image_slot_mask=image_slot_mask,
                    )
                    return cache
            else:

                # The cache is donated: the update aliases in place on
                # runtimes that honor donation (the engine never reuses the
                # input cache object's old buffers).
                @functools.partial(jax.jit, donate_argnums=(5,))
                def step(params, tokens, positions, valid, prefix_end, cache):
                    _, cache = forward(
                        params, tokens, positions, cache, config,
                        prefix_end=prefix_end, return_logits="none",
                        valid=valid,
                    )
                    return cache

            self._prefill_fns[key] = step
        return self._prefill_fns[key]

    def _decode_fn(self, batch: int, with_valid: bool = False):
        """with_valid adds a [B, 1] bool arg routing masked slots' KV
        writes to the garbage row (continuous-batcher padding slots must
        not write real ring rows, engine/serving.py)."""
        key = (batch, with_valid)
        if key not in self._decode_fns:
            config = self.config

            if self.mesh is not None:
                from gemma_tpu.parallel import build_tp_step

                tp_step = build_tp_step(self.params, config, self.mesh,
                                        return_logits="last",
                                        seq_len=self.runtime.seq_len)

                def step(params, prev_tokens, positions, cache, *valid):
                    v = valid[0] if valid else jnp.ones_like(prev_tokens,
                                                             bool)
                    pe = jnp.zeros((prev_tokens.shape[0],), jnp.int32)
                    return tp_step(params, prev_tokens, positions,
                                   v, pe, cache)
            else:

                @functools.partial(jax.jit, donate_argnums=(3,))
                def step(params, prev_tokens, positions, cache, *valid):
                    logits, cache = forward(
                        params, prev_tokens, positions, cache, config,
                        return_logits="last",
                        valid=valid[0] if valid else None,
                    )
                    return logits, cache

                sparams = self.scan_params
                if sparams is not None:
                    from gemma_tpu.engine.scan_decode import forward_scan

                    @functools.partial(jax.jit, donate_argnums=(3,))
                    def scan_step(sp, prev_tokens, positions, cache,
                                  *valid):
                        logits, cache = forward_scan(
                            sp, prev_tokens, positions, cache, config,
                            return_logits="last",
                            valid=valid[0] if valid else None)
                        return logits, cache

                    unrolled = step

                    def step(params, prev_tokens, positions, cache,
                             *valid):
                        # A cache whose pool layout is not periodic-affine
                        # (built for a different config) fails the scan's
                        # trace-time asserts — route it to the unrolled
                        # step (trace failure precedes any donation).
                        try:
                            return scan_step(sparams, prev_tokens,
                                             positions, cache, *valid)
                        except AssertionError:
                            return unrolled(params, prev_tokens,
                                            positions, cache, *valid)

            self._decode_fns[key] = step
        return self._decode_fns[key]

    def _decode_chunk_fn(self, batch: int, k: int, with_mask: bool = False):
        """k decode+sample steps in one executable (lax.scan), returning
        tokens/probs [B, k] — amortizes per-dispatch latency for the host
        loop while keeping per-(query, pos) sampling streams exact.

        with_mask adds an allowed-token mask [V] applied to the logits
        before sampling (vectorized TokenSet constraints stay chunked)."""
        rt = self.runtime
        key = (batch, k, rt.top_k, rt.temperature, with_mask,
               rt.stream_probs)
        if key not in self._decode_chunk_fns:
            config = self.config
            top_k, temperature = rt.top_k, rt.temperature
            need_prob = rt.stream_probs

            if self.mesh is not None:
                from gemma_tpu.parallel import build_tp_decode_chunk

                tp_run = build_tp_decode_chunk(
                    self.params, config, self.mesh, k, top_k, temperature,
                    with_mask=with_mask)

                def run(params, prev, pos, cache, seed, *mask):
                    return tp_run(params, prev, pos, cache,
                                  jnp.int32(seed), *mask)

                self._decode_chunk_fns[key] = run
                return run
            def make_run(fwd):
                @functools.partial(jax.jit, donate_argnums=(3,))
                def run(params, prev, pos, cache, seed, *mask):
                    def body(carry, _):
                        prev, pos, cache = carry
                        if top_k == 1:
                            # Greedy: fused logits head (the [B, vocab]
                            # logits never materialize); the allowed-token
                            # TokenSet constraint rides the kernel's
                            # in-block mask.
                            (tok, prob), cache = fwd(
                                params, prev[:, None], pos[:, None], cache,
                                config, return_logits="top1",
                                top1_mask=mask[0] if mask else None,
                                top1_need_prob=need_prob,
                            )
                            tok = tok.astype(jnp.int32)
                            return (tok, pos + 1, cache), (tok, prob)
                        # Sampled decode: fused top-k head selects the k
                        # candidates in-kernel; the categorical draw runs
                        # on the tiny [B, k] result.
                        (vals, idxs), cache = fwd(
                            params, prev[:, None], pos[:, None], cache,
                            config, return_logits="topk", top_k_n=top_k,
                            top1_mask=mask[0] if mask else None,
                        )
                        keys = jax.vmap(
                            lambda qi, p: sample_key(seed, qi, p)
                        )(jnp.arange(batch), pos + 1)
                        tok, prob = sampling.sample_from_topk(
                            vals, idxs, keys, temperature)
                        tok = tok.astype(jnp.int32)
                        return (tok, pos + 1, cache), (tok, prob)

                    (prev, pos, cache), (toks, probs) = jax.lax.scan(
                        body, (prev, pos, cache), None, length=k)
                    return toks.T, probs.T, cache

                return run

            run = make_run(forward)
            sparams = self.scan_params
            if sparams is not None:
                from gemma_tpu.engine.scan_decode import forward_scan

                scan_run = make_run(forward_scan)
                base_run = run

                def run(params, prev, pos, cache, seed, *mask):
                    try:
                        return scan_run(sparams, prev, pos, cache, seed,
                                        *mask)
                    except AssertionError:
                        return base_run(params, prev, pos, cache, seed,
                                        *mask)

            self._decode_chunk_fns[key] = run
        return self._decode_chunk_fns[key]

    # --- public API ---

    def prefill_chunk(self, batch: int, max_len: int | None = None) -> int:
        """The prefill chunk this engine will use for a `batch`-query call.

        Explicit runtime.prefill_tbatch_size (> 0) wins.  Auto (0) applies
        the measured winners (docs/PERF.md §5: 1024 tok at batch 1 —
        26,320 vs 21,429 tok/s at 256 — and 512 at batch >= 2, +8.7% at
        b4), capped to the next power of two >= the prompt length (the
        step pads [batch, chunk], so an oversized chunk wastes MXU rows
        on short prompts; the cap also bounds the jit-signature count).
        """
        chunk = self.runtime.prefill_tbatch_size
        if chunk <= 0:
            chunk = 1024 if batch == 1 else 512
            if max_len is not None and max_len < chunk:
                chunk = max(64, 1 << (max_len - 1).bit_length())
        return chunk

    def new_cache(self, batch: int, seq_len: int | None = None,
                  min_local_slack: int = 0) -> KVCache:
        """Create a cache sized for this engine's prefill chunks.

        Local rings get slack >= the largest prefill chunk the engine can
        issue; prefix-LM prompts (PaliGemma) widen the chunk to prefix_end,
        so callers that know it pass `min_local_slack`.  When the needed
        slack leaves no room to split, KVCache.create degenerates to the
        single full-length pool (correct, just larger).  PALIGEMMA-wrapped
        models never split: their prefix (image + text) is unbounded and
        must land in one chunk (run.cc:199-206).
        """
        from gemma_tpu.models.configs import PromptWrapping
        from gemma_tpu.models.kv_cache import LOCAL_RING_SLACK

        slack = max(LOCAL_RING_SLACK, self.prefill_chunk(batch),
                    min_local_slack)
        split = self.config.wrapping != PromptWrapping.PALIGEMMA
        cache = KVCache.create(self.config, batch,
                               seq_len or self.runtime.seq_len,
                               split_local=split, local_slack=slack,
                               kind=self.runtime.kv_kind)
        if self.mesh is not None:
            from gemma_tpu.parallel import shard_cache

            cache = shard_cache(cache, self.mesh)
        return cache

    def prefill(
        self,
        prompts: Sequence[Sequence[int]],
        cache: KVCache,
        start_pos: Sequence[int] | None = None,
        prefix_end: Sequence[int] | None = None,
        stream_token: StreamFunc | None = None,
        image_embeddings=None,
    ) -> tuple[KVCache, list[int]]:
        """Prefill all but the last prompt token; returns (cache, last tokens).

        Token-parallel across queries AND chunked within each prompt: round
        j prefills tokens [j*C, (j+1)*C) of every query simultaneously with
        per-slot valid masks, so ragged batches take ceil(max_len/C) steps
        instead of sum(ceil(len/C)) — the PrefillQBatch/PrefillTBatch hybrid
        (gemma.cc:188-283, 526-534).

        image_embeddings: [n_img, model_dim] ImageTokens; spliced into the
        embedding stream at -2 placeholders (Gemma3 VLM) or at positions
        < n_img (PaliGemma prefix) — EmbedMMToken, gemma.cc:144-157.
        """
        from gemma_tpu.models.configs import PromptWrapping

        batch = len(prompts)
        start_pos = list(start_pos or [0] * batch)
        prefix_end = list(prefix_end or [0] * batch)
        chunk_size = self.prefill_chunk(
            batch, max(len(p) for p in prompts))
        if self.runtime.prefill_tbatch_size <= 0 and cache.kv_local is not None:
            # Auto mode bends to a caller-provided cache's smaller local
            # ring slack (the chunk is a tuning knob, not a correctness
            # contract; engine-created caches size slack to the auto
            # winner via new_cache).
            chunk_size = min(chunk_size, cache.local_slack)
        if any(pe > 0 for pe in prefix_end):
            # Prefix-LM queries attend FORWARD within the prefix, so every
            # prefix row must be written in the same chunk (the reference
            # sets prefill_tbatch_size = prompt_size, run.cc:199-206).
            chunk_size = max(chunk_size, max(prefix_end))
        if cache.kv_local is not None and chunk_size > cache.local_slack:
            raise ValueError(
                f"prefill_tbatch_size {chunk_size} exceeds the local KV "
                f"ring slack {cache.local_slack}; create the cache with "
                f"local_slack >= the chunk size (or split_local=False)")

        img = None
        if image_embeddings is not None:
            img = jnp.asarray(image_embeddings, jnp.float32)
        is_pali = self.config.wrapping == PromptWrapping.PALIGEMMA

        prompts = [list(p) for p in prompts]
        last_tokens = [int(p[-1]) for p in prompts]
        n_prefill = []
        img_rows = []
        for qi, prompt in enumerate(prompts):
            assert prompt, "prompts must be non-empty"
            # Map prompt position -> image row (or -1).  -2 placeholders are
            # replaced by token 0 for the (masked-out) embedding lookup.
            rows = [-1] * len(prompt)
            if img is not None:
                n_img = img.shape[0]
                seen = 0
                for i, t in enumerate(prompt):
                    if t == -2:
                        rows[i] = seen
                        seen += 1
                        prompt[i] = 0
                    elif is_pali and start_pos[qi] + i < n_img:
                        rows[i] = start_pos[qi] + i
            img_rows.append(rows)
            # Attend to the last token too when it is inside the prefix
            # (gemma.cc:219-232).
            n = len(prompt) - 1
            if n < prefix_end[qi]:
                n += 1
            n_prefill.append(n)

        pe = jnp.asarray(prefix_end, jnp.int32)
        rounds = (max(n_prefill) + chunk_size - 1) // chunk_size
        for j in range(rounds):
            lo = j * chunk_size
            tokens = np.zeros((batch, chunk_size), np.int32)
            positions = np.zeros((batch, chunk_size), np.int32)
            valid = np.zeros((batch, chunk_size), bool)
            rows = np.zeros((batch, chunk_size), np.int32)
            mask = np.zeros((batch, chunk_size), bool)
            with_image = False
            for qi, prompt in enumerate(prompts):
                n = min(chunk_size, n_prefill[qi] - lo)
                if n <= 0:
                    continue
                tokens[qi, :n] = prompt[lo : lo + n]
                positions[qi] = np.arange(
                    start_pos[qi] + lo, start_pos[qi] + lo + chunk_size)
                valid[qi, :n] = True
                for i in range(n):
                    r = img_rows[qi][lo + i]
                    if r >= 0:
                        rows[qi, i] = r
                        mask[qi, i] = True
                        with_image = True
            args = [self.params, jnp.asarray(tokens), jnp.asarray(positions),
                    jnp.asarray(valid), pe, cache]
            if with_image:
                args += [img[jnp.asarray(rows)], jnp.asarray(mask)]
            step = self._prefill_fn(batch, chunk_size, with_image)
            cache = step(*args)
            if stream_token is not None:
                for qi, prompt in enumerate(prompts):
                    n = min(chunk_size, n_prefill[qi] - lo)
                    for i in range(max(n, 0)):
                        if lo + i < len(prompt) - 1:
                            stream_token(qi, start_pos[qi] + lo + i,
                                         int(tokens[qi, i]), 0.0)
        return cache, last_tokens

    def generate(
        self,
        prompt: Sequence[int],
        max_generated_tokens: int | None = None,
        stream_token: StreamFunc | None = None,
        accept_token: AcceptFunc | None = None,
        allowed_tokens: Sequence[int] | None = None,
        cache: KVCache | None = None,
        start_pos: int = 0,
        prefix_end: int = 0,
        timing_info: TimingInfo | None = None,
        image_embeddings=None,
    ) -> list[int]:
        """Single-query generation (Gemma::Generate, gemma.cc:663-674)."""
        outs = self.generate_batch(
            [prompt],
            max_generated_tokens=max_generated_tokens,
            stream_token=stream_token,
            accept_token=accept_token,
            allowed_tokens=allowed_tokens,
            cache=cache,
            start_pos=[start_pos],
            prefix_end=[prefix_end],
            timing_info=timing_info,
            image_embeddings=image_embeddings,
        )
        return outs[0]

    def generate_batch(
        self,
        prompts: Sequence[Sequence[int]],
        max_generated_tokens: int | None = None,
        stream_token: StreamFunc | None = None,
        accept_token: AcceptFunc | None = None,
        allowed_tokens: Sequence[int] | None = None,
        cache: KVCache | None = None,
        start_pos: Sequence[int] | None = None,
        prefix_end: Sequence[int] | None = None,
        timing_info: TimingInfo | None = None,
        image_embeddings=None,
    ) -> list[list[int]]:
        """Batched generation with EOS tracking (GenerateT, gemma.cc:488-568)."""
        rt = self.runtime
        batch = len(prompts)
        max_gen = max_generated_tokens or rt.max_generated_tokens
        timing = timing_info or TimingInfo(verbosity=0)
        timing.prefill_start = time.monotonic()

        start_pos = list(start_pos or [0] * batch)
        prefix_end = list(prefix_end or [0] * batch)
        user_cache = cache
        if cache is None:
            # Prefix-LM prompts widen the prefill chunk to prefix_end; size
            # the local rings (or fall back to one pool) accordingly.
            cache = self.new_cache(batch, min_local_slack=max(prefix_end))

        allowed_mask = None
        if allowed_tokens is not None:
            # Vectorized TokenSet constraint (run_mmlu): one [V] bool mask
            # applied to logits on device — no per-token Python callbacks.
            m = np.zeros((self.config.vocab_size,), bool)
            m[np.asarray(sorted(allowed_tokens), np.int64)] = True
            allowed_mask = jnp.asarray(m)

        cache_box = [cache]
        try:
            return self._generate_loop(
                prompts, cache_box, start_pos, prefix_end, stream_token,
                accept_token, max_gen, timing, image_embeddings,
                allowed_mask)
        finally:
            timing.notify_generate_done()
            if user_cache is not None and cache_box[0] is not user_cache:
                # Rebind even when an exception / KeyboardInterrupt fires
                # mid-loop, so a caller-held conversation cache tracks the
                # newest buffers instead of donated (deleted) ones.  An
                # exception *inside* a jitted step can still leave the last
                # buffers consumed; callers should then discard the
                # conversation (the reference mutates KVCache in place and
                # has no such window, ADVICE r1).
                user_cache.assign(cache_box[0])

    def _generate_loop(self, prompts, cache_box, start_pos, prefix_end,
                       stream_token, accept_token, max_gen, timing,
                       image_embeddings, allowed_mask=None):
        rt = self.runtime
        batch = len(prompts)
        cache = cache_box[0]
        with profiler.zone("Gen.Prefill"):
            cache, last_tokens = self.prefill(
                prompts, cache, start_pos, prefix_end, stream_token,
                image_embeddings=image_embeddings)
        cache_box[0] = cache
        timing.notify_prefill(sum(len(p) - 1 for p in prompts))

        # Stream the last prompt token (gemma.cc:540-554).
        non_eos = [True] * batch
        pos = [start_pos[qi] + len(prompts[qi]) - 1 for qi in range(batch)]
        for qi in range(batch):
            tok = last_tokens[qi]
            if stream_token is not None:
                if not stream_token(qi, pos[qi], tok, 0.0):
                    non_eos[qi] = False

        outputs: list[list[int]] = [[] for _ in range(batch)]
        prev = np.asarray(last_tokens, np.int32)
        timing.generate_start = time.monotonic()

        # Chunked decode (device-side sampling loop) when the host cannot
        # influence tokens mid-chunk; accept_token takes the one-step path.
        # stream_token still fires per token, in bursts.  Mesh mode chunks
        # too: the whole scan runs inside one shard_map program
        # (parallel/tp.py:build_tp_decode_chunk).
        chunk = max(1, rt.decode_chunk)
        if accept_token is not None:
            chunk = 1

        done = 0
        while done < max_gen and any(non_eos):
            k = min(chunk, max_gen - done)
            positions = np.asarray(pos, np.int32)
            if k == 1:
                with profiler.zone("Gen.Decode"):
                    logits, cache = self._decode_fn(batch)(
                        self.params, jnp.asarray(prev[:, None]),
                        jnp.asarray(positions[:, None]), cache)
                cache_box[0] = cache
                with profiler.zone("Gen.Sample"):
                    tokens, probs = self._sample(logits, pos, accept_token,
                                                 allowed_mask)
                tokens, probs = tokens[:, None], np.asarray(probs)[:, None]
            else:
                run = self._decode_chunk_fn(batch, k,
                                            allowed_mask is not None)
                mask_args = () if allowed_mask is None else (allowed_mask,)
                with profiler.zone("Gen.DecodeChunk"):
                    toks, prb, cache = run(
                        self.params, jnp.asarray(prev),
                        jnp.asarray(positions), cache, rt.seed, *mask_args)
                cache_box[0] = cache
                tokens, probs = np.asarray(toks), np.asarray(prb)
            for i in range(k):
                if not any(non_eos):
                    break
                timing.notify_generated(sum(non_eos))
                for qi in range(batch):
                    if not non_eos[qi]:
                        continue
                    tok, prob = int(tokens[qi, i]), float(probs[qi, i])
                    if stream_token is not None:
                        if not stream_token(qi, pos[qi] + 1, tok, prob):
                            tok = self.config.eos_id
                    outputs[qi].append(tok)
                    prev[qi] = tok
                    pos[qi] += 1
                    if self.config.is_eos(tok):
                        non_eos[qi] = False
            done += k
        return outputs

    def _sample(self, logits: jnp.ndarray, pos: list[int],
                accept_token: AcceptFunc | None,
                allowed_mask: jnp.ndarray | None = None):
        rt = self.runtime
        if allowed_mask is not None:
            # Vectorized allowed-set constraint: mask once on device, then
            # the standard samplers run unchanged (the TokenSet fast path of
            # run_mmlu; equivalent to TopK-with-accept_token because top-k
            # of masked logits == top-k of accepted tokens).
            logits = jnp.where(allowed_mask, logits, sampling.NEG_INF)
        if accept_token is not None:
            # Candidate-restricted constraint evaluation: the reference
            # calls accept_token per token inside TopK (ops-inl.h:1336-1362)
            # — cheap in-process C++; a Python callback over a 256K vocab is
            # not.  Evaluate only the top candidates, widening on rejection;
            # the result is identical because only the top-k *accepted*
            # tokens can ever be sampled.
            arr = np.asarray(logits, np.float32)
            bsz, vocab = arr.shape
            k = max(1, rt.top_k)
            out_t = np.zeros(bsz, np.int32)
            out_p = np.zeros(bsz, np.float32)
            for qi in range(bsz):
                row = arr[qi]
                cand = min(vocab, max(64, 8 * k))
                while True:
                    part = np.argpartition(row, -cand)[-cand:]
                    order = part[np.argsort(row[part])[::-1]]
                    accepted = [int(t) for t in order
                                if accept_token(int(t), float(row[t]))]
                    if len(accepted) >= k or cand == vocab:
                        break
                    cand = min(vocab, cand * 8)
                if not accepted:
                    # Nothing accepted anywhere (the reference would read
                    # uninitialized memory here): fall back to argmax.
                    accepted = [int(order[0])]
                accepted = accepted[:k]
                # FusedSoftmaxAndSampleTopK semantics (ops-inl.h:1375-1398):
                # softmax over the top-k accepted logits only.
                lg = row[accepted]
                e = np.exp(lg - lg.max())
                probs = e / e.sum()
                if k == 1 or rt.temperature == 0.0:
                    j = 0  # accepted is sorted by logit, descending
                else:
                    p = probs ** (1.0 / rt.temperature)
                    p /= p.sum()
                    key = sample_key(rt.seed, qi, pos[qi] + 1)
                    u = float(jax.random.uniform(key))
                    j = min(int(np.searchsorted(np.cumsum(p), u)),
                            len(accepted) - 1)
                out_t[qi] = accepted[j]
                out_p[qi] = float(probs[j])
            return out_t, out_p

        if rt.top_k == 1:
            tokens, probs = sampling.top1(logits)
            return np.asarray(tokens), np.asarray(probs)
        keys = jnp.stack(
            [sample_key(rt.seed, qi, pos[qi] + 1) for qi in range(logits.shape[0])]
        )
        sampler = sampling.make_sampler(rt.top_k, rt.temperature)
        tokens, probs = sampler(logits, keys)
        return np.asarray(tokens), np.asarray(probs)

    # --- fused benchmark loop ---

    def generate_fast(self, prompts: Sequence[Sequence[int]],
                      max_steps: int) -> np.ndarray:
        """Greedy decode with the whole loop inside one jit (lax.scan).

        Returns [batch, max_steps] tokens; no EOS early-exit or streaming --
        this is the throughput path for benchmarks.
        """
        batch = len(prompts)
        cache = self.new_cache(batch)
        cache, last_tokens = self.prefill(prompts, cache)
        pos0 = np.asarray([len(p) - 1 for p in prompts], np.int32)
        if self.mesh is not None:
            # Whole greedy loop in one sharded executable (VERDICT r1 #3:
            # mesh decode amortizes dispatch exactly like single-chip).
            from gemma_tpu.parallel import build_tp_decode_chunk

            mkey = ("mesh", batch, max_steps)
            if mkey not in self._generate_fns:
                self._generate_fns[mkey] = build_tp_decode_chunk(
                    self.params, self.config, self.mesh, max_steps,
                    top_k=1, temperature=0.0)
            toks, _, _ = self._generate_fns[mkey](
                self.params, jnp.asarray(last_tokens, jnp.int32),
                jnp.asarray(pos0), cache, jnp.int32(0))
            return np.asarray(toks)
        key = (batch, max_steps)
        if key not in self._generate_fns:
            config = self.config

            def make_run(fwd):
                @jax.jit
                def run(params, prev, pos, cache):
                    def body(carry, _):
                        prev, pos, cache = carry
                        (tok, _), cache = fwd(
                            params, prev[:, None], pos[:, None], cache,
                            config, return_logits="top1",
                        )
                        tok = tok.astype(jnp.int32)
                        return (tok, pos + 1, cache), tok

                    (_, _, cache), tokens = jax.lax.scan(
                        body, (prev, pos, cache), None, length=max_steps
                    )
                    return tokens.T, cache

                return run

            run = make_run(forward)
            sparams = self.scan_params
            if sparams is not None:
                from gemma_tpu.engine.scan_decode import forward_scan

                scan_run = make_run(forward_scan)
                base_run = run

                def run(params, prev, pos, cache):
                    try:
                        return scan_run(sparams, prev, pos, cache)
                    except AssertionError:
                        return base_run(params, prev, pos, cache)

            self._generate_fns[key] = run
        tokens, _ = self._generate_fns[key](
            self.params, jnp.asarray(last_tokens, jnp.int32),
            jnp.asarray(pos0), cache,
        )
        return np.asarray(tokens)

"""gemma_tpu: a TPU-native quantized inference engine with the capabilities of
google/gemma.cpp, built from scratch on JAX/XLA/Pallas.

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):

  frontends/   CLI REPL, Gemini-compatible HTTP server, Python API
  engine/      generation engine: chunked prefill, batched decode, streaming
  models/      model configs, weights loading, transformer forward, tokenizer
  ops/         Pallas/XLA kernels: dequant-fused matmul, flash attention, ops
  compression/ SFP8 / NUQ4 / I8 / BF16 weight codecs (gemma.cpp formats)
  io/          .sbs blob store + fields-compatible serialization
  parallel/    jax.sharding mesh + tensor-parallel layouts over ICI/DCN
  paligemma/   image preprocessing for the SigLIP ViT encoder
  evals/       cross-entropy, benchmarks, MMLU
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (the TPU-side analog of
    the reference's autotune persistence: 'second and especially third
    query faster', README.md:337 — but for compile time, which dominates
    startup on tunneled backends).  Opt out: GEMMA_TPU_NO_COMPILE_CACHE=1.
    """
    import os

    if os.environ.get("GEMMA_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/gemma_tpu/xla"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


_enable_compilation_cache()

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

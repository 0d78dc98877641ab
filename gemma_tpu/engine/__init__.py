from gemma_tpu.engine.engine import GemmaEngine, RuntimeConfig, TimingInfo  # noqa: F401

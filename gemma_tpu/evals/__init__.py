"""Evals & benchmarks (maps evals/ — SURVEY.md §2.6)."""

from gemma_tpu.evals.cross_entropy import compute_cross_entropy
from gemma_tpu.evals.benchmark_helper import GemmaEnv

__all__ = ["compute_cross_entropy", "GemmaEnv"]

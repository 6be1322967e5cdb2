"""Operator surface: reference-parity pipelines (WordCount) and the
LLM-data-pipeline extensions (dedup, similarity, text analysis, multimodal)."""

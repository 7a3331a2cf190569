"""Operators: parse/serialize projections (reference parity) and the
LLM-data-pipeline operator suite (dedup, similarity, text, multimodal)."""

"""LLM-data-pipeline operator library (dedup, similarity, text, multimodal)."""

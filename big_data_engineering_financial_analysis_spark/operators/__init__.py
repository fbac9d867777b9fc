"""Dataset-level operators: windows, dedup family, similarity, multimodal."""

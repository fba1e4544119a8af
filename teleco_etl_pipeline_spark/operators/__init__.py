"""Engine operators: surrogate keys, keyed upsert/merge, dedup family,
similarity search, text analysis, multimodal column plumbing."""

"""DataFrame-level operators: flattening, merge patterns, dedup,
similarity search, text analysis, multimodal column plumbing."""

"""Beyond-reference operators: Tier-2 bounded-memory sketch, dedup,
similarity search, text analysis, multimodal column plumbing."""

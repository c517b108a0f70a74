"""Data sources: parquet star-schema loaders and CSV schema helpers."""

"""Sources/sinks layer (SURVEY.md §2.1): CSV ingestion with
schema-narrowing + key-minting, Parquet artifact IO, OOF artifact
scans, JSON manifests, and config parsing."""

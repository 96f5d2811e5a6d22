"""Sources/sinks: parquet/CSV table readers, feature-matrix extraction
views, and model persistence helpers."""

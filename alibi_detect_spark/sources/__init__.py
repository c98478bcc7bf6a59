"""Table IO layer: parquet-backed tier catalog with an Iceberg-shaped API."""

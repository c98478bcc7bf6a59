"""Job planning: lineage, checkpoint/resume, metrics."""

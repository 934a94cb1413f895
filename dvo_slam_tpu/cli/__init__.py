"""Command-line drivers: batch benchmark (dvo_benchmark replacement)."""

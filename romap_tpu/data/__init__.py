"""Dataset formats (reference-compatible), device frame store, synthetic data."""

"""Cross-cutting utilities (logging, config, checkpoint port)."""

"""Scalar functions: text normalization, HTML extraction, tag schemes."""

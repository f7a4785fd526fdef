"""Composite operators: dedup, similarity search, multimodal plumbing,
reference-parity playstore parts."""

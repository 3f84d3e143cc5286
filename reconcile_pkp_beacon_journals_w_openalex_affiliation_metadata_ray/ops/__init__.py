"""Generic reusable Ray Data operators: relational, dedup, text
analysis, similarity search, multimodal plumbing."""

"""Input readers + deterministic fixture synthesis."""

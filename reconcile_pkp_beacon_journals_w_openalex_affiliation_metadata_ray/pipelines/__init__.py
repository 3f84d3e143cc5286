"""End-to-end pipelines wiring the stages together."""

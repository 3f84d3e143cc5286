"""Checkpoint / lineage manifests + resume."""

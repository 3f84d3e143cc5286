"""Linkage pipeline stages: extract -> block -> score -> cluster -> stats."""

"""Marginalization (placeholder — implemented after GN solver)."""

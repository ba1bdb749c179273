"""Shared small utilities (shape helpers, pytree helpers)."""

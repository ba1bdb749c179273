"""Core runtime: environment setup, model bases, train/eval/predict drivers,
optimizer factory, checkpointing.

Parity tier for the reference's top-level ``core_*.py`` + ``modelhelper.py``.
"""

"""Convergence-data helpers (name parity with ``adorym/visualization.py``)."""

from .io.output import parse_loss_data  # noqa: F401

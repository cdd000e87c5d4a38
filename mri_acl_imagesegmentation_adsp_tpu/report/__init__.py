"""Run reporting."""

from .exporter import export_run_report

__all__ = ["export_run_report"]

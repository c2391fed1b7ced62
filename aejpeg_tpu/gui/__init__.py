"""Tkinter GUI: interactive codec explorer.

Mirrors the reference GUI surface (reference: src/gui/__init__.py:20-24 —
JpegApp / ControlPanel / PreviewPanel / RangeSlider) on the TPU-native
codec. Import is display-free; only ``main()`` needs an X server.
"""

from .app import AejpegApp, main, plan_batches
from .control_panel import ControlPanel, PanelState
from .preview_panel import PreviewPanel, default_metrics_line
from .range_slider import RangeModel, RangeSlider

__all__ = [
    "AejpegApp", "main", "plan_batches", "ControlPanel", "PanelState",
    "PreviewPanel", "default_metrics_line", "RangeModel", "RangeSlider",
]

"""Headless analysis/plotting tooling over the per-frame telemetry CSV.

Parity targets: `zenslam_py/scripts/{plot_timing_breakdown,
plot_feature_metrics,plot_detector_comparison}.py` — the reference's
matplotlib dashboards over its 50-column frame CSV, rebuilt over this repo's
telemetry schema (`zenslam_tpu/io/telemetry.py`).
"""

from zenslam_tpu.analysis.style import PALETTE, apply_style
from zenslam_tpu.analysis.plot_timing_breakdown import main as plot_timing_breakdown
from zenslam_tpu.analysis.plot_feature_metrics import main as plot_feature_metrics
from zenslam_tpu.analysis.plot_detector_comparison import main as plot_detector_comparison

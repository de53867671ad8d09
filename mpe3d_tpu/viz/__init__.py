"""Visualization: headless 3D skeleton rendering, interactive HTML export,
and the live HTTP/SSE streaming viewer."""

from mpe3d_tpu.viz.html_viewer import write_html_viewer  # noqa: F401
from mpe3d_tpu.viz.live_viewer import LiveViewerServer  # noqa: F401
from mpe3d_tpu.viz.viewer import remap_axes, render_frame, render_sequence  # noqa: F401

"""Visualization: headless 3D skeleton rendering."""

from mpe3d_tpu.viz.viewer import remap_axes, render_frame, render_sequence  # noqa: F401

"""Visualization (reference: src/cupoch/visualization/ — host-side
viewer bridge per SURVEY.md §2.10; the GL/CUDA interop renderer is
replaced by offscreen matplotlib rendering fed by device→host
transfers, with the same public API)."""
from .color_map import (
    ColorMapOption,
    get_color_map_color,
    get_global_color_map_option,
    set_global_color_map_option,
)
from .render_option import (
    MeshColorOption,
    MeshShadeOption,
    PointColorOption,
    RenderOption,
    ViewControl,
)
from .view_trajectory import (
    ViewParameters,
    ViewTrajectory,
    read_view_trajectory,
    write_view_trajectory,
)
from .html_viewer import export_html_viewer
from .visualizer import Visualizer, draw_geometries

__all__ = [
    "ViewParameters",
    "ViewTrajectory",
    "read_view_trajectory",
    "write_view_trajectory",
    "ColorMapOption",
    "get_color_map_color",
    "get_global_color_map_option",
    "set_global_color_map_option",
    "RenderOption",
    "ViewControl",
    "PointColorOption",
    "MeshShadeOption",
    "MeshColorOption",
    "Visualizer",
    "draw_geometries",
    "export_html_viewer",
]

"""Host-side visualizer
(reference: src/cupoch/visualization/visualizer/visualizer.h:113-142 +
draw_geometry.cpp DrawGeometries).

The reference renders with CUDA-GL interop (simple_shader.cu:367-388);
on TPU there is no GL interop path, so per SURVEY.md §2.10 the API is
kept (`Visualizer`, `draw_geometries`) but rendering happens host-side
via matplotlib after one device→host transfer per geometry. Headless
environments render offscreen; `capture_screen_image` / the
`filename=` argument save PNGs.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..utility import console
from .render_option import RenderOption, ViewControl

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as _plt

    _HAS_MPL = True
except ImportError:  # pragma: no cover
    _HAS_MPL = False


def _geometry_arrays(g):
    """(points, colors, lines) host arrays for any supported geometry."""
    from ..geometry import (
        Graph,
        LineSet,
        OccupancyGrid,
        PointCloud,
        TriangleMesh,
        VoxelGrid,
    )

    if isinstance(g, PointCloud):
        pts = np.asarray(g.points)
        cols = np.asarray(g.colors) if g.has_colors() else None
        return pts, cols, None
    if isinstance(g, TriangleMesh):
        pts = np.asarray(g.vertices)
        cols = (np.asarray(g.vertex_colors)
                if g.has_vertex_colors() else None)
        tris = np.asarray(g.triangles)
        lines = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                                tris[:, [2, 0]]]) if len(tris) else None
        return pts, cols, lines
    if isinstance(g, (LineSet, Graph)):
        pts = np.asarray(g.points)
        lines = np.asarray(g.lines)
        cols = np.asarray(g.colors) if g.has_colors() else None
        return pts, cols, lines
    if isinstance(g, VoxelGrid):
        centers = np.asarray(g.get_voxel_centers())
        colors = np.asarray(g.voxels_colors)
        return centers, colors if colors.shape[0] else None, None
    if isinstance(g, OccupancyGrid):
        from ..geometry.pointcloud_factory import create_from_occupancy_grid

        pcd = create_from_occupancy_grid(g)
        return np.asarray(pcd.points), None, None
    # fall back to anything with .points
    pts = getattr(g, "points", None)
    if pts is not None:
        return np.asarray(pts), None, None
    console.log_warning("[Visualizer] Unsupported geometry type %s",
                        type(g).__name__)
    return np.zeros((0, 3), np.float32), None, None


class Visualizer:
    """reference: visualizer.h — add/update geometry + render loop;
    here the loop is a single host-side render."""

    def __init__(self):
        self._geometries: List[object] = []
        self.render_option = RenderOption()
        self.view_control = ViewControl()
        self._window_name = "cupoch_tpu"
        self._fig = None

    def create_window(self, window_name: str = "cupoch_tpu",
                      width: int = 1024, height: int = 768,
                      left: int = 50, top: int = 50,
                      visible: bool = True) -> bool:
        self._window_name = window_name
        self._size = (width, height)
        return True

    def destroy_window(self):
        if self._fig is not None and _HAS_MPL:
            _plt.close(self._fig)
            self._fig = None

    def add_geometry(self, geometry) -> bool:
        self._geometries.append(geometry)
        return True

    def update_geometry(self, geometry=None) -> bool:
        return True  # host arrays are re-read at render time

    def clear_geometries(self) -> bool:
        self._geometries = []
        return True

    def get_render_option(self) -> RenderOption:
        return self.render_option

    def get_view_control(self) -> ViewControl:
        return self.view_control

    def _render(self):
        if not _HAS_MPL:
            console.log_error("[Visualizer] matplotlib is not available "
                              "for host-side rendering.")
        opt = self.render_option
        fig = _plt.figure(
            figsize=(self._size[0] / 100, self._size[1] / 100)
            if hasattr(self, "_size") else (10, 7.5))
        ax = fig.add_subplot(111, projection="3d")
        ax.set_facecolor(tuple(opt.background_color))
        for g in self._geometries:
            pts, cols, lines = _geometry_arrays(g)
            if pts.shape[0] == 0:
                continue
            # subsample very large clouds for the host plot
            if pts.shape[0] > 200000:
                sel = np.random.default_rng(0).choice(
                    pts.shape[0], 200000, replace=False)
                pts_p = pts[sel]
                cols_p = cols[sel] if cols is not None else None
            else:
                pts_p, cols_p = pts, cols
            ax.scatter(pts_p[:, 0], pts_p[:, 1], pts_p[:, 2],
                       s=opt.point_size * 0.2,
                       c=np.clip(cols_p, 0, 1) if cols_p is not None
                       else None)
            if lines is not None and len(lines):
                from mpl_toolkits.mplot3d.art3d import Line3DCollection

                segs = pts[np.asarray(lines)]  # [E, 2, 3], one batch
                ax.add_collection3d(Line3DCollection(
                    segs, linewidths=opt.line_width * 0.5))
        ax.set_box_aspect((1, 1, 1))
        self._fig = fig
        return fig

    def run(self):
        """Render once (the reference's interactive loop needs a
        display; offscreen this produces the figure for capture)."""
        self._render()

    def poll_events(self) -> bool:
        return False  # headless: no event loop

    def update_renderer(self):
        pass

    def capture_screen_image(self, filename: str, do_render: bool = True
                             ) -> bool:
        if do_render or self._fig is None:
            self._render()
        self._fig.savefig(filename, dpi=100)
        return True


def draw_geometries(geometry_list, window_name: str = "cupoch_tpu",
                    width: int = 1024, height: int = 768,
                    left: int = 50, top: int = 50,
                    filename: Optional[str] = None) -> bool:
    """reference: DrawGeometries (draw_geometry.cpp). With `filename`
    the frame is written to disk (headless mode); otherwise a window is
    attempted via matplotlib."""
    vis = Visualizer()
    vis.create_window(window_name, width, height, left, top)
    for g in geometry_list:
        vis.add_geometry(g)
    if filename is not None:
        ok = vis.capture_screen_image(filename)
        vis.destroy_window()
        return ok
    vis.run()
    vis.destroy_window()
    return True

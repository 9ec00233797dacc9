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
        if cols is None:
            cols = g.sample_texture_vertex_colors()
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


def _render_projected(geometries, view, width: int, height: int,
                      render_option: Optional[RenderOption] = None,
                      filename: Optional[str] = None):
    """Render through the ViewControl's pinhole camera: project every
    point with the reference-parity extrinsic/intrinsic
    (view_control.cpp:115-157) and depth-sort — the camera math, not
    matplotlib's axes, decides the image."""
    if not _HAS_MPL:
        console.log_error("[Visualizer] matplotlib is not available "
                          "for host-side rendering.")
    opt = render_option or RenderOption()
    view.change_window_size(width, height)
    params = view.convert_to_pinhole_camera_parameters()
    if params is None:
        console.log_warning("[Visualizer] cannot render an orthogonal "
                            "view through the pinhole path.")
        return None
    K = np.asarray(params.intrinsic.intrinsic_matrix, np.float64)
    E = np.asarray(params.extrinsic, np.float64)
    fig = _plt.figure(figsize=(width / 100, height / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_facecolor(tuple(opt.background_color))
    ax.set_xlim(0, width)
    ax.set_ylim(height, 0)
    ax.axis("off")
    for g in geometries:
        pts, cols, lines = _geometry_arrays(g)
        if pts.shape[0] == 0:
            continue
        if pts.shape[0] > 200000:
            sel = np.random.default_rng(0).choice(
                pts.shape[0], 200000, replace=False)
            pts = pts[sel]
            cols = cols[sel] if cols is not None else None
            lines = None
        cam = pts @ E[:3, :3].T + E[:3, 3]
        z = cam[:, 2]
        vis_m = z > 1e-6
        uv = (cam[:, :2] / np.maximum(z[:, None], 1e-6)) \
            * K[[0, 1], [0, 1]] + K[[0, 1], [2, 2]]
        order = np.argsort(-z[vis_m])
        uvo = uv[vis_m][order]
        c = None
        if cols is not None:
            c = np.clip(cols[vis_m][order], 0, 1)
        ax.scatter(uvo[:, 0], uvo[:, 1], s=opt.point_size * 0.2, c=c)
        if lines is not None and len(lines):
            from matplotlib.collections import LineCollection

            both = vis_m[lines].all(-1)
            segs = uv[lines[both]]
            ax.add_collection(LineCollection(
                segs, linewidths=opt.line_width * 0.5))
    if filename is not None:
        fig.savefig(filename, dpi=100)
        _plt.close(fig)
        return None
    return fig


def play_view_trajectory(geometry_list, trajectory,
                         filename_pattern: str = "frame_%05d.png",
                         width: int = 1024, height: int = 768,
                         render_option: Optional[RenderOption] = None
                         ) -> List[str]:
    """Trajectory playback: render each interpolated camera frame
    (view_trajectory.cpp:110-126) to a PNG via the pinhole projection
    path. Returns the written file paths (an MP4 can be assembled with
    any encoder)."""
    view = ViewControl()
    written: List[str] = []
    n = trajectory.num_of_frames()
    for k in range(n):
        ok, status = trajectory.get_interpolated_frame(k)
        if not ok:
            break
        view.convert_from_view_parameters(status)
        path = filename_pattern % k if "%" in filename_pattern \
            else filename_pattern
        _render_projected(geometry_list, view, width, height,
                          render_option, filename=path)
        written.append(path)
    return written


def draw_geometries(geometry_list, window_name: str = "cupoch_tpu",
                    width: int = 1024, height: int = 768,
                    left: int = 50, top: int = 50,
                    filename: Optional[str] = None,
                    trajectory=None) -> bool:
    """reference: DrawGeometries (draw_geometry.cpp) +
    DrawGeometriesWithCustomAnimation (camera trajectory playback).
    With `filename` one frame is written to disk (headless mode); with
    `trajectory` (a ViewTrajectory) a frame sequence is written using
    `filename` as the %-pattern (default frame_%05d.png)."""
    if trajectory is not None:
        pattern = filename or "frame_%05d.png"
        return len(play_view_trajectory(
            geometry_list, trajectory, pattern, width, height)) > 0
    if filename is not None and filename.endswith(".html"):
        # navigable single-file viewer (orbit/zoom/pan in any
        # browser, no network needed) — the headless counterpart of
        # the reference's GLFW window (visualizer.cpp:256-299)
        from .html_viewer import export_html_viewer

        return export_html_viewer(geometry_list, filename,
                                  window_name=window_name)
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

"""Render / view options with JSON round-trip
(reference: src/cupoch/visualization/visualizer/render_option.h +
view_control.h + view_trajectory.h; serialisation via
IJsonConvertible, file_json.cpp).

The TPU build renders host-side (SURVEY.md §2.10), so these classes
carry the same state the reference persists to JSON — compatible with
cupoch/Open3D render-option files — without any GL coupling.
"""
from __future__ import annotations

import enum
from typing import List

import numpy as np


class PointColorOption(enum.IntEnum):
    """reference: render_option.h:50-57."""

    Default = 0
    Color = 1
    XCoordinate = 2
    YCoordinate = 3
    ZCoordinate = 4
    Normal = 9


class MeshShadeOption(enum.IntEnum):
    FlatShade = 0
    SmoothShade = 1


class MeshColorOption(enum.IntEnum):
    Default = 0
    Color = 1
    XCoordinate = 2
    YCoordinate = 3
    ZCoordinate = 4
    Normal = 9


class RenderOption:
    """reference: render_option.h (GL-independent subset)."""

    POINT_SIZE_DEFAULT = 5.0
    LINE_WIDTH_DEFAULT = 1.0

    def __init__(self):
        self.background_color = np.ones(3, np.float32)
        self.point_size = self.POINT_SIZE_DEFAULT
        self.line_width = self.LINE_WIDTH_DEFAULT
        self.point_show_normal = False
        self.mesh_show_wireframe = False
        self.mesh_show_back_face = False
        self.point_color_option = PointColorOption.Default
        self.mesh_shade_option = MeshShadeOption.FlatShade
        self.mesh_color_option = MeshColorOption.Color
        self.show_coordinate_frame = False
        self.light_on = True

    def to_dict(self) -> dict:
        return {
            "class_name": "RenderOption",
            "version_major": 1,
            "version_minor": 0,
            "background_color": [float(c) for c in self.background_color],
            "point_size": float(self.point_size),
            "line_width": float(self.line_width),
            "point_show_normal": bool(self.point_show_normal),
            "mesh_show_wireframe": bool(self.mesh_show_wireframe),
            "mesh_show_back_face": bool(self.mesh_show_back_face),
            "point_color_option": int(self.point_color_option),
            "mesh_shade_option": int(self.mesh_shade_option),
            "mesh_color_option": int(self.mesh_color_option),
            "show_coordinate_frame": bool(self.show_coordinate_frame),
            "light_on": bool(self.light_on),
        }

    @staticmethod
    def from_dict(d: dict) -> "RenderOption":
        opt = RenderOption()
        opt.background_color = np.asarray(
            d.get("background_color", [1, 1, 1]), np.float32)
        opt.point_size = float(d.get("point_size",
                                     RenderOption.POINT_SIZE_DEFAULT))
        opt.line_width = float(d.get("line_width",
                                     RenderOption.LINE_WIDTH_DEFAULT))
        opt.point_show_normal = bool(d.get("point_show_normal", False))
        opt.mesh_show_wireframe = bool(d.get("mesh_show_wireframe", False))
        opt.mesh_show_back_face = bool(d.get("mesh_show_back_face", False))
        opt.point_color_option = PointColorOption(
            d.get("point_color_option", 0))
        opt.mesh_shade_option = MeshShadeOption(
            d.get("mesh_shade_option", 0))
        opt.mesh_color_option = MeshColorOption(
            d.get("mesh_color_option", 1))
        opt.show_coordinate_frame = bool(
            d.get("show_coordinate_frame", False))
        opt.light_on = bool(d.get("light_on", True))
        return opt


class ViewControl:
    """Camera state (reference: view_control.h — look-at model)."""

    def __init__(self):
        self.lookat = np.zeros(3, np.float32)
        self.up = np.asarray([0.0, 1.0, 0.0], np.float32)
        self.front = np.asarray([0.0, 0.0, 1.0], np.float32)
        self.zoom = 0.7
        self.field_of_view = 60.0

    def set_lookat(self, v):
        self.lookat = np.asarray(v, np.float32)

    def set_up(self, v):
        self.up = np.asarray(v, np.float32)

    def set_front(self, v):
        self.front = np.asarray(v, np.float32)

    def set_zoom(self, z):
        self.zoom = float(z)

    def to_dict(self) -> dict:
        return {
            "class_name": "ViewControl",
            "lookat": [float(c) for c in self.lookat],
            "up": [float(c) for c in self.up],
            "front": [float(c) for c in self.front],
            "zoom": float(self.zoom),
            "field_of_view": float(self.field_of_view),
        }

    @staticmethod
    def from_dict(d: dict) -> "ViewControl":
        vc = ViewControl()
        vc.lookat = np.asarray(d.get("lookat", [0, 0, 0]), np.float32)
        vc.up = np.asarray(d.get("up", [0, 1, 0]), np.float32)
        vc.front = np.asarray(d.get("front", [0, 0, 1]), np.float32)
        vc.zoom = float(d.get("zoom", 0.7))
        vc.field_of_view = float(d.get("field_of_view", 60.0))
        return vc

"""VoxelGrid file IO (PLY).

reference: io/class_io/voxelgrid_io.cpp + the voxelgrid PLY layout in
io/file_format/file_ply.cu:611-750 — a PLY with three elements:
  element origin (1): x, y, z double
  element voxel_size (1): val double
  element vertex (N): x, y, z double (integer grid indices) and
  optional red/green/blue uchar colors (0-255).
Byte-compatible with files written by cupoch/Open3D.
"""
from __future__ import annotations

import os

import numpy as np

from ..geometry.voxelgrid import VoxelGrid
from ..utility import console
from .pointcloud_io import _read_ply_elements


def read_voxel_grid(path: str, format: str = "auto") -> VoxelGrid:
    """reference: ReadVoxelGrid (voxelgrid_io.cpp:63)."""
    ext = (os.path.splitext(path)[1][1:].lower()
           if format == "auto" else format)
    if ext != "ply":
        console.log_error("Read VoxelGrid failed: unknown extension %s",
                          ext)
        return VoxelGrid()
    els = _read_ply_elements(path)
    vg = VoxelGrid()
    if "origin" in els:
        o = els["origin"]
        vg.origin = np.asarray(
            [o["x"][0], o["y"][0], o["z"][0]], np.float32)
    if "voxel_size" in els:
        vg.voxel_size = float(els["voxel_size"]["val"][0])
    v = els.get("vertex")
    if v is None or "x" not in v:
        return vg
    import jax.numpy as jnp

    keys = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.int32)
    vg.voxels_keys = jnp.asarray(keys)
    if "red" in v:
        cols = np.stack([v["red"], v["green"], v["blue"]],
                        -1).astype(np.float32) / 255.0
        vg.voxels_colors = jnp.asarray(cols)
    else:
        vg.voxels_colors = jnp.zeros((len(keys), 3), jnp.float32)
    return vg


def write_voxel_grid(path: str, voxelgrid: VoxelGrid,
                     write_ascii: bool = False,
                     format: str = "auto") -> bool:
    """reference: WriteVoxelGrid (voxelgrid_io.cpp:88) +
    WriteVoxelGridToPLY (file_ply.cu:684-750)."""
    ext = (os.path.splitext(path)[1][1:].lower()
           if format == "auto" else format)
    if ext != "ply":
        console.log_error("Write VoxelGrid failed: unknown extension %s",
                          ext)
        return False
    keys = np.asarray(voxelgrid.voxels_keys, np.float64)
    has_colors = voxelgrid.has_colors()
    n = len(keys)
    fmt = "ascii" if write_ascii else "binary_little_endian"
    header = [
        "ply",
        f"format {fmt} 1.0",
        "comment Created by cupoch_tpu",
        "element origin 1",
        "property double x",
        "property double y",
        "property double z",
        "element voxel_size 1",
        "property double val",
        f"element vertex {n}",
        "property double x",
        "property double y",
        "property double z",
    ]
    if has_colors:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")
    origin = np.asarray(voxelgrid.origin, np.float64)
    if has_colors:
        cols = np.clip(np.asarray(voxelgrid.voxels_colors, np.float64)
                       * 255.0, 0.0, 255.0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if write_ascii:
            f.write(f"{origin[0]} {origin[1]} {origin[2]}\n"
                    .encode("ascii"))
            f.write(f"{float(voxelgrid.voxel_size)}\n".encode("ascii"))
            for i in range(n):
                row = f"{keys[i, 0]:.0f} {keys[i, 1]:.0f} {keys[i, 2]:.0f}"
                if has_colors:
                    row += f" {cols[i, 0]} {cols[i, 1]} {cols[i, 2]}"
                f.write((row + "\n").encode("ascii"))
        else:
            f.write(origin.astype("<f8").tobytes())
            f.write(np.float64(voxelgrid.voxel_size)
                    .astype("<f8").tobytes())
            if has_colors:
                rec = np.dtype([("x", "<f8"), ("y", "<f8"), ("z", "<f8"),
                                ("r", "u1"), ("g", "u1"), ("b", "u1")])
                rows = np.empty(n, rec)
                rows["x"], rows["y"], rows["z"] = keys.T
                rows["r"], rows["g"], rows["b"] = cols.T
                f.write(rows.tobytes())
            else:
                f.write(keys.astype("<f8").tobytes())
    return True

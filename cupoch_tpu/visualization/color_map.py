"""Colormaps (reference:
src/cupoch/visualization/utility/color_map.h:30-160).

Vectorised over jnp arrays so geometry code can colorize whole clouds
in one fused op (the reference evaluates per-thread on device).
"""
from __future__ import annotations

import enum

import jax.numpy as jnp


class ColorMapOption(enum.IntEnum):
    """reference: color_map.h:32-38."""

    Gray = 0
    Jet = 1
    Summer = 2
    Winter = 3
    Hot = 4


def _interp(value, y0, x0, y1, x1):
    t = jnp.clip((value - x0) / (x1 - x0), 0.0, 1.0)
    return y0 + t * (y1 - y0)


def _jet_base(value):
    """reference: color_map.h:83-96 JetBase piecewise ramp."""
    return jnp.where(
        value <= -0.75, 0.0,
        jnp.where(value <= -0.25, _interp(value, 0.0, -0.75, 1.0, -0.25),
                  jnp.where(value <= 0.25, 1.0,
                            jnp.where(value <= 0.75,
                                      _interp(value, 1.0, 0.25, 0.0, 0.75),
                                      0.0))))


def color_map_gray(value):
    value = jnp.asarray(value, jnp.float32)
    return jnp.stack([value, value, value], -1)


def color_map_jet(value):
    value = jnp.asarray(value, jnp.float32)
    return jnp.stack([_jet_base(value * 2.0 - 1.5),
                      _jet_base(value * 2.0 - 1.0),
                      _jet_base(value * 2.0 - 0.5)], -1)


def color_map_summer(value):
    value = jnp.asarray(value, jnp.float32)
    return jnp.stack([_interp(value, 0.0, 0.0, 1.0, 1.0),
                      _interp(value, 0.5, 0.0, 1.0, 1.0),
                      jnp.full_like(value, 0.4)], -1)


def color_map_winter(value):
    value = jnp.asarray(value, jnp.float32)
    return jnp.stack([jnp.zeros_like(value),
                      _interp(value, 0.0, 0.0, 1.0, 1.0),
                      _interp(value, 1.0, 0.0, 0.5, 1.0)], -1)


def color_map_hot(value):
    """reference: color_map.h:116-139 (white->yellow->red->black)."""
    value = jnp.asarray(value, jnp.float32)
    e = [jnp.asarray(c, jnp.float32) for c in
         ([1.0, 1.0, 1.0], [1.0, 1.0, 0.0], [1.0, 0.0, 0.0],
          [0.0, 0.0, 0.0])]
    v = value[..., None]
    seg0 = e[0] + jnp.clip(v / (1 / 3), 0, 1) * (e[1] - e[0])
    seg1 = e[1] + jnp.clip((v - 1 / 3) / (1 / 3), 0, 1) * (e[2] - e[1])
    seg2 = e[2] + jnp.clip((v - 2 / 3) / (1 / 3), 0, 1) * (e[3] - e[2])
    return jnp.where(v < 1 / 3, seg0, jnp.where(v < 2 / 3, seg1, seg2))


_MAPS = {
    ColorMapOption.Gray: color_map_gray,
    ColorMapOption.Jet: color_map_jet,
    ColorMapOption.Summer: color_map_summer,
    ColorMapOption.Winter: color_map_winter,
    ColorMapOption.Hot: color_map_hot,
}

_global_option = ColorMapOption.Jet


def get_color_map_color(value, option: ColorMapOption = None):
    """reference: GetColorMapColor (color_map.h:141-157); value in
    [0, 1], returns [..., 3] RGB."""
    option = _global_option if option is None else ColorMapOption(option)
    return _MAPS[option](value)


def get_global_color_map_option() -> ColorMapOption:
    return _global_option


def set_global_color_map_option(option: ColorMapOption):
    global _global_option
    _global_option = ColorMapOption(option)

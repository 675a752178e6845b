"""Turbo colormap helpers (reference ``data/utils/turbo_cmap.py``).

Instead of shipping the 256-entry literal LUT, the table is synthesized once
from the published Turbo polynomial approximation (Google AI blog, 2019),
which matches the original LUT to ~1/255 per channel.
"""

from __future__ import annotations

import numpy as np


def _turbo_poly(x):
    """Polynomial approximation of the Turbo colormap, x in [0, 1]."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    r = 0.13572138 + x * (4.61539260 + x * (-42.66032258 + x * (
        132.13108234 + x * (-152.94239396 + x * 59.28637943))))
    g = 0.09140261 + x * (2.19418839 + x * (4.84296658 + x * (
        -14.18503333 + x * (4.27729857 + x * 2.82956604))))
    b = 0.10667330 + x * (12.64194608 + x * (-60.58204836 + x * (
        110.36276771 + x * (-89.90310912 + x * 27.34824973))))
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)


turbo_colormap_data = _turbo_poly(np.linspace(0.0, 1.0, 256))


def interpolate(colormap, x):
    """Linear interpolation into a colormap, x in [0, 1]."""
    x = max(0.0, min(1.0, float(x)))
    a = int(x * 255.0)
    b = min(255, a + 1)
    f = x * 255.0 - a
    return [colormap[a][i] + (colormap[b][i] - colormap[a][i]) * f
            for i in range(3)]


def interpolate_or_clip(colormap, x):
    if x < 0.0:
        return [0.0, 0.0, 0.0]
    if x > 1.0:
        return [1.0, 1.0, 1.0]
    return interpolate(colormap, x)

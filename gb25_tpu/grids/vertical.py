"""Vertical coordinates.

Reference behavior: GB-25 builds all grids with
``exponential_z_faces(; Nz, depth=4000, h=30)``
(/root/reference/src/model_utils.jl:57,136) — z faces spanning
[-depth, 0] with spacing refined toward the surface (surface spacing on the
order of ``h`` meters).  We implement the same capability with an explicit
geometric-stretching construction (not a line-for-line port): face positions

    z_f[k] = -depth * (exp(gamma * (1 - k/Nz)) - 1) / (exp(gamma) - 1)

where ``gamma`` is solved so the top spacing equals ``h`` (clamped to the
uniform-spacing limit when ``h >= depth/Nz``).
"""

from __future__ import annotations

import numpy as np


def exponential_z_faces(Nz: int, depth: float = 4000.0, h: float = 30.0) -> np.ndarray:
    """Return ``Nz+1`` z-face positions in meters, ``z_f[0] = -depth`` (bottom)
    up to ``z_f[Nz] = 0`` (surface), refined toward the surface.
    """
    if Nz < 1:
        raise ValueError("Nz must be >= 1")
    uniform = depth / Nz
    k = np.arange(Nz + 1, dtype=np.float64)
    if h >= uniform or Nz == 1:
        # Requested surface spacing >= uniform spacing (or a single layer):
        # use uniform faces.
        return -depth * (1.0 - k / Nz)

    def top_spacing(gamma: float) -> float:
        # z_f[Nz] - z_f[Nz-1] under the stretching with parameter gamma.
        e = np.expm1(gamma)
        return depth * np.expm1(gamma / Nz) / e

    # Bisection for gamma in (0, large): top_spacing is decreasing in gamma.
    lo, hi = 1e-8, 1.0
    while top_spacing(hi) > h:
        hi *= 2.0
        if hi > 1e4:  # pragma: no cover - pathological h
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if top_spacing(mid) > h:
            lo = mid
        else:
            hi = mid
    gamma = 0.5 * (lo + hi)
    zf = -depth * (np.expm1(gamma * (1.0 - k / Nz))) / np.expm1(gamma)
    zf[0] = -depth
    zf[-1] = 0.0
    return zf


def uniform_z_faces(Nz: int, depth: float) -> np.ndarray:
    """Uniformly spaced z faces on [-depth, 0]."""
    return -depth * (1.0 - np.arange(Nz + 1, dtype=np.float64) / Nz)

"""Device-mesh policy for 2-D spatial domain decomposition.

Reference: ``factors(N)`` (/root/reference/src/sharding_utils.jl:39-62)
chooses a 2-D process grid (Dx, Dy) with Dx ~ 2 Dy (the benchmark domain is
384x192, aspect 2:1), with square special cases (4 -> (2,2), 16 -> (4,4),
512 -> (32,32), 16384 -> (128,128)). Here the same policy feeds
``jax.make_mesh`` over ("x", "y") — on TPU the mesh maps onto the ICI torus
so the halo collective-permutes ride neighbor links.
"""

from __future__ import annotations

import jax
import numpy as np

_SPECIAL = {
    1: (1, 1),
    4: (2, 2),
    16: (4, 4),
    512: (32, 32),
    16384: (128, 128),
}


def factors(N: int) -> tuple[int, int]:
    """(Rx, Ry) process grid: prefers Rx = 2 Ry, falls back to the divisor
    pair closest to that aspect ratio."""
    if N in _SPECIAL:
        return _SPECIAL[N]
    best = None
    for ry in range(1, int(np.sqrt(N)) + 1):
        if N % ry:
            continue
        rx = N // ry
        score = abs(np.log2(rx / ry) - 1.0)  # target rx/ry = 2
        if best is None or score < best[0]:
            best = (score, (rx, ry))
    return best[1]


def make_mesh(n_devices: int | None = None, devices=None, shape=None) -> jax.sharding.Mesh:
    """2-D ("x", "y") device mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    rx, ry = shape or factors(n_devices)
    if rx * ry != n_devices:
        raise ValueError(f"mesh shape {(rx, ry)} != device count {n_devices}")
    dev_array = np.asarray(devices).reshape(rx, ry)
    return jax.sharding.Mesh(dev_array, ("x", "y"))

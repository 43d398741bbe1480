#!/usr/bin/env python
"""Calibrate the ICI projection constants with a real multi-chip measurement.

Fits t(bytes) = latency + bytes/bandwidth over a sweep of ppermute ring
exchanges and prints JSON suitable for overriding
``gb25_tpu.analysis.comm.ICI_BYTES_PER_SEC`` / ``ICI_LATENCY_PER_ROUND``.

Reference analog: the measured-vs-projected communication accounting in
/root/reference/analysis/weak-scaling/pm-ablation.jl:6-93.

CALIBRATION STATUS (round 3): this development environment exposes exactly
ONE physical TPU chip through the axon tunnel (`jax.devices()` == 1 real
v5e core; multi-chip meshes exist only as virtual CPU devices, whose
"interconnect" is host memcpy and calibrates nothing).  Until this script
runs on a real slice, the defaults in analysis/comm.py stay at the public
How-to-Scale-Your-Model v5e numbers (4 links x 45 GB/s one-way; ~1-3 us
per-round dispatch), used conservatively (serial-per-round charging).
Error bar: one-way link bandwidth is a hardware datasheet figure, so the
bytes term should be within ~2x (contention, bidirectional overlap);
the latency term dominates only below ~64 KB per exchange, two orders of
magnitude under the flagship halo sizes (~1.5 MB/step/device), so the
projection is bandwidth-model-driven where it matters.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    devs = jax.devices()
    if len(devs) < 2 or devs[0].platform != "tpu":
        print(json.dumps({
            "calibrated": False,
            "reason": f"needs >= 2 real TPU chips; this environment exposes "
                      f"{len(devs)} {devs[0].platform} device(s) via the axon "
                      f"tunnel — see module docstring for the documented "
                      f"defaults and their error bar",
            "defaults": {"ici_bytes_per_sec": 1.8e11,
                         "ici_latency_per_round": 3e-6},
        }))
        return 0

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n = len(devs)
    mesh = Mesh(np.array(devs), ("x",))
    perm = [(i, (i + 1) % n) for i in range(n)]
    sizes = [2 ** k for k in range(10, 27, 2)]  # 1 KB .. 64 MB (f32 elems/4)
    rounds = 20
    pts = []
    for nbytes in sizes:
        m = nbytes // 4

        @jax.jit
        @lambda f: shard_map(f, mesh=mesh, in_specs=P("x"), out_specs=P("x"))
        def ring(a):
            for _ in range(rounds):
                a = jax.lax.ppermute(a, "x", perm)
            return a

        a = jax.device_put(
            jnp.ones((n * m,), jnp.float32),
            NamedSharding(mesh, P("x")),
        )
        ring(a).block_until_ready()
        t0 = time.perf_counter()
        ring(a).block_until_ready()
        per_round = (time.perf_counter() - t0) / rounds
        pts.append((nbytes, per_round))
        print(f"  {nbytes:>10d} B  {1e6 * per_round:8.1f} us/round", file=sys.stderr)

    xs = np.array([p[0] for p in pts], float)
    ts = np.array([p[1] for p in pts], float)
    A = np.stack([np.ones_like(xs), xs], axis=1)
    (lat, inv_bw), *_ = np.linalg.lstsq(A, ts, rcond=None)
    print(json.dumps({
        "calibrated": True,
        "devices": n,
        "ici_bytes_per_sec": 1.0 / inv_bw,
        "ici_latency_per_round": float(lat),
        "points": [{"bytes": int(b), "s_per_round": t} for b, t in pts],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

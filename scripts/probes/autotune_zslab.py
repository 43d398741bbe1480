#!/usr/bin/env python
"""Autotune the z-slab kernel tiles (by, bz) on the PRESENT TPU generation.

The shipped defaults in ``gb25_tpu/ops/pallas_zslab.py`` (by=24, bz=8 f32)
were swept on one v5e; other generations (v5p, v6e) have different
VMEM/lane economics.  Run this once per machine type and either export the
printed ``GB25_ZSLAB_BY/BZ`` env line in the pod launcher, or add a row to
``pallas_zslab.GENERATION_TILE_DEFAULTS`` keyed by the printed device_kind.

Reference analog: the per-machine tile choices of
/root/reference/sharding/{alps,perlmutter}_scaling_test.jl:34-37 (768^2x64
on GH200, 256^2x128 on 40 GB A100) — tile tuning is per-hardware there too.

Usage:  python scripts/probes/autotune_zslab.py [--nx 1536 --ny 768 --nz 64]
"""

import argparse
import itertools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=1536)
    p.add_argument("--ny", type=int, default=768)
    p.add_argument("--nz", type=int, default=64)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--by", default="8,16,24,48",
                   help="candidate y tiles (divisors of Ny are kept)")
    p.add_argument("--bz", default="4,8,16",
                   help="candidate z tiles (divisors of Nz are kept)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gb25_tpu.models.baroclinic import baroclinic_instability_model
    from gb25_tpu.models.hydrostatic import loop
    from gb25_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    print(f"device_kind: {dev.device_kind}  platform: {dev.platform}",
          file=sys.stderr, flush=True)

    cfg, grid, state0 = baroclinic_instability_model(
        Nx=args.nx, Ny=args.ny, Nz=args.nz, dtype=jnp.float32)
    dt = 60.0

    bys = [int(v) for v in args.by.split(",") if args.ny % int(v) == 0]
    bzs = [int(v) for v in args.bz.split(",") if args.nz % int(v) == 0]
    results = []
    for by, bz in itertools.product(bys, bzs):
        import os

        os.environ["GB25_ZSLAB_BY"] = str(by)
        os.environ["GB25_ZSLAB_BZ"] = str(bz)
        try:
            lp = jax.jit(lambda s: loop(cfg, grid, s, dt, args.steps))
            t0 = time.perf_counter()
            s = lp(state0)
            np.asarray(jax.device_get(s.iteration))
            tc = time.perf_counter() - t0
            s = lp(s)  # warm
            np.asarray(jax.device_get(s.iteration))
            t0 = time.perf_counter()
            s = lp(s)
            np.asarray(jax.device_get(s.iteration))
            ms = 1e3 * (time.perf_counter() - t0) / args.steps
            ok = bool(np.isfinite(np.asarray(jax.device_get(s.u[:2, :2, 0]))).all())
            print(f"by={by:3d} bz={bz:3d}: {ms:7.2f} ms/step "
                  f"(compile {tc:.0f}s, finite={ok})", file=sys.stderr, flush=True)
            if ok:
                results.append((ms, by, bz))
        except Exception as e:  # Mosaic VMEM overflow / compile-service errors
            print(f"by={by:3d} bz={bz:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", file=sys.stderr, flush=True)
        finally:
            # a fresh jit per config; drop the traced closures
            jax.clear_caches()

    if not results:
        print("no configuration succeeded", file=sys.stderr)
        return 1
    results.sort()
    ms, by, bz = results[0]
    print(f"\nbest: by={by} bz={bz} at {ms:.2f} ms/step on {dev.device_kind}",
          file=sys.stderr)
    print(f"export GB25_ZSLAB_BY={by} GB25_ZSLAB_BZ={bz}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

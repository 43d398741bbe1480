#!/usr/bin/env python
"""Visualize output-writer records (reference analog:
visualize_ocean_climate_simulation.jl). Reads NPZOutputWriter directories or
NetCDFOutputWriter .nc files and plots surface fields."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output_dir",
                   help="NPZ writer directory, or a NetCDF .nc output file")
    p.add_argument("--field", default="T_surface")
    p.add_argument("--frame", type=int, default=-1)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gb25_tpu.io import read_series

    if args.output_dir.endswith(".nc"):
        from gb25_tpu.data.netcdf import read_netcdf

        v, _, _ = read_netcdf(args.output_dir)
        times, data = np.asarray(v["time"]), np.asarray(v[args.field])
    else:
        times, data = read_series(args.output_dir, args.field)
    if data.size == 0:
        raise SystemExit(f"no records for {args.field} in {args.output_dir}")
    frame = data[args.frame]
    fig, ax = plt.subplots(figsize=(10, 5))
    im = ax.imshow(frame.T, origin="lower", aspect="auto", cmap="viridis")
    ax.set_title(f"{args.field} @ t = {times[args.frame] / 86400:.2f} days")
    ax.set_xlabel("i (longitude index)")
    ax.set_ylabel("j (latitude index)")
    fig.colorbar(im, ax=ax)
    out = args.out or f"{args.field}_frame.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

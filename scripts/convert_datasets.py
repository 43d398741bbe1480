#!/usr/bin/env python
"""Convert real NetCDF datasets (ETOPO1 / ECCO4 / JRA55) to the framework's
``.npz`` contracts (gb25_tpu/data/datasets.py docstring).

Reference analog: ClimaOcean's dataset machinery feeding regrid_bathymetry /
ECCORestoring / JRA55PrescribedAtmosphere
(/root/reference/simulations/ocean_climate_simulation.jl:61-83). The model
scripts also accept ``.nc`` paths directly; converting once avoids re-parsing
large files every run.

  python convert_datasets.py etopo1 ETOPO1.nc -o bathymetry.npz
  python convert_datasets.py ecco THETA.nc -s SALT.nc -o climatology.npz
  python convert_datasets.py jra55 jra55.nc -o atmosphere.npz
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["etopo1", "ecco", "jra55"])
    p.add_argument("path")
    p.add_argument("-s", "--salinity", default=None,
                   help="separate salinity file (ecco)")
    p.add_argument("-o", "--out", required=True)
    args = p.parse_args()

    from gb25_tpu.data.netcdf import (
        load_atmosphere_nc,
        load_bathymetry_nc,
        load_climatology_nc,
    )

    if args.kind == "etopo1":
        lon, lat, z = load_bathymetry_nc(args.path)
        np.savez_compressed(args.out, lon=lon, lat=lat, z=z)
    elif args.kind == "ecco":
        d = load_climatology_nc(args.path, salinity_path=args.salinity)
        np.savez_compressed(args.out, **d)
    else:
        d = load_atmosphere_nc(args.path)
        np.savez_compressed(args.out, **d)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

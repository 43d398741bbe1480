"""Driver/CLI-surface smoke tests: bench.py's JSON contract and the compile
artifact dump (reference CI runs its scripts the same way, SURVEY.md 4.4)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=1200):
    # generous timeout: on the shared single-TPU environment a concurrent
    # Mosaic compile elsewhere can serialize this subprocess's compile
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GB25_COMPILE_CACHE"] = "/tmp/gb25_test_cache"
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def test_bench_json_contract():
    r = _run(["bench.py", "--nx", "64", "--ny", "32", "--nz", "8",
              "--steps", "2", "--warmup", "1", "--no-precision-rows"])
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert set(out) >= {"metric", "value", "unit", "vs_baseline"}
    assert out["value"] > 0
    assert out["unit"] == "cell-steps/s"


def test_bench_atmosphere_row_contract():
    # the shallow-water atmosphere companion (BASELINE.md atmosphere rows)
    r = _run(["bench.py", "--config", "atmosphere", "--nx", "64", "--ny", "32",
              "--steps", "2", "--warmup", "1", "--no-precision-rows"])
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["config"] == "atmosphere"
    assert out["value"] > 0
    assert out["vs_baseline"] is None  # reference tile size unpublished
    assert out["metric"].startswith("shallow_water_atmosphere")


import pytest


@pytest.mark.skipif(
    not int(os.environ.get("GB25_SCRIPT_TESTS", "0")),
    reason="covered by the CI compile-artifacts job; set GB25_SCRIPT_TESTS=1",
)
def test_compile_dump_script(tmp_path):
    r = _run(["scripts/baroclinic_instability_compile.py",
              "--grid-x", "16", "--grid-y", "8", "--grid-z", "4",
              "--steps", "2", "--out-dir", str(tmp_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    names = os.listdir(tmp_path)
    assert any(n.endswith(".stablehlo.mlir") for n in names)
    assert any(n.endswith(".hlo.txt") for n in names)


@pytest.mark.skipif(
    not int(os.environ.get("GB25_SCRIPT_TESTS", "0")),
    reason="covered by the CI compile-artifacts job; set GB25_SCRIPT_TESTS=1",
)
def test_climate_compile_dump_script(tmp_path):
    r = _run(["scripts/ocean_climate_simulation_compile.py",
              "--resolution", "12", "--Nz", "4", "--steps", "2",
              "--out-dir", str(tmp_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    names = os.listdir(tmp_path)
    assert any("ocean_climate" in n and n.endswith(".stablehlo.mlir") for n in names)
    assert any("ocean_climate" in n and n.endswith(".hlo.txt") for n in names)


def test_pod_launcher_strong_scaling(tmp_path):
    """--strong holds the global grid fixed: per-chip tiles are
    global/factors(n), recorded in run-info.toml (reference:
    common_submission_generator.jl:108-112 strong sizing)."""
    out = tmp_path / "jobs"
    r = _run(["scripts/tpu_pod_launcher.py", "--sizes", "8,32",
              "--strong", "--global-x", "6144", "--global-y", "3072",
              "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    # 8 chips -> factors (4,2) -> tile 1536x1536; 32 -> (8,4) -> 768x768
    info8 = (out / "chips_8" / "run-info.toml").read_text()
    assert "tile = [1536, 1536, 64]" in info8
    assert 'scaling = "strong"' in info8
    assert "global = [6144, 3072, 64]" in info8
    info32 = (out / "chips_32" / "run-info.toml").read_text()
    assert "tile = [768, 768, 64]" in info32
    launcher32 = (out / "chips_32" / "launcher.sh").read_text()
    assert "--tile-x 768 --tile-y 768" in launcher32


def test_pod_launcher_strong_requires_global(tmp_path):
    r = _run(["scripts/tpu_pod_launcher.py", "--strong",
              "--out", str(tmp_path / "j")])
    assert r.returncode != 0
    assert "--global-x" in r.stderr

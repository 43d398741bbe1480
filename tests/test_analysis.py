"""XSpace trace decoding test: emit a real jax.profiler trace (the CPU
backend writes the same .xplane.pb format as TPU) and mine it with our
dependency-free decoder (reference analog: analysis/xspace + notebooks)."""

import jax
import jax.numpy as jnp

from gb25_tpu.analysis import find_xplane_files, parse_xspace, op_durations, summarize
from gb25_tpu.utils import with_profiler, annotate


def test_xplane_roundtrip(tmp_path):
    logdir = str(tmp_path / "trace")

    @jax.jit
    def f(a):
        return jnp.sin(a) @ a.T

    a = jnp.ones((256, 256))
    f(a).block_until_ready()
    with with_profiler(logdir):
        with annotate("bench", step=1):
            for _ in range(3):
                f(a).block_until_ready()

    files = find_xplane_files(logdir)
    assert files, "no xplane.pb produced"
    planes = parse_xspace(files[0])
    assert planes, "no planes decoded"
    names = [p.name for p in planes]
    assert any(names), names
    durs = op_durations(planes)
    assert durs
    top = summarize(logdir, top=5)
    assert len(top) > 0
    assert all(isinstance(n, str) and ms >= 0 for n, ms in top)

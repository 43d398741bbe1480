from gb25_tpu.utils.correctness import compare_states, sync_states, default_rtol  # noqa: F401
from gb25_tpu.utils.profiling import (  # noqa: F401
    with_profiler,
    annotate,
    Timer,
    allocator_stats,
    force_virtual_cpu_devices,
)

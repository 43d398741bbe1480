from gb25_tpu.analysis.xplane import (  # noqa: F401
    parse_xspace,
    find_xplane_files,
    op_durations,
    summarize,
)

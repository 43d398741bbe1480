from gb25_tpu.simulation.simulation import (  # noqa: F401
    Simulation,
    IterationInterval,
    TimeInterval,
    progress_callback,
)

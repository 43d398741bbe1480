from gb25_tpu.simulation.simulation import (  # noqa: F401
    CheckpointWriter,
    Simulation,
    IterationInterval,
    TimeInterval,
    progress_callback,
)

from gb25_tpu.io.output import NPZOutputWriter, read_series, STANDARD_OUTPUTS  # noqa: F401
from gb25_tpu.io.checkpoint import (  # noqa: F401
    save_sharded_state,
    load_global_field,
    load_all_fields,
    load_metadata,
    restore_state,
)

from gb25_tpu.io.checkpoint import (  # noqa: F401
    save_sharded_state,
    load_global_field,
    load_all_fields,
    load_metadata,
    restore_state,
)

from tmrnet_tpu.memory.lfb import (  # noqa: F401
    FeatureBank,
    build_feature_bank,
    gather_memory_windows,
    update_bank,
    save_bank,
    load_bank,
)

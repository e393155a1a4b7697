from tmrnet_tpu.data.indexing import (  # noqa: F401
    clip_start_indices,
    expand_clip_indices,
    clips_per_video,
    video_first_rows,
    memory_window_rows,
    memory_window_rows_reference,
)
from tmrnet_tpu.data.packed import (  # noqa: F401
    is_packed_path,
    load_packed_frame,
    pack_manifest,
    pack_video,
)
from tmrnet_tpu.data.synthetic import (  # noqa: F401
    PHASE_TOKENS,
    ambiguous_phases,
    frame_only_ceiling,
    generate_video,
    write_synthetic_dataset,
)
from tmrnet_tpu.data.manifests import (  # noqa: F401
    Manifest,
    VideoRecord,
    build_manifest_from_frames,
    load_pickle_manifest,
    save_pickle_manifest,
    load_csv_manifest,
    save_csv_manifest,
)

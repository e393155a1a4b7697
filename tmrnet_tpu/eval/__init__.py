from tmrnet_tpu.eval.distributed import (  # noqa: F401
    local_eval_mesh,
    partition_videos,
    run_corpus_distributed,
    run_lfb_distributed,
)
from tmrnet_tpu.eval.metrics import (  # noqa: F401
    relaxed_evaluate,
    aggregate_videos,
    evaluate_protocol,
    read_phase_file,
    write_phase_file,
    classification_metrics,
)

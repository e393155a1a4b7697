from tmrnet_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from tmrnet_tpu.utils.logging import MetricLogger  # noqa: F401

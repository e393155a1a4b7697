from tmrnet_tpu.train.losses import (  # noqa: F401
    balanced_class_weights,
    weighted_cross_entropy,
)
from tmrnet_tpu.train.optim import (  # noqa: F401
    make_optimizer,
    PlateauSchedule,
    StepSchedule,
    set_learning_rate,
    current_learning_rate,
)
from tmrnet_tpu.train.state import TrainState, create_train_state  # noqa: F401
from tmrnet_tpu.train.steps import (  # noqa: F401
    make_stage1_steps,
    make_stage2_steps,
)

from tmrnet_tpu.models.lstm import LSTM  # noqa: F401
from tmrnet_tpu.models.blocks import NLBlock, TimeConv  # noqa: F401
from tmrnet_tpu.models.resnet import ResNet, resnet50  # noqa: F401
from tmrnet_tpu.models.resnest import resnest50  # noqa: F401
from tmrnet_tpu.models.tmrnet import (  # noqa: F401
    ClipEncoder,
    MemoryBankModel,
    LFBExtractor,
    TMRNet,
    build_model,
)

from rcvpose_tpu.models.fcnresnet import (  # noqa: F401
    Bottleneck,
    DenseFCNResNet152,
    ResFCNResNet152,
)

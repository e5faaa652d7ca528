from multimodalrouting_tpu.ops.masked import (  # noqa: F401
    masked_last,
    masked_max,
    masked_mean,
    masked_softmax,
)

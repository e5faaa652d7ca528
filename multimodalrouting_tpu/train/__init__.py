from multimodalrouting_tpu.train.losses import (  # noqa: F401
    bce_with_logits,
    death_logit,
    focal_bce_with_logits,
    routing_regularizers,
)
from multimodalrouting_tpu.train.state import TrainState, create_train_state  # noqa: F401

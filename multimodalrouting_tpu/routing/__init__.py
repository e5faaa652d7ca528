from multimodalrouting_tpu.routing.capsule_head import (  # noqa: F401
    CapsuleHead,
    RouteDimAdapter,
    RoutePrimaryProjector,
    compose_priors,
)

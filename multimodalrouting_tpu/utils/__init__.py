from multimodalrouting_tpu.utils.debug import checked_finite, debug_checks_enabled  # noqa: F401
from multimodalrouting_tpu.utils.profiling import StepTimer, trace_context  # noqa: F401

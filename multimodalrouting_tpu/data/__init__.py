from multimodalrouting_tpu.data.batches import Batch  # noqa: F401
from multimodalrouting_tpu.data.synthetic import make_synthetic_cohort  # noqa: F401

from multimodalrouting_tpu.models.behrt import BEHRTLabEncoder  # noqa: F401
from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder  # noqa: F401
from multimodalrouting_tpu.models.cxr import ImageEncoder  # noqa: F401
from multimodalrouting_tpu.models.mult import MULTRouter  # noqa: F401

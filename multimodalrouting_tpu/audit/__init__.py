from multimodalrouting_tpu.audit.attribution import (  # noqa: F401
    compute_uc_bi_ti,
    route_contributions_occlusion,
)
from multimodalrouting_tpu.audit.droptable import drop_table_eval  # noqa: F401
from multimodalrouting_tpu.audit.exports import (  # noqa: F401
    routing_heatmap_tables,
    save_array_with_versions,
)

from oplogtoredis_ray.stages.parse import ParseStage, to_change_records  # noqa: F401
from oplogtoredis_ray.stages.fold import (  # noqa: F401
    apply_folded,
    fold_events,
    folded_to_pseudo_events,
)
from oplogtoredis_ray.stages.apply import make_apply_fn  # noqa: F401

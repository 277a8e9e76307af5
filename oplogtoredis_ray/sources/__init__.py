from oplogtoredis_ray.sources.event_log import (  # noqa: F401
    log_ts_bounds,
    read_event_window,
)
from oplogtoredis_ray.sources.synthetic import (  # noqa: F401
    GeneratorSpec,
    generate_event_log,
    oracle_apply,
    write_event_log,
)

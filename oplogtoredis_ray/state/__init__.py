from oplogtoredis_ray.state.manifest import (  # noqa: F401
    Manifest,
    commit_manifest,
    read_all_manifests,
    read_manifest,
    resume_watermark,
)
from oplogtoredis_ray.state.lake import (  # noqa: F401
    lake_partition_dir,
    read_lake,
    read_partition_state,
    write_partition_state,
)

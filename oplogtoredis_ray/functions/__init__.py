from oplogtoredis_ray.functions.changed_fields import (  # noqa: F401
    ChangedFieldsError,
    changed_fields,
    flat_object_keys,
    is_array_operator,
    is_v2_update,
    map_keys,
    update_is_replace,
    v2_changed_fields_deep,
    v2_changed_fields_shallow,
)
from oplogtoredis_ray.functions.docid import (  # noqa: F401
    ObjectID,
    UnsupportedDocIDType,
    normalize_doc_id,
)
from oplogtoredis_ray.functions.namespace import parse_namespace  # noqa: F401
from oplogtoredis_ray.functions.sharding import (  # noqa: F401
    assign_to_shard,
    parallelism_key,
    partition_id_for,
    partition_key_u64,
)
from oplogtoredis_ray.functions.timestamp_codec import (  # noqa: F401
    decode_optime,
    encode_optime,
    optime_to_unix_seconds,
)
from oplogtoredis_ray.functions.transactions import flatten_raw_entry  # noqa: F401
from oplogtoredis_ray.functions.fingerprint import rolling_fingerprint  # noqa: F401

"""oplogtoredis_ray — a Ray-Data-native CDC / incremental-ingest engine.

Rebuilt from scratch with the query/data-processing capabilities of the
reference `tulip/oplogtoredis` (a Go daemon tailing a MongoDB oplog and
publishing changed-fields+id messages to Redis with exactly-once dedup on
(timestamp, txIdx), resumable watermarks and per-database ordering).

Here those semantics are re-expressed as idiomatic `ray.data.Dataset`
pipelines over a Parquet change-event log of multi-turn conversation
transcripts: resumable timestamp windows -> zero-copy Arrow parse/normalize
(`map_batches`) -> hash-partition by conv_id -> per-partition ordered fold +
upsert/delete merge into a partitioned Parquet lake with atomic per-partition
checkpoint manifests (watermark + lineage + metrics).

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (driver / bench.py / test fixtures).
"""

__version__ = "0.1.0"

from oplogtoredis_ray.config import PipelineConfig  # noqa: F401

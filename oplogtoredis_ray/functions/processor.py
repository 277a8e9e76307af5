"""Row-level publication builder — full parity with processOplogEntry
(/root/reference/lib/oplog/processor.go:23-117).

Composes the kernels (system filter → id normalization → changed fields →
event name → channels → parallelism key) into the reference's exact message
contract: ``{"e": <event>, "d": {"_id": <id>}, "f": [<changed fields>]}``
published on the ``ns`` and ``ns::<id>`` channels.

This is the per-row semantic the vectorized ParseStage/`to_change_records`
implement in bulk; it exists for contract-level parity tests (the
reference's acceptance suite asserts these exact messages) and as the
drop-in for users porting single-event code.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from oplogtoredis_ray.functions.changed_fields import changed_fields
from oplogtoredis_ray.functions.docid import event_name_for_operation, normalize_doc_id
from oplogtoredis_ray.functions.namespace import is_system_or_internal
from oplogtoredis_ray.functions.sharding import parallelism_key
from oplogtoredis_ray.functions.transactions import ParsedEntry


@dataclass
class Publication:
    """≙ redispub.Publication (/root/reference/lib/redispub/publication.go:11-32)."""

    channels: list[str]
    msg: dict
    oplog_ts: tuple[int, int]
    wall: Any
    tx_idx: int
    parallelism_key: int


def process_entry(entry: ParsedEntry, v2_deep: bool = False) -> Publication | None:
    """Build the outgoing publication for one parsed entry, or None for
    never-published entries (system collections, the config database —
    processor.go:34-43).  Unsupported id types raise (≙ per-entry error)."""
    if is_system_or_internal(entry.database, entry.collection):
        return None

    id_for_channel, id_for_message = normalize_doc_id(entry.doc_id)
    fields = changed_fields(entry.op, entry.data, v2_deep=v2_deep)

    msg = {
        "e": event_name_for_operation(entry.op),
        "d": {"_id": id_for_message},
        "f": fields,
    }
    return Publication(
        channels=[entry.namespace, f"{entry.namespace}::{id_for_channel}"],
        msg=msg,
        oplog_ts=tuple(entry.ts),
        wall=entry.wall,
        tx_idx=entry.tx_idx,
        parallelism_key=parallelism_key(entry.database),
    )

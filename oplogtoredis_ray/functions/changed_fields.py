"""Changed-fields extraction — the reference's most intricate pure functions.

Re-implements (from observed behavior, not code) the semantics of:

- insert / replacement-update → top-level keys of the document
  (``mapKeysRaw`` — /root/reference/lib/oplog/oplogEntry.go:166-180,
  ``ChangedFields`` :93-137, ``UpdateIsReplace`` :79-90)
- v1 modify-update ``{$v:1, $set:{...}, $unset:{...}}`` → union of keys under
  each ``$``-operator, skipping ``$v`` (oplogEntry.go:100-133)
- v2 modify-update ``{$v:2, diff:{...}}`` (MongoDB ≥5) in two modes
  (/root/reference/lib/oplog/oplog_v2_converter.go):
  * shallow (default): top-level only — ``i``/``u``/``d`` sub-doc keys plus
    ``s<field>`` prefixes; ``a`` and ``o*`` keys ignored (:144-186)
  * deep (OTR_OPLOG_V2_EXTRACT_SUBFIELD_CHANGES): full recursive translation
    producing dotted paths incl. array indices (:82-142), with
    ``flatObjectKeys`` flattening (:63-80) and ``isArrayOperator``
    detection ``{a:true, uN:...}`` (:18-46)
- delete → ``[]``

The reference skips malformed *sub*-entries (logs + metric + continue) and
errors only on top-level failures (missing/non-map ``diff``, unparseable
data); we mirror that with ``ChangedFieldsError`` for top-level failures and
silent-skip (counted via the optional ``on_unprocessable`` callback) for
sub-entry mismatches.

In the transcript payload these kernels run per row inside ``map_batches``
when the event log carries raw update-spec documents; when the log already
carries an explicit ``changed_fields`` column the parse stage validates it
instead (see stages/parse.py).
"""

from __future__ import annotations

import re
from typing import Any, Callable

_ARRAY_INDEX_OP_RE = re.compile(r"^u\d+")

OP_INSERT = "i"
OP_UPDATE = "u"
OP_REMOVE = "d"
OP_COMMAND = "c"


class ChangedFieldsError(ValueError):
    """Top-level unprocessable update spec (≙ reference's returned error)."""


def map_keys(doc: dict) -> list[str]:
    """Top-level keys of a document (≙ mapKeysRaw, oplogEntry.go:166-180)."""
    if not isinstance(doc, dict):
        raise ChangedFieldsError(f"expected document, got {type(doc).__name__}")
    return list(doc.keys())


def is_v2_update(data: dict) -> bool:
    """``$v == 2`` (any numeric 2 — BSON doubles round-trip through JSON as
    2.0 and the reference's AsInt64OK accepts them) and a ``diff`` key
    present (oplogEntry.go:57-75)."""
    v = data.get("$v")
    if isinstance(v, bool) or not isinstance(v, (int, float)) or v != 2:
        return False
    return "diff" in data


def update_is_replace(data: dict) -> bool:
    """No ``$set``/``$unset`` and not v2 → whole-document replacement
    (oplogEntry.go:79-90)."""
    if "$set" in data or "$unset" in data:
        return False
    return not is_v2_update(data)


def is_array_operator(value: Any) -> bool:
    """``{a: true, uN: ..., ...}`` with only ``a`` and ``u<digits>`` keys
    (oplog_v2_converter.go:18-46)."""
    if not isinstance(value, dict) or not value:
        return False
    if "a" not in value:
        return False
    for key in value:
        if key != "a" and not _ARRAY_INDEX_OP_RE.match(key):
            return False
    return True


def flat_object_keys(prefix: str, obj: dict) -> list[str]:
    """Flatten nested maps to dotted key paths; an *empty* nested map counts
    as a leaf (oplog_v2_converter.go:63-80)."""
    acc: list[str] = []
    for key, val in obj.items():
        if isinstance(val, dict):
            if not val:
                acc.append(prefix + key)
            else:
                acc.extend(flat_object_keys(prefix + key + ".", val))
        else:
            acc.append(prefix + key)
    return acc


def v2_changed_fields_deep(
    diff: dict,
    prefix: str = "",
    on_unprocessable: Callable[[str], None] | None = None,
) -> list[str]:
    """Deep (recursive) v2 diff translation (oplog_v2_converter.go:82-142)."""
    fields: list[str] = []
    for op_key, operation in diff.items():
        if op_key in ("i", "u", "d"):
            if not isinstance(operation, dict):
                if on_unprocessable:
                    on_unprocessable(op_key)
                continue
            fields.extend(flat_object_keys(prefix, operation))
        elif is_array_operator(operation):
            for arr_key in operation:
                if arr_key == "a":
                    continue
                fields.append(prefix + op_key[1:] + "." + arr_key[1:])
        elif op_key.startswith("s"):
            if not isinstance(operation, dict):
                if on_unprocessable:
                    on_unprocessable(op_key)
                continue
            fields.extend(
                v2_changed_fields_deep(operation, prefix + op_key[1:] + ".", on_unprocessable)
            )
        elif op_key == "a":
            continue
        else:
            if on_unprocessable:
                on_unprocessable(op_key)
            continue
    return fields


def v2_changed_fields_shallow(
    diff: dict,
    on_unprocessable: Callable[[str], None] | None = None,
) -> list[str]:
    """Shallow v2 diff translation — top-level fields only
    (oplog_v2_converter.go:144-186)."""
    fields: list[str] = []
    for op_key, operation in diff.items():
        if op_key in ("i", "u", "d"):
            if not isinstance(operation, dict):
                if on_unprocessable:
                    on_unprocessable(op_key)
                continue
            fields.extend(map_keys(operation))
        elif op_key.startswith("s"):
            fields.append(op_key[1:])
        elif op_key == "a" or op_key.startswith("o"):
            continue
        else:
            if on_unprocessable:
                on_unprocessable(op_key)
            continue
    return fields


def changed_fields(
    op: str,
    data: dict | None,
    *,
    v2_deep: bool = False,
    on_unprocessable: Callable[[str], None] | None = None,
) -> list[str]:
    """Fields affected by an operation (≙ oplogEntry.ChangedFields,
    oplogEntry.go:93-137).

    - insert, or update that is a replacement → top-level document keys
    - v2 update → shallow or deep diff translation (mode ≙ the
      OTR_OPLOG_V2_EXTRACT_SUBFIELD_CHANGES config)
    - v1 update → union of keys under each ``$``-operator (``$v`` skipped;
      non-map operator values skipped with ``on_unprocessable``)
    - anything else (delete, command) → ``[]``
    """
    if data is None:
        data = {}
    if op == OP_INSERT or (op == OP_UPDATE and update_is_replace(data)):
        return map_keys(data)
    if op == OP_UPDATE and is_v2_update(data):
        diff = data.get("diff")
        if not isinstance(diff, dict):
            raise ChangedFieldsError("v2 update without a map-valued diff field")
        if v2_deep:
            return v2_changed_fields_deep(diff, "", on_unprocessable)
        return v2_changed_fields_shallow(diff, on_unprocessable)
    if op == OP_UPDATE:
        fields: list[str] = []
        for op_key, operation in data.items():
            if op_key == "$v":
                continue
            if not isinstance(operation, dict):
                if on_unprocessable:
                    on_unprocessable(op_key)
                continue
            fields.extend(map_keys(operation))
        return fields
    return []

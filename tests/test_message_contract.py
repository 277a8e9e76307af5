"""Acceptance-level message-contract goldens.

These mirror the reference's dockerized acceptance tests, which insert into
a real MongoDB and assert the exact set of published messages per channel
(/root/reference/integration-tests/acceptance/{insert,update,remove,
transaction,commands}_test.go).  Here the oplog entries those writes produce
are replayed through flatten_raw_entry → process_entry, asserting the same
``{"e","d","f"}`` messages on the same channels.
"""

import pytest

from oplogtoredis_ray.functions.docid import ObjectID, UnsupportedDocIDType
from oplogtoredis_ray.functions.processor import process_entry
from oplogtoredis_ray.functions.transactions import flatten_raw_entry


def _raw(op, ns, o=None, o2=None, ts=(100, 1), wall=100):
    return {"op": op, "ns": ns, "o": o, "o2": o2, "ts": ts, "wall": wall}


def _publish(raw, v2_deep=False):
    out = []
    for entry in flatten_raw_entry(raw):
        pub = process_entry(entry, v2_deep=v2_deep)
        if pub is not None:
            out.append(pub)
    return out


def test_insert_message():
    # insert_test.go:13-37
    pubs = _publish(_raw("i", "tests.Foo", {"_id": "someid", "hello": "world"}))
    assert len(pubs) == 1
    p = pubs[0]
    assert p.channels == ["tests.Foo", "tests.Foo::someid"]
    assert p.msg == {"e": "i", "d": {"_id": "someid"}, "f": ["_id", "hello"]}


def test_update_set_message():
    # update_test.go TestUpdate: $set of two fields
    pubs = _publish(
        _raw(
            "u",
            "tests.Foo",
            {"$v": "1.0", "$set": {"hello": "new", "world": "new"}},
            {"_id": "someid"},
        )
    )
    p = pubs[0]
    assert p.msg["e"] == "u"
    assert sorted(p.msg["f"]) == ["hello", "world"]
    assert p.channels[1] == "tests.Foo::someid"


def test_update_replace_message():
    # update_test.go TestUpdateReplace: whole-doc replacement → top-level keys
    pubs = _publish(
        _raw("u", "tests.Foo", {"_id": "someid", "world": "new"}, {"_id": "someid"})
    )
    p = pubs[0]
    assert p.msg["e"] == "u"
    assert sorted(p.msg["f"]) == ["_id", "world"]


def test_update_array_position_v2_deep():
    # update_test.go TestUpdateArraySet ($inc hello.$.value on index 1) —
    # Mongo ≥5 emits a v2 diff with an array operator; deep mode yields the
    # dotted array path
    pubs = _publish(
        _raw(
            "u",
            "tests.Foo",
            {"$v": 2, "diff": {"shello": {"a": True, "u1": {"value": 21}}}},
            {"_id": "someid"},
        ),
        v2_deep=True,
    )
    assert pubs[0].msg["f"] == ["hello.1"]


def test_update_array_push_shallow():
    # update_test.go TestUpdateArrayPush: whole-array set → top-level field
    pubs = _publish(
        _raw(
            "u",
            "tests.Foo",
            {"$v": 2, "diff": {"u": {"hello": [10, 25, 20, 30, 40]}}},
            {"_id": "someid"},
        )
    )
    assert pubs[0].msg["f"] == ["hello"]


def test_remove_message():
    # remove_test.go:12-43: delete → event "r", empty fields
    pubs = _publish(_raw("d", "tests.Foo", {"_id": "someid"}))
    p = pubs[0]
    assert p.msg == {"e": "r", "d": {"_id": "someid"}, "f": []}


def test_transaction_messages():
    # transaction_test.go:19-96: applyOps flattening → one message per op,
    # shared optime, tx_idx ordinal
    raw = _raw(
        "c",
        "admin.$cmd",
        {
            "applyOps": [
                _raw("i", "tests.Foo", {"_id": "a", "x": 1}),
                _raw("u", "tests.Foo", {"$v": "1.0", "$set": {"x": 2}}, {"_id": "b"}),
            ]
        },
        ts=(555, 7),
    )
    pubs = _publish(raw)
    assert len(pubs) == 2
    assert [p.tx_idx for p in pubs] == [0, 1]
    assert all(p.oplog_ts == (555, 7) for p in pubs)
    assert pubs[0].msg["e"] == "i" and pubs[1].msg["e"] == "u"


def test_commands_publish_nothing():
    # commands_test.go:13-47: index creation and dropCollection are silent
    assert _publish(_raw("c", "tests.$cmd", {"drop": "Foo"})) == []
    assert _publish(
        _raw("i", "tests.system.indexes", {"_id": "idx", "key": {"a": 1}})
    ) == []
    # whole config database is internal
    assert _publish(_raw("i", "config.transactions", {"_id": "t1"})) == []


def test_objectid_and_unsupported_id():
    # processor_test.go: ObjectID serialization + unsupported type error
    oid = ObjectID(bytes(range(12)))
    pubs = _publish(_raw("i", "tests.Foo", {"_id": oid, "x": 1}))
    p = pubs[0]
    hexid = bytes(range(12)).hex()
    assert p.channels[1] == f"tests.Foo::{hexid}"
    assert p.msg["d"]["_id"] == {"$type": "oid", "$value": hexid}

    with pytest.raises(UnsupportedDocIDType):
        _publish(_raw("i", "tests.Foo", {"_id": 42, "x": 1}))


def test_parallelism_key_is_database_hash():
    pubs = _publish(_raw("i", "foo.Bar", {"_id": "x"}))
    assert pubs[0].parallelism_key == -5843589418109203719  # fooHash pin

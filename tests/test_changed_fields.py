"""Golden corpus for the changed-fields kernels.

Cases ported (as data, semantics-for-semantics) from the reference's unit
tests:
- /root/reference/lib/oplog/oplogEntry_test.go:154-351 (v1/replace/delete/v2 matrix)
- /root/reference/lib/oplog/oplog_v2_converter_test.go:12-174 (Meteor deep corpus)
"""

import pytest

from oplogtoredis_ray.functions import (
    changed_fields,
    flat_object_keys,
    is_array_operator,
    is_v2_update,
    map_keys,
    update_is_replace,
    v2_changed_fields_deep,
)


# --- ChangedFields matrix (oplogEntry_test.go:154-351) -----------------------
# Every reference case name, mapped 1:1:
#   Insert → insert; Replacement update → replacement_update; Delete → delete;
#   Update → update_v1; Update, no operations → update_v1_no_ops;
#   Update, unexpected operation value type → update_v1_unexpected_value_type;
#   Update v2 → update_v2_shallow; Update v2 deep → update_v2_deep;
#   Update v2, no operations[, deep] → update_v2_no_ops[_deep];
#   Update v2, unexpected operation value type[, deep] →
#   update_v2_unexpected_value_type[_deep].
# TestCategorization / TestMapKeys[Raw] / TestUpdateIsReplace /
# TestUpdateIsV2Formatted map to the building-block tests at the bottom.

MATRIX = [
    # (name, op, data, want, v2_deep)
    ("insert", "i", {"foo": "a", "bar": 10}, ["foo", "bar"], False),
    ("replacement_update", "u", {"foo": "a", "bar": 10}, ["foo", "bar"], False),
    ("delete", "d", {"foo": "a", "bar": 10}, [], False),
    (
        "update_v1",
        "u",
        {
            "$v": "1.0",
            "$set": {"foo": "a", "bar": {"xxx": "yyy"}, "baz.qux": 10},
            "$unset": {"qax": True},
        },
        ["foo", "bar", "baz.qux", "qax"],
        False,
    ),
    ("update_v1_no_ops", "u", {"$v": "1.0", "$set": {}}, [], False),
    (
        "update_v1_unexpected_value_type",
        "u",
        {"$v": "1.0", "weird": "thing", "$set": {"foo": "a"}},
        ["foo"],
        False,
    ),
    (
        "update_v2_shallow",
        "u",
        {
            "$v": 2,
            "diff": {
                "i": {"a": 1, "b": "2"},
                "u": {"c": 1, "d": "2"},
                "d": {"e": 1, "f": "2"},
                "sg": 10,
                "sfoobar": {},
            },
        },
        ["a", "b", "c", "d", "e", "f", "g", "foobar"],
        False,
    ),
    (
        "update_v2_deep",
        "u",
        {
            "$v": 2,
            "diff": {
                "i": {"a": 1, "b": "2"},
                "u": {"c": 1, "d": "2"},
                "d": {"e": 1, "f": "2"},
                "sg": {},
                "sfoobar": {},
            },
        },
        ["a", "b", "c", "d", "e", "f"],
        True,
    ),
    ("update_v2_no_ops", "u", {"$v": 2, "diff": {}}, [], False),
    ("update_v2_no_ops_deep", "u", {"$v": 2, "diff": {}}, [], True),
    (
        "update_v2_unexpected_value_type",
        "u",
        {"$v": 2, "weird": "thing", "diff": {"i": 10, "otherwierd": "thing", "sfoo": "bar"}},
        ["foo"],
        False,
    ),
    (
        "update_v2_unexpected_value_type_deep",
        "u",
        {
            "$v": 2,
            "weird": "thing",
            "diff": {"i": 10, "otherwierd": "thing", "sfoo": {"u": {"x": "10"}}},
        },
        ["foo.x"],
        True,
    ),
]


@pytest.mark.parametrize("name,op,data,want,v2_deep", MATRIX, ids=[m[0] for m in MATRIX])
def test_changed_fields_matrix(name, op, data, want, v2_deep):
    got = changed_fields(op, data, v2_deep=v2_deep)
    assert sorted(got) == sorted(want)


# --- V2 deep converter corpus (oplog_v2_converter_test.go:12-174) ------------

DEEP_CORPUS = [
    (
        "basic",
        {"scustom": {"sEJSON$value": {"u": {"EJSONtail": "d"}}}},
        ["custom.EJSON$value.EJSONtail"],
    ),
    ("basic_with_u", {"u": {"d": "2", "oi": "asdas"}}, ["d", "oi"]),
    ("set_inside_array", {"sasd": {"a": True, "u0": 2}}, ["asd.0"]),
    ("unset_inside_array", {"sasd": {"a": True, "u0": None}}, ["asd.0"]),
    ("set_new_nested_field", {"i": {"a": {"b": 2}}}, ["a.b"]),
    (
        "set_new_nested_field_variant",
        {"u": {"count": 1}, "i": {"nested": {"state": {}}}},
        ["nested.state", "count"],
    ),
    ("set_existing_nested", {"sa": {"i": {"b": 3, "c": 1}}}, ["a.b", "a.c"]),
    ("unset_existing_nested", {"sa": {"d": {"b": False}}}, ["a.b"]),
    ("combine_u_and_s", {"u": {"c": "bar"}, "sb": {"a": True, "u0": 2}}, ["b.0", "c"]),
    (
        "deeply_nested_s",
        {"sservices": {"sresume": {"u": {"loginTokens": []}}}},
        ["services.resume.loginTokens"],
    ),
    (
        "set_new_array",
        {"i": {"tShirt": {"sizes": ["small", "medium", "large"]}}},
        ["tShirt.sizes"],
    ),
    (
        "update_specific_list_elements",
        {"slist": {"a": True, "u3": "i", "u4": "h"}},
        ["list.3", "list.4"],
    ),
    ("set_whole_array", {"sobject": {"u": {"array": ["2", "2", "4", "3"]}}}, ["object.array"]),
    (
        "more_deep_nesting",
        {"slayout": {"sjourneyStepIds": {"sj4aqp3tiK6xCPCYu8": {"a": True, "u2": "zTkxivNrKuBi2iJ2m"}}}},
        ["layout.journeyStepIds.j4aqp3tiK6xCPCYu8.2"],
    ),
    (
        "misleading_array_operator_like_keys",
        {"sarray": {"a": True, "s2": {"u": {"a": "something"}}}},
        ["array.2.a"],
    ),
]


@pytest.mark.parametrize("name,diff,want", DEEP_CORPUS, ids=[c[0] for c in DEEP_CORPUS])
def test_v2_deep_corpus(name, diff, want):
    got = v2_changed_fields_deep(diff)
    assert sorted(got) == sorted(want)


# --- Building blocks ---------------------------------------------------------


def test_map_keys_order():
    assert map_keys({"key1": "foo", "key2": 2, "key3": None}) == ["key1", "key2", "key3"]


def test_is_v2_update():
    assert is_v2_update({"$v": 2, "diff": {}})
    assert not is_v2_update({"$v": 2})  # no diff
    assert not is_v2_update({"$v": "2", "diff": {}})  # string $v
    assert not is_v2_update({"$v": 1, "diff": {}})
    assert not is_v2_update({"diff": {}})
    assert not is_v2_update({"$v": True, "diff": {}})  # bool is not int 2


def test_update_is_replace():
    # ≙ TestUpdateIsReplace (oplogEntry_test.go:109-152): set / unset /
    # set-and-unset / replacement
    assert update_is_replace({"foo": "bar"})
    assert not update_is_replace({"$set": {"a": 1}})
    assert not update_is_replace({"$unset": {"a": True}})
    assert not update_is_replace({"$set": {"foo": "bar"}, "$unset": {"foo": "bar"}})
    assert update_is_replace({"$v": {"foo": "bar"}, "foo": "bar"})  # "replacement"
    assert not update_is_replace({"$v": 2, "diff": {}})
    assert update_is_replace({"$v": 2})  # v2 without diff is not a v2 update


def test_is_array_operator():
    assert is_array_operator({"a": True, "u0": 2})
    assert is_array_operator({"a": True})
    assert not is_array_operator({})
    assert not is_array_operator(None)
    assert not is_array_operator({"u0": 2})  # no "a"
    assert not is_array_operator({"a": True, "s2": {}})  # non-uN key
    assert not is_array_operator({"a": True, "ux": 1})  # u must be followed by digits
    assert not is_array_operator("a")


def test_flat_object_keys():
    obj = {"a": {"b": {"c": [{"d": 1}], "e": 2}, "f": 3}}
    assert sorted(flat_object_keys("", obj)) == ["a.b.c", "a.b.e", "a.f"]
    assert flat_object_keys("", {"x": {}}) == ["x"]


def test_unprocessable_counter():
    seen = []
    got = changed_fields(
        "u",
        {"$v": 2, "diff": {"i": 10, "zzz": "thing"}},
        on_unprocessable=seen.append,
    )
    assert got == []
    assert seen == ["i", "zzz"]

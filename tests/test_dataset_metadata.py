"""Gender/age metadata → attribute-token mapping (reference test parity)."""

from oron_tts_tpu.data.dataset import attr_tokens_from_metadata


def test_gender_and_age_mapping():
    item = {"gender": "Female", "age": "twenties"}
    assert attr_tokens_from_metadata(item, "gender", "age") == [
        "[FEMALE]", "[YOUNG]",
    ]


def test_unknown_values_rejected():
    assert attr_tokens_from_metadata({"gender": "other"}, "gender", None) == []
    assert attr_tokens_from_metadata({"gender": "unknown"}, "gender", None) == []
    assert attr_tokens_from_metadata({"age": "nan"}, None, "age") == []
    assert attr_tokens_from_metadata({"age": ""}, None, "age") == []


def test_normalization_of_values():
    assert attr_tokens_from_metadata({"g": "  MALE "}, "g", None) == ["[MALE]"]
    assert attr_tokens_from_metadata({"a": "Sixties"}, None, "a") == ["[ELDERLY]"]
    assert attr_tokens_from_metadata({"a": "30s"}, None, "a") == ["[MIDDLE]"]


def test_missing_columns_ignored():
    assert attr_tokens_from_metadata({}, "gender", "age") == []
    assert attr_tokens_from_metadata({"gender": "male"}, None, None) == []


def test_parity_with_reference():
    import pytest

    from tests.conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("no reference")
    add_reference_to_path()
    from src.data.dataset import _attr_tokens_from_metadata as ref_fn

    cases = [
        ({"gender": "female", "age": "teens"}, "gender", "age"),
        ({"gender": "M", "age": "fourties"}, "gender", "age"),
        ({"gender": "woman"}, "gender", None),
        ({"age": "90s"}, None, "age"),
        ({"gender": "robot", "age": "ancient"}, "gender", "age"),
    ]
    for item, g, a in cases:
        assert ref_fn(item, gender_column=g, age_column=a) == \
            attr_tokens_from_metadata(item, gender_column=g, age_column=a)

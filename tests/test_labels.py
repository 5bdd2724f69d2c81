"""ImageNet label-table loader tests (replaces Main.c's imagenet_label)."""

from pathlib import Path

import pytest

from vit_tpu.io.labels import _parse_c_string_array, load_labels


def test_parse_c_string_array():
    src = 'const char* names[3] = {"tench", "goldfish", "great white shark"};'
    assert _parse_c_string_array(src) == ["tench", "goldfish", "great white shark"]


def test_parse_picks_longest_array():
    src = '{"a", "b"}; x = {"one", "two", "three"};'
    assert _parse_c_string_array(src) == ["one", "two", "three"]


def test_parse_handles_escaped_quotes():
    src = '{"a \\"quoted\\" name", "plain"}'
    assert _parse_c_string_array(src) == ['a "quoted" name', "plain"]


def test_load_from_text_file(tmp_path):
    f = tmp_path / "labels.txt"
    f.write_text("alpha\nbeta\ngamma\n")
    assert load_labels(str(f), num_classes=3) == ["alpha", "beta", "gamma"]


def test_load_from_c_source(tmp_path):
    f = tmp_path / "labels.c"
    f.write_text('char* t[] = {"x", "y", "z", "w"};')
    assert load_labels(str(f), num_classes=4) == ["x", "y", "z", "w"]


def test_too_few_labels_raises(tmp_path):
    f = tmp_path / "labels.txt"
    f.write_text("only_one\n")
    with pytest.raises(ValueError):
        load_labels(str(f), num_classes=5)


def test_fallback_placeholders(monkeypatch, tmp_path):
    # Force the no-source path: packaged asset missing and no env source.
    import vit_tpu.io.labels as labels_mod

    monkeypatch.setattr(labels_mod, "_PACKAGED_LABELS", tmp_path / "nope.txt")
    monkeypatch.delenv("VIT_TPU_LABELS_SOURCE", raising=False)
    labels = load_labels(None, num_classes=7)
    assert labels == [f"class_{i}" for i in range(7)]


def test_packaged_asset_is_self_contained():
    """The framework ships the ImageNet-1k names — no reference checkout
    needed at runtime (Main.c:14-16's table, as standard public data)."""
    labels = load_labels(None, num_classes=1000)
    assert len(labels) == 1000
    assert labels[65] == "sea snake"  # answer_result.txt:1's class
    assert labels[0] == "tench"


def test_env_source_fallback(monkeypatch, tmp_path):
    import vit_tpu.io.labels as labels_mod

    src = tmp_path / "alt.c"
    src.write_text('char* t[] = {"aa", "bb", "cc"};')
    monkeypatch.setattr(labels_mod, "_PACKAGED_LABELS", tmp_path / "nope.txt")
    monkeypatch.setenv("VIT_TPU_LABELS_SOURCE", str(src))
    assert load_labels(None, num_classes=3) == ["aa", "bb", "cc"]

"""CLI config layering tests (_base_ inheritance, closed schema)."""

from __future__ import annotations

import json

import pytest

from webextract.__main__ import load_config


def test_base_chain_and_dict_merge(tmp_path):
    (tmp_path / "base.json").write_text(json.dumps({
        "min_region_size": 5,
        "merge_aliases": {"title": "header"},
    }))
    (tmp_path / "child.json").write_text(json.dumps({
        "_base_": "base.json",
        "max_link_density": 0.4,
        "merge_aliases": {"blockquote": "paragraph"},
    }))
    cfg = load_config(str(tmp_path / "child.json"))
    assert cfg.min_region_size == 5            # inherited
    assert cfg.max_link_density == 0.4         # child
    # dict values merge per-key, as in the reference's CfgNode merge
    assert cfg.merge_aliases == {"title": "header",
                                 "blockquote": "paragraph"}


def test_child_overrides_base(tmp_path):
    (tmp_path / "base.json").write_text(json.dumps({"min_region_size": 5}))
    (tmp_path / "child.json").write_text(json.dumps({
        "_base_": "base.json", "min_region_size": 9}))
    assert load_config(str(tmp_path / "child.json")).min_region_size == 9


def test_base_cycle_rejected(tmp_path):
    (tmp_path / "a.json").write_text(json.dumps({"_base_": "b.json"}))
    (tmp_path / "b.json").write_text(json.dumps({"_base_": "a.json"}))
    with pytest.raises(SystemExit, match="cycle"):
        load_config(str(tmp_path / "a.json"))


def test_unknown_key_rejected_through_chain(tmp_path):
    (tmp_path / "base.json").write_text(json.dumps({"bogus": 1}))
    (tmp_path / "child.json").write_text(json.dumps({"_base_": "base.json"}))
    with pytest.raises(SystemExit, match="unknown config keys"):
        load_config(str(tmp_path / "child.json"))

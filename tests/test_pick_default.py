"""Unit tests for scripts/pick_serving_default.py — the data-driven
serving-default pick (fastest arm whose TPU quality gate accepts) that
bench.py reads as its default config overlay."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import pick_serving_default as psd  # noqa: E402


def _write(root, rel, obj):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump(obj, f)


def _gate(miou, passes=True):
    return {
        "miou_semantic": miou,
        "accept": {"psnr_raw > 20": True, "miou > 0.90": passes,
                   "fd_ratio < 3": True},
    }


def _setup(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "docs"), exist_ok=True)
    return root


def test_picks_fastest_passing_arm(tmp_path):
    root = _setup(tmp_path)
    b, g, _ = psd.ARMS["bf16_baseline"]
    _write(root, b, {"value": 63.4})
    _write(root, g, _gate(0.94))
    b, g, _ = psd.ARMS["maxcfg"]
    _write(root, b, {"value": 71.4})
    _write(root, g, _gate(0.93))
    assert psd.main(root) == 0
    out = json.load(open(os.path.join(root, "docs/serving_default.json")))
    assert out["chosen_arm"] == "maxcfg"
    assert out["config"]["g_fp16"] == 7
    canon = json.load(
        open(os.path.join(root, "docs/frustum_quality_r5_tpu.json")))
    assert canon["copied_from"] == psd.ARMS["maxcfg"][1]


def test_fast_but_red_gated_arm_is_skipped(tmp_path):
    root = _setup(tmp_path)
    b, g, _ = psd.ARMS["bf16_baseline"]
    _write(root, b, {"value": 63.4})
    _write(root, g, _gate(0.94))
    b, g, _ = psd.ARMS["maxcfg"]
    _write(root, b, {"value": 71.4})
    _write(root, g, _gate(0.88, passes=False))  # fast arm fails its gate
    assert psd.main(root) == 0
    out = json.load(open(os.path.join(root, "docs/serving_default.json")))
    assert out["chosen_arm"] == "bf16_baseline"
    assert out["config"] == {}


def test_benched_but_ungated_arm_is_not_eligible(tmp_path):
    root = _setup(tmp_path)
    b, g, _ = psd.ARMS["bf16_baseline"]
    _write(root, b, {"value": 63.4})
    _write(root, g, _gate(0.94))
    b, _, _ = psd.ARMS["carry_f32"]
    _write(root, b, {"value": 99.0})  # bench only, no gate JSON
    assert psd.main(root) == 0
    out = json.load(open(os.path.join(root, "docs/serving_default.json")))
    assert out["chosen_arm"] == "bf16_baseline"


def test_no_eligible_arm_leaves_default_untouched(tmp_path):
    root = _setup(tmp_path)
    b, g, _ = psd.ARMS["bf16_baseline"]
    _write(root, b, {"value": 63.4})
    _write(root, g, _gate(0.85, passes=False))
    assert psd.main(root) == 1
    assert not os.path.exists(
        os.path.join(root, "docs/serving_default.json"))

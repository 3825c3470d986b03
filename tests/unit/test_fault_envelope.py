"""Probed fault-envelope artifact loading and chunk-shape selection."""

from __future__ import annotations

import json

from farkle_ii_tpu.utils.fault_envelope import FaultEnvelope, load_fault_envelope


def _write(tmp_path, payload):
    p = tmp_path / "envelope.json"
    p.write_text(json.dumps(payload))
    return p


def _payload(ok_shapes, n_strategies=5160):
    return {
        "envelope_version": 1,
        "platform": "tpu",
        "device_kind": "TPU v5 lite",
        "n_strategies": n_strategies,
        "ok_shapes": ok_shapes,
    }


def test_load_and_select(tmp_path):
    path = _write(
        tmp_path,
        _payload([[2, 16, True], [2, 64, True], [5, 16, True], [5, 43, True]]),
    )
    env = load_fault_envelope(path, n_strategies=5160)
    assert env is not None
    # largest probed-safe shape under the cap
    assert env.max_safe_ns(2, compact=True, cap=43) == 16
    assert env.max_safe_ns(2, compact=True, cap=128) == 64
    assert env.max_safe_ns(5, compact=True, cap=43) == 43
    # unprobed (k, compact) combinations fall back to None
    assert env.max_safe_ns(3, compact=True, cap=43) is None
    assert env.max_safe_ns(2, compact=False, cap=43) is None
    assert env.is_probed_ok(2, 16, True)
    assert not env.is_probed_ok(2, 43, True)


def test_unset_missing_and_corrupt(tmp_path):
    assert load_fault_envelope(None) is None
    assert load_fault_envelope(tmp_path / "absent.json") is None
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert load_fault_envelope(bad) is None
    # schema-valid JSON with the wrong shape types is rejected, not crashed
    assert load_fault_envelope(_write(tmp_path, {"ok_shapes": "nope"})) is None


def test_grid_size_mismatch_ignored(tmp_path):
    path = _write(tmp_path, _payload([[2, 64, True]], n_strategies=5160))
    # batch shapes are ns*n_strategies/k games: a different grid size means
    # the probe does not transfer
    assert load_fault_envelope(path, n_strategies=120) is None
    env = load_fault_envelope(path, n_strategies=5160)
    assert isinstance(env, FaultEnvelope)
    # artifacts probed before the grid-size field are still accepted
    legacy = _write(tmp_path, {"ok_shapes": [[2, 64, True]]})
    assert load_fault_envelope(legacy, n_strategies=120) is not None

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


def test_best_ns_prefers_measured_fastest(tmp_path):
    payload = _payload([[2, 16, True], [2, 64, True], [2, 96, True]])
    payload["probes"] = [
        {"k": 2, "ns": 16, "compact": True, "ok": True, "games_per_sec": 900_000},
        {"k": 2, "ns": 64, "compact": True, "ok": True, "games_per_sec": 1_500_000},
        {"k": 2, "ns": 96, "compact": True, "ok": True, "games_per_sec": 1_400_000},
        # faulted probes never contribute speed entries
        {"k": 2, "ns": 43, "compact": True, "ok": False, "games_per_sec": None},
    ]
    env = load_fault_envelope(_write(tmp_path, payload))
    # fastest safe shape wins, not the largest
    assert env.best_ns(2, compact=True, cap=128) == 64
    # the cap still constrains the choice
    assert env.best_ns(2, compact=True, cap=43) == 16
    # without timings (legacy artifact) falls back to largest-safe
    legacy = load_fault_envelope(_write(tmp_path, _payload([[2, 16, True], [2, 96, True]])))
    assert legacy.best_ns(2, compact=True, cap=128) == 96


def test_best_block_group_exact_nsb_only(tmp_path):
    payload = _payload([])
    payload["block_group_probes"] = [
        {"k": 2, "m": 4, "nsb": 43, "compact": True, "ok": True, "games_per_sec": 2_000_000},
        # legacy record without a family field: treated as a scan probe
        {"k": 2, "m": 8, "nsb": 43, "compact": True, "ok": True, "games_per_sec": 3_000_000},
        {"k": 2, "m": 8, "nsb": 43, "compact": True, "family": "flat", "ok": True, "games_per_sec": 3_500_000},
        {"k": 2, "m": 16, "nsb": 43, "compact": True, "ok": False, "games_per_sec": None},
        {"k": 2, "m": 8, "nsb": 50, "compact": True, "ok": True, "games_per_sec": 9_000_000},
    ]
    env = load_fault_envelope(_write(tmp_path, payload))
    # fastest safe (m, family) for the exact per-block shuffle count; other
    # nsb values are a different program shape and must not transfer. The
    # flat probe is fastest (3.5M) but within 15% of the scan (3.0M), so
    # the deserialize-aware tie-break picks the scan program (flat AOT
    # blobs measured ~12 s slower to load per cell).
    assert env.best_block_group(2, nsb=43, compact=True, max_m=100) == (8, "scan")
    assert env.best_block_group(2, nsb=43, compact=True, max_m=6) == (4, "scan")
    assert env.best_block_group(2, nsb=41, compact=True, max_m=100) is None
    # a flat probe faster by MORE than 15% keeps the flat family
    payload["block_group_probes"].append(
        {"k": 2, "m": 8, "nsb": 43, "compact": True, "family": "flat",
         "ok": True, "games_per_sec": 4_000_000},
    )
    env2 = load_fault_envelope(_write(tmp_path, payload))
    assert env2.best_block_group(2, nsb=43, compact=True, max_m=100) == (8, "flat")
    assert env.best_block_group(3, nsb=43, compact=True, max_m=100) is None


def test_block_group_floor_speed(tmp_path):
    payload = _payload([[5, 43, True]])
    payload["probes"] = [
        {"k": 5, "ns": 43, "compact": True, "ok": True, "games_per_sec": 1_300_000},
    ]
    payload["block_group_probes"] = [
        {"k": 5, "m": 8, "nsb": 43, "compact": True, "ok": True, "games_per_sec": 1_100_000},
    ]
    env = load_fault_envelope(_write(tmp_path, payload))
    assert env.chunk_speed(5, ns=43, compact=True) == 1_300_000
    assert env.chunk_speed(5, ns=17, compact=True) is None
    # a grouped program slower than the per-block chunk scan is rejected
    floor = env.chunk_speed(5, ns=43, compact=True)
    assert env.best_block_group(5, nsb=43, compact=True, max_m=100, floor_speed=floor) is None
    # and accepted when it actually beats the chunk path
    assert (
        env.best_block_group(5, nsb=43, compact=True, max_m=100, floor_speed=900_000.0)
        == (8, "scan")
    )
    # no floor (no timed chunk probe) keeps the old behavior
    assert env.best_block_group(5, nsb=43, compact=True, max_m=100, floor_speed=None) == (8, "scan")


def test_best_h2h_batch(tmp_path):
    payload = _payload([])
    payload["h2h_probes"] = [
        {"h2h_batch": 16384, "ok": True, "games_per_sec": 250_000},
        {"h2h_batch": 65536, "ok": True, "games_per_sec": 600_000},
        {"h2h_batch": 131072, "ok": True, "games_per_sec": 550_000},
        {"h2h_batch": 262144, "ok": False, "games_per_sec": None},
    ]
    env = load_fault_envelope(_write(tmp_path, payload))
    # fastest probed-fault-free batch, not the largest
    assert env.best_h2h_batch() == 65536
    assert env.best_h2h_batch(cap=32768) == 16384
    assert env.best_h2h_batch(cap=1000) is None
    # legacy artifact: fault-free batches recorded without speeds -> largest
    legacy_payload = _payload([])
    legacy_payload["h2h_probes"] = [
        {"h2h_batch": 16384, "ok": True},
        {"h2h_batch": 65536, "ok": True},
    ]
    legacy = load_fault_envelope(_write(tmp_path, legacy_payload))
    assert legacy.best_h2h_batch() == 65536
    # never probed -> None (caller keeps its configured default)
    assert load_fault_envelope(_write(tmp_path, _payload([]))).best_h2h_batch() is None


def test_resolve_h2h_dispatch_cap(tmp_path):
    from farkle_ii_tpu.analysis.h2h_schedule import _resolve_h2h_dispatch_cap
    from farkle_ii_tpu.config import AppConfig

    payload = _payload([])
    payload["h2h_probes"] = [
        {"h2h_batch": 16384, "ok": True, "games_per_sec": 250_000},
        {"h2h_batch": 65536, "ok": True, "games_per_sec": 600_000},
    ]
    env_path = _write(tmp_path, payload)

    cfg = AppConfig()
    cfg.tpu.h2h_games_per_dispatch = 0
    cfg.tpu.fault_envelope_path = str(env_path)
    assert _resolve_h2h_dispatch_cap(cfg) == 65536
    # an explicit config value always wins over the envelope
    cfg.tpu.h2h_games_per_dispatch = 4096
    assert _resolve_h2h_dispatch_cap(cfg) == 4096
    # auto without an envelope keeps the conservative default
    cfg.tpu.h2h_games_per_dispatch = 0
    cfg.tpu.fault_envelope_path = None
    assert _resolve_h2h_dispatch_cap(cfg) == 16384


def test_block_resume_rejects_old_dice_stream(tmp_path):
    """Blocks persisted under an older dice-stream definition fail coordinate
    validation on resume (outcomes differ across stream versions)."""
    import pytest

    from farkle_ii_tpu.ops import game_kernel as gk
    from farkle_ii_tpu.simulation import tournament as T
    from farkle_ii_tpu.simulation.runner import (
        load_block_aggregate,
        save_block_aggregate,
    )

    acc = T.TournamentAccumulator(4)
    path = tmp_path / "blocks" / "block_000000.npz"
    coords = {
        "batch_id": 0,
        "root_seed": 7,
        "k": 2,
        "shuffle_lo": 0,
        "shuffle_hi": 0,
        "games_per_shuffle": 2,
        "dice_stream": gk.DICE_STREAM_VERSION,
    }
    save_block_aggregate(path, acc, batch_id=0, coordinates=coords)
    assert load_block_aggregate(path, expected_coordinates=coords) is not None

    # a block written before stream versioning (no dice_stream key) or under
    # the old stream must be replayed, never merged
    stale = dict(coords, dice_stream=1)
    save_block_aggregate(path, acc, batch_id=0, coordinates=stale)
    with pytest.raises(ValueError, match="dice_stream"):
        load_block_aggregate(path, expected_coordinates=coords)
    legacy = {k: v for k, v in coords.items() if k != "dice_stream"}
    save_block_aggregate(path, acc, batch_id=0, coordinates=legacy)
    with pytest.raises(ValueError, match="dice_stream"):
        load_block_aggregate(path, expected_coordinates=coords)


def test_best_shape_considers_compaction_off(tmp_path):
    payload = _payload([[4, 16, True], [4, 43, False]])
    payload["probes"] = [
        {"k": 4, "ns": 16, "compact": True, "ok": True, "games_per_sec": 282_000},
        {"k": 4, "ns": 43, "compact": True, "ok": False, "games_per_sec": None},
        {"k": 4, "ns": 43, "compact": False, "ok": True, "games_per_sec": 400_000},
    ]
    env = load_fault_envelope(_write(tmp_path, payload))
    # the compaction-off 43 out-runs the largest safe compacted chunk
    assert env.best_shape(4, cap=43) == (43, False)
    # under a tighter cap the compacted 16 wins again
    assert env.best_shape(4, cap=20) == (16, True)
    # untimed artifacts fall back to the compacted best_ns choice
    legacy = load_fault_envelope(_write(tmp_path, _payload([[4, 16, True]])))
    assert legacy.best_shape(4, cap=43) == (16, True)
    assert legacy.best_shape(9, cap=43) is None


def test_best_h2h_window(tmp_path):
    payload = _payload([])
    payload["h2h_window_probes"] = [
        {"nb": 32, "window": 2048, "ok": True, "games_per_sec": 1_200_000},
        {"nb": 128, "window": 2048, "ok": True, "games_per_sec": 2_400_000},
        {"nb": 512, "window": 2048, "ok": False, "games_per_sec": None},
    ]
    env = load_fault_envelope(_write(tmp_path, payload))
    assert env.best_h2h_window() == (128, 2048, 2_400_000)
    # never probed -> None (execution keeps the flat-probe-derived cap)
    assert load_fault_envelope(_write(tmp_path, _payload([]))).best_h2h_window() is None

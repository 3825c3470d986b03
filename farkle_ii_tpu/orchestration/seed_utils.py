"""Seed-pair directory scheme and per-root config preparation.

Reference parity (``/root/reference/src/farkle/orchestration/seed_utils.py``):
two-seed runs live under ``results_seed_pair_{A}_{B}/`` with one
``results_seed_{X}`` root per seed and a shared ``seed_pair_analysis``
directory; the active per-root config is written with round-trip sha
verification so a drifted config file can never silently drive a resume.
"""

from __future__ import annotations

import copy
from pathlib import Path

import yaml

from farkle_ii_tpu.config import AppConfig, assign_config_sha, compute_config_sha, config_from_dict
from farkle_ii_tpu.utils.writer import atomic_path


def pair_dir(cfg: AppConfig, seed_a: int, seed_b: int) -> Path:
    base = Path(cfg.data_dir) / f"{Path(cfg.io.results_dir_prefix).name}_seed_pair_{seed_a}_{seed_b}"
    return base


def seed_run_dir(cfg: AppConfig, seed_a: int, seed_b: int, seed: int) -> Path:
    return pair_dir(cfg, seed_a, seed_b) / f"results_seed_{seed}"


def pair_analysis_dir(cfg: AppConfig, seed_a: int, seed_b: int) -> Path:
    return pair_dir(cfg, seed_a, seed_b) / "seed_pair_analysis"


def prepare_seed_config(cfg: AppConfig, seed_a: int, seed_b: int, seed: int) -> AppConfig:
    """Per-root config clone rooted inside the pair directory."""
    clone = copy.deepcopy(cfg)
    clone.sim.seed = int(seed)
    clone.sim.seed_list = [int(seed)]
    clone.results_root_override = str(seed_run_dir(cfg, seed_a, seed_b, seed))
    return assign_config_sha(clone)


def prepare_pair_config(cfg: AppConfig, seed_a: int, seed_b: int) -> AppConfig:
    """Pair-analysis config clone (seed list carries both roots)."""
    clone = copy.deepcopy(cfg)
    clone.sim.seed = int(seed_a)
    clone.sim.seed_list = [int(seed_a), int(seed_b)]
    clone.results_root_override = str(pair_analysis_dir(cfg, seed_a, seed_b))
    return assign_config_sha(clone)


def write_active_config(cfg: AppConfig, path: Path) -> str:
    """Write active_config.yaml and verify the round-trip sha."""
    payload = cfg.to_dict()
    with atomic_path(path) as tmp:
        Path(tmp).write_text(yaml.safe_dump(payload, sort_keys=True), encoding="utf-8")
    reloaded = config_from_dict(yaml.safe_load(path.read_text(encoding="utf-8")))
    original_sha = compute_config_sha(cfg)
    round_trip_sha = compute_config_sha(reloaded)
    if round_trip_sha != original_sha:
        raise RuntimeError(
            f"active config round-trip sha mismatch: {round_trip_sha} != {original_sha}"
        )
    return original_sha

"""Two-seed pipeline: independent roots -> cross-seed stability -> pair H2H.

Reference parity (``/root/reference/src/farkle/orchestration/two_seed_pipeline.py``):

1. validates two distinct roots, prepares per-root configs under
   ``results_seed_pair_{A}_{B}/results_seed_{X}`` with round-trip-verified
   active configs;
2. runs each root's simulation + full root analysis plan (sequentially, or
   concurrently when ``orchestration.parallel_seeds``);
3. computes a per-root lifecycle identity sha over the completion stamps;
4. builds root-combined canonical contributions in the pair analysis root,
   runs root stability, freezes the pair candidate family, and executes the
   shared H2H tail across both roots;
5. writes ``pipeline_health.json`` and raises on any failure.
"""

from __future__ import annotations

import hashlib
import json
import logging
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
import pyarrow as pa

from farkle_ii_tpu.analysis.stage_runner import StageRunner, build_root_stage_plan
from farkle_ii_tpu.config import AppConfig
from farkle_ii_tpu.orchestration import seed_utils
from farkle_ii_tpu.utils import manifest as mf
from farkle_ii_tpu.utils.artifacts import (
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)


def _root_lifecycle_identity(cfg: AppConfig) -> str:
    """Sha over all completion stamps under one root's results tree."""
    digest = hashlib.sha256()
    for stamp in sorted(cfg.results_root.rglob("*.done.json")):
        digest.update(stamp.name.encode())
        digest.update(stamp.read_bytes())
    return digest.hexdigest()


def _run_one_seed(cfg: AppConfig, *, force: bool, lineage: str | None = None) -> dict:
    from farkle_ii_tpu.simulation.runner import run_simulation
    from farkle_ii_tpu.utils.stage_completion import run_lineage

    cfg.results_root.mkdir(parents=True, exist_ok=True)
    seed_utils.write_active_config(cfg, cfg.results_root / "active_config.yaml")
    # lineage is passed explicitly (not inherited) because parallel_seeds
    # runs the roots on worker threads, which do not share the caller's
    # context variables
    with run_lineage(lineage):
        sim_result = run_simulation(
            cfg, force=force, progress=lambda m: logger.info("%s", m)
        )
        analysis_result = StageRunner(cfg, build_root_stage_plan()).run(force=force)
    return {
        "seed": cfg.sim.seed,
        "games": sum(
            r.accumulator.games_attempted for r in sim_result["results"].values()
        ),
        "analysis_stages": analysis_result.ran,
        "lifecycle_identity": _root_lifecycle_identity(cfg),
    }


def _combine_pair_contributions(
    pair_cfg: AppConfig, cfg_a: AppConfig, cfg_b: AppConfig
) -> None:
    """Root-combined canonical contributions for the pair candidate freeze."""
    # equal-k performance: mean across roots on the complete-support
    # intersection; counts summed
    frames = []
    for cfg in (cfg_a, cfg_b):
        across = read_parquet_artifact(
            cfg.performance_across_k_path(), expected_producer="performance"
        ).to_pandas()
        frames.append(across[across["complete_support"]].set_index("strategy"))
    common = sorted(set(frames[0].index) & set(frames[1].index))
    combined = pd.DataFrame(
        {
            "root_seed": pair_cfg.sim.seed,
            "strategy": common,
            "complete_support": True,
            "equal_k_score": (
                frames[0].loc[common, "equal_k_score"].to_numpy()
                + frames[1].loc[common, "equal_k_score"].to_numpy()
            )
            / 2.0,
            "equal_k_mcse": (
                (
                    frames[0].loc[common, "equal_k_mcse"].to_numpy() ** 2
                    + frames[1].loc[common, "equal_k_mcse"].to_numpy() ** 2
                )
                ** 0.5
            )
            / 2.0,
            "raw_attempted_exposures": (
                frames[0].loc[common, "raw_attempted_exposures"].to_numpy()
                + frames[1].loc[common, "raw_attempted_exposures"].to_numpy()
            ),
        }
    )
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(combined, preserve_index=False),
        pair_cfg.performance_across_k_path(),
        producer="performance", scope="cross_seed",
        metadata={
            "operation": "root_combined_equal_k_mean",
            "roots": [cfg_a.sim.seed, cfg_b.sim.seed],
        },
    )

    # TrueSkill: NOT combined here — the pair plan's pair_trueskill stage
    # refits ratings over pair-combined curated rows (run_trueskill.run_root_pair)

    # pair strategy manifest: identical grids across roots; copy root A's
    manifest = read_parquet_artifact(
        cfg_a.strategy_manifest_path(), expected_producer="simulation"
    )
    write_parquet_artifact_atomic(
        manifest, pair_cfg.strategy_manifest_path(),
        producer="simulation", scope="cross_seed",
        metadata={"operation": "pair_strategy_manifest"},
    )


def run_pipeline(
    cfg: AppConfig,
    *,
    seeds: tuple[int, int] | None = None,
    force: bool = False,
) -> dict:
    """Full two-seed workflow; returns the pipeline health payload."""
    if seeds is None:
        if not cfg.sim.seed_list or len(cfg.sim.seed_list) != 2:
            raise ValueError(
                "two-seed pipeline requires sim.seed_list with exactly two seeds"
            )
        seeds = (int(cfg.sim.seed_list[0]), int(cfg.sim.seed_list[1]))
    seed_a, seed_b = seeds
    if seed_a == seed_b:
        raise ValueError("two-seed pipeline requires two distinct seeds")

    run_id = mf.new_run_id()
    pair_root = seed_utils.pair_dir(cfg, seed_a, seed_b)
    pair_root.mkdir(parents=True, exist_ok=True)
    manifest_path = pair_root / "manifest.ndjson"
    mf.append_manifest_event(
        manifest_path, "pipeline_start", run_id=run_id,
        config_sha=cfg.config_sha, seeds=[seed_a, seed_b],
    )

    cfg_a = seed_utils.prepare_seed_config(cfg, seed_a, seed_b, seed_a)
    cfg_b = seed_utils.prepare_seed_config(cfg, seed_a, seed_b, seed_b)

    # run-lineage sha: chains the pipeline invocation identity into every
    # completion stamp written below (per-root and pair scopes)
    lineage = hashlib.sha256(
        json.dumps(
            {"run_id": run_id, "config_sha": cfg.config_sha, "seeds": [seed_a, seed_b]},
            sort_keys=True,
        ).encode()
    ).hexdigest()

    health: dict = {
        "seeds": [seed_a, seed_b], "roots": {}, "status": "running",
        "run_lineage_sha": lineage,
    }
    try:
        parallel = cfg.orchestration.parallel_seeds
        if parallel:
            import jax

            # two threads against one accelerator share a single JAX client
            # with per-shape executable memoization; a worker fault in one
            # thread poisons the client for both (tests/FAILURE_NOTES.md).
            # The reference's analogue splits *process* pools per root
            # (two_seed_pipeline.py:99-129), which has no shared-client
            # hazard — so on a lone accelerator the roots run serially.
            if jax.default_backend() != "cpu" and len(jax.devices()) < 2:
                logger.warning(
                    "orchestration.parallel_seeds disabled: a single %s "
                    "device cannot isolate two concurrent root simulations "
                    "(shared-client fault domain); running roots serially",
                    jax.default_backend(),
                )
                parallel = False
        if parallel:
            with ThreadPoolExecutor(max_workers=2) as pool:
                futures = [
                    pool.submit(_run_one_seed, c, force=force, lineage=lineage)
                    for c in (cfg_a, cfg_b)
                ]
                results = [f.result() for f in futures]
        else:
            results = [
                _run_one_seed(c, force=force, lineage=lineage) for c in (cfg_a, cfg_b)
            ]
        for res in results:
            health["roots"][str(res["seed"])] = res

        # ── pair analysis ────────────────────────────────────────────────
        from farkle_ii_tpu.analysis.root_stability import summary_path
        from farkle_ii_tpu.analysis.stage_registry import build_root_pair_stage_plan
        from farkle_ii_tpu.utils.stage_completion import run_lineage

        pair_cfg = seed_utils.prepare_pair_config(cfg, seed_a, seed_b)
        pair_cfg.results_root.mkdir(parents=True, exist_ok=True)

        with run_lineage(lineage):
            _combine_pair_contributions(pair_cfg, cfg_a, cfg_b)
            # stability -> pair trueskill refit -> candidate freeze -> H2H tail
            tail_result = StageRunner(pair_cfg, build_root_pair_stage_plan()).run(
                force=force
            )
        stability = json.loads(summary_path(pair_cfg).read_text())
        health["root_stability"] = {
            "observed_max_abs_discrepancy": stability["observed_max_abs_discrepancy"],
            "within_bootstrap_band": stability["observed_within_bootstrap_band"],
        }
        health["pair_analysis_stages"] = tail_result.ran
        health["status"] = "ok"
    except Exception as exc:
        health["status"] = "error"
        health["error"] = f"{type(exc).__name__}: {exc}"
        write_json_atomic(pair_root / "pipeline_health.json", health)
        mf.append_manifest_event(
            manifest_path, "pipeline_end", run_id=run_id,
            config_sha=cfg.config_sha, status="error", error=str(exc),
        )
        raise

    write_json_atomic(pair_root / "pipeline_health.json", health)
    mf.append_manifest_event(
        manifest_path, "pipeline_end", run_id=run_id,
        config_sha=cfg.config_sha, status="ok",
    )
    return health

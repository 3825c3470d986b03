"""H2H power planning + block execution on the device kernel.

Reference parity (``/root/reference/src/farkle/analysis/h2h_schedule.py``):

* per-pair Bonferroni alpha = ``family_alpha / C(n,2)``;
* power of the *implemented* two-proportion score test computed exactly via
  binomial convolution over rejection boundaries (``:145-276``), with an
  asymptotic pre-bracketing pass; the minimum equal root/order block size is
  the smallest count whose worst-case power over the configured
  seat1-advantage scenarios meets ``target_power`` (``:314``);
* an immutable ``schedule_hash`` over the statistical contract (``:457``) and
  one block per (pair x root x order) with deterministic ``block_id``;
* ``blocked_by_cap`` vs ``ready`` execution authorization under
  ``total_game_cap``.

Execution is TPU-native: each pending block's attempt window is batched into
one 2-player device sweep (namespace-202/203 coordinates), and the
reference's sequential stop-at-target semantics are reproduced exactly by
truncating each block's ordered attempt stream at the attempt that reaches
``n_completed_required`` — deterministic games make played-then-discarded
identical to never-played. Blocks checkpoint into ``execution_state.json``
and the final row-preserving order-counts parquet.
"""

from __future__ import annotations

import hashlib
import json
import logging
import math
from functools import lru_cache
from itertools import combinations
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
from scipy.stats import binom, norm

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)

# default games-per-dispatch cap; production value comes from
# cfg.tpu.h2h_games_per_dispatch (0 = auto from the probed fault envelope,
# scripts/probe_fault_envelope.py --h2h-batches)
_H2H_GAMES_PER_DISPATCH = 16384
# ceiling on the FLAT-probe-derived auto choice: the flat probes time a
# play_games batch, but execution compiles the fused attempt-window program
# ((blocks, window) + stop-at-target scan) — a 1,048,576-game auto cap
# produced a window program whose remote compile crashed the TPU backend
# (UNAVAILABLE after ~25 min) even though the flat batch probed clean.
# Window-shaped probes EXIST since round 4 (envelope ``h2h_window_probes``,
# probed ascending up to 512x2048 at 5.08M games/s) and execution
# auto-selects its window shape from them (see ``execute_h2h`` window
# resolution); this cap only bounds the legacy flat-probe fallback when no
# window probe is available.
_H2H_AUTO_CAP = 65536


def _resolve_h2h_dispatch_cap(cfg: AppConfig) -> int:
    """Games per H2H device dispatch: explicit config, else the fastest
    probed-fault-free batch from the envelope artifact, else the
    conservative default."""
    explicit = int(cfg.tpu.h2h_games_per_dispatch)
    if explicit > 0:
        return explicit
    from farkle_ii_tpu.utils.fault_envelope import load_fault_envelope

    envelope = load_fault_envelope(cfg.tpu.fault_envelope_path)
    if envelope is not None:
        probed = envelope.best_h2h_batch(cap=_H2H_AUTO_CAP)
        if probed:
            logger.info(
                "h2h dispatch cap %d games from probed envelope", probed
            )
            return probed
    return _H2H_GAMES_PER_DISPATCH

H2H_METHOD_VERSION = 2
SCORE_TEST_ID = "two_proportion_score_constrained_null"
POWER_METHOD_ID = "exact_binomial_convolution_of_implemented_score_rule"
RNG_SCHEME_VERSION = 2
OUTCOME_SCHEMA_VERSION = 2
H2H_GAME_NAMESPACE = 202


# ── paths ────────────────────────────────────────────────────────────────────


def power_plan_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "h2h_power_plan.json"


def schedule_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "h2h_schedule.parquet"


def power_grid_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "h2h_power_grid.parquet"


def order_counts_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "h2h_order_counts.parquet"


def execution_state_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "execution_state.json"


# ── power math ───────────────────────────────────────────────────────────────


def independent_score_planning_power(
    games_per_order: int, q_ab: float, q_ba: float, alpha: float
) -> float:
    """Asymptotic normal-approximation power (pre-bracketing only)."""
    n = games_per_order
    pbar = 0.5 * (q_ab + q_ba)
    null_sd = math.sqrt(pbar * (1 - pbar) * 2.0 / n)
    alt_sd = math.sqrt((q_ab * (1 - q_ab) + q_ba * (1 - q_ba)) / n)
    critical = float(norm.ppf(1 - alpha / 2.0)) * null_sd
    diff = q_ab - q_ba
    upper = float(norm.sf((critical - diff) / alt_sd))
    lower = float(norm.cdf((-critical - diff) / alt_sd))
    return min(1.0, max(0.0, upper + lower))


@lru_cache(maxsize=32)
def _score_critical_value(alpha: float) -> float:
    return float(norm.isf(alpha / 2.0))


def _score_rejects(count1: int, nobs: int, count2: int, alpha: float) -> bool:
    """The implemented two-sided score rejection rule at equal sample sizes."""
    total = count1 + count2
    common = total / (2.0 * nobs)
    difference = (count1 - count2) / nobs
    variance = common * (1.0 - common) * (2.0 / nobs)
    if variance > 0.0:
        return abs(difference / math.sqrt(variance)) > _score_critical_value(alpha)
    return difference != 0.0


def _fixed_first_count_boundaries(count1: int, nobs: int, alpha: float) -> tuple[int, int]:
    """Largest rejecting lower / smallest rejecting upper second count."""
    lower = -1
    if count1 > 0 and _score_rejects(count1, nobs, 0, alpha):
        left, right = 0, count1
        while left + 1 < right:
            mid = (left + right) // 2
            if _score_rejects(count1, nobs, mid, alpha):
                left = mid
            else:
                right = mid
        lower = left
    upper = nobs + 1
    if count1 < nobs and _score_rejects(count1, nobs, nobs, alpha):
        left, right = count1, nobs
        while left + 1 < right:
            mid = (left + right) // 2
            if _score_rejects(count1, nobs, mid, alpha):
                right = mid
            else:
                left = mid
        upper = right
    return lower, upper


@lru_cache(maxsize=512)
def implemented_score_test_power(
    games_per_order: int, q_ab: float, q_ba: float, alpha: float
) -> float:
    """Exact power of the implemented score rule (binomial enumeration)."""
    if games_per_order < 1:
        raise ValueError("games_per_order must be positive")
    if not 0.0 < q_ab < 1.0 or not 0.0 < q_ba < 1.0:
        raise ValueError("planning probabilities must be strictly between zero and one")
    nobs = int(games_per_order)
    support = np.arange(nobs + 1, dtype=np.int64)
    first_pmf = binom.pmf(support, nobs, q_ab)
    lower = np.empty(nobs + 1, dtype=np.int64)
    upper = np.empty(nobs + 1, dtype=np.int64)
    for c1 in support.tolist():
        lower[c1], upper[c1] = _fixed_first_count_boundaries(c1, nobs, alpha)
    rejection_given_first = binom.cdf(lower, nobs, q_ba) + binom.sf(upper - 1, nobs, q_ba)
    power = float(np.dot(first_pmf, rejection_given_first))
    return min(1.0, max(0.0, power))


def scenario_probabilities(effect: float, seat1_advantage: float) -> tuple[float, float]:
    q_ab = 0.5 + seat1_advantage + effect
    q_ba = 0.5 + seat1_advantage - effect
    if not 0.0 < q_ba < q_ab < 1.0:
        raise ValueError(
            "head-to-head effect and seat-advantage scenario produce invalid "
            f"probabilities: q_ab={q_ab}, q_ba={q_ba}"
        )
    return q_ab, q_ba


def _worst_power(fn, *, block_games, root_count, effect, scenarios, alpha):
    games = block_games * root_count
    return min(
        fn(games, *scenario_probabilities(effect, adv), alpha) for adv in scenarios
    )


def minimum_block_games(
    *,
    root_count: int,
    effect: float,
    scenarios: tuple[float, ...],
    alpha_per_pair: float,
    target_power: float,
) -> int:
    """Smallest equal root/order block size meeting worst-case exact power."""

    def asympt_ok(b: int) -> bool:
        return (
            _worst_power(
                independent_score_planning_power,
                block_games=b, root_count=root_count, effect=effect,
                scenarios=scenarios, alpha=alpha_per_pair,
            )
            >= target_power
        )

    def exact_ok(b: int) -> bool:
        return (
            _worst_power(
                implemented_score_test_power,
                block_games=b, root_count=root_count, effect=effect,
                scenarios=scenarios, alpha=alpha_per_pair,
            )
            >= target_power
        )

    upper = 1
    while not asympt_ok(upper):
        upper *= 2
        if upper > 2**50:
            raise RuntimeError("H2H power search failed to find a finite allocation")
    lower = 0
    while lower + 1 < upper:
        mid = (lower + upper) // 2
        if asympt_ok(mid):
            upper = mid
        else:
            lower = mid
    exact_upper = upper
    while not exact_ok(exact_upper):
        exact_upper *= 2
        if exact_upper > 2**50:
            raise RuntimeError("H2H exact power search failed")
    exact_lower = 0
    while exact_lower + 1 < exact_upper:
        mid = (exact_lower + exact_upper) // 2
        if exact_ok(mid):
            exact_upper = mid
        else:
            exact_lower = mid
    return exact_upper


# ── schedule ────────────────────────────────────────────────────────────────


def _schedule_hash(**contract) -> str:
    encoded = json.dumps(contract, sort_keys=True, separators=(",", ":")).encode()
    return hashlib.sha256(encoded).hexdigest()


def _block_id(schedule_hash: str, pair_id: int, root_seed: int, order: int) -> str:
    value = f"{schedule_hash}:{pair_id}:{root_seed}:{order}".encode()
    return hashlib.sha256(value).hexdigest()[:24]


def plan_h2h_schedule(cfg: AppConfig, *, force: bool = False) -> dict:
    """Power-size and freeze equal pair/root/order simulation blocks."""
    from farkle_ii_tpu.analysis.candidate_family import (
        configured_roots,
        family_manifest_path,
        family_membership_path,
    )

    if (
        not math.isfinite(cfg.head2head.max_attempt_multiplier)
        or cfg.head2head.max_attempt_multiplier < 1.0
    ):
        raise ValueError("head2head.max_attempt_multiplier must be finite and at least 1")
    stage_sha = compute_stage_config_sha(cfg, "h2h_power")
    out_dir = cfg.h2h_dir()
    state = resolve_stage_state(
        out_dir, "h2h_power", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        return json.loads(power_plan_path(cfg).read_text())

    family = json.loads(family_manifest_path(cfg).read_text())
    candidates = [int(v) for v in family["candidates"]]
    family_hash = str(family["family_hash"])
    roots = tuple(int(v) for v in family["root_seeds"])
    if roots != configured_roots(cfg):
        raise ValueError(
            f"frozen family roots {roots} do not match configuration "
            f"{configured_roots(cfg)}"
        )
    if len(roots) == 1 and not cfg.head2head.allow_single_root:
        raise ValueError("single-root H2H is disabled by head2head.allow_single_root")
    pair_count = len(candidates) * (len(candidates) - 1) // 2
    alpha_per_pair = cfg.head2head.family_alpha / pair_count
    scenarios = tuple(float(v) for v in cfg.head2head.seat1_advantage_scenarios)
    effect = float(cfg.head2head.practical_delta)
    block_games = minimum_block_games(
        root_count=len(roots), effect=effect, scenarios=scenarios,
        alpha_per_pair=alpha_per_pair, target_power=cfg.head2head.target_power,
    )
    worst_power = _worst_power(
        implemented_score_test_power,
        block_games=block_games, root_count=len(roots), effect=effect,
        scenarios=scenarios, alpha=alpha_per_pair,
    )
    max_attempts = math.ceil(cfg.head2head.max_attempt_multiplier * block_games)
    total_attempt_budget = pair_count * len(roots) * 2 * max_attempts
    blocked_by_cap = total_attempt_budget > cfg.head2head.total_game_cap

    schedule_hash = _schedule_hash(
        family_hash=family_hash,
        root_seeds=list(roots),
        seat_orders=[0, 1],
        target_effect=effect,
        family_alpha=cfg.head2head.family_alpha,
        alpha_per_pair=alpha_per_pair,
        target_power=cfg.head2head.target_power,
        seat1_advantage_scenarios=list(scenarios),
        n_completed_required_per_root_order_block=block_games,
        max_attempt_multiplier=cfg.head2head.max_attempt_multiplier,
        max_attempts_per_root_order_block=max_attempts,
        min_candidate_completion_rate=cfg.head2head.min_candidate_completion_rate,
        rng_scheme_version=RNG_SCHEME_VERSION,
        outcome_schema_version=OUTCOME_SCHEMA_VERSION,
        h2h_method_version=H2H_METHOD_VERSION,
        rng_purpose_namespace=H2H_GAME_NAMESPACE,
        score_test_id=SCORE_TEST_ID,
        power_method_id=POWER_METHOD_ID,
    )

    rows = []
    for pair_id, (a, b) in enumerate(combinations(sorted(candidates), 2)):
        for root_index, root_seed in enumerate(roots):
            for order in (0, 1):
                rows.append(
                    {
                        "family_hash": family_hash,
                        "schedule_hash": schedule_hash,
                        "pair_id": pair_id,
                        "strategy_a": a,
                        "strategy_b": b,
                        "root_seed": root_seed,
                        "root_index": root_index,
                        "order": order,
                        "order_label": "a_b" if order == 0 else "b_a",
                        "seat1_strategy": a if order == 0 else b,
                        "seat2_strategy": b if order == 0 else a,
                        "n_completed_required": block_games,
                        "max_attempts": max_attempts,
                        "block_id": _block_id(schedule_hash, pair_id, root_seed, order),
                    }
                )
    schedule = pd.DataFrame(rows)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(schedule, preserve_index=False), schedule_path(cfg),
        producer="h2h_schedule", scope="h2h_2p",
        metadata={"operation": "score_test_schedule", "schedule_hash": schedule_hash},
    )

    grid_rows = []
    games_per_order = block_games * len(roots)
    for eff in cfg.head2head.sensitivity_deltas:
        for adv in scenarios:
            q_ab, q_ba = scenario_probabilities(float(eff), float(adv))
            grid_rows.append(
                {
                    "reported_effect": float(eff),
                    "seat1_advantage": float(adv),
                    "q_ab": q_ab,
                    "q_ba": q_ba,
                    "games_per_order": games_per_order,
                    "achieved_power": implemented_score_test_power(
                        games_per_order, q_ab, q_ba, alpha_per_pair
                    ),
                }
            )
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(pd.DataFrame(grid_rows), preserve_index=False),
        power_grid_path(cfg),
        producer="h2h_schedule", scope="h2h_2p",
        metadata={"operation": "score_test_power_grid"},
    )

    plan = {
        "family_hash": family_hash,
        "schedule_hash": schedule_hash,
        "root_seeds": list(roots),
        "candidate_count": len(candidates),
        "unordered_pair_count": pair_count,
        "family_alpha": cfg.head2head.family_alpha,
        "alpha_per_pair": alpha_per_pair,
        "target_power": cfg.head2head.target_power,
        "practical_delta": effect,
        "seat1_advantage_scenarios": list(scenarios),
        "n_completed_required_per_root_order_block": block_games,
        "max_attempts_per_root_order_block": max_attempts,
        "max_attempt_multiplier": cfg.head2head.max_attempt_multiplier,
        "min_candidate_completion_rate": cfg.head2head.min_candidate_completion_rate,
        "worst_scenario_achieved_power": worst_power,
        "total_attempt_budget": total_attempt_budget,
        "total_game_cap": cfg.head2head.total_game_cap,
        "execution_authorization": "blocked_by_cap" if blocked_by_cap else "ready",
        "score_test_id": SCORE_TEST_ID,
        "power_method_id": POWER_METHOD_ID,
        "h2h_method_version": H2H_METHOD_VERSION,
    }
    write_json_atomic(power_plan_path(cfg), plan)
    write_stage_done(
        out_dir, "h2h_power",
        inputs=[family_manifest_path(cfg), family_membership_path(cfg)],
        outputs=[power_plan_path(cfg), schedule_path(cfg), power_grid_path(cfg)],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    logger.info(
        "H2H plan: %d pairs x %d roots x 2 orders, %d completed games per "
        "block (worst power %.3f), authorization=%s",
        pair_count, len(roots), block_games, worst_power,
        plan["execution_authorization"],
    )
    return plan


# ── execution ────────────────────────────────────────────────────────────────


@lru_cache(maxsize=16)
def _h2h_window_step(nb: int, window: int, root_seed: int, use_aot: bool):
    """Compiled fused H2H window: coordinates, play, stop-at-target reduce.

    The whole window runs on device from tiny per-block inputs — (nb,)
    param/coordinate vectors up, one (nb, 4) int32 result down
    [attempts_counted, completed, seat1_wins, safety] — instead of
    uploading (nb*window,)-sized repeated params and fetching per-attempt
    arrays (round trips dominated H2H wall clock on the remote backend).
    The stop-at-target truncation (sequential attempt semantics) is the
    same cumsum/argmax algebra the host used; results are bit-identical.
    """
    import jax
    import jax.numpy as jnp

    from farkle_ii_tpu.ops import game_kernel as gk, rng as rng_mod

    def fn(pair_g, order_g, attempts, st1, dt1, fl1, st2, dt2, fl2,
           prior_completed, n_required):
        pair = jnp.repeat(pair_g, window)
        order = jnp.repeat(order_g, window)
        attempt = jnp.tile(attempts, nb)
        keys = rng_mod.vector_coordinate_keys(
            rng_mod.RandomPurpose.H2H_PLAYER,
            root_seed=root_seed, k=2,
            pair_id=pair, order=order, game_index=attempt,
        )
        kd = jax.random.key_data(keys)
        st = jnp.stack([jnp.repeat(st1, window), jnp.repeat(st2, window)], axis=1)
        dt = jnp.stack([jnp.repeat(dt1, window), jnp.repeat(dt2, window)], axis=1)
        fl = jnp.stack([jnp.repeat(fl1, window), jnp.repeat(fl2, window)], axis=1)
        res = gk.play_games(kd, st, dt, fl)
        comp = res.completed.reshape(nb, window).astype(jnp.int32)
        win = (res.completed & (res.winner_seat == 0)).reshape(nb, window)
        win = win.astype(jnp.int32)
        cum = prior_completed[:, None] + jnp.cumsum(comp, axis=1)
        reached = cum >= n_required[:, None]
        first = jnp.where(reached.any(axis=1), jnp.argmax(reached, axis=1), window - 1)
        counted = first + 1
        mask = (jnp.arange(window, dtype=jnp.int32)[None, :] < counted[:, None]).astype(jnp.int32)
        return jnp.stack(
            [
                counted,
                (comp * mask).sum(axis=1),
                (win * mask).sum(axis=1),
                ((1 - comp) * mask).sum(axis=1),
            ],
            axis=1,
        )

    if not use_aot:
        return jax.jit(fn)
    from farkle_ii_tpu.utils.aot_cache import cached_compile

    u = jnp.zeros((nb,), dtype=jnp.uint32)
    i = jnp.zeros((nb,), dtype=jnp.int32)
    w = jnp.zeros((window,), dtype=jnp.uint32)
    return cached_compile(
        fn, u, u, w, i, i, i, i, i, i, i, i,
        extra_key=f"h2h-window-{nb}x{window}-r{root_seed}",
    )


def _play_block_window(
    cfg: AppConfig,
    blocks: pd.DataFrame,
    attempt_lo: int,
    attempt_hi: int,
    params_lookup,
    prior_completed: np.ndarray,
    n_required: int,
    group_override: int | None = None,
):
    """Play one attempt window for every pending block, fused on device.

    Returns per-block int32 sums ``(attempts_counted, completed, seat1_wins,
    safety)`` of shape (n_blocks, 4), truncated at the attempt that reaches
    ``n_required`` completed games (sequential stop-at-target semantics,
    computed in the compiled step — only (nb,)-sized vectors cross the host
    boundary in either direction).
    """
    import jax.numpy as jnp

    window = attempt_hi - attempt_lo
    n_blocks = len(blocks)
    attempts = np.arange(attempt_lo, attempt_hi, dtype=np.uint32)
    pair_ids = blocks["pair_id"].to_numpy(dtype=np.uint32)
    orders = blocks["order"].to_numpy(dtype=np.uint32)
    root_seeds = blocks["root_seed"].to_numpy()
    seat1 = blocks["seat1_strategy"].to_numpy(dtype=np.int64)
    seat2 = blocks["seat2_strategy"].to_numpy(dtype=np.int64)

    out_sums = np.zeros((n_blocks, 4), dtype=np.int32)
    # cap each device dispatch: (blocks x window) games per batch. When the
    # envelope probed the fused window family itself, the caller passes the
    # probed block-group size straight through (group_override); otherwise
    # fall back to the flat-probe-derived cap with a fixed power-of-two
    # group so one compiled shape covers shrinking pending sets.
    if group_override is not None:
        group = max(1, int(group_override))
    else:
        group = max(1, _resolve_h2h_dispatch_cap(cfg) // window)
        group = 1 << (group.bit_length() - 1)  # round down to a power of two
    use_aot = bool(getattr(cfg.tpu, "aot_cache", False))
    for root in sorted(set(root_seeds.tolist())):
        sel_root = np.flatnonzero(root_seeds == root)
        for group_lo in range(0, len(sel_root), group):
            sel = sel_root[group_lo : group_lo + group]
            nb = len(sel)
            nb_pad = group
            pad_sel = np.concatenate([sel, np.full(nb_pad - nb, sel[0])])
            st1, dt1, fl1 = params_lookup(seat1[pad_sel])
            st2, dt2, fl2 = params_lookup(seat2[pad_sel])
            step = _h2h_window_step(nb_pad, window, int(root), use_aot)
            out = step(
                jnp.asarray(pair_ids[pad_sel]),
                jnp.asarray(orders[pad_sel]),
                jnp.asarray(attempts),
                jnp.asarray(st1, dtype=jnp.int32),
                jnp.asarray(dt1, dtype=jnp.int32),
                jnp.asarray(fl1, dtype=jnp.int32),
                jnp.asarray(st2, dtype=jnp.int32),
                jnp.asarray(dt2, dtype=jnp.int32),
                jnp.asarray(fl2, dtype=jnp.int32),
                jnp.asarray(prior_completed[pad_sel], dtype=jnp.int32),
                jnp.asarray(
                    np.full(nb_pad, n_required), dtype=jnp.int32
                ),
            )
            out_sums[sel] = np.asarray(out)[:nb]
    return out_sums


def execute_h2h_schedule(
    cfg: AppConfig, *, force: bool = False, window: int | None = None
) -> pd.DataFrame:
    """Execute all pending blocks to their completed-game targets."""
    plan = json.loads(power_plan_path(cfg).read_text())
    if plan["execution_authorization"] != "ready":
        raise RuntimeError(
            "H2H execution is blocked by total_game_cap; raise the cap and replan"
        )
    stage_sha = compute_stage_config_sha(cfg, "h2h_execute")
    out_dir = cfg.h2h_dir()
    state = resolve_stage_state(
        out_dir, "h2h_execute", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        return read_parquet_artifact(
            order_counts_path(cfg), expected_producer="h2h_schedule"
        ).to_pandas()

    schedule = read_parquet_artifact(
        schedule_path(cfg), expected_producer="h2h_schedule"
    ).to_pandas().sort_values(["pair_id", "root_seed", "order"], kind="mergesort")
    n_required = int(plan["n_completed_required_per_root_order_block"])
    max_attempts = int(plan["max_attempts_per_root_order_block"])
    # Window shape: an explicit argument wins; else the fastest probed fused
    # attempt-window shape from the envelope (the exact program family this
    # stage compiles — results are invariant to the window partition because
    # attempts are globally indexed and the stop-at-target truncation
    # depends only on the cumulative completed count); else the n_required
    # heuristic under the conservative flat-probe cap.
    group_override: int | None = None
    if window is None:
        from farkle_ii_tpu.utils.fault_envelope import load_fault_envelope

        envelope = load_fault_envelope(cfg.tpu.fault_envelope_path)
        best = envelope.best_h2h_window() if envelope is not None else None
        if best is not None and int(cfg.tpu.h2h_games_per_dispatch) <= 0:
            group_override, window, probed_speed = best
            logger.info(
                "h2h window shape %dx%d from window-family probes "
                "(%.0f games/s probed)", group_override, window, probed_speed,
            )
    window = window or min(max(n_required, 16), 4096)

    # strategy parameter lookup from the manifest
    from farkle_ii_tpu.simulation import strategies as S

    manifest = read_parquet_artifact(
        cfg.strategy_manifest_path(), expected_producer="simulation"
    ).to_pandas().set_index("strategy_id")

    def params_lookup(ids: np.ndarray):
        st = manifest.loc[ids, "score_threshold"].to_numpy(dtype=np.int32)
        dt = manifest.loc[ids, "dice_threshold"].to_numpy(dtype=np.int32)
        flags = np.zeros(len(ids), dtype=np.int32)
        for bit, col in (
            (S.FLAG_SMART_FIVE, "smart_five"),
            (S.FLAG_SMART_ONE, "smart_one"),
            (S.FLAG_CONSIDER_SCORE, "consider_score"),
            (S.FLAG_CONSIDER_DICE, "consider_dice"),
            (S.FLAG_REQUIRE_BOTH, "require_both"),
            (S.FLAG_AUTO_HOT_DICE, "auto_hot_dice"),
            (S.FLAG_RUN_UP_SCORE, "run_up_score"),
        ):
            flags |= manifest.loc[ids, col].to_numpy(dtype=bool) * bit
        favor = (manifest.loc[ids, "favor_dice_or_score"].astype(str) == "score").to_numpy()
        flags |= favor * S.FLAG_FAVOR_SCORE
        return st, dt, flags

    n_blocks = len(schedule)
    completed = np.zeros(n_blocks, dtype=np.int64)
    attempted = np.zeros(n_blocks, dtype=np.int64)
    seat1_wins = np.zeros(n_blocks, dtype=np.int64)
    safety = np.zeros(n_blocks, dtype=np.int64)

    # resume from execution state
    state_path = execution_state_path(cfg)
    if state_path.exists() and not force:
        try:
            saved = json.loads(state_path.read_text())
            if saved.get("schedule_hash") == plan["schedule_hash"]:
                for i, block_id in enumerate(schedule["block_id"]):
                    entry = saved["blocks"].get(block_id)
                    if entry:
                        completed[i] = entry["games_completed"]
                        attempted[i] = entry["games_attempted"]
                        seat1_wins[i] = entry["wins_seat1"]
                        safety[i] = entry["games_safety_limit"]
        except (json.JSONDecodeError, KeyError):
            logger.warning("unusable execution state; restarting blocks")

    def save_state():
        write_json_atomic(
            state_path,
            {
                "schedule_hash": plan["schedule_hash"],
                "blocks": {
                    str(bid): {
                        "games_completed": int(completed[i]),
                        "games_attempted": int(attempted[i]),
                        "wins_seat1": int(seat1_wins[i]),
                        "games_safety_limit": int(safety[i]),
                    }
                    for i, bid in enumerate(schedule["block_id"])
                },
            },
        )

    for attempt_lo in range(0, max_attempts, window):
        attempt_hi = min(attempt_lo + window, max_attempts)
        pending_mask = (completed < n_required) & (attempted < max_attempts) & (
            attempted <= attempt_lo
        )
        pending = np.flatnonzero(pending_mask)
        if len(pending) == 0:
            break
        blocks = schedule.iloc[pending]
        sums = _play_block_window(
            cfg, blocks, attempt_lo, attempt_hi, params_lookup,
            prior_completed=completed[pending], n_required=n_required,
            group_override=group_override,
        )
        attempted[pending] += sums[:, 0]
        completed[pending] += sums[:, 1]
        seat1_wins[pending] += sums[:, 2]
        safety[pending] += sums[:, 3]
        save_state()

    # final per-block frame (order counts)
    frame = schedule.copy().reset_index(drop=True)
    frame["n_completed_required"] = n_required
    frame["max_attempts"] = max_attempts
    frame["games_attempted"] = attempted
    frame["games_completed"] = completed
    frame["games_safety_limit"] = safety
    frame["replacement_attempt_count"] = attempted - np.minimum(completed, n_required)
    frame["wins_seat1"] = seat1_wins
    frame["wins_seat2"] = completed - seat1_wins
    frame["wins_a"] = np.where(
        frame["order"] == 0, frame["wins_seat1"], frame["wins_seat2"]
    )
    frame["wins_b"] = np.where(
        frame["order"] == 0, frame["wins_seat2"], frame["wins_seat1"]
    )
    frame["completion_status"] = np.where(
        frame["games_completed"] >= n_required, "complete", "unresolved"
    )
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(frame, preserve_index=False), order_counts_path(cfg),
        producer="h2h_schedule", scope="h2h_2p",
        metadata={
            "operation": "concatenate_root_order_blocks",
            "uncertainty_method": SCORE_TEST_ID,
            "schedule_hash": plan["schedule_hash"],
        },
    )
    save_state()
    write_stage_done(
        out_dir, "h2h_execute",
        inputs=[schedule_path(cfg), power_plan_path(cfg)],
        outputs=[order_counts_path(cfg), execution_state_path(cfg)],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    logger.info(
        "H2H execution: %d blocks, %s attempts, %s completed",
        n_blocks, f"{attempted.sum():,}", f"{completed.sum():,}",
    )
    return frame


def run_power(cfg: AppConfig, *, force: bool = False) -> None:
    plan_h2h_schedule(cfg, force=force)


def run_execute(cfg: AppConfig, *, force: bool = False) -> None:
    execute_h2h_schedule(cfg, force=force)

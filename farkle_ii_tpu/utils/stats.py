"""Statistical sizing helpers: Wilson intervals and power-based game counts.

Same statistical contracts as the reference (``utils/stats.py:93`` wilson_ci,
``:190-235`` games_for_power): identical interval semantics and identical
sizing formulas. The implementations here are this repo's own — the Wilson
interval is computed from the quadratic-root form of the score equation
(numerically identical to the center/margin form, exact at k=0 and k=n),
and the multiple-testing alpha and sample-size assembly are organized around
a single endpoint-parameterized pipeline instead of the reference's inline
branching.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from typing import Literal

from scipy.stats import norm

logger = logging.getLogger(__name__)

_LOGGED_SIZINGS: set[tuple] = set()


def _clip01(x: float) -> float:
    return 0.0 if x < 0.0 else (1.0 if x > 1.0 else x)


def wilson_ci(k: int, n: int, alpha: float = 0.05) -> tuple[float, float]:
    """Wilson score confidence interval for a binomial proportion.

    Computed as the two roots of the score equation
    ``(p_hat - p)^2 = z^2 p (1 - p) / n`` — algebraically the same interval
    as the usual center +/- margin form, but exact at the boundary counts
    (the lower root is 0.0 at ``k == 0`` and the upper root 1.0 at
    ``k == n`` without needing a clamp).
    """
    if n <= 0:
        raise ValueError("wilson_ci: sample size n must be positive")
    if k < 0 or k > n:
        raise ValueError(f"wilson_ci: success count {k} outside [0, {n}]")
    if not 0.0 < alpha < 1.0:
        raise ValueError("wilson_ci: alpha must lie strictly inside (0, 1)")
    z = float(norm.ppf(1.0 - alpha / 2.0))
    zz = z * z
    discriminant = z * math.sqrt(zz + 4.0 * k * (n - k) / n)
    scale = 0.5 / (n + zz)
    lo = _clip01((2.0 * k + zz - discriminant) * scale)
    hi = _clip01((2.0 * k + zz + discriminant) * scale)
    return (lo, hi) if lo <= hi else (hi, hi)


@dataclass(frozen=True, slots=True)
class GamesForPowerResult:
    """Structured sizing output (field names are the reporting contract)."""

    games_per_strategy_uncapped: int  # raw power computation before floor/cap
    games_per_strategy: int  # the number production actually schedules
    applied_floor: bool  # min_games_floor raised the raw value
    applied_cap: bool  # max_games_cap lowered it (wins over floor)
    sizing_source: Literal["computed", "floored", "capped"]
    m: int  # number of simultaneous tests being controlled
    alpha_star: float  # planning per-test level after BH/Bonferroni
    alpha_for_z: float  # tail-adjusted level fed to the normal quantile
    z_alpha: float
    z_beta: float
    p0: float  # null win rate for the chosen endpoint
    p1: float  # alternative rate (p0 + detectable_lift)
    detectable_lift: float


def _planning_alpha(
    method: str, m: int, control: float, *,
    use_by: bool, bh_target_rank: int | None, bh_target_frac: float | None,
) -> float:
    """Per-test planning level alpha*.

    Bonferroni spends ``control`` evenly; BH plans at the target discovery
    rank ``i*`` via ``(i*/m) * q`` (divided by the harmonic number H_m when
    the Benjamini-Yekutieli correction is requested). Identical planning
    rule as the reference's sizing helper.
    """
    if not 0.0 < control < 1.0:
        raise ValueError("planning control level must lie inside (0, 1)")
    if m < 1:
        raise ValueError("test count m must be at least 1")
    if method == "bonferroni":
        return control / m
    # BH: resolve the target rank i* (explicit rank wins over fraction wins
    # over the 1% default), then scale the control level.
    if bh_target_rank is not None:
        target = math.ceil(bh_target_rank)
    elif bh_target_frac is not None:
        target = math.ceil(bh_target_frac * m)
    else:
        target = round(0.01 * m)
    i_star = min(m, max(1, int(target)))
    harmonic = math.fsum(1.0 / i for i in range(1, m + 1)) if use_by else 1.0
    return (i_star / m) * (control / harmonic)


def _two_arm_n(p_a: float, p_b: float, lift: float, z_alpha: float, z_beta: float) -> float:
    """Per-arm n for a two-proportion comparison (pooled-null normal sizing)."""
    pooled = 0.5 * (p_a + p_b)
    zs = z_alpha * math.sqrt(2.0 * pooled * (1.0 - pooled))
    zs += z_beta * math.sqrt(p_a * (1.0 - p_a) + p_b * (1.0 - p_b))
    return (zs / lift) ** 2


def _one_sample_n(p0: float, p1: float, lift: float, z_alpha: float, z_beta: float) -> float:
    """n for a one-sample proportion test of p0 vs p1 at the given levels."""
    zs = z_alpha * math.sqrt(p0 * (1.0 - p0)) + z_beta * math.sqrt(p1 * (1.0 - p1))
    return (zs / lift) ** 2


def games_for_power(
    *,
    n_strategies: int, k_players: int = 2, endpoint: str = "top1",
    method: str = "bh", power: float = 0.8, control: float = 0.1,
    detectable_lift: float = 0.03, baseline_rate: float | None = None,
    tail: str = "two_sided", full_pairwise: bool = False, use_by: bool = False,
    min_games_floor: int | None = None, max_games_cap: int | None = None,
    bh_target_rank: int | None = None, bh_target_frac: float | None = None,
    return_details: bool = False,
) -> int | GamesForPowerResult:
    """Required games per strategy for BH/Bonferroni-controlled detection.

    ``endpoint="top1"`` sizes a one-sample proportion test against
    ``p0 = 1/k`` (each game gives every seated strategy one Bernoulli).
    ``endpoint="pairwise"`` sizes per-pair two-sample comparisons and
    converts arm counts to games via the ``k - 1`` co-appearances each game
    provides. Formula parity with the reference's games_for_power.
    """
    for label, ok in (
        ("n_strategies must be > 1", n_strategies > 1),
        ("k_players must be >= 2", k_players >= 2),
        ("power must be in (0,1)", 0.0 < power < 1.0),
        ("detectable_lift must be in (0,1)", 0.0 < detectable_lift < 1.0),
        ("tail must be 'one_sided' or 'two_sided'", tail in ("one_sided", "two_sided")),
    ):
        if not ok:
            raise ValueError(label)

    pairwise = endpoint == "pairwise"
    chance = 1.0 / k_players
    if baseline_rate is None:
        p0 = 0.5 if pairwise else chance
    else:
        p0 = baseline_rate
        if not pairwise and abs(p0 - chance) > 1e-6:
            logger.warning(
                "top1 baseline_rate=%.6f differs from 1/k=%.6f; sizing may be miscalibrated",
                p0, chance,
            )
    if not 0.0 < p0 < 1.0:
        raise ValueError("effective null rate p0 must lie inside (0, 1)")
    p1 = p0 + detectable_lift
    if p1 >= 1.0:
        raise ValueError("p0 + detectable_lift must stay below 1")

    if pairwise:
        m = n_strategies * (n_strategies - 1) // 2 if full_pairwise else n_strategies - 1
    else:
        m = n_strategies

    bh = method == "bh"
    rank, frac = (bh_target_rank, bh_target_frac) if bh else (None, None)
    if bh and rank is not None and frac is not None:
        rank = None  # when both are supplied the fraction wins (reference rule)
    if bh and rank is None and frac is None:
        frac = 0.01
    alpha_star = _planning_alpha(
        method, m, control, use_by=use_by and bh, bh_target_rank=rank, bh_target_frac=frac
    )
    alpha_for_z = alpha_star / (2.0 if tail == "two_sided" else 1.0)
    z_alpha = float(norm.ppf(1.0 - alpha_for_z))
    z_beta = float(norm.ppf(power))

    if pairwise:
        per_arm = _two_arm_n(p0, p1, detectable_lift, z_alpha, z_beta)
        # each strategy faces n-1 opponents; a k-player game covers k-1 pairs
        raw = math.ceil(per_arm * (n_strategies - 1) / (k_players - 1))
    else:
        raw = math.ceil(_one_sample_n(p0, p1, detectable_lift, z_alpha, z_beta))

    games, floored, capped = raw, False, False
    if min_games_floor is not None and games < int(min_games_floor):
        games, floored = int(min_games_floor), True
    if max_games_cap is not None and games > int(max_games_cap):
        games, capped = int(max_games_cap), True
    source = "capped" if capped else ("floored" if floored else "computed")

    key = (endpoint, method, n_strategies, k_players, m, control, tail, p0,
           detectable_lift, games, source)
    if key not in _LOGGED_SIZINGS:
        _LOGGED_SIZINGS.add(key)
        logger.info(
            "sizing_source=%s endpoint=%s method=%s m=%d games_per_strategy=%d",
            source, endpoint, method, m, games,
        )

    result = GamesForPowerResult(
        games_per_strategy_uncapped=int(raw), games_per_strategy=int(games),
        applied_floor=floored, applied_cap=capped,
        sizing_source=source,  # type: ignore[arg-type]
        m=m, alpha_star=alpha_star, alpha_for_z=alpha_for_z,
        z_alpha=z_alpha, z_beta=z_beta,
        p0=p0, p1=p1, detectable_lift=detectable_lift,
    )
    return result if return_details else result.games_per_strategy

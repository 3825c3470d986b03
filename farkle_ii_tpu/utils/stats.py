"""Statistical sizing helpers: Wilson intervals and power-based game counts.

Semantics parity with the reference (``utils/stats.py:93`` wilson_ci,
``:190-235`` games_for_power) — the math contracts are identical; logging
dedup machinery is simplified.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from math import ceil, sqrt
from typing import Literal

from scipy.stats import norm

logger = logging.getLogger(__name__)

_EMITTED_SIZING_SIGNATURES: set[tuple] = set()


def wilson_ci(k: int, n: int, alpha: float = 0.05) -> tuple[float, float]:
    """Wilson score confidence interval for a binomial proportion."""
    if n <= 0:
        raise ValueError("n must be positive")
    if not 0 <= k <= n:
        raise ValueError("k must be between 0 and n (inclusive)")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    p = k / n
    z = float(norm.ppf(1.0 - alpha / 2.0))
    z2 = z * z
    denom = 1.0 + z2 / n
    center = p + z2 / (2.0 * n)
    margin = z * sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)
    lower = max(0.0, min(1.0, (center - margin) / denom))
    upper = max(0.0, min(1.0, (center + margin) / denom))
    return (min(lower, upper), upper)


@dataclass(frozen=True, slots=True)
class GamesForPowerResult:
    """Structured sizing output (parity with reference GamesForPowerResult)."""

    games_per_strategy_uncapped: int
    games_per_strategy: int
    applied_floor: bool
    applied_cap: bool
    sizing_source: Literal["computed", "floored", "capped"]
    m: int
    alpha_star: float
    alpha_for_z: float
    z_alpha: float
    z_beta: float
    p0: float
    p1: float
    detectable_lift: float


def _per_test_level(
    method: str,
    m: int,
    control: float,
    use_by: bool,
    bh_target_rank: int | None = None,
    bh_target_frac: float | None = None,
) -> float:
    """Planning per-test alpha*: Bonferroni alpha/m or BH (i*/m)*q[/H_m]."""
    if not 0 < control < 1:
        raise ValueError("control must be in (0,1)")
    if m <= 0:
        raise ValueError("m must be positive")
    if method == "bonferroni":
        return control / m
    c_m = sum(1.0 / i for i in range(1, m + 1)) if use_by else 1.0
    if bh_target_rank is not None:
        i_star = max(1, min(m, int(ceil(bh_target_rank))))
    elif bh_target_frac is not None:
        i_star = max(1, min(m, int(ceil(bh_target_frac * m))))
    else:
        i_star = max(1, int(round(0.01 * m)))
    return (i_star / m) * (control / c_m)


def games_for_power(
    *,
    n_strategies: int,
    k_players: int = 2,
    method: str = "bh",
    power: float = 0.8,
    control: float = 0.1,
    detectable_lift: float = 0.03,
    baseline_rate: float | None = None,
    tail: str = "two_sided",
    full_pairwise: bool = False,
    use_by: bool = False,
    min_games_floor: int | None = None,
    max_games_cap: int | None = None,
    bh_target_rank: int | None = None,
    bh_target_frac: float | None = None,
    endpoint: str = "top1",
    return_details: bool = False,
) -> int | GamesForPowerResult:
    """Required games per strategy for BH/Bonferroni-controlled detection.

    ``endpoint="top1"``: one-sample proportion vs p0 = 1/k (one Bernoulli per
    game per strategy). ``endpoint="pairwise"``: two-sample per-pair
    co-appearance sizing converted to games via /(k-1).
    """
    if n_strategies <= 1:
        raise ValueError("n_strategies must be > 1")
    if k_players < 2:
        raise ValueError("k_players must be >= 2")
    if not 0 < power < 1:
        raise ValueError("power must be in (0,1)")
    if not 0 < detectable_lift < 1:
        raise ValueError("detectable_lift must be in (0,1)")
    if tail not in {"one_sided", "two_sided"}:
        raise ValueError("tail must be 'one_sided' or 'two_sided'")

    if endpoint == "pairwise":
        p0 = 0.5 if baseline_rate is None else baseline_rate
    else:
        p0 = (1.0 / k_players) if baseline_rate is None else baseline_rate
        if baseline_rate is not None and abs(baseline_rate - 1.0 / k_players) > 1e-6:
            logger.warning(
                "top1 baseline_rate=%.6f differs from 1/k=%.6f; sizing may be "
                "miscalibrated",
                baseline_rate,
                1.0 / k_players,
            )
    if not 0 < p0 < 1:
        raise ValueError("baseline_rate (effective p0) must be in (0,1)")
    if p0 + detectable_lift >= 1:
        raise ValueError("baseline_rate + detectable_lift must be < 1")

    if endpoint == "pairwise":
        m = (n_strategies * (n_strategies - 1)) // 2 if full_pairwise else n_strategies - 1
    else:
        m = n_strategies

    if method == "bh" and bh_target_rank is not None and bh_target_frac is not None:
        bh_target_rank = None  # fraction wins, matching the reference
    if method == "bh" and bh_target_rank is None and bh_target_frac is None:
        bh_target_frac = 0.01

    alpha_star = _per_test_level(
        method=method,
        m=m,
        control=control,
        use_by=(use_by if method == "bh" else False),
        bh_target_rank=(bh_target_rank if method == "bh" else None),
        bh_target_frac=(bh_target_frac if method == "bh" else None),
    )
    alpha_for_z = alpha_star / 2.0 if tail == "two_sided" else alpha_star
    z_alpha = float(norm.ppf(1.0 - alpha_for_z))
    z_beta = float(norm.ppf(power))

    if endpoint == "pairwise":
        p1, p2 = p0, p0 + detectable_lift
        pbar = 0.5 * (p1 + p2)
        numerator = z_alpha * sqrt(2.0 * pbar * (1.0 - pbar)) + z_beta * sqrt(
            p1 * (1.0 - p1) + p2 * (1.0 - p2)
        )
        n_arm_per_pair = (numerator / detectable_lift) ** 2
        raw = ceil(n_arm_per_pair * (n_strategies - 1) / (k_players - 1))
        p1_out = p0 + detectable_lift
    else:
        p1_out = p0 + detectable_lift
        numerator = z_alpha * sqrt(p0 * (1.0 - p0)) + z_beta * sqrt(
            p1_out * (1.0 - p1_out)
        )
        raw = ceil((numerator / detectable_lift) ** 2)

    games = raw
    applied_floor = applied_cap = False
    if min_games_floor is not None:
        floored = max(games, int(min_games_floor))
        applied_floor = floored != games
        games = floored
    if max_games_cap is not None:
        capped = min(games, int(max_games_cap))
        applied_cap = capped != games
        games = capped
    sizing_source: Literal["computed", "floored", "capped"] = (
        "capped" if applied_cap else ("floored" if applied_floor else "computed")
    )

    signature = (endpoint, method, n_strategies, k_players, m, control, tail, p0,
                 detectable_lift, games, applied_floor, applied_cap)
    if signature not in _EMITTED_SIZING_SIGNATURES:
        _EMITTED_SIZING_SIGNATURES.add(signature)
        logger.info(
            "sizing_source=%s endpoint=%s method=%s m=%d games_per_strategy=%d",
            sizing_source, endpoint, method, m, games,
        )

    result = GamesForPowerResult(
        games_per_strategy_uncapped=int(raw),
        games_per_strategy=int(games),
        applied_floor=applied_floor,
        applied_cap=applied_cap,
        sizing_source=sizing_source,
        m=m,
        alpha_star=alpha_star,
        alpha_for_z=alpha_for_z,
        z_alpha=z_alpha,
        z_beta=z_beta,
        p0=p0,
        p1=p1_out,
        detectable_lift=detectable_lift,
    )
    return result if return_details else result.games_per_strategy

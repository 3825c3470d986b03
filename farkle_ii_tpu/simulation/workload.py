"""Deterministic precision -> workload resolution (Wilson screening contract).

Same statistical contract as the reference planner
(``/root/reference/src/farkle/simulation/workload_planner.py:77-193``): the
screening precision target (worst-case full Wilson interval width <=
``resolution_delta`` at ``confidence``) resolves to a minimum shuffle count,
rounded up into ``batch_count`` equal contiguous deterministic batches of at
least ``min_shuffles_per_batch`` shuffles each. The resulting plan is the
recovery/checkpoint unit contract for the whole simulation layer; a
configured shuffle cap can block scheduling (:class:`WorkloadCapExceeded`)
before any compute is spent.

Implementation notes (this module's own derivation, not the reference's
doubling+bisection): the Wilson width at sample size ``n`` is maximized at
``p = 1/2``, where it collapses to the closed form ``z / sqrt(n + z^2)``
(substitute ``p(1-p) = 1/4`` into the interval radius and simplify). For odd
``n`` the nearest achievable estimate is ``floor(n/2)/n``, which only
shrinks the width, so ``ceil(z^2/delta^2 - z^2)`` from inverting the closed
form is an upper bound on the answer; the exact minimum is found by walking
down while the achievable-width predicate still holds (the same predicate
the width function exposes, so the two can never disagree).
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, replace
from pathlib import Path

from scipy.stats import norm

WORKLOAD_PLAN_VERSION = 1
CAP_CONFIG_KEY = "screening.max_shuffles_per_root_k"


def _z_score(confidence: float) -> float:
    if confidence <= 0.0 or confidence >= 1.0:
        raise ValueError(f"confidence must lie strictly inside (0, 1), got {confidence!r}")
    return float(norm.ppf(0.5 + confidence / 2.0))


def _require_int(value: object, name: str, *, minimum: int) -> int:
    """Reject bools and non-ints (bool is an int subclass in Python)."""
    if isinstance(value, bool) or not isinstance(value, int) or value < minimum:
        article = "a positive integer" if minimum == 1 else f"an integer of at least {minimum}"
        raise ValueError(f"{name} must be {article}")
    return value


def worst_case_wilson_width(n: int, *, confidence: float = 0.95) -> float:
    """Maximum full Wilson interval width over all success counts at size n.

    The width is symmetric in ``p -> 1 - p`` and maximized at ``p = 1/2``;
    the achievable worst case at size ``n`` is therefore ``floor(n/2)/n``
    successes (identical width to ``ceil(n/2)/n`` by symmetry).
    """
    _require_int(n, "n", minimum=1)
    z = _z_score(confidence)
    z2 = z * z
    p = (n // 2) / n
    half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4 * n * n))
    return 2.0 * half / (1.0 + z2 / n)


def minimum_shuffles_for_resolution(resolution_delta: float, *, confidence: float = 0.95) -> int:
    """Smallest sample size whose worst-case Wilson width meets the target."""
    if resolution_delta <= 0.0 or resolution_delta >= 1.0:
        raise ValueError(f"resolution_delta must lie strictly inside (0, 1), got {resolution_delta!r}")
    z2 = _z_score(confidence) ** 2
    # Exact-p closed form: width(n) = z / sqrt(n + z^2)  =>  n >= z^2/d^2 - z^2.
    # Odd n only shrink the achievable width, so this is an upper bound.
    n = max(1, math.ceil(z2 / (resolution_delta * resolution_delta) - z2))
    while worst_case_wilson_width(n, confidence=confidence) > resolution_delta:
        n += 1  # guard against ceil landing one short through float rounding
    while n > 1 and worst_case_wilson_width(n - 1, confidence=confidence) <= resolution_delta:
        n -= 1
    return n


@dataclass(frozen=True, slots=True)
class TournamentWorkloadPlan:
    """Resolved work and precision contract for one root/player-count cell.

    Field names are the on-disk plan JSON schema (an artifact contract shared
    with the reference's plan files) — do not rename.
    """

    root_seed: int  # tournament root RNG seed this cell belongs to
    k: int  # players per table
    strategy_count: int  # grid size being screened
    confidence: float  # Wilson confidence level of the precision target
    resolution_delta: float  # worst-case full-interval width target
    required_shuffles_unrounded: int  # exact minimum before batch rounding
    required_shuffles: int  # after rounding up to whole batches
    batch_count: int  # recovery/checkpoint unit count
    shuffles_per_batch: int  # equal contiguous batch size
    batch_construction: str  # always "equal_contiguous"
    games_per_shuffle: int  # strategy_count // k tables per shuffle
    required_games: int  # total games the plan schedules
    achieved_resolution: float  # width actually reached at required_shuffles
    shuffle_cap: int | None  # configured scheduling cap, if any
    cap_exceeded: bool  # plan blocked before any compute
    achieved_resolution_at_cap: float | None  # best width the cap permits
    projected_games_per_second: float | None = None
    projected_runtime_seconds: float | None = None
    plan_version: int = WORKLOAD_PLAN_VERSION

    @property
    def status(self) -> str:
        if self.cap_exceeded:
            return "blocked_by_cap"
        return "not_started"

    def with_games_per_second(self, games_per_second: float) -> "TournamentWorkloadPlan":
        bad = games_per_second <= 0.0 or not math.isfinite(games_per_second)
        if bad:
            raise ValueError(f"games_per_second must be a finite positive rate, got {games_per_second!r}")
        rate = float(games_per_second)
        return replace(
            self,
            projected_games_per_second=rate,
            projected_runtime_seconds=self.required_games / rate,
        )

    def to_dict(self) -> dict[str, object]:
        out: dict[str, object] = asdict(self)
        out["status"] = self.status
        out["cap_config_key"] = CAP_CONFIG_KEY
        return out


class WorkloadCapExceeded(RuntimeError):
    """Raised before scheduling when the screening shuffle cap is insufficient."""

    def __init__(self, plan: TournamentWorkloadPlan) -> None:
        self.plan = plan
        super().__init__(
            f"cell root={plan.root_seed} k={plan.k} needs {plan.required_shuffles} shuffles "
            f"but {CAP_CONFIG_KEY} caps it at {plan.shuffle_cap}; raise the cap to "
            f"at least {plan.required_shuffles} and resume"
        )


def plan_tournament_workload(
    *,
    root_seed: int, k: int, strategy_count: int, resolution_delta: float,
    confidence: float = 0.95, batch_count: int = 100,
    min_shuffles_per_batch: int = 30, shuffle_cap: int | None = None,
    projected_games_per_second: float | None = None,
) -> TournamentWorkloadPlan:
    """Resolve precision, batching, game count, cap state for one cell."""
    _require_int(k, "k", minimum=2)
    _require_int(strategy_count, "strategy_count", minimum=k)
    if strategy_count % k:
        raise ValueError(f"strategy_count ({strategy_count}) must divide evenly into {k}-seat tables")
    _require_int(batch_count, "batch_count", minimum=2)
    _require_int(min_shuffles_per_batch, "min_shuffles_per_batch", minimum=1)
    if shuffle_cap is not None:
        _require_int(shuffle_cap, "shuffle_cap", minimum=1)

    unrounded = minimum_shuffles_for_resolution(resolution_delta, confidence=confidence)
    per_batch = max(min_shuffles_per_batch, -(-unrounded // batch_count))
    total_shuffles = batch_count * per_batch
    capped = shuffle_cap is not None and total_shuffles > shuffle_cap

    tables = strategy_count // k
    plan = TournamentWorkloadPlan(
        root_seed=int(root_seed), k=k, strategy_count=strategy_count,
        confidence=float(confidence), resolution_delta=float(resolution_delta),
        required_shuffles_unrounded=unrounded, required_shuffles=total_shuffles,
        batch_count=batch_count, shuffles_per_batch=per_batch,
        batch_construction="equal_contiguous",
        games_per_shuffle=tables, required_games=total_shuffles * tables,
        achieved_resolution=worst_case_wilson_width(total_shuffles, confidence=confidence),
        shuffle_cap=shuffle_cap, cap_exceeded=capped,
        achieved_resolution_at_cap=(
            worst_case_wilson_width(shuffle_cap, confidence=confidence) if capped else None
        ),
    )
    if projected_games_per_second is None:
        return plan
    return plan.with_games_per_second(projected_games_per_second)


def write_workload_plan(path: Path, plan: TournamentWorkloadPlan) -> None:
    """Write a workload plan atomically as canonical JSON."""
    from farkle_ii_tpu.utils.writer import atomic_path

    path.parent.mkdir(parents=True, exist_ok=True)
    with atomic_path(path) as tmp:
        Path(tmp).write_text(
            json.dumps(plan.to_dict(), indent=2, sort_keys=True) + "\n", encoding="utf-8"
        )


def load_workload_plan(path: Path) -> TournamentWorkloadPlan:
    """Read a plan back (inverse of :func:`write_workload_plan`)."""
    data = json.loads(Path(path).read_text(encoding="utf-8"))
    data.pop("status", None)
    data.pop("cap_config_key", None)
    return TournamentWorkloadPlan(**data)

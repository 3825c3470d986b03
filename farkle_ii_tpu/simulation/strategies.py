"""Threshold strategy space: decision rule, grid generation, deterministic IDs.

Behavioral parity targets (no code copied):
``/root/reference/src/farkle/simulation/strategies.py:164`` (ThresholdStrategy),
``:345`` (grid generation with constraint pruning), ``:618`` (encoder),
``:280`` (canonical string form).

A strategy is a 10-field tuple
``(score_threshold, dice_threshold, smart_five, smart_one, consider_score,
consider_dice, require_both, auto_hot_dice, run_up_score,
favor_dice_or_score)`` with the invariants

* ``smart_one`` requires ``smart_five``;
* ``require_both`` requires both ``consider_score`` and ``consider_dice``.

For the TPU kernel, strategies are *data*, not objects: a strategy grid is
packed into parallel int32 arrays (:func:`pack_strategy_params`) gathered by
strategy id on device. The continue/bank threshold rule itself lives in the
game kernel as branchless boolean algebra.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from functools import lru_cache
from itertools import product
from typing import Any, Iterator, Mapping, Sequence

import numpy as np

__all__ = [
    "FavorDiceOrScore", "ThresholdStrategy", "StrategyGridOptions",
    "StrategyEncoder", "StrategyParams",
    "STRATEGY_TUPLE_FIELDS", "DEFAULT_STRATEGY_GRID", "STOP_AT_THRESHOLDS",
    "build_strategy_encoder", "build_strategy_grid", "iter_strategy_combos",
    "pack_strategy_params", "parse_strategy", "random_threshold_strategy",
    "strategy_tuple",
]


class FavorDiceOrScore(Enum):
    """Tie-break preference when choosing among smart-discard candidates."""

    SCORE = "score"
    DICE = "dice"

    def __str__(self) -> str:
        return self.value


STRATEGY_TUPLE_FIELDS: tuple[str, ...] = (
    "score_threshold", "dice_threshold",
    "smart_five", "smart_one",
    "consider_score", "consider_dice", "require_both",
    "auto_hot_dice", "run_up_score", "favor_dice_or_score",
)

_BOTH = (True, False)
DEFAULT_STRATEGY_GRID: dict[str, tuple[Any, ...]] = {
    "score_thresholds": tuple(range(200, 1400, 50)),  # 24 values, 50-point steps
    "dice_thresholds": tuple(range(5)),
    "smart_five_opts": _BOTH, "smart_one_opts": _BOTH,
    "consider_score_opts": _BOTH, "consider_dice_opts": _BOTH,
    "auto_hot_dice_opts": (False, True), "run_up_score_opts": _BOTH,
}

STOP_AT_THRESHOLDS: tuple[int, ...] = (350, 400, 450, 500)

STRATEGY_MANIFEST_NAME = "strategy_manifest.parquet"

StrategyTuple = tuple[int, int, bool, bool, bool, bool, bool, bool, bool, FavorDiceOrScore]


@dataclass(frozen=True)
class ThresholdStrategy:
    """Threshold-based continue/bank rule plus smart-discard toggles.

    ``decide`` semantics (used by the host oracle engine; the TPU kernel
    re-expresses the same algebra vectorized):

    * continue while ``turn_score < score_threshold`` (when considered)
      and/or ``dice_left > dice_threshold`` (when considered);
    * with both considered, ``require_both=True`` means *continue while
      either target is unmet* (bank needs both thresholds hit) and
      ``require_both=False`` means *continue only while both are unmet*.
    """

    score_threshold: int = 300  # bank once the turn reaches this (if considered)
    dice_threshold: int = 2  # keep rolling while more dice than this remain
    smart_five: bool = False  # allow discarding lone fives to keep dice
    smart_one: bool = False  # allow discarding lone ones (requires smart_five)
    consider_score: bool = True  # the score threshold participates in decide()
    consider_dice: bool = True  # the dice threshold participates in decide()
    require_both: bool = False  # AND vs OR combination of the two thresholds
    auto_hot_dice: bool = False  # always reroll a fresh set of six
    run_up_score: bool = False  # keep rolling during the final round once ahead
    favor_dice_or_score: FavorDiceOrScore = FavorDiceOrScore.SCORE
    strategy_id: int | None = field(default=None, compare=False)

    def __post_init__(self) -> None:
        if self.smart_one and not self.smart_five:
            raise ValueError("ThresholdStrategy: smart_one needs smart_five enabled")
        both_considered = self.consider_score and self.consider_dice
        if self.require_both and not both_considered:
            raise ValueError(
                "ThresholdStrategy: require_both needs both considerations enabled"
            )

    def decide(
        self,
        *,
        turn_score: int, dice_left: int, has_scored: bool,
        score_needed: int = 0, final_round: bool = False,
        score_to_beat: int = 0, running_total: int = 0,
    ) -> bool:
        """Return True to keep rolling, False to bank."""
        del score_needed  # reserved for richer strategies
        entry_gate_unmet = not has_scored and turn_score < 500
        if entry_gate_unmet:
            return True  # must cross the 500-point entry gate
        if final_round:
            behind = running_total <= score_to_beat
            if behind:
                return True  # must beat the leader; ties don't win
            if not self.run_up_score:
                return False
        score_unmet = turn_score < self.score_threshold
        dice_unmet = dice_left > self.dice_threshold
        match (self.consider_score, self.consider_dice):
            case (True, True):
                if self.require_both:
                    return score_unmet or dice_unmet  # bank only once BOTH are met
                return score_unmet and dice_unmet  # bank as soon as either is met
            case (True, False):
                return score_unmet
            case (False, True):
                return dice_unmet
            case _:
                return False

    def __str__(self) -> str:
        def flag(letter: str, on: bool) -> str:
            return letter if on else "-"

        considers = flag("S", self.consider_score) + flag("D", self.consider_dice)
        smarts = flag("F", self.smart_five) + flag("O", self.smart_one)
        smarts += "FS" if self.favor_dice_or_score is FavorDiceOrScore.SCORE else "FD"
        combine = "AND" if self.require_both else "OR"
        extras = flag("H", self.auto_hot_dice) + flag("R", self.run_up_score)
        head = f"Strat({self.score_threshold},{self.dice_threshold})"
        return f"{head}[{considers}][{smarts}][{combine}][{extras}]"


def strategy_tuple(strategy: ThresholdStrategy) -> StrategyTuple:
    """Canonical 10-field tuple representation."""
    return tuple(getattr(strategy, f) for f in STRATEGY_TUPLE_FIELDS)  # type: ignore[return-value]


def strategy_from_tuple(combo: StrategyTuple, strategy_id: int | None = None) -> ThresholdStrategy:
    """Inverse of :func:`strategy_tuple`."""
    attrs = dict(zip(STRATEGY_TUPLE_FIELDS, combo, strict=True))
    return ThresholdStrategy(**attrs, strategy_id=strategy_id)


_FAVOR_SCORE_ONLY = (FavorDiceOrScore.SCORE,)
_FAVOR_DICE_ONLY = (FavorDiceOrScore.DICE,)


def _favor_options(sf: bool, cs: bool, cd: bool) -> tuple[FavorDiceOrScore, ...]:
    """Valid favor choices for a flag combination (grid pruning rule)."""
    if cs and cd:
        return _FAVOR_SCORE_ONLY + _FAVOR_DICE_ONLY if sf else _FAVOR_SCORE_ONLY
    return _FAVOR_DICE_ONLY if cd and not cs else _FAVOR_SCORE_ONLY


def iter_strategy_combos(
    *,
    score_thresholds: Sequence[int], dice_thresholds: Sequence[int],
    smart_five_opts: Sequence[bool], smart_one_opts: Sequence[bool],
    consider_score_opts: Sequence[bool], consider_dice_opts: Sequence[bool],
    auto_hot_dice_opts: Sequence[bool], run_up_score_opts: Sequence[bool],
    inactive_score_threshold: int, inactive_dice_threshold: int,
    allowed_smart_pairs: set[tuple[bool, bool]] | None = None,
) -> Iterator[StrategyTuple]:
    """Enumerate strategy tuples with constraint pruning, deterministic order.

    Inactive thresholds collapse to the sentinel value (``min - 1``) so a
    disabled consideration contributes exactly one grid point. ``require_both``
    varies only when both considerations are enabled; favor choices follow
    :func:`_favor_options`. The enumeration order *is* the strategy-id
    assignment (flags outermost in field order ``sf, so, cs, cd``; then
    ``st, dt, hd, rs, rb, favor`` with favor fastest) — matching the
    reference's id contract (strategies.py:345) while the per-flag value
    axes are resolved up front and crossed with ``itertools.product``.
    """
    for sf, so, cs, cd in product(
        smart_five_opts, smart_one_opts, consider_score_opts, consider_dice_opts
    ):
        if so and not sf:
            continue  # smart_one requires smart_five (tuple invariant)
        if allowed_smart_pairs is not None and (sf, so) not in allowed_smart_pairs:
            continue
        value_axes = (
            score_thresholds if cs else (inactive_score_threshold,),
            dice_thresholds if cd else (inactive_dice_threshold,),
            auto_hot_dice_opts,
            run_up_score_opts,
            (True, False) if cs and cd else (False,),
            _favor_options(sf, cs, cd),
        )
        for st, dt, hd, rs, rb, fv in product(*value_axes):
            yield (
                int(st),
                int(dt),
                bool(sf),
                bool(so),
                bool(cs),
                bool(cd),
                bool(rb),
                bool(hd),
                bool(rs),
                fv,
            )


def build_stop_at_strategy(
    threshold: int, *, heuristic: bool = False, inactive_dice_threshold: int = -1
) -> ThresholdStrategy:
    """Named stop-at strategy: bank once the turn score crosses ``threshold``.

    Heuristic variants additionally enable smart discards and auto hot dice
    (reference strategies.py:454-481).
    """
    if threshold not in STOP_AT_THRESHOLDS:
        raise ValueError(f"stop-at threshold {threshold} is not registered")
    return ThresholdStrategy(
        score_threshold=threshold, dice_threshold=inactive_dice_threshold,
        smart_five=heuristic, smart_one=heuristic,
        consider_score=True, consider_dice=False, require_both=False,
        auto_hot_dice=heuristic, run_up_score=False,
        favor_dice_or_score=FavorDiceOrScore.SCORE,
    )


STOP_AT_REGISTRY = {
    **{f"stop_at_{t}": (t, False) for t in STOP_AT_THRESHOLDS},
    **{f"stop_at_{t}_heuristic": (t, True) for t in STOP_AT_THRESHOLDS},
}


@dataclass(frozen=True)
class StrategyGridOptions:
    """Normalized, immutable grid option bundle."""

    score_thresholds: tuple[int, ...]  # ascending; min-1 is the inactive sentinel
    dice_thresholds: tuple[int, ...]  # ascending; min-1 is the inactive sentinel
    smart_five_opts: tuple[bool, ...]  # pruned by the smart_one invariant
    smart_one_opts: tuple[bool, ...]  # pruned by the smart_one invariant
    consider_score_opts: tuple[bool, ...]  # (True, False) in the default grid
    consider_dice_opts: tuple[bool, ...]  # (True, False) in the default grid
    auto_hot_dice_opts: tuple[bool, ...]  # (False, True) in the default grid
    run_up_score_opts: tuple[bool, ...]  # (True, False) in the default grid
    include_stop_at: bool = False  # append the named stop-at strategies
    include_stop_at_heuristic: bool = False

    @property
    def inactive_score_threshold(self) -> int:
        return min(self.score_thresholds) - 1

    @property
    def inactive_dice_threshold(self) -> int:
        return min(self.dice_thresholds) - 1

    @classmethod
    def from_inputs(
        cls,
        *,
        score_thresholds: Sequence[int] | None = None,
        dice_thresholds: Sequence[int] | None = None,
        smart_five_opts: Sequence[bool] | None = None,
        smart_one_opts: Sequence[bool] | None = None,
        consider_score_opts: Sequence[bool] | None = None,
        consider_dice_opts: Sequence[bool] | None = None,
        auto_hot_dice_opts: Sequence[bool] | None = None,
        run_up_score_opts: Sequence[bool] | None = None,
        include_stop_at: bool = False, include_stop_at_heuristic: bool = False,
    ) -> "StrategyGridOptions":
        def norm(values: Sequence[Any] | None, default_key: str) -> tuple[Any, ...]:
            if values is None:
                return DEFAULT_STRATEGY_GRID[default_key]
            values_t = tuple(values)
            if not isinstance(values, tuple):
                # stabilize configured ordering so strategy ids stay deterministic
                try:
                    return tuple(sorted(values_t))
                except TypeError:
                    return values_t
            return values_t

        supplied = {
            "score_thresholds": score_thresholds, "dice_thresholds": dice_thresholds,
            "smart_five_opts": smart_five_opts, "smart_one_opts": smart_one_opts,
            "consider_score_opts": consider_score_opts,
            "consider_dice_opts": consider_dice_opts,
            "auto_hot_dice_opts": auto_hot_dice_opts,
            "run_up_score_opts": run_up_score_opts,
        }
        return cls(
            **{name: norm(value, name) for name, value in supplied.items()},
            include_stop_at=include_stop_at,
            include_stop_at_heuristic=include_stop_at_heuristic,
        )


@dataclass(frozen=True)
class StrategyEncoder:
    """Deterministic strategy-tuple <-> integer-id bijection for one grid."""

    options: StrategyGridOptions
    tuples: tuple[StrategyTuple, ...]
    tuple_to_id: Mapping[StrategyTuple, int]

    def __len__(self) -> int:
        return len(self.tuples)

    def encode_tuple(self, combo: StrategyTuple) -> int:
        return int(self.tuple_to_id[combo])

    def encode_strategy(self, strategy: ThresholdStrategy) -> int:
        return self.encode_tuple(strategy_tuple(strategy))

    def decode_id(self, strategy_id: int) -> dict[str, Any]:
        combo = self.tuples[int(strategy_id)]
        return dict(zip(STRATEGY_TUPLE_FIELDS, combo, strict=True))

    def strategies(self) -> list[ThresholdStrategy]:
        """Materialize the full grid with ids assigned."""
        return [strategy_from_tuple(c, strategy_id=i) for i, c in enumerate(self.tuples)]


_ITER_AXIS_FIELDS = (
    "score_thresholds", "dice_thresholds",
    "smart_five_opts", "smart_one_opts",
    "consider_score_opts", "consider_dice_opts",
    "auto_hot_dice_opts", "run_up_score_opts",
)


def _iter_encoder_combos(options: StrategyGridOptions):
    axes = {name: getattr(options, name) for name in _ITER_AXIS_FIELDS}
    yield from iter_strategy_combos(
        **axes,
        inactive_score_threshold=options.inactive_score_threshold,
        inactive_dice_threshold=options.inactive_dice_threshold,
    )
    if options.include_stop_at:
        for threshold in STOP_AT_THRESHOLDS:
            yield strategy_tuple(
                build_stop_at_strategy(
                    threshold, inactive_dice_threshold=options.inactive_dice_threshold
                )
            )
    if options.include_stop_at_heuristic:
        for threshold in STOP_AT_THRESHOLDS:
            yield strategy_tuple(
                build_stop_at_strategy(
                    threshold,
                    heuristic=True,
                    inactive_dice_threshold=options.inactive_dice_threshold,
                )
            )


@lru_cache(maxsize=None)
def _build_encoder_cached(options: StrategyGridOptions) -> StrategyEncoder:
    # dict insertion order dedups while preserving first-seen enumeration order
    tuple_to_id: dict[StrategyTuple, int] = {}
    for combo in _iter_encoder_combos(options):
        tuple_to_id.setdefault(combo, len(tuple_to_id))
    return StrategyEncoder(
        options=options, tuples=tuple(tuple_to_id), tuple_to_id=tuple_to_id
    )


def build_strategy_encoder(**kwargs: Any) -> StrategyEncoder:
    """Build (cached) the deterministic encoder for the given grid options."""
    return _build_encoder_cached(StrategyGridOptions.from_inputs(**kwargs))


def build_strategy_grid(**kwargs: Any) -> list[ThresholdStrategy]:
    """Materialize the deterministic strategy grid with ids assigned."""
    return build_strategy_encoder(**kwargs).strategies()


def parse_strategy_identifier(
    spec: str | int, *, encoder: StrategyEncoder | None = None
) -> ThresholdStrategy:
    """Resolve a strategy from an integer id (default-grid enumeration
    order) or a canonical strategy string (reference strategies.py:762)."""
    if isinstance(spec, int) or (isinstance(spec, str) and spec.strip().isdigit()):
        enc = encoder or build_strategy_encoder()
        sid = int(spec)
        if not 0 <= sid < len(enc):
            raise ValueError(
                f"strategy id {sid} out of range for a {len(enc)}-strategy grid"
            )
        return strategy_from_tuple(enc.tuples[sid], strategy_id=sid)
    return parse_strategy(str(spec).strip())


# ---------------------------------------------------------------------------
# Device-side parameter packing
# ---------------------------------------------------------------------------

# Flag bit positions inside the packed int32 flags word.
FLAG_SMART_FIVE = 1 << 0
FLAG_SMART_ONE = 1 << 1
FLAG_CONSIDER_SCORE = 1 << 2
FLAG_CONSIDER_DICE = 1 << 3
FLAG_REQUIRE_BOTH = 1 << 4
FLAG_AUTO_HOT_DICE = 1 << 5
FLAG_RUN_UP_SCORE = 1 << 6
FLAG_FAVOR_SCORE = 1 << 7


@dataclass(frozen=True)
class StrategyParams:
    """Struct-of-arrays strategy parameters for device gather by strategy id."""

    score_threshold: np.ndarray  # (S,) int32
    dice_threshold: np.ndarray  # (S,) int32
    flags: np.ndarray  # (S,) int32 packed flag bits

    def __len__(self) -> int:
        return int(self.score_threshold.shape[0])


def pack_strategy_params(strategies: Sequence[ThresholdStrategy]) -> StrategyParams:
    """Pack a strategy list into parallel int32 arrays indexed by position."""
    n = len(strategies)
    st = np.zeros(n, dtype=np.int32)
    dt = np.zeros(n, dtype=np.int32)
    flags = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(strategies):
        st[i] = s.score_threshold
        dt[i] = s.dice_threshold
        f = 0
        if s.smart_five:
            f |= FLAG_SMART_FIVE
        if s.smart_one:
            f |= FLAG_SMART_ONE
        if s.consider_score:
            f |= FLAG_CONSIDER_SCORE
        if s.consider_dice:
            f |= FLAG_CONSIDER_DICE
        if s.require_both:
            f |= FLAG_REQUIRE_BOTH
        if s.auto_hot_dice:
            f |= FLAG_AUTO_HOT_DICE
        if s.run_up_score:
            f |= FLAG_RUN_UP_SCORE
        if s.favor_dice_or_score is FavorDiceOrScore.SCORE:
            f |= FLAG_FAVOR_SCORE
        flags[i] = f
    return StrategyParams(score_threshold=st, dice_threshold=dt, flags=flags)


# ---------------------------------------------------------------------------
# Parsing / misc
# ---------------------------------------------------------------------------

_STRAT_RE = re.compile(
    r"""
    \A
    Strat\(\s*(?P<score>-?\d+)\s*,\s*(?P<dice>-?\d+)\s*\)
    \[ (?P<cs>[S\-])(?P<cd>[D\-]) \]
    \[ (?P<sf>[F\-])(?P<so>[O\-])(?P<fs>FS|FD) \]
    \[ (?P<rb>AND|OR) \]
    \[ (?P<hd>[H\-])(?P<rs>[R\-]) \]
    \Z
    """,
    re.VERBOSE,
)


def parse_strategy(s: str) -> ThresholdStrategy:
    """Parse a canonical strategy string back into a ThresholdStrategy."""
    m = _STRAT_RE.match(s)
    if not m:
        raise ValueError(f"Cannot parse strategy string: {s!r}")
    g = m.group
    flag_on = {"sf": "F", "so": "O", "cs": "S", "cd": "D", "hd": "H", "rs": "R"}
    on = {name: g(name) == mark for name, mark in flag_on.items()}
    return ThresholdStrategy(
        score_threshold=int(g("score")), dice_threshold=int(g("dice")),
        smart_five=on["sf"], smart_one=on["so"],
        consider_score=on["cs"], consider_dice=on["cd"],
        require_both=g("rb") == "AND",
        auto_hot_dice=on["hd"], run_up_score=on["rs"],
        favor_dice_or_score=(
            FavorDiceOrScore.SCORE if g("fs") == "FS" else FavorDiceOrScore.DICE
        ),
    )


def random_threshold_strategy(rng: np.random.Generator) -> ThresholdStrategy:
    """Sample a random strategy consistent with the invariants (for time/watch)."""
    def coin() -> bool:
        return bool(rng.integers(0, 2))

    sf = coin()
    so = sf and coin()  # smart_one only when smart_five is on
    cs, cd = coin(), coin()
    rb = cs and cd and coin()  # require_both only with both considerations
    if cs == cd:
        fv = FavorDiceOrScore.SCORE if coin() else FavorDiceOrScore.DICE
    else:
        fv = FavorDiceOrScore.SCORE if cs else FavorDiceOrScore.DICE
    return ThresholdStrategy(
        score_threshold=50 * int(rng.integers(1, 20)),
        dice_threshold=int(rng.integers(0, 5)),
        smart_five=sf, smart_one=so,
        consider_score=cs, consider_dice=cd, require_both=rb,
        favor_dice_or_score=fv,
    )

"""TrueSkill rating model implemented from the published algorithm.

The reference depends on the external ``trueskill`` package
(``/root/reference/src/farkle/analysis/run_trueskill.py:44``); that package is
not available here, so this module implements the algorithm directly from
Herbrich, Minka & Graepel, "TrueSkill(TM): A Bayesian Skill Rating System"
(NIPS 2006) for free-for-all games of single-player teams without draws
(``draw_probability = 0``, matching this framework's configs — Farkle games
never draw: ranks are a strict permutation).

Structure: per game, players are sorted by rank and a chain factor graph over
adjacent pairs is iterated (sum/difference factors with greater-than
truncation) until message convergence, exactly the schedule of the original
paper / the de-facto standard implementation. A closed-form two-player path
(identical fixed point, zero iteration) accelerates k=2, which is the H2H and
mega-run hot case.

Validated against the canonical published example (1v1 defaults ->
29.396/7.171 vs 20.604/7.171) and invariance/symmetry properties in tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from scipy.special import erf as _erf_vec

DEFAULT_MU = 25.0
DEFAULT_SIGMA = DEFAULT_MU / 3.0


@dataclass
class Rating:
    mu: float = DEFAULT_MU
    sigma: float = DEFAULT_SIGMA


def _phi(x: float) -> float:
    return math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)


def _cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def v_win(t: float) -> float:
    """Additive truncated-Gaussian correction for a strict win at margin t."""
    denom = _cdf(t)
    if denom < 1e-300:
        return -t  # deep-tail asymptote
    return _phi(t) / denom


def w_win(t: float) -> float:
    """Multiplicative variance correction for a strict win at margin t."""
    v = v_win(t)
    return v * (v + t)


class TrueSkillEnv:
    """Rating environment (no draws)."""

    def __init__(
        self,
        mu: float = DEFAULT_MU,
        sigma: float = DEFAULT_SIGMA,
        beta: float | None = None,
        tau: float | None = None,
        draw_probability: float = 0.0,
    ) -> None:
        if draw_probability != 0.0:
            raise ValueError("this implementation supports draw_probability=0 only")
        self.mu = float(mu)
        self.sigma = float(sigma)
        self.beta = float(beta) if beta is not None else self.sigma / 2.0
        self.tau = float(tau) if tau is not None else self.sigma / 100.0

    def create_rating(self) -> Rating:
        return Rating(self.mu, self.sigma)

    # ------------------------------------------------------------------
    def rate_2p(self, winner: Rating, loser: Rating) -> tuple[Rating, Rating]:
        """Closed-form two-player update (chain has a single truncate factor)."""
        tau2 = self.tau * self.tau
        var_w = winner.sigma**2 + tau2
        var_l = loser.sigma**2 + tau2
        c2 = var_w + var_l + 2.0 * self.beta**2
        c = math.sqrt(c2)
        t = (winner.mu - loser.mu) / c
        v = v_win(t)
        w = w_win(t)
        mu_w = winner.mu + (var_w / c) * v
        mu_l = loser.mu - (var_l / c) * v
        sigma_w = math.sqrt(var_w * max(1.0 - (var_w / c2) * w, 1e-12))
        sigma_l = math.sqrt(var_l * max(1.0 - (var_l / c2) * w, 1e-12))
        return Rating(mu_w, sigma_w), Rating(mu_l, sigma_l)

    # ------------------------------------------------------------------
    def rate(self, ratings: list[Rating], ranks: list[int]) -> list[Rating]:
        """Update a free-for-all game; lower rank wins. Strict ordering only."""
        k = len(ratings)
        if k != len(ranks):
            raise ValueError("ratings and ranks must align")
        if sorted(ranks) != list(range(1, k + 1)):
            raise ValueError("ranks must be a strict permutation 1..k (no draws)")
        if k == 1:
            return list(ratings)
        order = sorted(range(k), key=lambda i: ranks[i])
        if k == 2:
            new_w, new_l = self.rate_2p(ratings[order[0]], ratings[order[1]])
            out: list[Rating] = [None] * k  # type: ignore[list-item]
            out[order[0]] = new_w
            out[order[1]] = new_l
            return out

        # ---- chain factor graph with message passing (k >= 3) ----
        tau2 = self.tau * self.tau
        beta2 = self.beta * self.beta
        # prior (dynamics-inflated) skill marginals in precision form
        prior_pi = [1.0 / (ratings[i].sigma**2 + tau2) for i in order]
        prior_tau = [
            ratings[i].mu / (ratings[i].sigma**2 + tau2) for i in order
        ]
        # performance marginal = skill + beta^2 noise; likelihood messages from
        # each adjacent truncate factor, iterated to convergence.
        # perf prior (from skill): variance = 1/prior_pi + beta2
        perf_prior_var = [1.0 / prior_pi[i] + beta2 for i in range(k)]
        perf_prior_mu = [prior_tau[i] / prior_pi[i] for i in range(k)]
        perf_prior_pi = [1.0 / v for v in perf_prior_var]
        perf_prior_tau = [perf_prior_mu[i] * perf_prior_pi[i] for i in range(k)]

        # messages from each difference factor d_j = p_j - p_{j+1} (j = 0..k-2)
        # to its two performance variables, in precision form
        up_pi = [0.0] * (k - 1)  # message to p_j (the better-ranked side)
        up_tau = [0.0] * (k - 1)
        down_pi = [0.0] * (k - 1)  # message to p_{j+1}
        down_tau = [0.0] * (k - 1)

        for _ in range(60):
            max_delta = 0.0
            for j in range(k - 1):
                # cavity marginals of p_j and p_{j+1} excluding factor j
                pj_pi = perf_prior_pi[j]
                pj_tau = perf_prior_tau[j]
                if j - 1 >= 0:
                    pj_pi += down_pi[j - 1]
                    pj_tau += down_tau[j - 1]
                pn_pi = perf_prior_pi[j + 1]
                pn_tau = perf_prior_tau[j + 1]
                if j + 1 <= k - 2:
                    pn_pi += up_pi[j + 1]
                    pn_tau += up_tau[j + 1]

                var_j = 1.0 / pj_pi
                mu_j = pj_tau / pj_pi
                var_n = 1.0 / pn_pi
                mu_n = pn_tau / pn_pi

                c2 = var_j + var_n
                c = math.sqrt(c2)
                t = (mu_j - mu_n) / c
                v = v_win(t)
                w = w_win(t)
                w = min(w, 1.0 - 1e-12)

                # moment-matched difference marginal -> messages back
                # new marginal for p_j
                new_mu_j = mu_j + (var_j / c) * v
                new_var_j = var_j * (1.0 - (var_j / c2) * w)
                new_mu_n = mu_n - (var_n / c) * v
                new_var_n = var_n * (1.0 - (var_n / c2) * w)

                # message = marginal / cavity (precision arithmetic)
                m_pi_j = 1.0 / new_var_j - pj_pi
                m_tau_j = new_mu_j / new_var_j - pj_tau
                m_pi_n = 1.0 / new_var_n - pn_pi
                m_tau_n = new_mu_n / new_var_n - pn_tau

                max_delta = max(
                    max_delta,
                    abs(m_pi_j - up_pi[j]),
                    abs(m_tau_j - up_tau[j]),
                    abs(m_pi_n - down_pi[j]),
                    abs(m_tau_n - down_tau[j]),
                )
                up_pi[j], up_tau[j] = m_pi_j, m_tau_j
                down_pi[j], down_tau[j] = m_pi_n, m_tau_n
            if max_delta < 1e-6:
                break

        # final performance marginals
        out: list[Rating] = [None] * k  # type: ignore[list-item]
        for i in range(k):
            pi = perf_prior_pi[i]
            tau_ = perf_prior_tau[i]
            if i <= k - 2:
                pi += up_pi[i]
                tau_ += up_tau[i]
            if i - 1 >= 0:
                pi += down_pi[i - 1]
                tau_ += down_tau[i - 1]
            perf_var = 1.0 / pi
            perf_mu = tau_ / pi
            # strip the beta^2 performance noise back to the skill marginal:
            # skill posterior = prior skill combined with (perf likelihood)
            # message = perf marginal / perf prior, passed through the beta
            # noise factor.
            lik_pi = pi - perf_prior_pi[i]
            lik_tau = tau_ - perf_prior_tau[i]
            if lik_pi <= 0.0:
                # no information from the game (degenerate); keep prior
                skill_pi = prior_pi[i]
                skill_tau = prior_tau[i]
            else:
                lik_var = 1.0 / lik_pi
                lik_mu = lik_tau / lik_pi
                noisy_var = lik_var + beta2
                skill_pi = prior_pi[i] + 1.0 / noisy_var
                skill_tau = prior_tau[i] + lik_mu / noisy_var
            out_idx = order[i]
            out[out_idx] = Rating(
                skill_tau / skill_pi, math.sqrt(1.0 / skill_pi)
            )
        return out


# ── vectorized wave updates ───────────────────────────────────────────────────
# Batched twins of rate_2p / the chain EP, operating on (W, k) arrays of
# player-disjoint games (one "wave"; see run_trueskill.rate_games). The math
# per game is identical to the scalar path — including the per-game
# convergence stop, replicated with an active mask — so wave-batched rating
# equals sequential rating up to last-ulp libm differences.


def _phi_vec(x: np.ndarray) -> np.ndarray:
    return np.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)


def _cdf_vec(x: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + _erf_vec(x / math.sqrt(2.0)))


def _v_w_win_vec(t: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (v_win, w_win) with the deep-tail asymptote."""
    denom = _cdf_vec(t)
    tail = denom < 1e-300
    with np.errstate(divide="ignore", invalid="ignore"):
        v = np.where(tail, -t, _phi_vec(t) / np.where(tail, 1.0, denom))
    return v, v * (v + t)


def rate_2p_vec(
    env: TrueSkillEnv, mu: np.ndarray, sigma: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Closed-form two-player update over (W, 2) arrays, winner first."""
    tau2 = env.tau * env.tau
    var = sigma * sigma + tau2
    c2 = var[:, 0] + var[:, 1] + 2.0 * env.beta**2
    c = np.sqrt(c2)
    t = (mu[:, 0] - mu[:, 1]) / c
    v, w = _v_w_win_vec(t)
    out_mu = np.stack(
        [mu[:, 0] + (var[:, 0] / c) * v, mu[:, 1] - (var[:, 1] / c) * v], axis=1
    )
    shrink = np.maximum(1.0 - var / c2[:, None] * w[:, None], 1e-12)
    return out_mu, np.sqrt(var * shrink)


def rate_chain_vec(
    env: TrueSkillEnv, mu: np.ndarray, sigma: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Chain-EP update over (W, k) arrays in rank order (k >= 3).

    Same Gauss-Seidel factor sweep, per-game convergence threshold, and
    marginal extraction as :meth:`TrueSkillEnv.rate`; games whose sweep
    delta drops below 1e-6 freeze (mask), exactly like the scalar break.
    """
    w_games, k = mu.shape
    tau2 = env.tau * env.tau
    beta2 = env.beta * env.beta
    prior_pi = 1.0 / (sigma * sigma + tau2)
    prior_tau = mu * prior_pi
    perf_prior_pi = 1.0 / (1.0 / prior_pi + beta2)
    perf_prior_tau = (prior_tau / prior_pi) * perf_prior_pi

    up_pi = np.zeros((w_games, k - 1))
    up_tau = np.zeros((w_games, k - 1))
    down_pi = np.zeros((w_games, k - 1))
    down_tau = np.zeros((w_games, k - 1))
    active = np.ones(w_games, dtype=bool)

    for _ in range(60):
        max_delta = np.zeros(w_games)
        for j in range(k - 1):
            pj_pi = perf_prior_pi[:, j].copy()
            pj_tau = perf_prior_tau[:, j].copy()
            if j - 1 >= 0:
                pj_pi += down_pi[:, j - 1]
                pj_tau += down_tau[:, j - 1]
            pn_pi = perf_prior_pi[:, j + 1].copy()
            pn_tau = perf_prior_tau[:, j + 1].copy()
            if j + 1 <= k - 2:
                pn_pi += up_pi[:, j + 1]
                pn_tau += up_tau[:, j + 1]

            var_j = 1.0 / pj_pi
            mu_j = pj_tau / pj_pi
            var_n = 1.0 / pn_pi
            mu_n = pn_tau / pn_pi

            c2 = var_j + var_n
            c = np.sqrt(c2)
            t = (mu_j - mu_n) / c
            v, w = _v_w_win_vec(t)
            w = np.minimum(w, 1.0 - 1e-12)

            new_mu_j = mu_j + (var_j / c) * v
            new_var_j = var_j * (1.0 - (var_j / c2) * w)
            new_mu_n = mu_n - (var_n / c) * v
            new_var_n = var_n * (1.0 - (var_n / c2) * w)

            m_pi_j = 1.0 / new_var_j - pj_pi
            m_tau_j = new_mu_j / new_var_j - pj_tau
            m_pi_n = 1.0 / new_var_n - pn_pi
            m_tau_n = new_mu_n / new_var_n - pn_tau

            max_delta = np.maximum.reduce(
                [
                    max_delta,
                    np.abs(m_pi_j - up_pi[:, j]),
                    np.abs(m_tau_j - up_tau[:, j]),
                    np.abs(m_pi_n - down_pi[:, j]),
                    np.abs(m_tau_n - down_tau[:, j]),
                ]
            )
            up_pi[:, j] = np.where(active, m_pi_j, up_pi[:, j])
            up_tau[:, j] = np.where(active, m_tau_j, up_tau[:, j])
            down_pi[:, j] = np.where(active, m_pi_n, down_pi[:, j])
            down_tau[:, j] = np.where(active, m_tau_n, down_tau[:, j])
        active &= max_delta >= 1e-6
        if not active.any():
            break

    pi = perf_prior_pi.copy()
    tau_ = perf_prior_tau.copy()
    pi[:, : k - 1] += up_pi
    tau_[:, : k - 1] += up_tau
    pi[:, 1:] += down_pi
    tau_[:, 1:] += down_tau

    lik_pi = pi - perf_prior_pi
    lik_tau = tau_ - perf_prior_tau
    informative = lik_pi > 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        lik_var = np.where(informative, 1.0 / np.where(informative, lik_pi, 1.0), 0.0)
        lik_mu = np.where(informative, lik_tau * lik_var, 0.0)
    noisy_var = lik_var + beta2
    skill_pi = np.where(informative, prior_pi + 1.0 / noisy_var, prior_pi)
    skill_tau = np.where(informative, prior_tau + lik_mu / noisy_var, prior_tau)
    return skill_tau / skill_pi, np.sqrt(1.0 / skill_pi)

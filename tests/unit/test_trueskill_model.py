"""TrueSkill implementation tests: published KAT, properties, MC oracle."""

import numpy as np
import pytest

from farkle_ii_tpu.analysis.trueskill_model import Rating, TrueSkillEnv


def test_known_answer_1v1_no_draws():
    # Analytic values for defaults (mu=25, sigma=25/3, beta=25/6, tau=25/300)
    # with draw_probability=0 (our contract):
    #   c^2 = 2b^2 + s^2 + s^2 + 2t^2 = 173.625; t = 0
    #   v(0) = 0.797885, w(0) = 0.636620
    #   mu_w = 25 + (s^2 + t^2)/c * v = 29.2055
    #   sigma_w = sqrt((s^2+t^2) * (1 - (s^2+t^2)/c^2 * w)) = 7.19466
    # (The often-quoted 29.396/7.171 figure assumes the external library's
    # default draw_probability=0.10, which Farkle never uses.)
    env = TrueSkillEnv()
    w, l = env.rate_2p(env.create_rating(), env.create_rating())
    assert w.mu == pytest.approx(29.2055, abs=0.005)
    assert w.sigma == pytest.approx(7.1947, abs=0.005)
    assert l.mu == pytest.approx(50 - 29.2055, abs=0.005)
    assert l.sigma == pytest.approx(7.1947, abs=0.005)


def test_rate_dispatch_matches_2p_closed_form():
    env = TrueSkillEnv(beta=4.2, tau=0.1)
    a, b = Rating(27.0, 5.0), Rating(22.0, 7.0)
    w, l = env.rate_2p(a, b)
    out = env.rate([a, b], [1, 2])
    assert out[0].mu == pytest.approx(w.mu)
    assert out[1].mu == pytest.approx(l.mu)
    # reversed seat order, reversed ranks -> same result per player
    out2 = env.rate([b, a], [2, 1])
    assert out2[1].mu == pytest.approx(w.mu)
    assert out2[0].mu == pytest.approx(l.mu)


def test_upset_moves_more_than_expected_win():
    env = TrueSkillEnv()
    strong, weak = Rating(30.0, 4.0), Rating(20.0, 4.0)
    w_expected, _ = env.rate_2p(strong, weak)
    w_upset, _ = env.rate_2p(weak, strong)
    assert (w_upset.mu - weak.mu) > (w_expected.mu - strong.mu) > 0


def test_ffa_ordering_and_symmetry():
    env = TrueSkillEnv()
    ratings = [env.create_rating() for _ in range(4)]
    out = env.rate(ratings, [1, 2, 3, 4])
    mus = [r.mu for r in out]
    assert mus[0] > mus[1] > mus[2] > mus[3]
    # symmetric priors: mu changes roughly antisymmetric around the middle
    assert mus[0] - 25.0 == pytest.approx(25.0 - mus[3], abs=0.05)
    assert mus[1] - 25.0 == pytest.approx(25.0 - mus[2], abs=0.05)
    for r in out:
        assert r.sigma < 25.0 / 3.0  # information always reduces sigma


def test_rank_validation():
    env = TrueSkillEnv()
    with pytest.raises(ValueError):
        env.rate([Rating(), Rating()], [1, 1])  # draws unsupported
    with pytest.raises(ValueError, match="draw_probability"):
        TrueSkillEnv(draw_probability=0.1)


def test_3p_against_monte_carlo_oracle():
    """EP result must match the exact posterior (MC quadrature) closely."""
    env = TrueSkillEnv(tau=0.0)
    priors = [Rating(25.0, 25.0 / 3.0), Rating(27.0, 6.0), Rating(23.0, 5.0)]
    out = env.rate(priors, [1, 2, 3])

    rng = np.random.default_rng(0)
    n = 4_000_000
    skills = np.stack(
        [rng.normal(r.mu, r.sigma, size=n) for r in priors], axis=1
    )
    perfs = skills + rng.normal(0.0, env.beta, size=(n, 3))
    accept = (perfs[:, 0] > perfs[:, 1]) & (perfs[:, 1] > perfs[:, 2])
    post = skills[accept]
    assert post.shape[0] > 50_000
    mc_mu = post.mean(axis=0)
    mc_sigma = post.std(axis=0)
    for i in range(3):
        assert out[i].mu == pytest.approx(mc_mu[i], abs=0.08), i
        assert out[i].sigma == pytest.approx(mc_sigma[i], abs=0.08), i

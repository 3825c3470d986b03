"""Public simulation API tests: simulate_many_games, experiment_size, lazy exports."""

import numpy as np
import pytest

import farkle_ii_tpu as f
from farkle_ii_tpu.simulation.simulation import experiment_size, simulate_many_games
from farkle_ii_tpu.simulation.strategies import ThresholdStrategy


def test_experiment_size_default_grid():
    assert experiment_size() == 5160


def test_simulate_many_games_rows():
    df = simulate_many_games(
        n_games=64,
        strategies=[ThresholdStrategy(), ThresholdStrategy(score_threshold=500)],
        seed=9,
    )
    assert len(df) == 64
    assert set(df["termination_status"]) <= {"completed", "safety_limit"}
    completed = df[df["termination_status"] == "completed"]
    assert (completed["winning_score"] >= 10_000).all()
    # deterministic: same seed -> identical frame
    df2 = simulate_many_games(
        n_games=64,
        strategies=[ThresholdStrategy(), ThresholdStrategy(score_threshold=500)],
        seed=9,
    )
    np.testing.assert_array_equal(
        df["winning_score"].to_numpy(), df2["winning_score"].to_numpy()
    )


def test_simulate_many_games_validation():
    with pytest.raises(ValueError):
        simulate_many_games(n_games=0, strategies=[ThresholdStrategy()])
    with pytest.raises(ValueError):
        simulate_many_games(n_games=1, strategies=[])


def test_lazy_exports():
    assert f.AppConfig is not None
    assert f.RandomPurpose.TOURNAMENT_PLAYER == 103
    assert callable(f.play_games)
    with pytest.raises(AttributeError):
        f.nonexistent_attribute
    assert "run_pipeline" in dir(f)

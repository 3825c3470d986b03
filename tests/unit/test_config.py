"""Config system tests: loading, validation, overrides, identity, paths."""

import pytest

from farkle_ii_tpu import config as C


def test_defaults_and_paths(tmp_path):
    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    assert cfg.results_root.name == "results_seed_0"
    assert cfg.analysis_dir.name == "analysis"
    assert cfg.scope_dir("by_k").name == "by_k"
    with pytest.raises(ValueError):
        cfg.scope_dir("bogus_scope")
    assert cfg.checkpoint_path(5).name == "5p_checkpoint.parquet"


def test_load_yaml_and_seed_suffix(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("sim:\n  seed: 7\n  n_players_list: [2]\nio:\n  results_dir_prefix: r\n")
    cfg = C.load_app_config(p)
    assert cfg.sim.seed == 7
    assert cfg.results_root.name == "r_seed_7"


def test_reference_config_surface_loads():
    """The reference's fast_config keys must all be accepted."""
    cfg = C.load_app_config("/root/reference/configs/fast_config.yaml")
    assert cfg.sim.n_players_list == [2, 4, 5]
    assert cfg.sim.seed == 32
    assert cfg.screening.practical_delta_by_k == {2: 0.03, 4: 0.03, 5: 0.03}
    assert cfg.head2head.total_game_cap == 100_000_000
    cfg2 = C.load_app_config("/root/reference/configs/default_config.yaml")
    assert cfg2.trueskill.beta == 25.0
    cfg3 = C.load_app_config("/root/reference/configs/farkle_mega_config.yaml")
    assert 12 in cfg3.sim.n_players_list


def test_unknown_key_rejection_with_suggestion(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("sim:\n  sede: 3\n")
    with pytest.raises(C.ConfigKeyError, match="seed"):
        C.load_app_config(p)
    p.write_text("smi:\n  seed: 3\n")
    with pytest.raises(C.ConfigKeyError, match="sim"):
        C.load_app_config(p)


def test_retired_key_guidance(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("sim:\n  num_shuffles: 10\n")
    with pytest.raises(C.ConfigKeyError, match="retired"):
        C.load_app_config(p)


def test_dot_overrides_and_coercion():
    cfg = C.AppConfig()
    cfg = C.apply_dot_overrides(
        cfg, ["sim.seed=9", "screening.resolution_delta=0.05", "sim.n_players_list=[2,3]"]
    )
    assert cfg.sim.seed == 9
    assert cfg.screening.resolution_delta == 0.05
    assert cfg.sim.n_players_list == [2, 3]
    with pytest.raises(C.ConfigKeyError):
        C.apply_dot_overrides(cfg, ["sim.bogus=1"])


def test_config_sha_stability_and_sensitivity():
    a = C.compute_config_sha(C.AppConfig())
    assert a == C.compute_config_sha(C.AppConfig())
    cfg = C.AppConfig()
    cfg.sim.seed = 123
    assert C.compute_config_sha(cfg) != a


def test_stage_scoped_sha_ignores_unrelated_sections():
    cfg1 = C.AppConfig()
    cfg2 = C.AppConfig()
    cfg2.hgb.max_depth = 12  # unrelated to simulation
    assert C.compute_stage_config_sha(cfg1, "simulation") == C.compute_stage_config_sha(
        cfg2, "simulation"
    )
    cfg2.sim.seed = 5
    assert C.compute_stage_config_sha(cfg1, "simulation") != C.compute_stage_config_sha(
        cfg2, "simulation"
    )
    with pytest.raises(KeyError):
        C.compute_stage_config_sha(cfg1, "nope")


def test_stage_sha_ignores_execution_only_knobs():
    # device chunking cannot change results (coordinate-addressed RNG), so it
    # must not invalidate simulation caches
    cfg1 = C.AppConfig()
    cfg2 = C.AppConfig()
    cfg2.sim.shuffles_per_device_batch = 7
    assert C.compute_stage_config_sha(cfg1, "simulation") == C.compute_stage_config_sha(
        cfg2, "simulation"
    )


def test_freshness_key_contains_contract_fields():
    cfg = C.AppConfig()
    fk = cfg.freshness_key()
    assert fk["rng_scheme_version"] == 2
    assert fk["chance_rate_by_k"] == {5: 0.2}
    assert fk["multiplicity"] == "holm_h2h"
    assert fk["conditioning"] == "unconditional_default"


def test_dotted_yaml_keys_and_blank_preset(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("sim.seed: 7\nsim:\n  n_players_list: [2]\ntpu.aot_cache: false\n")
    cfg = C.load_app_config(p)
    assert cfg.sim.seed == 7
    assert cfg.sim.n_players_list == [2]
    assert cfg.tpu.aot_cache is False

    blank = C.load_app_config("configs/blank_config.yaml")
    assert C.compute_config_sha(blank) == C.compute_config_sha(
        C.load_app_config(None, overlays=[{"data_dir": "data"}])
    )


def test_expand_dotted_keys_semantics():
    # non-string keys are stringified path segments
    out = C.expand_dotted_keys({5: 1})
    assert out == {"5": 1}
    # scalar collision raises instead of silently deep-merging
    import pytest

    with pytest.raises(C.ConfigKeyError):
        C.expand_dotted_keys({"a": 1, "a.b": 2})
    # dict values merge into existing nodes
    out = C.expand_dotted_keys({"a.b": {"x": 1}, "a": {"b": {"y": 2}}})
    assert out == {"a": {"b": {"x": 1, "y": 2}}}

"""Smoke coverage for the small substrate modules.

These modules back the CLI/pipeline paths (reference counterparts:
utils/aggregation.py, analysis_shared.py, csv_files.py, logging.py,
sinks.py, timing.py, types.py, streaming_loop.py, aot_cache.py,
analysis/roll_enumeration.py, simulation/time_farkle.py) and were the
uncovered tail of the round-2 coverage report.
"""

import json
import logging
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from farkle_ii_tpu.utils.aggregation import normalize_k_aggregation_method
from farkle_ii_tpu.utils.analysis_shared import (
    coerce_optional_bool,
    coerce_optional_float,
    coerce_optional_int,
)
from farkle_ii_tpu.utils.csv_files import CsvWriterThread
from farkle_ii_tpu.utils.logging import configure_logging
from farkle_ii_tpu.utils.sinks import CsvSink, write_counter_csv
from farkle_ii_tpu.utils.timing import time_block
from farkle_ii_tpu.utils.types import normalize_compression


def test_normalize_k_aggregation_method():
    assert normalize_k_aggregation_method("Equal-K") == "equal-k"
    assert normalize_k_aggregation_method("equal_k") == "equal-k"
    assert normalize_k_aggregation_method("declared") == "declared_mapping"
    with pytest.raises(ValueError):
        normalize_k_aggregation_method("bogus")
    with pytest.raises(ValueError):
        normalize_k_aggregation_method(None)


def test_coercions():
    assert coerce_optional_float(None) is None
    assert coerce_optional_float(pd.NA) is None
    assert coerce_optional_float(float("nan")) is None
    assert coerce_optional_float(np.float64("nan")) is None
    assert coerce_optional_float(np.float32(2.5)) == 2.5
    assert coerce_optional_int(None) is None
    assert coerce_optional_int(3.0) == 3
    with pytest.raises(ValueError):
        coerce_optional_int(3.5)
    assert coerce_optional_bool(None) is None
    assert coerce_optional_bool(np.bool_(True)) is True
    assert coerce_optional_bool(0) is False
    with pytest.raises(ValueError):
        coerce_optional_bool("yes")


def test_csv_writer_thread(tmp_path):
    path = tmp_path / "rows.csv"
    w = CsvWriterThread(path, ["a", "b"])
    w.write({"a": 1, "b": 2})
    w.write({"a": 3, "b": 4})
    w.close()
    df = pd.read_csv(path)
    assert df.to_dict("list") == {"a": [1, 3], "b": [2, 4]}
    # append run reuses the existing header
    w2 = CsvWriterThread(path, ["a", "b"])
    w2.write({"a": 5, "b": 6})
    w2.close()
    assert len(pd.read_csv(path)) == 3


def test_csv_sink_and_counter(tmp_path):
    sink = CsvSink(tmp_path / "s.csv", ["k", "v"])
    assert sink.write_rows([{"k": "x", "v": 1}, {"k": "y", "v": 2}]) == 2
    assert sink.write_rows([{"k": "z", "v": 3}]) == 1
    df = pd.read_csv(tmp_path / "s.csv")
    assert list(df["k"]) == ["x", "y", "z"]
    write_counter_csv(tmp_path / "c.csv", {"b": 2, "a": 1})
    df = pd.read_csv(tmp_path / "c.csv")
    assert list(df["key"]) == ["a", "b"]


def test_configure_logging(tmp_path):
    configure_logging("debug", log_file=tmp_path / "log" / "x.log")
    logging.getLogger("farkle-test").info("hello-smoke")
    for h in logging.getLogger().handlers:
        h.flush()
    assert (tmp_path / "log" / "x.log").exists()


def test_time_block(caplog):
    with caplog.at_level(logging.INFO, logger="farkle_ii_tpu.utils.timing"):
        with time_block("smoke"):
            pass
    assert any("smoke took" in r.message for r in caplog.records)


def test_normalize_compression():
    assert normalize_compression(None) == "snappy"
    assert normalize_compression("ZSTD") == "zstd"
    with pytest.raises(ValueError):
        normalize_compression("xz")


def test_streaming_loop_roundtrip(tmp_path):
    from farkle_ii_tpu.utils.streaming_loop import (
        BoundedQueue,
        producer_thread,
        run_streaming_shard,
    )

    schema = pa.schema([("x", pa.int64())])
    q = BoundedQueue(maxsize=2)

    def produce(qq):
        for lo in range(0, 60, 20):
            qq.put(pa.table({"x": list(range(lo, lo + 20))}))

    t = producer_thread(produce, q)
    out = tmp_path / "shard.parquet"
    manifest = tmp_path / "manifest.ndjson"
    rows = run_streaming_shard(
        out_path=out, manifest_path=manifest, schema=schema, batch_iter=iter(q),
        manifest_extra={"block": 7},
    )
    t.join(timeout=10)
    assert rows == 60
    import pyarrow.parquet as pq

    assert pq.read_table(out)["x"].to_pylist() == list(range(60))
    lines = [json.loads(l) for l in manifest.read_text().splitlines() if l.strip()]
    assert lines[-1]["n_rows"] == 60 and lines[-1]["block"] == 7


def test_aot_cache_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from farkle_ii_tpu.utils.aot_cache import cached_compile

    calls = []

    def fn(x):
        calls.append(1)
        return x * 2 + 1

    x = jnp.arange(8)
    c1 = cached_compile(fn, x, cache_dir=tmp_path)
    np.testing.assert_array_equal(np.asarray(c1(x)), np.arange(8) * 2 + 1)
    # this host exposes 8 virtual devices, where XLA:CPU AOT deserialization
    # produces call-time-broken executables — the cache must BYPASS disk
    # (no store, no load) and still return a working executable
    assert len(jax.devices()) > 1
    assert list(tmp_path.glob("*.aotx")) == []
    c2 = cached_compile(fn, x, cache_dir=tmp_path)
    np.testing.assert_array_equal(np.asarray(c2(x)), np.asarray(c1(x)))


def test_roll_enumeration_exact():
    from farkle_ii_tpu.analysis.roll_enumeration import (
        enumerate_ordered_roll_outcomes,
        summarize,
    )

    out = enumerate_ordered_roll_outcomes(max_dice=3)
    s = summarize(out)
    assert list(s["outcomes"]) == [6, 36, 216]
    # single die: only 1 and 5 score -> farkle probability 4/6
    np.testing.assert_allclose(s["farkle_probability"][0], 4 / 6)
    assert s["max_score"][0] == 100  # a lone 1
    assert s["max_score"][2] == 600  # triple 6s (triple 1s score 300 here)
    three = out[out.n_dice == 3].set_index("roll")
    assert three.loc["111", "score"] == 300  # data/scoring_patterns.csv:29
    one_die = out[out.n_dice == 1].set_index("roll")
    assert one_die.loc["5", "score"] == 50
    assert one_die.loc["5", "single_fives"] == 1


def test_roll_enumeration_stage(tmp_path):
    from farkle_ii_tpu import config as C
    from farkle_ii_tpu.analysis import roll_enumeration as RE

    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    cfg = C.assign_config_sha(cfg)
    RE.run(cfg)
    assert RE.enumeration_path(cfg).exists()
    assert RE.summary_path(cfg).exists()
    RE.run(cfg)  # second call resolves COMPLETE_VALID and returns early


@pytest.mark.slow
def test_time_farkle_measure(tmp_path):
    from farkle_ii_tpu import config as C
    from farkle_ii_tpu.simulation.time_farkle import measure_sim_times

    cfg = C.AppConfig()
    cfg.data_dir = str(tmp_path)
    out = measure_sim_times(cfg, n_games=64, k=2)
    assert out["batch_games_per_sec"] > 0
    assert out["single_game_warm_s"] < out["single_game_cold_s"]


def test_main_module_entrypoint():
    proc = subprocess.run(
        [sys.executable, "-m", "farkle_ii_tpu", "--help"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
        cwd="/root/repo",
    )
    assert proc.returncode == 0
    assert "usage" in proc.stdout.lower() or "usage" in proc.stderr.lower()

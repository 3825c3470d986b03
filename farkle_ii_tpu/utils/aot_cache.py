"""Ahead-of-time compiled-executable cache.

The attached TPU backend in this environment (axon, remote-tunneled) costs
~0.5 s of network round-trips *per HLO op* during lowering, so a ~1k-op game
kernel takes minutes to lower on every process start even though XLA's own
compilation cache hits. This module removes that tax wholesale: the fully
compiled executable is serialized (``jax.experimental.serialize_executable``)
and pickled to disk, keyed by a hash of the traced jaxpr + shapes + platform.
Warm starts deserialize in milliseconds.

Tracing is always done fresh (it is fast and device-independent); only
lowering+compilation is skipped on a cache hit, so a code change that alters
the program automatically misses the cache via the jaxpr hash.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile
import threading
from pathlib import Path
from typing import Any, Callable

import jax

logger = logging.getLogger(__name__)

# In-process executable memo keyed by the full cache key. Lets a background
# prewarm thread deserialize executables concurrently with real work and
# hand them to the run that asks for the same program later (per-cell AOT
# deserialization was part of the mega run's ~15 s/cell fixed cost).
_MEMO: dict[str, Any] = {}
_MEMO_LOCK = threading.Lock()
_IN_FLIGHT: dict[str, threading.Event] = {}

_DEFAULT_CACHE_DIR = Path(
    os.environ.get("FARKLE_AOT_CACHE", Path.home() / ".cache" / "farkle_ii_tpu" / "aot")
)


def _platform_fingerprint() -> str:
    dev = jax.devices()[0]
    return f"{jax.__version__}|{dev.platform}|{getattr(dev, 'device_kind', '?')}|{len(jax.devices())}"


def cache_key_for_trace(traced, extra: str = "") -> str:
    """Stable key: jaxpr text + input avals + platform + jax version."""
    text = str(traced.jaxpr)
    avals = str(getattr(traced, "in_avals", ""))
    payload = "\x00".join([text, avals, _platform_fingerprint(), extra])
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def cached_compile(
    fn: Callable[..., Any],
    *example_args: Any,
    cache_dir: Path | str | None = None,
    extra_key: str = "",
    static_argnums: tuple[int, ...] = (),
):
    """Return a compiled executable for ``fn(*example_args)``, disk-cached.

    ``fn`` is wrapped in ``jax.jit`` if it is not already jitted. The returned
    object is callable with arguments matching the example shapes/dtypes.
    """
    cache_dir = Path(cache_dir) if cache_dir is not None else _DEFAULT_CACHE_DIR
    jitted = fn if hasattr(fn, "trace") else jax.jit(fn, static_argnums=static_argnums)
    traced = jitted.trace(*example_args)

    if len(jax.devices()) > 1:
        # The cache exists to skip the single-chip axon backend's remote
        # lowering tax. On multi-device hosts (virtual CPU meshes in tests
        # and the multichip dryrun) XLA:CPU AOT deserialization yields an
        # executable that demands one shard per local device even for
        # single-device programs ("Expected args ... to have N shards"),
        # so a cache HIT would crash at call time. Compile fresh instead.
        logger.debug("aot_cache bypassed: %d local devices", len(jax.devices()))
        return traced.lower().compile()
    key = cache_key_for_trace(traced, extra=extra_key)
    path = cache_dir / f"{key}.aotx"

    # single-flight in-process memo: a concurrent identical request waits
    # for the first one instead of deserializing/compiling twice
    while True:
        with _MEMO_LOCK:
            if key in _MEMO:
                return _MEMO[key]
            event = _IN_FLIGHT.get(key)
            if event is None:
                _IN_FLIGHT[key] = threading.Event()
                break
        event.wait()

    def _finish(compiled_obj):
        with _MEMO_LOCK:
            _MEMO[key] = compiled_obj
            _IN_FLIGHT.pop(key).set()
        return compiled_obj

    try:
        if path.exists():
            try:
                from jax.experimental.serialize_executable import (
                    deserialize_and_load,
                )

                with open(path, "rb") as f:
                    blob, in_tree, out_tree = pickle.load(f)
                compiled = deserialize_and_load(blob, in_tree, out_tree)
                logger.info("aot_cache hit: %s", path.name)
                return _finish(compiled)
            except Exception as exc:  # corrupted/incompatible cache entry
                logger.warning(
                    "aot_cache entry %s unusable (%s); recompiling", path.name, exc
                )
                try:
                    path.unlink()
                except OSError:
                    pass

        compiled = traced.lower().compile()
        try:
            from jax.experimental.serialize_executable import serialize

            blob, in_tree, out_tree = serialize(compiled)
            cache_dir.mkdir(parents=True, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump((blob, in_tree, out_tree), f)
            os.replace(tmp, path)
            logger.info("aot_cache store: %s", path.name)
        except Exception as exc:  # serialization unsupported on this backend
            logger.warning("aot_cache store failed (%s); continuing uncached", exc)
        return _finish(compiled)
    except BaseException:
        # release waiters on failure so they retry rather than hang
        with _MEMO_LOCK:
            pending = _IN_FLIGHT.pop(key, None)
            if pending is not None:
                pending.set()
        raise

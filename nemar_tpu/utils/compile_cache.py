"""Persistent XLA compilation cache.

Every jitted/Pallas program pays a remote compile on the relayed TPU (1-5
min each — CLAUDE.md); round-2's driver bench spent 520 s on compile+first
step alone. The persistent cache makes every repeat invocation (bench runs,
experiments, CI subprocesses) hit disk instead of the compiler.

Called from every entry point (train.py, test.py, bench.py,
__graft_entry__.py, tests/conftest.py). Safe to call more than once.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX at a persistent on-disk compilation cache and return the dir.

    Honors $NEMAR_COMPILE_CACHE (set to '0'/'off' to disable, or to a path
    to relocate). The default lives inside the repo (.jax_cache, gitignored)
    so it survives across driver rounds on this machine.
    """
    env = os.environ.get("NEMAR_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return ""

    import jax

    # TPU-only. XLA:CPU cache entries are machine-code AOT results whose
    # load-time compatibility check covers both the host CPU feature set
    # (this VM migrates across feature sets between sessions) AND
    # compile-tuning pseudo-features like +prefer-no-gather that differ
    # between entry points — a mismatched entry SIGILL-aborts mid-run
    # (observed 2026-08-17: "Machine type used for XLA:CPU compilation
    # doesn't match", then 'Fatal Python error: Aborted' inside a jitted
    # train step; a per-machine-hash subdir still hit the pseudo-feature
    # variant). CPU compiles cost seconds; only the relayed-TPU compiles
    # (1-5 min each) need persistence. The platform is read WITHOUT
    # initializing the backend (init blocks for minutes during relay
    # outages): every CPU-forcing path in this repo sets
    # jax_platforms/JAX_PLATFORMS to 'cpu' explicitly.
    plats = (getattr(jax.config, "jax_platforms", None)
             or os.environ.get("JAX_PLATFORMS", ""))
    # Only the PRIMARY platform matters: the sitecustomize registers the
    # relayed TPU as 'axon,cpu' (cpu as fallback), and a substring test
    # against that silently disabled the cache for every TPU entry point
    # (round-3 session-4 finding). CPU-forcing paths set plats to exactly
    # 'cpu', which is the case the SIGILL hazard note below is about.
    primary = str(plats).split(",")[0].strip()
    if primary == "cpu":
        return ""
    cache_dir = os.path.join(cache_dir or env or _DEFAULT_DIR, "tpu")
    os.makedirs(cache_dir, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # The relay makes even small compiles expensive (~30-60 s round trip),
    # so cache everything that took any measurable compile time.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir

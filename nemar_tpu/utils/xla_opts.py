"""Per-jit XLA compiler options from the environment.

The axon relay's compile helper runs with a CLEARED environment, so
XLA_FLAGS set on this host never reaches the TPU compiler. Per-jit
``compiler_options`` DO travel: they are serialized into the PJRT
CompileOptions proto inside the compile request. This hook lets a perf
probe sweep backend knobs (scoped-VMEM limit, scheduler toggles, ...)
without code edits:

    NEMAR_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=65536" python bench.py

Values parse as bool ("true"/"false") or int when they look like one;
anything else passes through as a string. Empty/unset env -> None, which
``jax.jit(compiler_options=None)`` treats as the default build.
"""

from __future__ import annotations

import os


def _parse_val(v: str):
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(v)
    except ValueError:
        return v


def env_compiler_options() -> dict | None:
    """Parse $NEMAR_XLA_OPTS ("k=v,k=v") into a compiler_options dict."""
    raw = os.environ.get("NEMAR_XLA_OPTS", "").strip()
    if not raw:
        return None
    out = {}
    for item in raw.split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(
                f"NEMAR_XLA_OPTS entry {item!r} is not key=value")
        k, v = item.split("=", 1)
        out[k.strip()] = _parse_val(v.strip())
    return out or None

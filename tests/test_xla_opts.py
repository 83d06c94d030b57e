"""$NEMAR_XLA_OPTS -> per-jit compiler_options parsing (utils/xla_opts).

The hook exists because the axon relay's compile helper clears its env:
XLA_FLAGS never reaches the TPU compiler, per-jit CompileOptions do.
Parsing must be strict — a typo'd knob silently ignored would invalidate
a whole probe window.
"""

import pytest

from nemar_tpu.utils.xla_opts import env_compiler_options


def test_unset_returns_none(monkeypatch):
    monkeypatch.delenv("NEMAR_XLA_OPTS", raising=False)
    assert env_compiler_options() is None


def test_empty_and_blank_return_none(monkeypatch):
    monkeypatch.setenv("NEMAR_XLA_OPTS", "  ")
    assert env_compiler_options() is None
    monkeypatch.setenv("NEMAR_XLA_OPTS", " , ,")
    assert env_compiler_options() is None


def test_typed_values(monkeypatch):
    monkeypatch.setenv(
        "NEMAR_XLA_OPTS",
        "xla_tpu_scoped_vmem_limit_kib=65536, xla_x=true,xla_y=False,z=ab3",
    )
    assert env_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": 65536,
        "xla_x": True,
        "xla_y": False,
        "z": "ab3",
    }


def test_malformed_entry_raises(monkeypatch):
    monkeypatch.setenv("NEMAR_XLA_OPTS", "xla_tpu_scoped_vmem_limit_kib")
    with pytest.raises(ValueError, match="not key=value"):
        env_compiler_options()


def test_jit_accepts_parsed_options(monkeypatch):
    # compiler_options must flow into jax.jit unchanged; on CPU an unknown
    # key raises at compile time, which proves the plumbing reaches the
    # compiler rather than being dropped.
    import jax
    import jax.numpy as jnp

    monkeypatch.delenv("NEMAR_XLA_OPTS", raising=False)
    f = jax.jit(lambda x: x * 2, compiler_options=env_compiler_options())
    assert float(f(jnp.float32(2.0))) == 4.0

    monkeypatch.setenv("NEMAR_XLA_OPTS", "xla_no_such_knob_xyz=1")
    g = jax.jit(lambda x: x * 2, compiler_options=env_compiler_options())
    with pytest.raises(Exception):
        g(jnp.float32(2.0))

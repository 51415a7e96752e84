"""Config system: interpolation, mandatory fields, CLI overrides."""

import os

import pytest

from multimodalreactiongeneration_tpu.utils.config import (
    MandatoryValueError,
    from_dict,
    load_config,
)

BASE = {
    "hidden_size": 256,
    "lr": 5e-6,
    "name": "cradle-01",
    "data_dir": "???",
    "model": {
        "hidden_size": "${hidden_size}",
        "tag": "run-${name}",
        "emb_mixers": ["lstm", "lstm", "lstm"],
        "nested": {"lr": "${lr}"},
    },
}


def test_interpolation_preserves_type():
    cfg = from_dict(BASE)
    assert cfg.model.hidden_size == 256
    assert isinstance(cfg.model.hidden_size, int)
    assert cfg.model.nested.lr == 5e-6
    assert cfg.model.tag == "run-cradle-01"


def test_mandatory_raises():
    cfg = from_dict(BASE)
    with pytest.raises(MandatoryValueError):
        _ = cfg.data_dir
    # .get must raise too (OmegaConf MissingMandatoryValue semantics):
    # a default here would silently bypass the mandatory contract
    with pytest.raises(MandatoryValueError):
        cfg.get("data_dir", "fallback")
    # absent keys still take the default
    assert cfg.get("not_a_key", "fallback") == "fallback"


def test_overrides_typed():
    cfg = from_dict(
        BASE,
        overrides=[
            "data_dir=/tmp/corpus",
            "hidden_size=128",
            "model.flag=false",
            "name=exp2",
        ],
    )
    assert cfg.data_dir == "/tmp/corpus"
    assert cfg.model.hidden_size == 128  # interpolation sees the override
    assert cfg.model.flag is False
    assert cfg.model.tag == "run-exp2"


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nb: ${a}\ngrp:\n  c: ${b}\n")
    cfg = load_config(str(p))
    assert cfg.grp.c == 1


def test_equality_for_cache_protocol():
    assert from_dict(BASE) == from_dict(BASE)
    assert from_dict(BASE) != from_dict(BASE, overrides=["hidden_size=1"])


def test_enable_compile_cache_first_wins(tmp_path):
    """Production CLIs enable the persistent XLA compile cache, but never
    redirect one that conftest / the multichip dryrun already set."""
    import jax

    from multimodalreactiongeneration_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        target = str(tmp_path / "cache")
        enable_compile_cache(target)
        assert jax.config.jax_compilation_cache_dir == target
        assert os.path.isdir(target)
        enable_compile_cache(str(tmp_path / "other"))  # first-wins
        assert jax.config.jax_compilation_cache_dir == target
        enable_compile_cache(None)  # disabled = no-op
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

"""Layered config precedence (doc_agent_spark/config.py — the reference
Config + defaultModels surface): CLI > env > file > defaults, per-provider
default model resolution, fail-fast on unknown keys."""

from __future__ import annotations

import json

import pytest

from doc_agent_spark import config


def test_defaults_and_default_model():
    cfg = config.load_config(env={})
    assert cfg["provider"] == "ollama"
    assert cfg["model"] == "llama3.2-vision"   # defaultModels[ollama]
    assert cfg["row_limit"] == 100


def test_provider_resolves_its_own_default_model():
    cfg = config.load_config(env={"DOC_AGENT_PROVIDER": "gemini"})
    assert cfg["model"] == "gemini-2.5-flash"
    cfg = config.load_config(env={"DOC_AGENT_PROVIDER": "openai"})
    assert cfg["model"] == "gpt-4o"


def test_file_then_env_then_cli_precedence(tmp_path):
    f = tmp_path / "cfg.json"
    f.write_text(json.dumps({"provider": "gemini", "row_limit": 7,
                             "db_path": "/from/file"}))
    # file layer alone
    cfg = config.load_config(config_path=str(f), env={})
    assert (cfg["provider"], cfg["row_limit"], cfg["db_path"]) == (
        "gemini", 7, "/from/file")
    # env overrides file
    cfg = config.load_config(config_path=str(f),
                             env={"DOC_AGENT_ROW_LIMIT": "9"})
    assert cfg["row_limit"] == 9 and cfg["provider"] == "gemini"
    # cli overrides both; None cli values count as absent
    cfg = config.load_config(
        cli_args={"row_limit": 3, "provider": None},
        config_path=str(f), env={"DOC_AGENT_ROW_LIMIT": "9"},
    )
    assert cfg["row_limit"] == 3 and cfg["provider"] == "gemini"


def test_config_file_via_env_pointer(tmp_path):
    f = tmp_path / "cfg.json"
    f.write_text(json.dumps({"master": "local[3]"}))
    cfg = config.load_config(env={"DOC_AGENT_CONFIG": str(f)})
    assert cfg["master"] == "local[3]"


def test_model_given_anywhere_beats_provider_default():
    cfg = config.load_config(
        env={"DOC_AGENT_PROVIDER": "gemini", "DOC_AGENT_MODEL": "custom-m"})
    assert cfg["model"] == "custom-m"


def test_unknown_keys_fail_fast(tmp_path):
    f = tmp_path / "cfg.json"
    f.write_text(json.dumps({"providr": "x"}))
    with pytest.raises(ValueError, match="unknown config key"):
        config.load_config(config_path=str(f), env={})
    with pytest.raises(ValueError, match="unknown config field"):
        config.load_config(cli_args={"nope": 1}, env={})


def test_unknown_provider_fails_fast():
    with pytest.raises(ValueError, match="unknown provider"):
        config.load_config(env={"DOC_AGENT_PROVIDER": "gemni"})

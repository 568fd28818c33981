"""Layered runtime configuration — the reference's ``Config`` surface
(packages/core/src/index.ts:28-35: aiProvider/model/dbPath fields filled
from CLI options and process.env) with an explicit precedence order:

    CLI args  >  environment variables  >  config file  >  defaults

plus the CLI's per-provider default-model map (cli.ts:31-37:
``options.model || defaultModels[options.provider]``) applied AFTER the
merge, so a provider chosen at any layer picks its own default model
unless a model was given at any layer.

The provider/model fields drive the deterministic provider registry
(api/spec P2 routing — no real AI runs in this data plane); db_path is
the corpus location analog; row_limit/master parameterize the transport
shell (serve.py). Everything is a plain dict in, plain dict out — no
global state, trivially testable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

ENV_PREFIX = "DOC_AGENT_"

DEFAULTS: dict[str, Any] = {
    "provider": "ollama",     # the reference CLI's default (-p, cli.ts:25)
    "model": None,            # resolved from DEFAULT_MODELS when unset
    "db_path": None,
    "row_limit": 100,
    "master": None,
    "cache_dir": None,        # serve-layer result cache (roadmap :348)
}

# cli.ts:31-37 defaultModels mirror
DEFAULT_MODELS: dict[str, str] = {
    "ollama": "llama3.2-vision",
    "gemini": "gemini-2.5-flash",
    "openai": "gpt-4o",
}

_INT_FIELDS = {"row_limit"}


def _env_name(field: str) -> str:
    return ENV_PREFIX + field.upper()


def _coerce(field: str, value: Any) -> Any:
    if value is not None and field in _INT_FIELDS and not isinstance(value, int):
        return int(value)
    return value


def load_config(
    cli_args: Mapping[str, Any] | None = None,
    config_path: str | None = None,
    env: Mapping[str, str] | None = None,
) -> dict[str, Any]:
    """Merge the four layers into one config dict (all DEFAULTS keys
    always present). ``cli_args`` entries that are None count as ABSENT
    (an argparse flag the user didn't pass must not shadow env/file).
    The config file is JSON at ``config_path``, else at
    ``$DOC_AGENT_CONFIG`` if set, else skipped; unknown file keys fail
    fast (a typo'd key silently ignored is a misconfigured run)."""
    env = os.environ if env is None else env
    cfg = dict(DEFAULTS)

    path = config_path or env.get(ENV_PREFIX + "CONFIG")
    if path:
        with open(path) as fh:
            file_cfg = json.load(fh)
        unknown = sorted(set(file_cfg) - set(DEFAULTS))
        if unknown:
            raise ValueError(
                f"unknown config key(s) in {path}: {', '.join(unknown)}; "
                f"known: {', '.join(sorted(DEFAULTS))}"
            )
        for k, v in file_cfg.items():
            if v is not None:
                cfg[k] = _coerce(k, v)

    for k in DEFAULTS:
        v = env.get(_env_name(k))
        if v is not None:
            cfg[k] = _coerce(k, v)

    for k, v in (cli_args or {}).items():
        if k not in DEFAULTS:
            raise ValueError(f"unknown config field: {k}")
        if v is not None:
            cfg[k] = _coerce(k, v)

    if cfg["provider"] not in DEFAULT_MODELS:
        # same fail-fast policy as unknown file keys: a typo'd provider
        # silently borrowing another provider's default model is a
        # misconfigured run (the reference types it as a closed enum)
        raise ValueError(
            f"unknown provider: {cfg['provider']!r}; "
            f"known: {', '.join(sorted(DEFAULT_MODELS))}"
        )
    if cfg["model"] is None:
        cfg["model"] = DEFAULT_MODELS[cfg["provider"]]
    return cfg

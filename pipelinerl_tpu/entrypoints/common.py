"""Shared helpers for stage entrypoints."""

from __future__ import annotations

import sys
from pathlib import Path

from ..config import Config, compose
from ..utils import setup_logging


def load_stage_config(argv: list[str] | None = None) -> Config:
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = "conf"
    config_name = "exp_config"
    overrides = []
    for arg in argv:
        if arg.startswith("--config-dir="):
            config_dir = arg.split("=", 1)[1]
        elif arg.startswith("--config-name="):
            config_name = arg.split("=", 1)[1]
        else:
            overrides.append(arg)
    return compose(config_dir, config_name, overrides)


def stage_setup(cfg: Config, stage: str) -> str:
    exp_path = str(cfg.output_dir)
    setup_logging(Path(exp_path) / "logs" / stage)
    # every stage speaks the experiment's stream backend; "tcp" routes all
    # topics through the hub (cross-host transport, streams_tcp.py)
    from ..streams import set_streams_backend

    backend = str(cfg.select("streams.backend", "files") or "files")
    if stage != "stream_hub":  # the hub itself serves, not consumes
        set_streams_backend(backend, hub=cfg.select("streams.hub"))
    if stage in ("device", "trainer", "engine"):
        from ..utils import enable_compilation_cache

        enable_compilation_cache(cfg.select("compilation_cache_dir"))
    return exp_path

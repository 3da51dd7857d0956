"""Environment (verifier) server job."""

from __future__ import annotations

import logging

from ..domains.registry import resolve
from .common import load_stage_config, stage_setup

logger = logging.getLogger(__name__)

_DEFAULT_ENV_CLASS = "pipelinerl_tpu.domains.math.verifier_api.MathEnvironment"


def main(argv: list[str] | None = None) -> None:
    cfg = load_stage_config(argv)
    stage_setup(cfg, "environment")
    port = int(cfg.select("me.port", 7777))
    env_class_path = cfg.get("environment_class") or _DEFAULT_ENV_CLASS
    env_class = resolve(env_class_path)
    logger.info("Launching environment %s on port %d", env_class_path, port)
    env_class.launch(port=port)


if __name__ == "__main__":
    main()

"""Stream-hub job: the cross-host stream transport server (streams_tcp.py,
the Redis role in the reference — /root/reference/pipelinerl/streams.py:103-232)."""

from __future__ import annotations

import logging
from pathlib import Path

from ..streams_tcp import StreamHub
from .common import load_stage_config, stage_setup

logger = logging.getLogger(__name__)


def main(argv: list[str] | None = None) -> None:
    cfg = load_stage_config(argv)
    exp_path = stage_setup(cfg, "stream_hub")
    port = int(cfg.select("me.port", 7099))
    persist = None
    if bool(cfg.select("streams.persist", True)):
        persist = str(Path(exp_path) / "streams_hub")
    # per-key retention bound — matches the reference's Redis XADD maxlen 1M
    # (/root/reference/pipelinerl/streams.py:120-192); a days-long run must
    # not grow hub memory without bound
    maxlen = int(cfg.select("streams.hub_maxlen", 1_000_000) or 1_000_000)
    hub = StreamHub(host="0.0.0.0", port=port, persist_dir=persist, maxlen=maxlen)
    hub.serve_forever()


if __name__ == "__main__":
    main()

"""Gather every .json file under a folder into <folder>/all/tapes.json
(reference dev utility, /root/reference/pipelinerl/gather_jsons.py).

    python -m pipelinerl_tpu.gather_jsons <folder>
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def gather_jsons(folder: str | Path) -> Path:
    folder = Path(folder)
    all_jsons = []
    for p in sorted(folder.rglob("*.json")):
        if p.parent.name == "all":
            continue  # skip a previous run's output
        with open(p) as f:
            all_jsons.append(json.load(f))
    dst_dir = folder / "all"
    dst_dir.mkdir(parents=True, exist_ok=True)
    dst = dst_dir / "tapes.json"
    with open(dst, "w") as f:
        json.dump(all_jsons, f, indent=4)
    return dst


if __name__ == "__main__":
    gather_jsons(sys.argv[1])

"""WorldMap: job placement for multi-process deployments.

TPU-native re-think of the reference WorldMap (/root/reference/pipelinerl/
world.py:36-268). The reference splits GPUs between many CUDA processes;
on TPU the chips of a host belong to ONE process (the device job: engine(s)
+ trainer sharing the mesh, weight updates in-process), while actors,
preprocessors, and environment servers are pure-host processes talking over
streams and HTTP. Multi-host scaling adds one device job per host (engine
replicas / sharded trainer via jax.distributed) and spreads the host jobs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from .config import Config


@dataclass
class Job:
    kind: str  # "device" | "actor" | "preprocessor" | "environment" | "launcher"
    replica_idx: int = 0
    hostname: str = "127.0.0.1"
    port: int | None = None
    # extra per-job settings exposed to the child via cfg.me
    extra: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "replica_idx": self.replica_idx,
            "hostname": self.hostname,
            "port": self.port,
            **self.extra,
        }


class WorldMap:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        world = cfg.get("world", Config({}))
        self.replicas = int(world.get("replicas", 1))
        self.env_replicas = int(world.get("env_replicas", 1))
        engine_port = int(world.get("engine_start_port", 8080))
        env_port = int(world.get("environment_start_port", 7777))

        self.jobs: list[Job] = []
        # one device job per replica: owns the chips, runs engine + trainer
        for i in range(self.replicas):
            self.jobs.append(
                Job(kind="device", replica_idx=i, port=engine_port + i)
            )
        # environment servers (verifiers)
        needs_env = bool(cfg.get("environment"))
        if needs_env or cfg.get("environment_class"):
            for i in range(self.env_replicas):
                self.jobs.append(
                    Job(kind="environment", replica_idx=i, port=env_port + i)
                )
        # host-side pipeline stages
        n_actors = int(cfg.actor.get("replicas", 1)) if "actor" in cfg else 1
        for i in range(n_actors):
            self.jobs.append(Job(kind="actor", replica_idx=i))
        self.jobs.append(Job(kind="preprocessor", replica_idx=0))

    @property
    def llm_urls(self) -> list[str]:
        return [
            f"http://{j.hostname}:{j.port}"
            for j in self.jobs
            if j.kind == "device" and j.port
        ]

    @property
    def environment_servers(self) -> list[dict]:
        return [
            {"hostname": j.hostname, "port": j.port}
            for j in self.jobs
            if j.kind == "environment"
        ]

    def jobs_of(self, kind: str) -> list[Job]:
        return [j for j in self.jobs if j.kind == kind]

    def to_config(self) -> list[dict]:
        return [j.to_dict() for j in self.jobs]

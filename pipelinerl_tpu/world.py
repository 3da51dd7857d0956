"""WorldMap: job placement for multi-process / multi-host deployments.

TPU-native re-think of the reference WorldMap (/root/reference/pipelinerl/
world.py:36-268). The reference splits GPUs between many CUDA processes; on
TPU the chips of a host belong to ONE process, so placement is in units of
host processes:

- ``device`` jobs: engine + trainer sharing the host's chips (single-host
  default — weight updates are in-process pointer swaps);
- split deployments (``world.trainer_procs > 0``): ``trainer`` jobs form one
  jax.distributed world (the sharded learner mesh; dp spans hosts over DCN)
  while ``engine`` jobs serve rollouts, receiving weight pushes over HTTP
  (inference/weight_transfer.py) — the reference's actor:finetune GPU split
  (conf/base.yaml:75-81) expressed host-wise;
- ``stream_hub``: the cross-host stream transport (streams_tcp.py, the
  Redis role) on the head host;
- ``actor`` / ``preprocessor`` / ``environment``: pure-host jobs, spread
  round-robin over the host list.

``world.hosts`` lists placement targets (index 0 = head host, where the
launcher runs); non-local hosts are reached over ssh by the launcher.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import Config

_LOCAL_HOSTS = ("127.0.0.1", "localhost")


@dataclass
class Job:
    kind: str  # "device" | "engine" | "trainer" | "stream_hub" | "actor" | "preprocessor" | "environment"
    replica_idx: int = 0
    hostname: str = "127.0.0.1"
    port: int | None = None
    # extra per-job settings exposed to the child via cfg.me
    extra: dict = field(default_factory=dict)

    @property
    def is_local(self) -> bool:
        return self.hostname in _LOCAL_HOSTS

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "replica_idx": self.replica_idx,
            "hostname": self.hostname,
            "port": self.port,
            **self.extra,
        }


def _fraction_split(n_hosts: int, actor_fraction: float, finetune_fraction: float) -> int:
    """Number of hosts reserved for engines when fractions are set — the
    reference's actor:finetune GPU split (_split_gpus_by_purpose,
    /root/reference/pipelinerl/world.py:143-192) expressed host-wise.
    Returns engine host count in [1, n_hosts-1] (both sides need >=1)."""
    total = actor_fraction + finetune_fraction
    if total <= 0:
        return max(1, n_hosts // 2)
    k = round(n_hosts * actor_fraction / total)
    return min(max(k, 1), n_hosts - 1)


class WorldMap:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        world = cfg.get("world", Config({}))
        self.hosts: list[str] = list(world.get("hosts", ["127.0.0.1"]))
        self.replicas = int(world.get("replicas", 1))
        self.trainer_procs = int(world.get("trainer_procs", 0))
        self.actor_fraction = float(world.get("actor_fraction", 0) or 0)
        self.finetune_fraction = float(world.get("finetune_fraction", 0) or 0)
        self.env_replicas = int(world.get("env_replicas", 1))
        engine_port = int(world.get("engine_start_port", 8080))
        env_port = int(world.get("environment_start_port", 7777))
        self.stream_hub_port = int(world.get("stream_hub_port", 7099))
        self.coordinator_port = int(world.get("coordinator_port", 7199))
        hub_setting = world.get("stream_hub", "auto")
        self.use_stream_hub = (
            len(self.hosts) > 1 if hub_setting == "auto" else bool(hub_setting)
        )

        def host(i: int) -> str:
            return self.hosts[i % len(self.hosts)]

        self.jobs: list[Job] = []
        if self.use_stream_hub:
            self.jobs.append(
                Job(kind="stream_hub", hostname=self.hosts[0], port=self.stream_hub_port)
            )
        # reference-policy engine: a frozen-weights engine scoring ref
        # logprobs for the KL penalty (the reference provisions a dedicated
        # ref vLLM, /root/reference/pipelinerl/launch.py:149,
        # world.py:230-268). "auto" provisions iff kl_coef != 0.
        ref_setting = world.get("ref_engine", "auto")
        kl_coef = float(cfg.select("finetune.rl.kl_coef", 0.0) or 0.0)
        self.needs_ref_engine = (
            kl_coef != 0.0 if ref_setting == "auto" else bool(ref_setting)
        )
        self.ref_engine_port = int(world.get("ref_engine_port", engine_port + 500))
        if self.trainer_procs > 0:
            # split deployment: engines and the trainer world are separate
            # processes (possibly separate hosts / TPU slices). With
            # actor/finetune fractions set, engines get the first
            # `n_engine_hosts` hosts and trainers fill from the back —
            # otherwise legacy round-robin over all hosts.
            fractions_set = self.actor_fraction > 0 or self.finetune_fraction > 0
            if fractions_set and len(self.hosts) > 1:
                n_engine_hosts = _fraction_split(
                    len(self.hosts), self.actor_fraction, self.finetune_fraction
                )
                engine_host = lambda i: self.hosts[i % n_engine_hosts]  # noqa: E731
                trainer_host = lambda i: self.hosts[  # noqa: E731
                    n_engine_hosts + (i % (len(self.hosts) - n_engine_hosts))
                ]
            else:
                engine_host = host
                trainer_host = lambda i: self.hosts[  # noqa: E731
                    len(self.hosts) - 1 - (i % len(self.hosts))
                ]
            for i in range(self.replicas):
                self.jobs.append(
                    Job(kind="engine", replica_idx=i, hostname=engine_host(i), port=engine_port + i)
                )
            coordinator = f"{self.hosts[0]}:{self.coordinator_port}"
            for i in range(self.trainer_procs):
                self.jobs.append(
                    Job(
                        kind="trainer",
                        replica_idx=i,
                        hostname=trainer_host(i),
                        extra={
                            "process_id": i,
                            "num_processes": self.trainer_procs,
                            "coordinator": coordinator,
                        },
                    )
                )
        else:
            # one device job per replica: owns the chips, runs engine + trainer
            for i in range(self.replicas):
                self.jobs.append(
                    Job(kind="device", replica_idx=i, hostname=host(i), port=engine_port + i)
                )
        if self.needs_ref_engine:
            # own host slot after the engines (on TPU the ref engine needs
            # its own chip — single-tenant runtime); frozen: the server
            # rejects weight pushes
            self.jobs.append(
                Job(
                    kind="ref_engine",
                    replica_idx=0,
                    hostname=host(self.replicas),
                    port=self.ref_engine_port,
                    extra={"frozen": True},
                )
            )
        # environment servers (verifiers)
        needs_env = bool(cfg.get("environment"))
        if needs_env or cfg.get("environment_class"):
            for i in range(self.env_replicas):
                self.jobs.append(
                    Job(kind="environment", replica_idx=i, hostname=host(i), port=env_port + i)
                )
        # host-side pipeline stages
        n_actors = int(cfg.actor.get("replicas", 1)) if "actor" in cfg else 1
        for i in range(n_actors):
            self.jobs.append(Job(kind="actor", replica_idx=i, hostname=host(i)))
        self.jobs.append(Job(kind="preprocessor", replica_idx=0, hostname=self.hosts[0]))

    @property
    def llm_urls(self) -> list[str]:
        return [
            f"http://{j.hostname}:{j.port}"
            for j in self.jobs
            if j.kind in ("device", "engine") and j.port
        ]

    @property
    def ref_llm_urls(self) -> list[str]:
        return [
            f"http://{j.hostname}:{j.port}"
            for j in self.jobs
            if j.kind == "ref_engine" and j.port
        ]

    @property
    def stream_hub_addr(self) -> str | None:
        for j in self.jobs:
            if j.kind == "stream_hub":
                return f"{j.hostname}:{j.port}"
        return None

    @property
    def num_trainers(self) -> int:
        """Trainer stream partitions (one per trainer process; a combined
        device job is one trainer)."""
        return self.trainer_procs if self.trainer_procs > 0 else self.replicas

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

"""pipelinerl_tpu — a TPU-native asynchronous RL trainer for LLMs.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
ServiceNow/PipelineRL (reference layout documented in SURVEY.md): a sharded
pjit learner runs simplified-GRPO policy-gradient updates while a TPU-resident
continuous-batching inference engine generates grouped, verifier-rewarded
rollouts with per-token logprobs, and in-flight weight updates flow from
learner shards to inference shards between decode steps (no engine pause).

Subpackages
-----------
- ``models``    : functional transformer definitions + HF checkpoint import
- ``ops``       : Pallas/TPU kernels and their XLA reference implementations
- ``parallel``  : mesh construction and sharding rules (DP/FSDP/TP/CP)
- ``train``     : RL losses, advantages, packing, optimizers, train loop
- ``inference`` : continuous-batching engine, sampling, OpenAI-style server
- ``domains``   : pluggable tasks (load_problems / generate_rollout)
- ``utils``     : logging and small host-side helpers
"""

__version__ = "0.1.0"

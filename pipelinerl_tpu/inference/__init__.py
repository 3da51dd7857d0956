"""TPU-resident continuous-batching inference engine + clients/server."""

from .engine import EngineConfig, GenRequest, GenResult, InferenceEngine, SamplingParams  # noqa: F401

"""Per-stage process entrypoints (reference pipelinerl/entrypoints/*).

Each composes the saved exp_config with ``me.*`` overrides injected by the
launcher and runs one stage. All of them are also importable for tests.
"""

"""Real multi-process jax.distributed test on the CPU backend.

Two OS processes × 4 virtual CPU devices each form one 8-device world;
each process feeds ITS OWN dp-partition of a batch (the per-host
training_data partition contract, reference preprocess.py:356-367) through
the sharded loss and must observe the same global result as a single-process
run over the concatenated batch.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys, json
    import jax
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(os.environ["PROC_ID"]),
    )
    import jax.numpy as jnp
    import numpy as np
    from pipelinerl_tpu.parallel.multihost import make_multihost_mesh
    from pipelinerl_tpu.parallel.sharding import shard_batch, shard_params
    from pipelinerl_tpu.models.transformer import ModelConfig, init_params

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    mesh = make_multihost_mesh(tp=2, cp=1)  # dp=4 across both processes

    cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    with mesh:
        params = shard_params(params, mesh)

        # each process contributes its own half of the global [4, 16] batch
        pid = jax.process_index()
        rows = np.arange(2 * 16, dtype=np.int32).reshape(2, 16) % 64 + pid * 2
        batch = {
            "input_ids": rows,
            "labels": rows,
            "position_ids": np.tile(np.arange(16, dtype=np.int32), (2, 1)),
            "segment_ids": np.zeros((2, 16), np.int32),
        }
        global_batch = shard_batch(
            {k: v for k, v in batch.items()}, mesh
        )

        from pipelinerl_tpu.models.transformer import forward

        @jax.jit
        def loss_fn(params, input_ids, position_ids, segment_ids):
            logits = forward(params, cfg, input_ids, position_ids, segment_ids)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        loss = loss_fn(params, global_batch["input_ids"],
                       global_batch["position_ids"], global_batch["segment_ids"])
        print("RESULT", json.dumps({"pid": pid, "loss": float(loss)}), flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed_loss(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "COORD": coord,
        "PYTHONPATH": os.getcwd(),
    }
    env_base.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker)],
            env={**env_base, "PROC_ID": str(i)},
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line.removeprefix("RESULT "))
                results[r["pid"]] = r["loss"]
    assert set(results) == {0, 1}
    # both processes observe the same global loss
    assert results[0] == pytest.approx(results[1], rel=1e-6)

    # single-process reference over the concatenated batch
    ref_script = tmp_path / "ref.py"
    ref_script.write_text(
        textwrap.dedent(
            """
            import json
            import jax, jax.numpy as jnp, numpy as np
            from pipelinerl_tpu.models.transformer import ModelConfig, init_params, forward
            cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                              num_layers=2, num_heads=4, num_kv_heads=2,
                              dtype=jnp.float32)
            params = init_params(jax.random.key(0), cfg)
            rows = np.concatenate([
                np.arange(2 * 16, dtype=np.int32).reshape(2, 16) % 64 + pid * 2
                for pid in (0, 1)
            ])
            logits = forward(params, cfg, rows,
                             np.tile(np.arange(16, dtype=np.int32), (4, 1)),
                             np.zeros((4, 16), np.int32))
            print("RESULT", json.dumps(float(jnp.mean(logits.astype(jnp.float32) ** 2))))
            """
        )
    )
    env_ref = {**env_base}
    env_ref.pop("COORD")
    p = subprocess.run(
        [sys.executable, str(ref_script)], env=env_ref,
        capture_output=True, text=True, timeout=240,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    ref = json.loads(
        next(l for l in p.stdout.splitlines() if l.startswith("RESULT ")).removeprefix("RESULT ")
    )
    assert results[0] == pytest.approx(ref, rel=1e-5)

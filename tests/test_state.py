import time

from pipelinerl_tpu.state import (
    SamplesProcessed,
    TrainerState,
    TrainingDone,
    WeightUpdateSuccess,
    trainer_state_spec,
)
from pipelinerl_tpu.streams import StreamWriter


def test_trainer_state_listens(tmp_path):
    exp = str(tmp_path)
    state = TrainerState(exp)
    state.start_listening()
    writer = StreamWriter(trainer_state_spec(exp))
    writer.write(WeightUpdateSuccess(version=0).model_dump())
    assert state.wait_for_model_version(0, timeout=5) == 0
    writer.write(SamplesProcessed(samples=128).model_dump())
    writer.write(WeightUpdateSuccess(version=256).model_dump())
    assert state.wait_for_model_version(256, timeout=5) == 256
    assert state.samples_processed == 128
    writer.write(TrainingDone().model_dump())
    deadline = time.monotonic() + 5
    while not state.training_done and time.monotonic() < deadline:
        time.sleep(0.01)
    assert state.training_done
    state.stop()


def test_debug_mode_init(tmp_path):
    state = TrainerState(str(tmp_path))
    state.debug_mode_init()
    assert state.wait_for_model_version(0, timeout=1) == 0

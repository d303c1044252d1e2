"""Training-loop integration test: synthetic data, TB logs, checkpoint files."""

import glob
import os

import pytest

from moonsuperresolution_tpu.config import ModelConfig, TrainConfig


def test_train_loop_synthetic(tmp_path):
    from moonsuperresolution_tpu.train.loop import train

    cfg = TrainConfig(
        model=ModelConfig(variant="cnn_spade", image_size=64, latent_dim=16),
        batch_size=2,
        epochs=1,
        output_path=str(tmp_path),
        seed=0,
    )
    trainer, state, history = train(cfg, synthetic=True,
                                    max_steps_per_epoch=2, log=True)
    assert int(state.step) == 2
    assert len(history) == 1
    assert "total_loss" in history[0]["train"]
    assert "total_loss" in history[0]["val"]
    # TB event files for train and test writers (reference tag layout)
    events = glob.glob(str(tmp_path / "tensorboard" / "*" / "*" / "events*"))
    assert len(events) >= 2
    # resumable checkpoint written
    assert os.path.isdir(str(tmp_path / "checkpoints" / "latest"))

    # resume continues from the saved step
    trainer2, state2, _ = train(cfg, synthetic=True, resume=True,
                                max_steps_per_epoch=2, log=False)
    assert int(state2.step) >= 2

from moonsuperresolution_tpu.train.trainers import (
    TrainState,
    Pix2PixState,
    GauGANTrainer,
    Pix2PixTrainer,
    make_trainer,
)

__all__ = [
    "TrainState",
    "Pix2PixState",
    "GauGANTrainer",
    "Pix2PixTrainer",
    "make_trainer",
]

from ctagan_tpu.train.trainers import (
    P2pTrainer,
    CycTrainer,
    RegTrainer,
    HdTrainerStage1,
    HdTrainerStage2,
    P3dTrainer,
    build_trainer,
)

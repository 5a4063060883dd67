from ctagan_tpu.train.trainers import (
    P2pTrainer,
    CycTrainer,
    RegTrainer,
    HdTrainerStage1,
    HdTrainerStage2,
    build_trainer,
)

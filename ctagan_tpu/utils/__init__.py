from ctagan_tpu.utils.config import Config, load_config
from ctagan_tpu.utils.logging import TrainLogger
from ctagan_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    find_latest_checkpoint,
)

from .early_stop import EarlyStopState, fastpitch_target_delta
from .optim import (
    make_fastpitch_optimizer,
    make_gan_optimizer,
    fastpitch_stage_mask,
    noam_warmup_schedule,
)
from .checkpoints import CheckpointManager, export_fastpitch_v2, export_xvapitch_v3
from .metrics import TrainingLogger, GraphsWriter, ThroughputMeter
from .torch_save import torch_save_compatible

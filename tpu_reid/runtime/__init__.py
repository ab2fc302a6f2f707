from tpu_reid.runtime.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
    two_stage_cb,
    two_stage_resume,
)
from tpu_reid.runtime.guard import GuardTripped, StepWatchdog, TrainGuard
from tpu_reid.runtime.observe import MetricLogger, StepTimer, trace

__all__ = [
    "CheckpointManager",
    "save_checkpoint",
    "load_checkpoint",
    "two_stage_cb",
    "two_stage_resume",
    "TrainGuard",
    "StepWatchdog",
    "GuardTripped",
    "MetricLogger",
    "StepTimer",
    "trace",
]

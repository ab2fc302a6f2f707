from tpu_reid.train.trainer import (
    TrainConfig,
    run_stage1,
    run_stage2,
    stage1_opt_state_template,
    stage2_opt_state_template,
)
from tpu_reid.train.multitask import (
    run_mt_stage1,
    run_mt_stage2,
    mt_stage1_opt_state_template,
    mt_stage2_opt_state_template,
)

__all__ = [
    "TrainConfig",
    "run_stage1",
    "run_stage2",
    "stage1_opt_state_template",
    "stage2_opt_state_template",
    "run_mt_stage1",
    "run_mt_stage2",
    "mt_stage1_opt_state_template",
    "mt_stage2_opt_state_template",
]

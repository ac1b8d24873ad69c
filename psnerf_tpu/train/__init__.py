from psnerf_tpu.train.optim import (
    adam_init,
    adam_update,
    multistep_lr,
    row_mask_from_indices,
)
from psnerf_tpu.train.losses import (
    Stage1LossWeights,
    stage1_loss,
    Stage2LossWeights,
    stage2_loss,
    masked_mean,
)
from psnerf_tpu.train.stage1 import Stage1TrainConfig, make_stage1_train_step
from psnerf_tpu.train.stage2 import Stage2TrainConfig, make_stage2_train_step

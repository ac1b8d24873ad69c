from psnerf_tpu.runners.stage1 import Stage1Runner
from psnerf_tpu.runners.stage2 import Stage2Runner

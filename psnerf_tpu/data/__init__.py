from psnerf_tpu.data.scene import SceneParams, load_scene_params, load_image, load_mask
from psnerf_tpu.data.stage1 import load_stage1_data, sample_stage1_batch, full_view_batch
from psnerf_tpu.data.stage2 import decode_imgs, load_stage2_data, sample_stage2_batch

from psnerf_tpu.ops.fps import farthest_point_sampling

# Pallas kernels (import the modules lazily where needed if you want to
# avoid touching jax.experimental at package-import time; these are cheap)
from psnerf_tpu.ops.fused_occ import fused_occ_logit, make_fused_occ_fn
from psnerf_tpu.ops.fused_vis import fused_vis_shade, fused_visibility

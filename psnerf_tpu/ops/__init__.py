from psnerf_tpu.ops.fps import farthest_point_sampling

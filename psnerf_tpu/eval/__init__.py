from psnerf_tpu.eval.frame import render_frame_stage2, make_frame_renderer

from psnerf_tpu.render.marching import ray_marching, secant, light_visibility
from psnerf_tpu.render.unisurf import UnisurfConfig, render_unisurf, render_shape_extract
from psnerf_tpu.render.phong import render_phong
from psnerf_tpu.render.shading import render_psnet

from psnerf_tpu.core.encoding import positional_encoding, nerf_embed, nerf_embed_dim
from psnerf_tpu.core.rays import (
    image_points_to_ray,
    origin_to_world,
    get_sphere_intersection,
    get_camera_params,
    lift,
    quat_to_rot,
    arange_pixels,
)
from psnerf_tpu.core.sampling import stratified_noise, linspace_between
from psnerf_tpu.core.compositing import alpha_composite
from psnerf_tpu.core.spherical import gen_light_xyz, sph2cart, cart2sph

from psnerf_tpu.mesh.native import MISE, marching_cubes
from psnerf_tpu.mesh.extractor import extract_mesh, make_field_value_fn
from psnerf_tpu.mesh.meshio import (
    load_mesh,
    save_obj,
    save_ply,
    sample_surface,
    triangle_areas,
)
from psnerf_tpu.mesh.chamfer import MeshProximity, chamfer_distance, surface_distance
from psnerf_tpu.mesh.refine import refine_mesh, make_mask_carver

from psnerf_tpu.fields.mlp import (
    linear_init,
    linear_apply,
    wn_linear_init,
    wn_linear_apply,
    skip_mlp_init,
    skip_mlp_apply,
)
from psnerf_tpu.fields.occupancy import (
    OccFieldConfig,
    init_occupancy_field,
    occ_logits_and_feat,
    occ_logit,
    occ_alpha,
    occ_gradient,
    appearance,
    radiance_and_alpha,
)
from psnerf_tpu.fields.brdf import sg_basis, microfacet_brdf, SG_LOBES
from psnerf_tpu.fields.psnet import PSNetConfig, init_psnet

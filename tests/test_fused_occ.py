import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.fields import OccFieldConfig, init_occupancy_field, occ_logit
from psnerf_tpu.ops.fused_occ import fused_occ_logit, make_fused_occ_fn


def test_fused_occ_matches_reference_path():
    cfg = OccFieldConfig()  # full bear architecture: 8x256, skip@4, PE 6
    params = init_occupancy_field(jax.random.PRNGKey(0), cfg)
    p = jax.random.normal(jax.random.PRNGKey(1), (1024, 3)) * 0.8
    ref = np.asarray(occ_logit(params, p, cfg))
    out = np.asarray(fused_occ_logit(params, p, cfg, tile=1024, interpret=True))
    # bf16 trunk: absolute error ~1e-2 on O(1) logits; near-zero crossings
    # make relative error meaningless
    assert np.abs(out - ref).max() < 0.05
    assert np.corrcoef(out, ref)[0, 1] > 0.9999
    # sign agreement away from the +-0.05 crossing band
    far = np.abs(ref) > 0.05
    assert ((out > 0) == (ref > 0))[far].all()


def test_fused_occ_fn_pads_and_sigmoids():
    cfg = OccFieldConfig(num_layers=6, hidden_dim=128, feat_size=128,
                         octaves_pe=4, octaves_pe_views=2)
    params = init_occupancy_field(jax.random.PRNGKey(0), cfg)
    fn = make_fused_occ_fn(params, cfg, tile=1024, interpret=True)
    p = jax.random.normal(jax.random.PRNGKey(1), (200, 3)) * 0.5  # needs pad
    alpha = fn(p)
    assert alpha.shape == (200,)
    from psnerf_tpu.fields import occ_alpha

    ref = occ_alpha(params, p, cfg)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref), atol=0.02)

import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.core.encoding import nerf_embed
from psnerf_tpu.fields.mlp import skip_mlp_apply, skip_mlp_init
from psnerf_tpu.ops.fused_vis import fused_visibility


def test_fused_visibility_matches_reference_path():
    """Pallas kernel (interpret mode) vs the XLA skip-MLP on the reference
    vis-net topology (width 256, depth 8, skip@4, PE 10 octaves -> E=63)."""
    key = jax.random.PRNGKey(0)
    e = 63
    width, depth, skip = 256, 8, 4
    layers = skip_mlp_init(key, 2 * e, 1, width, depth, (skip,))

    n, l = 512, 12
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.3
    ldirs = jax.random.normal(jax.random.PRNGKey(2), (l, 3))
    ldirs = ldirs / jnp.linalg.norm(ldirs, axis=-1, keepdims=True)
    point_emb = nerf_embed(pts, 10)
    light_emb = nerf_embed(ldirs, 10)

    # reference: concat per (light, point)
    def ref_one_light(le):
        x = jnp.concatenate(
            [point_emb, jnp.broadcast_to(le, (n, e))], axis=-1)
        return skip_mlp_apply(layers, x, (skip,), "none")[..., 0]

    ref = jax.vmap(ref_one_light)(light_emb)  # [L, N]

    out = fused_visibility(layers, point_emb, light_emb, tile=256,
                           interpret=True)
    assert out.shape == (l, n)
    # bf16 matmuls: relative tolerance ~1e-2
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err / (np.abs(np.asarray(ref)) + 1e-2)
    assert rel.max() < 0.05, f"max rel err {rel.max():.4f}"
    assert np.corrcoef(np.asarray(out).ravel(),
                       np.asarray(ref).ravel())[0, 1] > 0.999

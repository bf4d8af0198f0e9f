"""Fixed-bucket appearance compaction (ops/compaction.py, render/pipeline.py).

The compacted path — appearance gather + shading MLP on the per-ray top-K
samples by weight, reference `app_mask` zeroing applied in compacted space
(reference: tensorBase.py:774-804) — must be EXACT vs the dense path
whenever every ray's above-threshold occupancy is <= K, for both values and
gradients (through tables, MLPs, warp, and ray/pose inputs).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodynrf_tpu.fields.config import FieldConfig
from rodynrf_tpu.fields.dynamic import init_dynamic_field
from rodynrf_tpu.fields.dynamic import pack_tables as dyn_pack
from rodynrf_tpu.fields.static import init_static_field
from rodynrf_tpu.fields.static import pack_tables as stat_pack
from rodynrf_tpu.ops.compaction import compact_rows, expand_rows, topk_select
from rodynrf_tpu.ops.compositing import raw2outputs
from rodynrf_tpu.render.pipeline import eval_dynamic_field, eval_static_field

AABB = jnp.asarray([[-1.5, -1.67, -1.0], [1.5, 1.67, 1.0]])


def _cfgs(app_frac):
    base = FieldConfig(
        grid_size=(24, 20, 16), t_size=4, near_far=(0.0, 1.0), app_frac=app_frac
    )
    st = dataclasses.replace(base, shading_mode="MLP_Fea", fea_pe=2)
    dn = dataclasses.replace(base, shading_mode="MLP_Fea_late_view", fea_pe=0)
    return st, dn


def _ray_batch(key, R=48, S=40):
    kk = jax.random.split(key, 4)
    rays = jnp.concatenate(
        [jax.random.normal(kk[0], (R, 3)) * 0.1, jax.random.normal(kk[1], (R, 3))], -1
    )
    ts = jax.random.uniform(kk[2], (R,), minval=-1, maxval=1)
    z = jnp.sort(jax.random.uniform(kk[3], (R, S)), axis=-1)
    xyz = rays[:, None, :3] + rays[:, None, 3:] * z[..., None]
    rv = jnp.ones((R, S), bool)
    return rays, ts, xyz, z, rv


def test_topk_sizing():
    st, _ = _cfgs(0.25)
    assert st.app_topk(270) == 72  # ceil(67.5) -> 68 -> round up to 72
    assert st.app_topk(40) == 16
    assert st.app_topk(4) == 4  # capped at S
    assert dataclasses.replace(st, app_frac=0.0).app_topk(270) == 0


def test_compact_expand_roundtrip_and_grads():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (5, 11, 3))
    idx = jnp.tile(jnp.asarray([9, 0, 4, 2])[None], (5, 1))
    xk = compact_rows(x, idx)
    np.testing.assert_array_equal(np.asarray(xk), np.asarray(x)[:, [9, 0, 4, 2]])
    dense = expand_rows(xk, idx, 11)
    # exactly the selected rows, zero elsewhere
    mask = np.zeros((5, 11, 1))
    mask[:, [9, 0, 4, 2]] = 1.0
    np.testing.assert_allclose(np.asarray(dense), np.asarray(x) * mask, atol=1e-7)

    # gradient duality: d/dx sum(f(compact(x))) == expand(f'(xk))
    g = jax.grad(lambda a: jnp.sum(compact_rows(a, idx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * x * mask), atol=1e-6)
    gk = jax.grad(lambda a: jnp.sum(expand_rows(a, idx, 11) ** 2))(xk)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(2 * xk), atol=1e-6)


def test_topk_select_keeps_threshold_semantics():
    w = jnp.asarray([[0.5, 0.0, 0.2, 1e-6, 0.3]])
    idx, keep = topk_select(w, 3, thres=1e-4)
    assert set(np.asarray(idx[0]).tolist()) == {0, 4, 2}
    np.testing.assert_array_equal(np.asarray(keep), [[1.0, 1.0, 1.0]])
    # below-threshold entries inside the bucket are zeroed
    idx2, keep2 = topk_select(w, 5, thres=1e-4)
    assert np.asarray(keep2).sum() == 3.0


@pytest.mark.parametrize("field", ["static", "dynamic"])
def test_compacted_eval_exact(field):
    """Occupancy < K: compacted == dense, values bit-exact (CPU)."""
    key = jax.random.PRNGKey(0)
    st_cfg, dn_cfg = _cfgs(0.3)
    rays, ts, xyz, z, rv = _ray_batch(key)
    if field == "static":
        params = init_static_field(key, st_cfg)
        cfg_d = dataclasses.replace(st_cfg, app_frac=0.0)
        d = eval_static_field(params, cfg_d, AABB, rays, ts, xyz, z, rv, "ndc")
        c = eval_static_field(
            params, st_cfg, AABB, rays, ts, xyz, z, rv, "ndc",
            packed=stat_pack(params, st_cfg),
        )
    else:
        params = init_dynamic_field(key, dn_cfg)
        cfg_d = dataclasses.replace(dn_cfg, app_frac=0.0)
        d = eval_dynamic_field(params, cfg_d, AABB, rays, ts, xyz, z, rv, "ndc")
        c = eval_dynamic_field(
            params, dn_cfg, AABB, rays, ts, xyz, z, rv, "ndc",
            packed=dyn_pack(params, dn_cfg),
        )
    occ = (d.weights > st_cfg.ray_march_weight_thres).sum(-1)
    assert int(occ.max()) <= st_cfg.app_topk(xyz.shape[1]), "fixture must fit the bucket"
    np.testing.assert_allclose(np.asarray(d.rgb), np.asarray(c.rgb), atol=1e-6)
    # density rides a differently-shaped line matmul in the split pack
    # (same per-column math; last-ulp lowering differences only)
    np.testing.assert_allclose(
        np.asarray(d.sigma), np.asarray(c.sigma), rtol=1e-5, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(d.weights), np.asarray(c.weights), rtol=1e-5, atol=1e-9
    )
    if field == "dynamic":
        np.testing.assert_allclose(
            np.asarray(d.blending), np.asarray(c.blending), rtol=1e-5, atol=1e-9
        )


def test_compacted_gradients_exact():
    """End-to-end gradient parity through the dual compositor: tables, MLPs,
    warp params, and the ray inputs themselves (pose-gradient path)."""
    key = jax.random.PRNGKey(1)
    st_cfg, dn_cfg = _cfgs(0.3)
    st_p = init_static_field(jax.random.fold_in(key, 0), st_cfg)
    dn_p = init_dynamic_field(jax.random.fold_in(key, 1), dn_cfg)
    rays, ts, xyz, z, rv = _ray_batch(key)

    def loss(params, rays_in, app_frac):
        stc = dataclasses.replace(st_cfg, app_frac=app_frac)
        dnc = dataclasses.replace(dn_cfg, app_frac=app_frac)
        st = eval_static_field(params["s"], stc, AABB, rays_in, ts, xyz, z, rv, "ndc")
        dn = eval_dynamic_field(params["d"], dnc, AABB, rays_in, ts, xyz, z, rv, "ndc")
        out = raw2outputs(
            st.rgb, st.sigma, dn.rgb, dn.sigma, dn.dists, dn.blending, dn.z_vals,
            rays_in, is_train=False, ray_type="ndc",
        )
        return (
            jnp.sum(out.rgb_full ** 2)
            + jnp.sum(out.rgb_d) * 0.3
            + jnp.sum(out.rgb_s) * 0.7
            + jnp.sum(out.depth_full)
        )

    params = {"s": st_p, "d": dn_p}
    g_dense = jax.grad(loss, argnums=(0, 1))(params, rays, 0.0)
    g_comp = jax.grad(loss, argnums=(0, 1))(params, rays, 0.3)
    flat_d, _ = jax.tree_util.tree_flatten(g_dense)
    flat_c, _ = jax.tree_util.tree_flatten(g_comp)
    assert len(flat_d) == len(flat_c)
    for a, b in zip(flat_d, flat_c):
        scale = max(1e-8, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-6
        )


def test_truncation_keeps_highest_weight_samples():
    """Occupancy > K: the compacted path keeps exactly the top-K rgb rows."""
    key = jax.random.PRNGKey(2)
    st_cfg, _ = _cfgs(0.1)  # K = 8 of 40
    params = init_static_field(key, st_cfg)
    rays, ts, xyz, z, rv = _ray_batch(key)
    cfg_d = dataclasses.replace(st_cfg, app_frac=0.0)
    d = eval_static_field(params, cfg_d, AABB, rays, ts, xyz, z, rv, "ndc")
    c = eval_static_field(params, st_cfg, AABB, rays, ts, xyz, z, rv, "ndc")
    K = st_cfg.app_topk(xyz.shape[1])
    _, topi = jax.lax.top_k(d.weights, K)
    kept = np.zeros(d.rgb.shape[:2], bool)
    np.put_along_axis(kept, np.asarray(topi), True, axis=1)
    # on the bucket: equal to dense; off the bucket: zero
    np.testing.assert_allclose(
        np.asarray(c.rgb)[kept], np.asarray(d.rgb)[kept], atol=1e-6
    )
    assert np.all(np.asarray(c.rgb)[~kept] == 0.0)

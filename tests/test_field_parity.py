"""Golden parity: our field evaluation vs a torch mirror of the reference.

Builds a tiny dynamic field, exports its weights through the .th-compatible
state_dict mapping, reconstructs the reference's computation in torch
(grid_sample chains + Linear layers with the reference's exact wiring,
models/tensoRF.py:521-541 warp, 646-732 density, 543-629 blending,
734-811 appearance), and compares outputs. This is the strongest
cross-implementation check available without network access.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from rodynrf_tpu.fields import FieldConfig
from rodynrf_tpu.fields import dynamic as dyn
from rodynrf_tpu.fields.static import feature2density
from rodynrf_tpu.train.checkpoints import dynamic_state_dict

GS = (9, 11, 13)
CFG = FieldConfig(
    grid_size=GS,
    t_size=4,
    density_n_comp=(4, 2, 2),
    app_n_comp=(8, 4, 4),
    app_dim=9,
    shading_mode="MLP_Fea_late_view",
    fea2dense_act="relu",
    view_pe=0,
    fea_pe=0,
    featureC=16,
)
AABB = np.array([[-1.5, -1.67, -1.0], [1.5, 1.67, 1.0]], np.float32)

MAT_MODE = [[0, 1], [0, 2], [1, 2]]
VEC_MODE = [2, 1, 0]


@pytest.fixture(scope="module")
def setup():
    params = dyn.init_dynamic_field(jax.random.PRNGKey(7), CFG)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in dynamic_state_dict(params, CFG).items()}
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-0.9, 0.9, (257, 3)).astype(np.float32) * np.array([1.4, 1.6, 0.9], np.float32)
    t = rng.uniform(-1, 1, 257).astype(np.float32)
    return params, sd, xyz, t


def torch_pe(x, freqs):
    fb = 2 ** torch.arange(freqs).float()
    pts = (x[..., None] * fb).reshape(*x.shape[:-1], freqs * x.shape[-1])
    return torch.cat([torch.sin(pts), torch.cos(pts)], -1)


def torch_normalize(xyz):
    aabb = torch.from_numpy(AABB)
    inv = 2.0 / (aabb[1] - aabb[0])
    return (xyz - aabb[0]) * inv - 1.0


def torch_linear(sd, name, x):
    return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


def torch_warp(sd, xyz_unnorm, t):
    """(tensoRF.py:521-541)."""
    tin = torch.cat([t[:, None], torch_pe(t[:, None], 8)], -1)
    t_out = torch_linear(sd, "layer2", torch.relu(torch_linear(sd, "layer1", tin)))
    xn = torch_normalize(xyz_unnorm)
    xin = torch.cat([xn, torch_pe(xn, 10), t_out], -1)
    h = torch.relu(torch_linear(sd, "layer3", xin))
    h = torch.relu(torch_linear(sd, "layer4", h))
    return xyz_unnorm + torch_linear(sd, "layer5", h)


def torch_multiscale(sd, key, xyz_prime_n):
    """(tensoRF.py:646-721): stride 1/2/4 plane+line grid_sample products."""
    coord_plane = torch.stack(
        [xyz_prime_n[..., m] for m in MAT_MODE]
    ).view(3, -1, 1, 2)
    zline = torch.stack([xyz_prime_n[..., v] for v in VEC_MODE])
    coord_line = torch.stack((torch.zeros_like(zline), zline), -1).view(3, -1, 1, 2)

    planes, lines = [], []
    for s in (1, 2, 4):
        for i in range(3):
            p = sd[f"{key}_plane.{i}"][:, :, ::s, ::s]
            l = sd[f"{key}_line.{i}"][:, :, ::s, :]
            planes.append(
                F.grid_sample(p, coord_plane[[i]], align_corners=True).view(-1, xyz_prime_n.shape[0])
            )
            lines.append(
                F.grid_sample(l, coord_line[[i]], align_corners=True).view(-1, xyz_prime_n.shape[0])
            )
    return (torch.cat(planes) * torch.cat(lines)).T


def test_warp_parity(setup):
    params, sd, xyz, t = setup
    ours = np.asarray(dyn.warp_coordinate(params, jnp.asarray(xyz), jnp.asarray(t), jnp.asarray(AABB)))
    ref = torch_warp(sd, torch.from_numpy(xyz), torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_density_parity(setup):
    params, sd, xyz, t = setup
    xyz_j, t_j, aabb_j = jnp.asarray(xyz), jnp.asarray(t), jnp.asarray(AABB)
    xyz_n = dyn.normalize_coord(xyz_j, aabb_j)
    xyz_prime = dyn.warp_coordinate(params, xyz_j, t_j, aabb_j)
    xyz_prime_n = dyn.normalize_coord(xyz_prime, aabb_j)
    ours = np.asarray(dyn.density_feature(params, CFG, xyz_n, t_j, xyz_prime_n))

    # torch mirror (tensoRF.py:646-732)
    xt, tt = torch.from_numpy(xyz), torch.from_numpy(t)
    xn_t = torch_normalize(xt)
    xp = torch_warp(sd, xt, tt)
    xpn = torch_normalize(xp)
    feats = torch_multiscale(sd, "density", xpn)
    indata = torch.cat([feats, xn_t, torch_pe(xn_t, 10), tt[:, None], torch_pe(tt[:, None], 8)], -1)
    ref = torch_linear(sd, "density_layer2", torch.relu(torch_linear(sd, "density_layer1", indata)))[:, 0]
    np.testing.assert_allclose(ours, ref.numpy(), atol=5e-5, rtol=1e-3)


def test_blending_parity(setup):
    params, sd, xyz, t = setup
    xyz_j, t_j, aabb_j = jnp.asarray(xyz), jnp.asarray(t), jnp.asarray(AABB)
    xyz_n = dyn.normalize_coord(xyz_j, aabb_j)
    xyz_prime_n = dyn.normalize_coord(dyn.warp_coordinate(params, xyz_j, t_j, aabb_j), aabb_j)
    ours = np.asarray(dyn.blending_feature(params, CFG, xyz_n, t_j, xyz_prime_n))

    xt, tt = torch.from_numpy(xyz), torch.from_numpy(t)
    xn_t = torch_normalize(xt)
    xpn = torch_normalize(torch_warp(sd, xt, tt))
    feats = torch_multiscale(sd, "blending", xpn)
    indata = torch.cat([feats, xn_t, torch_pe(xn_t, 10), tt[:, None], torch_pe(tt[:, None], 8)], -1)
    ref = torch_linear(sd, "blending_layer2", torch.relu(torch_linear(sd, "blending_layer1", indata)))[:, 0]
    np.testing.assert_allclose(ours, ref.numpy(), atol=5e-5, rtol=1e-3)


def test_app_parity(setup):
    params, sd, xyz, t = setup
    xyz_j, t_j, aabb_j = jnp.asarray(xyz), jnp.asarray(t), jnp.asarray(AABB)
    xyz_prime_n = dyn.normalize_coord(dyn.warp_coordinate(params, xyz_j, t_j, aabb_j), aabb_j)
    ours = np.asarray(dyn.app_feature(params, CFG, xyz_prime_n))

    xt, tt = torch.from_numpy(xyz), torch.from_numpy(t)
    xpn = torch_normalize(torch_warp(sd, xt, tt))
    feats = torch_multiscale(sd, "app", xpn)
    ref = feats @ sd["basis_mat.weight"].T
    np.testing.assert_allclose(ours, ref.numpy(), atol=5e-5, rtol=1e-3)


def test_scene_flow_parity(setup):
    params, sd, xyz, t = setup
    pts = jnp.asarray(xyz).reshape(1, -1, 3)
    f, b = dyn.scene_flow(params, pts, jnp.asarray(t[:1]), jnp.asarray(AABB))

    xt = torch.from_numpy(xyz)
    tt = torch.from_numpy(np.repeat(t[:1], xyz.shape[0]))[:, None]
    xn_t = torch_normalize(xt)
    indata = torch.cat([xn_t, torch_pe(xn_t, 4), tt, torch_pe(tt, 4)], -1)
    h = indata
    for i in range(3):
        h = torch.relu(torch_linear(sd, f"scene_flow_mlp.{2 * i}", h))
    sf = torch_linear(sd, "scene_flow_mlp.6", h)
    np.testing.assert_allclose(np.asarray(f[0]), sf[:, :3].numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b[0]), sf[:, 3:].numpy(), atol=3e-5, rtol=1e-4)


def test_th_roundtrip(setup):
    """export_th -> import_th returns identical params."""
    import tempfile, os
    from rodynrf_tpu.train.checkpoints import export_th, import_th

    params, sd, xyz, t = setup
    poses = np.zeros((4, 3, 4), np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.th")
        export_th(path, params, CFG, AABB, poses, 123.0, dynamic=True)
        params2, meta = import_th(path)
    assert meta["dynamic"]
    for k in ("density_plane", "blending_plane", "app_plane"):
        for a, b in zip(params[k], params2[k]):
            np.testing.assert_array_equal(np.asarray(a), b)
    np.testing.assert_array_equal(np.asarray(params["basis_mat"]), params2["basis_mat"])
    np.testing.assert_array_equal(
        np.asarray(params["warp_t1"]["w"]), params2["warp_t1"]["w"]
    )
    assert meta["kwargs"]["gridSize"] == list(GS)

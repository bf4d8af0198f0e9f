"""LPIPS JAX implementation tests (VERDICT r1 item 8).

Golden oracle: a torch mirror of the lpips-0.1 computation (scaling layer,
backbone taps, unit normalization, non-negative lin convs, spatial mean) fed
the SAME random weights through convert_lpips_state_dict — catches conversion
and architecture errors without pretrained weights (zero-egress env).
"""

import numpy as np
import pytest

from rodynrf_tpu.eval.lpips_jax import (
    PLANS,
    convert_lpips_state_dict,
    init_lpips_params,
    lpips,
)

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

# lpips slice layouts: torchvision feature indices of each conv, per slice
_SLICE_IDX = {
    "alex": [(1, 0), (2, 3), (3, 6), (4, 8), (5, 10)],
    "vgg": [
        (1, 0), (1, 2), (2, 5), (2, 7), (3, 10), (3, 12), (3, 14),
        (4, 17), (4, 19), (4, 21), (5, 24), (5, 26), (5, 28),
    ],
}


def _random_lpips_state_dict(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    plan, taps = PLANS[net]
    sd = {
        "scaling_layer.shift": torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1),
    }
    for (s, i), (k, stride, pad, cin, cout, _) in zip(_SLICE_IDX[net], plan):
        bound = 1.0 / np.sqrt(k * k * cin)
        sd[f"net.slice{s}.{i}.weight"] = torch.empty(cout, cin, k, k).uniform_(
            -bound, bound, generator=g
        )
        sd[f"net.slice{s}.{i}.bias"] = torch.empty(cout).uniform_(
            -bound, bound, generator=g
        )
    for li, t in enumerate(taps):
        cout = plan[t][4]
        sd[f"lin{li}.model.1.weight"] = torch.empty(1, cout, 1, 1).uniform_(
            0.0, 0.1, generator=g
        )
    return sd


def _torch_lpips(sd, img0, img1, net):
    """Mirror of lpips.LPIPS.forward(normalize=True) (lpips_0.1 semantics)."""
    import torch.nn.functional as F

    plan, taps = PLANS[net]
    shift, scale = sd["scaling_layer.shift"], sd["scaling_layer.scale"]

    def feats(img):
        x = (2 * img - 1 - shift) / scale
        out = []
        for (s, i), (k, stride, pad, cin, cout, pool) in zip(_SLICE_IDX[net], plan):
            if pool:
                x = F.max_pool2d(x, 3, stride=2)
            x = F.relu(
                F.conv2d(x, sd[f"net.slice{s}.{i}.weight"], sd[f"net.slice{s}.{i}.bias"],
                         stride=stride, padding=pad)
            )
            out.append(x)
        return [out[t] for t in taps]

    def unit(f):
        return f / (torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True)) + 1e-10)

    f0, f1 = feats(img0), feats(img1)
    total = 0.0
    for li, (a, b) in enumerate(zip(f0, f1)):
        diff = (unit(a) - unit(b)) ** 2
        lin = sd[f"lin{li}.model.1.weight"]
        total = total + F.conv2d(diff, lin).mean(dim=(2, 3))
    return total[:, 0]


@pytest.mark.parametrize("net,hw", [("alex", (64, 80)), ("vgg", (48, 64))])
def test_lpips_matches_torch_mirror(net, hw):
    sd = _random_lpips_state_dict(net)
    params = convert_lpips_state_dict({k: v.numpy() for k, v in sd.items()}, net)

    rng = np.random.default_rng(4)
    H, W = hw
    img0 = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(np.float32)

    with torch.no_grad():
        ref = _torch_lpips(
            sd,
            torch.from_numpy(img0.transpose(0, 3, 1, 2)),
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            net,
        ).numpy()
    ours = np.asarray(lpips(params, img0, img1, net))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
    assert (ref > 0).all()


def test_lpips_identity_is_zero():
    params = init_lpips_params(__import__("jax").random.PRNGKey(0), "alex")
    img = np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    d = float(np.asarray(lpips(params, img, img, "alex"))[0])
    assert abs(d) < 1e-9


def test_rgb_lpips_env_weights(tmp_path, monkeypatch):
    """eval.metrics.rgb_lpips scores through the JAX path when
    $LPIPS_WEIGHTS_ALEX points at a state_dict dump — mean.txt can carry
    finite lpips values without the lpips pip package."""
    sd = _random_lpips_state_dict("alex")
    path = tmp_path / "lpips_alex.pth"
    torch.save(sd, path)
    monkeypatch.setenv("LPIPS_WEIGHTS_ALEX", str(path))

    from rodynrf_tpu.eval import metrics

    metrics._LPIPS_CACHE.clear()
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    v = metrics.rgb_lpips(a, b, "alex")
    assert v is not None and np.isfinite(v) and v > 0
    metrics._LPIPS_CACHE.clear()

#!/usr/bin/env python
"""Render-path breakdown at the eval chunk shapes (VERDICT r3 item 6).

The bf16 eval renderer measured 34k rays/s (240 ms per 8192-ray chunk at
270 samples); the train step's fused dynamic eval costs ~24 ms per 276k
samples, so a fwd-only chunk "should" cost ~60-80 ms. This probe times the
chunk's components in isolation to find the slice to attack:

  sample   — sample_xyz alone
  static   — eval_static_field alone (packed tables prebuilt)
  dynamic  — eval_dynamic_field alone
  composit — raw2outputs alone (random field outputs)
  chunk    — the full render_chunk
  chunk@N  — full chunk at other chunk sizes

Writes scripts/probe_render.json. Run on the TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rodynrf_tpu.data import make_synthetic_scene  # noqa: E402
from rodynrf_tpu.ops.compositing import raw2outputs  # noqa: E402
from rodynrf_tpu.render.pipeline import eval_dynamic_field, eval_static_field  # noqa: E402
from rodynrf_tpu.render.renderer import make_chunk_renderer  # noqa: E402
from rodynrf_tpu.render.sampling import sample_xyz  # noqa: E402
from rodynrf_tpu.train import Trainer, parse_cmd  # noqa: E402

T, H, W = 12, 270, 480
CHUNK = int(os.environ.get("PROBE_CHUNK", "8192"))


def chain_time(step, args=(), n=10):
    # big arrays ride as jit ARGUMENTS: closed-over device arrays get baked
    # into the HLO constant pool, which blows the axon remote-compile size
    # limit (HTTP 413) at packed-table shapes
    c = step(jnp.float32(0.0), *args)
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(n):
        c = step(c, *args)
    float(c)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    args = parse_cmd(
        f"--expname probe --datadir none --dataset_name synthetic "
        f"--n_iters 100000 --batch_size 1024 --N_voxel_t {T} "
        f"--N_voxel_init {300**3} --N_voxel_final {300**3} "
        f"--upsamp_list 8000 --upsamp_list 12000 --upsamp_list 16000 --upsamp_list 22000 "
        f"--step_ratio 2.0 --ray_type ndc "
        f"--model_name TensorVMSplit_TimeEmbedding --shadingMode MLP_Fea_late_view "
        f"--shadingModeStatic MLP_Fea "
        f"--n_lamb_sigma 16 --n_lamb_sigma 4 --n_lamb_sigma 4 "
        f"--n_lamb_sh 48 --n_lamb_sh 12 --n_lamb_sh 12 "
        f"--fea2denseAct relu --view_pe 0 --fea_pe 0 "
        f"--optimize_poses 0 --optimize_focal_length 0 --use_disp 1 --bf16 1"
    )
    scene = make_synthetic_scene(T=T, H=H, W=W)
    tr = Trainer(args, scene)
    s_cfg, d_cfg = tr.static_cfg, tr.dynamic_cfg
    params = {"static": tr.params["static"], "dynamic": tr.params["dynamic"]}
    aabb = tr.aabb
    step_size = s_cfg.step_size(np.asarray(scene.scene_bbox))
    nS = tr.n_samples
    rng = np.random.default_rng(0)

    def mk_rays(n):
        return jnp.asarray(
            np.concatenate(
                [rng.uniform(-0.5, 0.5, (n, 3)),
                 rng.uniform(0.3, 1.0, (n, 3)) * np.array([0.3, 0.3, 1.0])], -1
            ), jnp.float32)

    rays = mk_rays(CHUNK)
    ts = jnp.asarray(rng.uniform(-1, 1, (CHUNK,)), jnp.float32)

    render_chunk = make_chunk_renderer(s_cfg, d_cfg, "ndc", nS, step_size)
    packs = render_chunk.pack(params)

    out = {"chunk": CHUNK, "n_samples": nS, "device": str(jax.devices()[0])}

    @jax.jit
    def f_sample(c, rays):
        xyz, zv, rv = sample_xyz(rays + c * 1e-30, nS, "ndc", s_cfg.near_far,
                                 aabb, step_size, None)
        return c + jnp.sum(xyz[::512, 0, 0]) + jnp.sum(zv[::512, 0])

    out["sample_ms"] = round(chain_time(f_sample, (rays,)), 2)
    print("sample", out["sample_ms"], flush=True)

    xyz0, zv0, rv0 = sample_xyz(rays, nS, "ndc", s_cfg.near_far, aabb, step_size, None)

    @jax.jit
    def f_static(c, params, packs, rays, ts, xyz0, zv0, rv0):
        st = eval_static_field(params["static"], s_cfg, aabb, rays, ts,
                               xyz0 + c * 1e-30, zv0, rv0, "ndc", packed=packs[0])
        return c + jnp.sum(st.rgb[::512, 0]) + jnp.sum(st.sigma[::512, 0])

    out["static_ms"] = round(
        chain_time(f_static, (params, packs, rays, ts, xyz0, zv0, rv0)), 2)
    print("static", out["static_ms"], flush=True)

    @jax.jit
    def f_dynamic(c, params, packs, rays, ts, xyz0, zv0, rv0):
        dn = eval_dynamic_field(params["dynamic"], d_cfg, aabb, rays, ts,
                                xyz0 + c * 1e-30, zv0, rv0, "ndc", packed=packs[1])
        return c + jnp.sum(dn.rgb[::512, 0]) + jnp.sum(dn.sigma[::512, 0])

    out["dynamic_ms"] = round(
        chain_time(f_dynamic, (params, packs, rays, ts, xyz0, zv0, rv0)), 2)
    print("dynamic", out["dynamic_ms"], flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    rr = lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.1
    rgb_s, rgb_d = rr(ks[0], (CHUNK, nS, 3)), rr(ks[1], (CHUNK, nS, 3))
    sig_s, sig_d = jnp.abs(rr(ks[2], (CHUNK, nS))), jnp.abs(rr(ks[3], (CHUNK, nS)))
    blend = jax.nn.sigmoid(rr(ks[4], (CHUNK, nS)))
    dists = jnp.abs(rr(ks[5], (CHUNK, nS))) * 0.01

    @jax.jit
    def f_comp(c, rgb_s, sig_s, rgb_d, sig_d, dists, blend, zv0, rays):
        o = raw2outputs(rgb_s, sig_s + c * 1e-30, rgb_d, sig_d, dists, blend,
                        zv0, rays, is_train=False, ray_type="ndc")
        return c + jnp.sum(o.rgb_full[::512, 0])

    out["composit_ms"] = round(
        chain_time(f_comp, (rgb_s, sig_s, rgb_d, sig_d, dists, blend, zv0, rays)), 2)
    print("composit", out["composit_ms"], flush=True)

    def f_chunk(c, params, packs, rays, ts):
        o = render_chunk(params, packs, aabb, rays, ts + c * 1e-30)
        return c + o.rgb[0, 0]

    out["full_chunk_ms"] = round(chain_time(f_chunk, (params, packs, rays, ts)), 2)
    out["rays_per_sec"] = round(CHUNK / out["full_chunk_ms"] * 1e3, 1)
    print("full_chunk", out["full_chunk_ms"], out["rays_per_sec"], flush=True)

    path = os.path.join(HERE, "probe_render.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
    prev[str(CHUNK)] = out
    with open(path, "w") as fh:
        json.dump(prev, fh, indent=1)


if __name__ == "__main__":
    main()

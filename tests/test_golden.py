"""Golden cross-implementation regression tests.

These replay the COMMITTED recordings of the actual PyTorch reference run
(golden/out/: ray-index streams, initial .th state dicts, per-term loss
trajectories, first-step gradients — produced by golden/run_reference.py on
/root/reference) against the current rodynrf_tpu code. They catch any change
that breaks numerical parity with the reference, without needing torch or
the reference repo at test time.

Full pipeline + report: see golden/compare.py and GOLDEN.md.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
GOLDEN = os.path.join(REPO, "golden")
OUT = os.path.join(GOLDEN, "out")

pytestmark = [
    pytest.mark.integration,
    pytest.mark.skipif(
        not os.path.exists(os.path.join(OUT, "ref_record.npz")),
        reason="golden reference recordings not present",
    ),
]

# trajectory tags checked in the replay window (before the first upsample at
# iter 30 — a single compile). Gated/TV/lr tags excluded by design (GOLDEN.md).
CHECK_TAGS = {
    "mse": "train/mse",
    "psnr": "train/PSNR",
    "img_d_loss": "train/img_d_loss",
    "img_s_loss": "train/img_s_loss",
    "order_loss": "train/order_loss",
    "novel_order_loss": "train/novel_order_loss",
    "flow_f_loss": "train/flow_f_loss",
    "flow_b_loss": "train/flow_b_loss",
    "disp_f_loss": "train/disp_f_loss",
    "disp_b_loss": "train/disp_b_loss",
    "flow_f_s_loss": "train/flow_f_s_loss",
    "disp_b_s_loss": "train/disp_b_s_loss",
    "small_scene_flow_loss": "train/small_scene_flow_loss",
    "smooth_scene_flow_loss": "train/smooth_scene_flow_loss",
    "total_mono_depth_loss_dynamic": "train/total_mono_depth_loss_dynamic",
    "total_mono_depth_loss_static": "train/total_mono_depth_loss_static",
    "loss_distortion": "train/loss_distortion",
    "loss_distortion_static": "train/loss_distortion_static",
    "disp_smooth_loss": "train/disp_smooth_loss",
}


@pytest.fixture(scope="module")
def golden_trainer():
    sys.path.insert(0, GOLDEN)
    from run_ours import inject_reference_init

    from rodynrf_tpu.data.video_dataset import load_nvidia_scene
    from rodynrf_tpu.train.config import config_parser
    from rodynrf_tpu.train.trainer import Trainer

    args = config_parser(
        ["--config", os.path.join(GOLDEN, "tiny.txt"), "--datadir",
         os.path.join(OUT, "fixture")]
    )
    args.golden_det = 1
    scene = load_nvidia_scene(
        args.datadir, downsample=1.0, use_disp=True,
        use_foreground_mask="motion_masks", with_gt_poses=True, ray_type="ndc",
    )
    trainer = Trainer(args, scene)
    inject_reference_init(trainer)
    rec = np.load(os.path.join(OUT, "ref_record.npz"))
    init_cam = {
        "pose": np.asarray(trainer.params["pose"]).copy(),
        "fov": np.asarray(trainer.params["fov"]).copy(),
    }
    return trainer, rec, init_cam


def test_trajectory_replay_matches_reference(golden_trainer):
    """First 25 iterations of the full 7-pass step track the actual
    reference's recorded per-term losses."""
    trainer, rec, _ = golden_trainer
    trainer.sampler_override = lambda i: (rec["ray_idx"][i], rec["ray_idx_rand"][i])
    ref = json.load(open(os.path.join(OUT, "ref_scalars.json")))
    # 15 iterations: float round-off amplifies chaotically through Adam at
    # roughly x1.3/iter (measured, GOLDEN.md §4); at 15 iters drift is still
    # ~1e-4 so a 5e-3 bound cleanly separates real regressions from noise.
    n = 15
    ours = {k: [] for k in CHECK_TAGS}
    for i in range(n):
        metrics = trainer.run_step()
        for k in CHECK_TAGS:
            ours[k].append(float(metrics[k]))
    for k, tag in CHECK_TAGS.items():
        ref_vals = dict((int(s), v) for s, v in ref[tag])
        for i in range(n):
            r, o = ref_vals[i], ours[k][i]
            denom = max(abs(r), abs(o), 1e-6)
            assert abs(r - o) / denom < 5e-3, (
                f"{tag} diverged at iter {i}: ref {r} vs ours {o}"
            )


def test_first_step_gradients_match_reference(golden_trainer):
    """jax.grad of the full train_loss == the reference's backward() for all
    72 parameter tensors (detach-topology parity)."""
    trainer, rec, init_cam = golden_trainer
    # the trajectory test mutates trainer state; restore the reference init
    # (fields from the .th dumps, cameras from the fixture snapshot)
    from run_ours import inject_reference_init

    inject_reference_init(trainer)
    trainer.params = dict(trainer.params)
    trainer.params["pose"] = jnp.asarray(init_cam["pose"])
    trainer.params["fov"] = jnp.asarray(init_cam["fov"])
    from rodynrf_tpu.train.checkpoints import dynamic_state_dict, static_state_dict
    from rodynrf_tpu.train.step import train_loss

    S = trainer._statics()
    sc = {
        "iteration": jnp.asarray(0, jnp.int32),
        "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
    }
    sc.update(
        {k: jnp.asarray(v, jnp.float32) for k, v in trainer.schedule.scalars(0).items()}
    )
    grad_fn = jax.jit(
        jax.grad(
            lambda p: train_loss(
                p, S, trainer.aabb, trainer.data,
                jnp.asarray(rec["ray_idx"][0]), jnp.asarray(rec["ray_idx_rand"][0]),
                jax.random.PRNGKey(0), sc,
            )[0]
        )
    )
    grads = grad_fn(trainer.params)
    ours = {}
    for k, v in static_state_dict(grads["static"], trainer.static_cfg).items():
        ours[f"static/{k}"] = v
    for k, v in dynamic_state_dict(grads["dynamic"], trainer.dynamic_cfg).items():
        ours[f"dynamic/{k}"] = v
    ours["pose"] = np.asarray(grads["pose"])
    ours["fov"] = np.asarray(grads["fov"])

    ref = np.load(os.path.join(OUT, "grads_ref.npz"))
    for name in ref.files:
        assert name in ours, f"missing gradient {name}"
        r, o = ref[name], ours[name]
        rel = np.abs(r - o).max() / (np.abs(r).max() + 1e-12)
        assert rel < 1e-3, f"gradient mismatch {name}: rel {rel:.2e}"

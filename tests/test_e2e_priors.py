"""End-to-end priors loop: frames → our RAFT/DPT/mask CLIs → loader → train.

The reference README's pipeline (reference: README.md:69-96) is: put frames
under <scene>/images, run the flow / depth / motion-mask scripts to produce
sidecars, then train from the scene directory. This test closes that loop
with the repo's OWN tooling end to end:

  1. writes synthetic video frames to <tmp>/images/*.png,
  2. runs scripts/generate_flow.py (RAFT, random-weight ckpt in the
     reference's DataParallel .pth format), scripts/generate_depth.py
     (DPT-Large, random-weight ckpt), scripts/generate_mask.py (epipolar
     error from the generated flow) against that directory,
  3. ingests the resulting sidecar tree through the REAL disk path of
     data/video_dataset.load_nvidia_scene, and
  4. constructs a Trainer on the loaded SceneData and runs train steps,
     asserting finite losses.

Random weights make the priors meaningless as supervision — the contract
under test is the file formats, naming, shapes, and loader/trainer wiring,
not prior quality (quality parity of the converted REAL networks is covered
by tests/test_weight_conversion.py against the reference's own modules).
"""

import os
import runpy
import sys
from argparse import Namespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.integration,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "scripts")),
        reason="no reference checkout (torch mirrors for random ckpts)",
    ),
]


def _add_paths():
    for p in (os.path.join(REPO, "golden", "shims"), os.path.join(REF, "scripts")):
        if p not in sys.path:
            sys.path.append(p)


def _write_frames(scene_dir, T=4, H=96, W=128):
    """Moving-square synthetic video — enough texture for RAFT/epipolar."""
    from PIL import Image

    rng = np.random.default_rng(11)
    base = rng.uniform(0.2, 0.8, (H, W, 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 3)
    img_dir = os.path.join(scene_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    for t in range(T):
        img = base.copy()
        x0 = 10 + 8 * t
        img[30:60, x0 : x0 + 24] = [0.9, 0.2, 0.1]
        arr = np.clip(img * 255, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{t:03d}.png"))


def _save_random_ckpts(tmp_path):
    _add_paths()
    from midas.dpt_depth import DPTDepthModel
    from RAFT.raft import RAFT

    torch.manual_seed(3)
    raft = RAFT(Namespace(small=False, mixed_precision=False)).eval()
    with torch.no_grad():
        for p in raft.parameters():
            if p.ndim > 1:
                p.mul_(0.5)
    raft_path = os.path.join(tmp_path, "raft_rand.pth")
    torch.save({"module." + k: v for k, v in raft.state_dict().items()}, raft_path)

    dpt = DPTDepthModel(backbone="vitl16_384", non_negative=True).eval()
    dpt_path = os.path.join(tmp_path, "dpt_rand.pt")
    torch.save(dpt.state_dict(), dpt_path)
    return raft_path, dpt_path


def _run_cli(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(REPO, "scripts", script), run_name="__main__")
    finally:
        sys.argv = old


def test_priors_pipeline_to_training(tmp_path):
    scene_dir = str(tmp_path / "scene")
    T, H, W = 4, 96, 128
    _write_frames(scene_dir, T=T, H=H, W=W)
    raft_ckpt, dpt_ckpt = _save_random_ckpts(str(tmp_path))

    # small long_side / few iters: the contract is the sidecar format, and
    # the full-resolution paths are exercised by the parity tests
    _run_cli(
        "generate_flow.py",
        ["--dataset_path", scene_dir, "--model", raft_ckpt,
         "--iters", "2", "--long_side", "128", "--zfill", "3"],
    )
    _run_cli("generate_depth.py", ["--dataset_path", scene_dir, "--model", dpt_ckpt])
    _run_cli("generate_mask.py", ["--dataset_path", scene_dir, "--zfill", "3"])

    # the sidecar tree is exactly the Nvidia layout the loader reads
    for t in range(T - 1):
        assert os.path.exists(os.path.join(scene_dir, "flow", f"{t:03d}_fwd.npz"))
        assert os.path.exists(os.path.join(scene_dir, "flow", f"{t+1:03d}_bwd.npz"))
    for t in range(T):
        assert os.path.exists(os.path.join(scene_dir, "disp", f"{t:03d}.npy"))
    masks = sorted(
        os.listdir(os.path.join(scene_dir, "motion_masks"))
    ) if os.path.isdir(os.path.join(scene_dir, "motion_masks")) else []
    assert len(masks) >= T - 1 or os.path.isdir(
        os.path.join(scene_dir, "epipolar_error_png")
    )

    from rodynrf_tpu.data.video_dataset import load_nvidia_scene

    mask_dir = "motion_masks" if masks else "epipolar_error_png"
    scene = load_nvidia_scene(
        scene_dir, downsample=1.0, use_disp=True,
        use_foreground_mask=mask_dir, with_gt_poses=False, ray_type="ndc",
    )
    assert scene.n_frames == T and scene.img_wh == (W, H)
    assert np.isfinite(scene.disps).all() and np.isfinite(scene.flows_f).all()
    # frames with flow sidecars carry nonzero flow
    assert np.abs(scene.flows_f[: H * W]).max() > 0

    from rodynrf_tpu.train import Trainer, parse_cmd

    args = parse_cmd(
        f"--expname e2e --datadir {scene_dir} --dataset_name nvidia "
        f"--n_iters 8 --batch_size 64 --N_voxel_t {T} "
        f"--N_voxel_init 512 --N_voxel_final 1000 "
        f"--upsamp_list 4 --upsamp_list 6 "
        f"--nSamples 24 --step_ratio 2.0 --ray_type ndc "
        f"--model_name TensorVMSplit_TimeEmbedding --shadingMode MLP_Fea_late_view "
        f"--shadingModeStatic MLP_Fea "
        f"--n_lamb_sigma 4 --n_lamb_sigma 2 --n_lamb_sigma 2 "
        f"--n_lamb_sh 8 --n_lamb_sh 4 --n_lamb_sh 4 "
        f"--fea2denseAct relu --view_pe 0 --fea_pe 0 "
        f"--optimize_poses 1 --optimize_focal_length 1 --use_disp 1"
    )
    tr = Trainer(args, scene)
    for _ in range(2):
        m = tr.run_step()
    assert np.isfinite(float(m["total_loss"]))

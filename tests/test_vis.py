"""Train-time visualization parity (VERDICT r1 item 5).

The reference logs 17 TB image families every vis_train_every iterations
(reference train.py:2428-2580) plus a camera-wireframe figure
(train.py:2365-2415). _tb_vis_images must produce all of them with valid
shapes/ranges — and it no longer swallows exceptions, so this test IS the
regression gate for the vis path.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.integration

# the reference's image families at a vis tick (train.py:2463-2580)
EXPECTED_TAGS = {
    "test/rgb_maps", "test/rgb_maps_s", "test/rgb_maps_d",
    "test/depth_map", "test/depth_map_s", "test/depth_map_d",
    "test/blending_maps", "test/gt_maps",
    "test/induced_flow_f", "test/induced_flow_b",
    "test/induced_flow_s_f", "test/induced_flow_s_b",
    "test/gt_flow_f", "test/gt_flow_b",
    "test/delta_xyz_tb", "test/gt_blending_maps", "test/monodepth_tb",
}


class RecordingWriter:
    def __init__(self):
        self.images = {}
        self.scalars = {}

    def add_images(self, tag, arr, global_step=None, dataformats="NHWC"):
        assert dataformats == "NHWC"
        self.images[tag] = np.asarray(arr)

    def add_scalar(self, tag, v, step=None):
        self.scalars[tag] = v


def test_tb_vis_images_all_reference_families():
    from rodynrf_tpu.testing import tiny_scene, tiny_trainer

    import train as cli

    trainer = tiny_trainer()
    scene = tiny_scene()
    writer = RecordingWriter()
    cli._tb_vis_images(trainer, scene, trainer.args, writer, it=0)

    missing = EXPECTED_TAGS - set(writer.images)
    assert not missing, f"missing TB families: {sorted(missing)}"

    H, W = trainer.H, trainer.W
    for tag, arr in writer.images.items():
        assert arr.ndim == 4 and arr.shape[1:] == (H, W, 3), f"{tag}: {arr.shape}"
        assert np.isfinite(arr).all(), f"{tag} has non-finite values"
        assert arr.min() >= 0.0 and arr.max() <= 1.0 + 1e-6, f"{tag} out of [0,1]"


def test_camera_pose_figure():
    pytest.importorskip("matplotlib")
    from rodynrf_tpu.utils.camera_vis import camera_pose_figure, camera_wireframes

    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (5, 1, 1))
    poses[:, :, 3] = rng.normal(0, 0.1, (5, 3))
    centers, wires = camera_wireframes(poses, depth=0.01)
    np.testing.assert_allclose(centers, poses[:, :, 3], atol=1e-6)
    assert wires.shape == (5, 10, 3)

    img = camera_pose_figure(poses, poses + 0.01)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8

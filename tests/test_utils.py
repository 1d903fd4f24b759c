"""Utils tests: visualization, depth filter, label mapper, preprocessing math."""

import numpy as np

from mm2d3d_tpu.data.preprocess.nuscenes_lidarseg import (
    map_pointcloud_to_image,
    quat_to_rot,
)
from mm2d3d_tpu.utils.depth import filter_depth
from mm2d3d_tpu.utils.segmentation import MapLabels
from mm2d3d_tpu.utils.visualize import (
    NUSCENES_PALETTE,
    colorize_labels,
    draw_points_image_labels_with_confidence,
    save_point_cloud_ply,
)


def test_quat_to_rot_matches_scipy(rng):
    from scipy.spatial.transform import Rotation as R

    q = rng.randn(4)
    q = q / np.linalg.norm(q)
    got = quat_to_rot(q)  # (w, x, y, z)
    want = R.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()  # scipy xyzw
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_map_pointcloud_to_image_identity_chain(rng):
    # identity transforms: camera frame == lidar frame; check projection + fov
    info = {
        "lidar2ego_rotation": [1, 0, 0, 0],
        "lidar2ego_translation": [0, 0, 0],
        "ego2global_rotation_lidar": [1, 0, 0, 0],
        "ego2global_translation_lidar": [0, 0, 0],
        "ego2global_rotation_cam": [1, 0, 0, 0],
        "ego2global_translation_cam": [0, 0, 0],
        "cam2ego_rotation": [1, 0, 0, 0],
        "cam2ego_translation": [0, 0, 0],
        "cam_intrinsic": [[100, 0, 80], [0, 100, 45], [0, 0, 1]],
    }
    pts = np.array([[0.0, 0.0, 10.0], [0.0, 0.0, -5.0], [100.0, 0.0, 10.0]]).T
    mask, cam, img = map_pointcloud_to_image(pts, (90, 160, 3), info)
    assert mask.tolist() == [True, False, False]  # behind cam / out of fov cut
    np.testing.assert_allclose(img[0], [80, 45], atol=1e-4)  # principal point


def test_filter_depth_removes_occluded():
    d = np.zeros((9, 9), np.float32)
    d[4, 4] = 10.0  # background leak
    d[3:6, 3:6][d[3:6, 3:6] == 0] = 2.0  # foreground surface
    out = np.asarray(filter_depth(d, kernel_size=3, threshold=0.1))
    assert out[4, 4] == 0.0  # occluded point dropped
    assert out[3, 3] == 2.0  # surface kept


def test_map_labels():
    m = MapLabels(["a", "b", "c"], ["c", "a"])
    np.testing.assert_array_equal(m(np.array([0, 1, 2])), [1, -100, 0])


def test_visualization_figures(tmp_path, rng):
    h, w, n = 40, 60, 50
    img = rng.rand(h, w, 3).astype(np.float32)
    idx = np.stack([rng.randint(0, h, n), rng.randint(0, w, n)], 1)
    labels = rng.randint(-1, 6, n)
    labels[labels == -1] = -100
    buf = draw_points_image_labels_with_confidence(
        img, rng.randint(0, 6, (h, w)), labels, labels, rng.rand(n), labels,
        idx, NUSCENES_PALETTE, out_path=str(tmp_path / "fig.png"),
    )
    assert buf.ndim == 3 and (tmp_path / "fig.png").exists()

    c = colorize_labels(np.array([0, -100]), NUSCENES_PALETTE)
    assert c[0].tolist() == [255, 158, 0] and c[1].tolist() == [0, 0, 0]

    save_point_cloud_ply(str(tmp_path / "pc.ply"), rng.rand(10, 3),
                         (rng.rand(10, 3) * 255).astype(np.uint8))
    text = (tmp_path / "pc.ply").read_text()
    assert "element vertex 10" in text

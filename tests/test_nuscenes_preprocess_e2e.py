"""Hermetic NuScenes preprocess e2e: fake devkit-shaped DB -> preprocess()
-> split pickles -> NuScenesSCN -> collate.

The preprocessor's geometry (projection, box membership, detection-class
mapping) is native (``data/nuscenes/{projection,boxes}.py``); the
nuscenes-devkit is only a DB reader, so a duck-typed ``nusc`` object covers
the full pipeline (reference ``data/nuscenes/preprocess.py:19-148``).
"""

import os
import os.path as osp
import pickle

import numpy as np
import pytest
from PIL import Image

from fusiontransformer_tpu.data.nuscenes.boxes import (
    SimpleBox, category_to_detection_name, points_in_box)
from fusiontransformer_tpu.data.nuscenes.nuscenes_dataloader import (
    NuScenesBase, NuScenesSCN)
from fusiontransformer_tpu.data.nuscenes.preprocess import preprocess

W, H = 1600, 900
FX = FY = 400.0
IDENT = {"translation": [0.0, 0.0, 0.0], "rotation": [1.0, 0.0, 0.0, 0.0]}


class FakeNusc:
    """Duck-typed stand-in for ``nuscenes.NuScenes``: identity calibration
    chain (camera frame == lidar frame, looking along +z)."""

    def __init__(self, root, scene_specs, n_pts=300, seed=0):
        rng = np.random.RandomState(seed)
        os.makedirs(osp.join(root, "sweeps"), exist_ok=True)
        img_path = osp.join(root, "sweeps", "cam.jpg")
        Image.fromarray(
            (rng.rand(H, W, 3) * 255).astype(np.uint8)).save(img_path)

        self.sample = []
        self._tables = {"scene": {}, "log": {}, "sample_data": {},
                        "calibrated_sensor": {}, "ego_pose": {}}
        self._sample_data_payload = {}
        self.intrinsic = np.array(
            [[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]])

        self._tables["log"]["log0"] = {"location": "singapore-onenorth"}
        self._tables["calibrated_sensor"]["cs0"] = dict(IDENT)
        self._tables["ego_pose"]["ep0"] = dict(IDENT)

        for i, (scene_name, description, box) in enumerate(scene_specs):
            scene_tok = f"scene{i}"
            self._tables["scene"][scene_tok] = {
                "name": scene_name, "description": description,
                "log_token": "log0"}
            lid_tok, cam_tok = f"lid{i}", f"cam{i}"
            for tok in (lid_tok, cam_tok):
                self._tables["sample_data"][tok] = {
                    "calibrated_sensor_token": "cs0",
                    "ego_pose_token": "ep0"}

            # Points in front of the camera (z in [4, 30]); every point
            # projects inside the image with the identity chain.
            z = rng.uniform(4.0, 30.0, n_pts)
            x = rng.uniform(-1.8, 1.8, n_pts) * z
            y = rng.uniform(-1.0, 1.0, n_pts) * z
            extra = rng.rand(2, n_pts)
            pts5 = np.stack([x, y, z, extra[0], extra[1]], 0).astype(
                np.float32)
            lidar_path = osp.join(root, "sweeps", f"lidar{i}.bin")
            pts5.T.astype(np.float32).tofile(lidar_path)
            self.points = pts5[:3]

            boxes = [box] if box is not None else []
            self._sample_data_payload[lid_tok] = (lidar_path, boxes, None)
            self._sample_data_payload[cam_tok] = (
                img_path, boxes, self.intrinsic)

            self.sample.append({
                "token": f"sample{i}", "scene_token": scene_tok,
                "data": {"LIDAR_TOP": lid_tok, "CAM_FRONT": cam_tok}})

    def get(self, table, token):
        return self._tables[table][token]

    def get_sample_data(self, token):
        return self._sample_data_payload[token]


def test_points_in_box_rotated():
    # 90-degree yaw: the box's length axis (x, l=4) lies along world y.
    s2 = np.sqrt(0.5)
    box = SimpleBox(center=(0, 0, 0), wlh=(2, 4, 2),
                    orientation=(s2, 0, 0, s2))
    pts = np.array([[0.0, 0.9, 0.0], [1.9, 0.0, 0.0],
                    [0.0, 1.9, 0.0], [1.1, 0.0, 0.0]]).T
    np.testing.assert_array_equal(points_in_box(box, pts),
                                  [True, False, True, False])


def test_category_mapping():
    assert category_to_detection_name("vehicle.bus.rigid") == "bus"
    assert category_to_detection_name("human.pedestrian.child") == "pedestrian"
    assert category_to_detection_name("static_object.bicycle_rack") is None


def test_preprocess_fake_db_to_dataset(tmp_path):
    root = str(tmp_path / "nusc")
    out = str(tmp_path / "out")
    car_box = SimpleBox(center=(1.0, 0.0, 10.0), wlh=(2.0, 2.0, 2.0),
                        name="vehicle.car", token="box0")
    nusc = FakeNusc(root, [
        ("scene-0001", "sunny day", car_box),     # train split
        ("scene-0003", "rainy night", None),      # test split
        ("scene-9999", "not in any split", None)  # skipped
    ])
    preprocess(nusc, ("train", "test"), root, out)

    with open(osp.join(out, "preprocess", "train.pkl"), "rb") as f:
        train_recs = pickle.load(f)
    with open(osp.join(out, "preprocess", "test.pkl"), "rb") as f:
        test_recs = pickle.load(f)
    assert len(train_recs) == 1 and len(test_recs) == 1

    rec = train_recs[0]
    pts = rec["points"]
    assert pts.shape[1] == 3 and len(pts) > 100
    # Box labeling: exactly the in-box points carry the 'car' class id.
    car_id = NuScenesBase.class_names.index("car")
    bg_id = NuScenesBase.class_names.index("background")
    in_box = points_in_box(car_box, pts.T)
    assert in_box.any()
    np.testing.assert_array_equal(
        rec["seg_labels"] == car_id, in_box)
    assert (rec["seg_labels"][~in_box] == bg_id).all()
    # Projection parity with the identity chain: u = FX*x/z + W/2.
    u = FX * pts[:, 0] / pts[:, 2] + W / 2
    np.testing.assert_allclose(rec["points_img"][:, 1], u, atol=1e-3)
    assert rec["camera_path"] == osp.join("sweeps", "cam.jpg")

    # Dataset + collate over the written pickles (merged 11 -> 5 classes).
    ds = NuScenesSCN(split=("train",), preprocess_dir=osp.join(
        out, "preprocess"), nuscenes_dir=root, merge_classes=True,
        output_orig=True)
    assert ds.class_names == ["vehicle", "pedestrian", "bike",
                              "traffic_boundary", "background"]
    item = ds[0]
    k = len(item["coords"])
    assert k > 50
    assert item["feats"].shape == (k, 4)
    assert item["img"].shape == (225, 400, 3)
    assert set(np.unique(item["seg_label"])) <= {0, 4}  # vehicle/background

    from fusiontransformer_tpu.data.collate import get_collate
    collate = get_collate(is_train=False, batch_size=1, point_capacity=512,
                          image_height=225, image_width=400)
    batch = collate([item])
    assert batch["num_dropped"] == 0
    assert batch["scan_count"][0] == k


def test_preprocess_location_and_keyword_filters(tmp_path):
    root = str(tmp_path / "nusc")
    out = str(tmp_path / "out")
    nusc = FakeNusc(root, [("scene-0001", "cloudy night", None)])
    # location 'boston' excludes the singapore log entirely.
    preprocess(nusc, ("train",), root, out, location="boston")
    with open(osp.join(out, "preprocess", "train.pkl"), "rb") as f:
        assert pickle.load(f) == []
    # keyword filter keeps only scenes whose description mentions it.
    preprocess(nusc, ("train",), root, out, keyword="night",
               keyword_action="filter", subset_name="night")
    with open(osp.join(out, "preprocess", "train_night.pkl"), "rb") as f:
        assert len(pickle.load(f)) == 1

"""Data layer end-to-end: fake nuScenes pickles -> dataset -> loader ->
PointBatch; pseudo-label refinement; config composition; padding."""

import os
import os.path as osp
import pickle

import numpy as np
import pytest

from mm2d3d_tpu.data.base import collate, pad_sample
from mm2d3d_tpu.data.nuscenes import NuScenesLidarSeg
from mm2d3d_tpu.data.loader import Loader, max_size_cycle
from mm2d3d_tpu.data.pseudo_labels import refine_pseudo_labels
from mm2d3d_tpu.utils.config import load_config

H, W = 90, 160  # raw image size; resize target (40, 22)
RESIZE = (40, 22)


def _make_scan(rng, n=300):
    pts_cam = np.stack(
        [
            (rng.rand(n) - 0.5) * 20,
            (rng.rand(n) - 0.5) * 4,
            rng.rand(n) * 40 + 2,
        ],
        1,
    ).astype(np.float32)
    points = pts_cam[:, [2, 0, 1]].copy()  # fake lidar frame
    rows = rng.randint(0, H, n).astype(np.float64)
    cols = rng.randint(0, W, n).astype(np.float64)
    return {
        "points": points,
        "seg_labels": rng.randint(0, 17, n).astype(np.uint8),
        "points_img": np.stack([rows, cols], 1),
        "camera_path": "img.png",
        "lidar_path": "lidar.bin",
        "sample_token": "tok",
        "scene_name": "scene-0001",
        "calib": {"cam_intrinsic": np.eye(3) * 100.0},
        "pts_cam_coord": pts_cam,
    }


@pytest.fixture
def nusc_dir(tmp_path, rng):
    from PIL import Image

    pre = tmp_path / "preprocess"
    pre.mkdir()
    scans = [_make_scan(rng) for _ in range(4)]
    for split in ("train_usa", "train_singapore", "val_singapore", "test_singapore"):
        with open(pre / f"{split}.pkl", "wb") as f:
            pickle.dump(scans, f)
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "img.png")
    return str(tmp_path)


def _dataset(nusc_dir, **kw):
    args = dict(
        split=("train_usa",),
        preprocess_dir=osp.join(nusc_dir, "preprocess"),
        nuscenes_dir=nusc_dir,
        merge_classes=True,
        scale=20,
        full_scale=2048,
        resize=RESIZE,
        use_rgb=True,
    )
    args.update(kw)
    return NuScenesLidarSeg(**args)


def test_nuscenes_sample_pipeline(nusc_dir, rng):
    ds = _dataset(nusc_dir, noisy_rot=0.1, flip_x=0.5, rot=6.28, transl=True,
                  fliplr=0.5, color_jitter=(0.4, 0.4, 0.4))
    assert ds.num_classes == 6
    s = ds.__getitem__(0, rng=np.random.RandomState(1))
    n = len(s["coords"])
    assert n > 0
    assert s["img"].shape == (RESIZE[1], RESIZE[0], 3)
    assert s["depth"].shape == (RESIZE[1], RESIZE[0], 1)
    assert s["feats"].shape == (n, 3)
    assert s["seg_label"].shape == (n,)
    assert (s["coords"] >= 0).all() and (s["coords"] < 2048).all()
    assert (s["img_indices"][:, 0] < RESIZE[1]).all()
    assert (s["img_indices"][:, 1] < RESIZE[0]).all()
    assert set(np.unique(s["seg_label"])) <= set(range(6)) | {-100}
    # feats are the image RGB at the projected pixels
    i = 0
    np.testing.assert_allclose(
        s["feats"][i], s["img"][s["img_indices"][i, 0], s["img_indices"][i, 1]]
    )
    # deterministic given the rng
    s2 = ds.__getitem__(0, rng=np.random.RandomState(1))
    np.testing.assert_array_equal(s["coords"], s2["coords"])


def test_loader_and_collate(nusc_dir):
    ds = _dataset(nusc_dir)
    loader = Loader(ds, batch_size=2, n_points=256, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b.coords.shape == (2, 256, 3)
    assert b.img.shape == (2, RESIZE[1], RESIZE[0], 3)
    assert b.point_mask.shape == (2, 256)
    assert (b.seg_label[~b.point_mask] == -100).all()

    trg = Loader(_dataset(nusc_dir, split=("train_singapore",)), 2, 256)
    pairs = list(max_size_cycle(loader, trg))
    assert len(pairs) == 2


def test_loader_multiprocess(nusc_dir):
    ds = _dataset(nusc_dir)
    l0 = Loader(ds, batch_size=2, n_points=256, shuffle=True, seed=3)
    l1 = Loader(ds, batch_size=2, n_points=256, shuffle=True, seed=3, num_workers=2)
    try:
        b0, b1 = list(l0), list(l1)
        for a, b in zip(b0, b1):
            np.testing.assert_array_equal(np.asarray(a.coords), np.asarray(b.coords))
    finally:
        l1.close()


def test_pad_truncates_and_masks(rng):
    s = {
        "coords": rng.randint(0, 10, (5, 3)),
        "img_indices": rng.randint(0, 4, (5, 2)),
        "feats": rng.rand(5, 3).astype(np.float32),
        "seg_label": np.arange(5),
    }
    p = pad_sample(s, 3)
    assert p["n_dropped"] == 2 and p["point_mask"].sum() == 3
    p = pad_sample(s, 8)
    assert p["n_dropped"] == 0
    assert (p["seg_label"][5:] == -100).all()
    assert p["point_mask"].tolist() == [True] * 5 + [False] * 3


def test_refine_pseudo_labels():
    probs = np.array([0.95, 0.6, 0.91, 0.2, 0.8, 0.99])
    labels = np.array([0, 0, 0, 1, 1, 1])
    out = refine_pseudo_labels(probs, labels.copy())
    # class 0: median 0.91 -> thresh 0.9: keep 0.95, 0.91; drop 0.6
    # class 1: median 0.8 -> keep 0.8, 0.99; drop 0.2
    np.testing.assert_array_equal(out, [0, -100, 0, -100, 1, 1])


def test_config_composition(tmp_path):
    (tmp_path / "run").mkdir()
    (tmp_path / "datasets").mkdir()
    (tmp_path / "config.yaml").write_text(
        "train:\n  lr: 0.001\ndefaults:\n- _self_\n- datasets: nusc\n- run: train\n"
    )
    (tmp_path / "datasets" / "nusc.yaml").write_text("dataset:\n  name: nuscenes\n")
    (tmp_path / "datasets" / "other.yaml").write_text("dataset:\n  name: other\n")
    (tmp_path / "run" / "train.yaml").write_text("run:\n  max_epochs: 49\n")
    (tmp_path / "run" / "test.yaml").write_text("run:\n  max_epochs: 1\n")

    cfg = load_config(str(tmp_path / "config.yaml"))
    assert cfg["dataset"]["name"] == "nuscenes"
    assert cfg["run"]["max_epochs"] == 49
    assert cfg["train"]["lr"] == 0.001

    cfg = load_config(str(tmp_path / "config.yaml"),
                      overrides=["run=test", "datasets=other", "train.lr=0.5"])
    assert cfg["run"]["max_epochs"] == 1
    assert cfg["dataset"]["name"] == "other"
    assert cfg["train"]["lr"] == 0.5


def test_loader_process_sharding():
    """Multi-host loader sharding: same seed => disjoint equal-size shards
    of the same global batches, equal batch counts per process
    (parallel.mesh multi-host input path)."""
    import numpy as np

    from mm2d3d_tpu.data.loader import Loader

    class DS:
        def __len__(self):
            return 37

        def __getitem__(self, i, rng=None):
            n = 8
            return {
                "img": np.zeros((4, 6, 3), np.float32),
                "depth": np.zeros((4, 6), np.float32),
                "img_indices": np.zeros((n, 2), np.int64),
                "coords": np.full((n, 3), i % 16, np.int64),
                "feats": np.ones((n, 3), np.float32),
                "seg_label": np.full(n, i % 5, np.int64),
            }

    shards = [
        Loader(DS(), 2, 8, shuffle=True, seed=7, num_shards=2, shard_id=s)
        for s in range(2)
    ]
    a = list(shards[0])
    b = list(shards[1])
    # non-drop_last sharded loaders pad the global tail: ceil(37/4) batches
    assert len(a) == len(b) == len(shards[0]) == (37 + 3) // 4
    for x, y in zip(a[:-1], b[:-1]):
        # disjoint halves of the same global batch: labels differ per index
        assert x.coords.shape == y.coords.shape == (2, 8, 3)
        assert not np.array_equal(x.seg_label, y.seg_label) or not np.array_equal(
            x.coords, y.coords
        )

    # a PARTIAL global tail batch (n=38, g=4: rows 36:38 fill shard 0's
    # slice, shard 1's slice is empty) must yield EQUAL per-shard batch
    # counts (multi-host collectives deadlock otherwise) while still
    # covering every scan: the tail is padded with fully-masked filler,
    # not dropped (the reference evaluates every scan)
    class DS38(DS):
        def __len__(self):
            return 38

    tails = []
    for s in range(2):
        bs = list(Loader(DS38(), 2, 8, num_shards=2, shard_id=s))
        assert len(bs) == (38 + 3) // 4, len(bs)
        tails.append(bs[-1])
    # shard 0's tail slice holds the 2 real leftover scans; shard 1's is
    # pure padding — every point masked, every label ignored
    assert tails[0].point_mask.any()
    assert not tails[1].point_mask.any()
    assert (tails[1].seg_label == -100).all()
    assert int(tails[1].n_dropped.sum()) == 0
    # drop_last (train) loaders still drop the global tail on every shard
    counts = [
        len(list(Loader(DS38(), 2, 8, num_shards=2, shard_id=s,
                        drop_last=True)))
        for s in range(2)
    ]
    assert counts == [38 // 4, 38 // 4], counts


def test_loader_pad_last_static_shapes():
    """pad_last=True: the tail batch is padded to the full batch size with
    zero-contribution filler — static shapes for jit, exact metrics."""
    import numpy as np

    from mm2d3d_tpu.data.loader import Loader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i, rng=None):
            n = 8
            return {
                "img": np.zeros((4, 6, 3), np.float32),
                "depth": np.zeros((4, 6), np.float32),
                "img_indices": np.zeros((n, 2), np.int64),
                "coords": np.full((n, 3), i % 16, np.int64),
                "feats": np.ones((n, 3), np.float32),
                "seg_label": np.full(n, i % 5, np.int64),
            }

    batches = list(Loader(DS(), 4, 8, pad_last=True))
    assert [b.batch_size for b in batches] == [4, 4, 4]
    tail = batches[-1]
    # 2 real samples + 2 fully-masked pads
    assert tail.point_mask[:2].all() and not tail.point_mask[2:].any()
    assert (tail.seg_label[2:] == -100).all()
    # total REAL points across the epoch == 10 scans x 8 points
    total = sum(int(b.point_mask.sum()) for b in batches)
    assert total == 10 * 8
    # without pad_last the tail stays partial (back-compat)
    batches = list(Loader(DS(), 4, 8))
    assert [b.batch_size for b in batches] == [4, 4, 2]


def test_image_cache_roundtrip(tmp_path, rng):
    """Dataset fed from the decoded-image cache must produce the same sample
    as the decode+resize path (images within uint8 quantization)."""
    import pickle

    from PIL import Image

    from mm2d3d_tpu.data.image_cache import build_image_cache
    from mm2d3d_tpu.data.nuscenes import NuScenesLidarSeg

    root = str(tmp_path)
    img = (rng.rand(90, 160, 3) * 255).astype(np.uint8)
    os.makedirs(osp.join(root, "samples"))
    Image.fromarray(img).save(osp.join(root, "samples", "f0.jpg"), quality=95)
    n = 50
    rec = {
        "points": rng.randn(n, 3).astype(np.float32) * 5,
        "pts_cam_coord": np.abs(rng.randn(n, 3).astype(np.float32)) + 1,
        "seg_labels": rng.randint(0, 17, n).astype(np.uint8),
        "points_img": np.stack(
            [rng.uniform(0, 89, n), rng.uniform(0, 159, n)], 1
        ).astype(np.float32),
        "camera_path": "samples/f0.jpg",
        "calib": {"cam_intrinsic": [[100.0, 0, 80], [0, 100.0, 45], [0, 0, 1]]},
    }
    with open(osp.join(root, "train_usa.pkl"), "wb") as f:
        pickle.dump([rec], f)

    kw = dict(split=("train_usa",), preprocess_dir=root, nuscenes_dir=root,
              resize=(40, 22))
    plain = NuScenesLidarSeg(**kw)
    cache_dir = osp.join(root, "cache")
    built = build_image_cache([rec["camera_path"]], root, cache_dir, (40, 22))
    assert built == 1
    cached = NuScenesLidarSeg(**kw, image_cache_dir=cache_dir)

    a = plain.__getitem__(0, rng=np.random.RandomState(3))
    b = cached.__getitem__(0, rng=np.random.RandomState(3))
    np.testing.assert_allclose(b["img"], a["img"], atol=0.6 / 255)
    np.testing.assert_array_equal(b["coords"], a["coords"])
    np.testing.assert_array_equal(b["seg_label"], a["seg_label"])
    np.testing.assert_array_equal(b["img_indices"], a["img_indices"])
    np.testing.assert_allclose(b["intrinsics"], a["intrinsics"])
    # resize mismatch is a config error, caught at init
    with pytest.raises(ValueError):
        NuScenesLidarSeg(**{**kw, "resize": (80, 45)},
                         image_cache_dir=cache_dir)


def test_device_image_ops_parity(tmp_path, rng):
    """Wire format (uint8 img + device jitter + device feats gather) must
    reproduce the host float pipeline exactly (same RNG stream => same
    jitter factors/order/fliplr/3D draws; device math == host math up to
    float reduction order)."""
    import pickle

    import jax
    from PIL import Image

    from mm2d3d_tpu.data.base import collate
    from mm2d3d_tpu.data.nuscenes import NuScenesLidarSeg
    from mm2d3d_tpu.train.batch import prepare_device_batch

    root = str(tmp_path)
    img = (rng.rand(90, 160, 3) * 255).astype(np.uint8)
    os.makedirs(osp.join(root, "samples"))
    Image.fromarray(img).save(osp.join(root, "samples", "f0.jpg"), quality=95)
    n = 60
    rec = {
        "points": rng.randn(n, 3).astype(np.float32) * 5,
        "pts_cam_coord": np.abs(rng.randn(n, 3).astype(np.float32)) + 1,
        "seg_labels": rng.randint(0, 17, n).astype(np.uint8),
        "points_img": np.stack(
            [rng.uniform(0, 89, n), rng.uniform(0, 159, n)], 1
        ).astype(np.float32),
        "camera_path": "samples/f0.jpg",
        "calib": {"cam_intrinsic": [[100.0, 0, 80], [0, 100.0, 45], [0, 0, 1]]},
    }
    with open(osp.join(root, "train_usa.pkl"), "wb") as f:
        pickle.dump([rec], f)

    kw = dict(split=("train_usa",), preprocess_dir=root, nuscenes_dir=root,
              resize=(40, 22), color_jitter=(0.4, 0.4, 0.4), fliplr=0.5)
    host_ds = NuScenesLidarSeg(**kw)
    wire_ds = NuScenesLidarSeg(**kw, device_image_ops=True)

    for seed in range(4):  # several seeds => both fliplr branches + orders
        a = host_ds.__getitem__(0, rng=np.random.RandomState(seed))
        b = wire_ds.__getitem__(0, rng=np.random.RandomState(seed))
        assert b["img"].dtype == np.uint8 and b["feats"] is None
        # identical RNG stream: geometry unchanged
        np.testing.assert_array_equal(a["coords"], b["coords"])
        np.testing.assert_array_equal(a["img_indices"], b["img_indices"])
        batch = collate([b], n_points=64)
        assert batch.feats_from_img and batch.jitter_params.shape == (1, 4)
        prepared = jax.jit(prepare_device_batch)(
            jax.tree_util.tree_map(lambda x: x, batch)
        )
        # tolerance: one uint8 quantization of the float resize output
        # (the decoded-image cache path is already uint8 here — exact);
        # jitter can scale it by up to 1.4
        np.testing.assert_allclose(
            np.asarray(prepared.img[0]), a["img"], atol=1.0 / 255
        )
        m = int(batch.point_mask.sum())
        np.testing.assert_allclose(
            np.asarray(prepared.feats[0])[:m], a["feats"][:m], atol=1.0 / 255
        )
    # normalizer is host-path only
    with pytest.raises(ValueError):
        NuScenesLidarSeg(**kw, device_image_ops=True,
                         image_normalizer=((0.5,) * 3, (0.5,) * 3))


def test_resolve_num_workers():
    from mm2d3d_tpu.run import resolve_num_workers

    assert resolve_num_workers(3) == 3
    assert resolve_num_workers("2") == 2
    auto = resolve_num_workers("auto")
    assert isinstance(auto, int) and auto >= 0


def test_doctor_validates_data_dir(tmp_path, rng, capsys):
    """tools.doctor: a healthy synthetic dataset passes; schema breakage
    (missing key, misaligned per-point arrays, missing image, bad split
    name) is reported with actionable messages instead of failing deep in
    a jitted trace."""
    import pickle

    from PIL import Image

    from mm2d3d_tpu.tools import doctor

    root = str(tmp_path)
    os.makedirs(osp.join(root, "samples"))
    img = (rng.rand(45, 80, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(osp.join(root, "samples", "f0.jpg"))
    n = 40
    rec = {
        "points": rng.randn(n, 3).astype(np.float32),
        "pts_cam_coord": np.abs(rng.randn(n, 3).astype(np.float32)) + 1,
        "seg_labels": rng.randint(0, 17, n).astype(np.uint8),
        "points_img": np.stack(
            [rng.uniform(0, 44, n), rng.uniform(0, 79, n)], 1
        ).astype(np.float32),
        "camera_path": "samples/f0.jpg",
        "calib": {"cam_intrinsic": np.eye(3).tolist()},
    }
    with open(osp.join(root, "train_usa.pkl"), "wb") as f:
        pickle.dump([rec], f)

    rc = doctor.main(["--preprocess-dir", root, "--scenario", "nuscenes",
                      "--splits", "train_usa", "--data-dir", root,
                      "--resize", "40", "22"])
    assert rc == 0, capsys.readouterr().out

    # break it: drop a key + misalign a per-point array + missing image
    bad = dict(rec)
    del bad["pts_cam_coord"]
    rec2 = dict(rec)
    rec2["seg_labels"] = rec["seg_labels"][:-3]
    rec3 = dict(rec)
    rec3["camera_path"] = "samples/missing.jpg"
    with open(osp.join(root, "train_sing.pkl"), "wb") as f:
        pickle.dump([bad, rec2, rec3], f)
    rc = doctor.main(["--preprocess-dir", root, "--scenario", "nuscenes",
                      "--splits", "train_sing", "--data-dir", root,
                      "--sample", "3"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "missing keys ['pts_cam_coord']" in out
    assert "must align" in out
    assert "missing.jpg" in out and "missing" in out
    # unknown split
    rc = doctor.main(["--preprocess-dir", root, "--splits", "nope"])
    assert rc == 1


def test_native_numpy_image_op_parity(rng):
    """The loader's default (C++) image ops vs the numpy reference, at the
    dataset's call sites (uint8 resize + depth/label maps)."""
    from mm2d3d_tpu import native
    from mm2d3d_tpu.data import augment as A

    if not native.available():
        pytest.skip("no native toolchain")
    img = (rng.rand(45, 80, 3) * 255).astype(np.uint8)
    old = A._USE_NATIVE
    try:
        A._USE_NATIVE = False
        ref = A.bilinear_resize(img, (22, 40))
        A._USE_NATIVE = True
        out = A.bilinear_resize(img, (22, 40))
        np.testing.assert_allclose(out, ref, atol=1e-3)

        idx = np.stack([rng.randint(0, 22, 30), rng.randint(0, 40, 30)], 1)
        depths = rng.rand(30).astype(np.float32) * 50
        labels = rng.randint(-100, 6, 30).astype(np.int64)
        A._USE_NATIVE = False
        d_ref, l_ref = A.build_depth_and_label_maps(idx, depths, labels, (22, 40))
        A._USE_NATIVE = True
        d, l = A.build_depth_and_label_maps(idx, depths, labels, (22, 40))
        np.testing.assert_array_equal(d, d_ref)
        np.testing.assert_array_equal(l, l_ref)
    finally:
        A._USE_NATIVE = old


def test_cycle_reseeds_augmentations(nusc_dir):
    """max_size_cycle restarts of the shorter loader must RE-DRAW sample
    augmentations (a within-epoch cycle counter folds into the sample
    seed) — the second cycle differs from the first, but the whole paired
    sequence is reproducible across reruns."""
    aug = dict(noisy_rot=0.1, rot=6.28, transl=True, fliplr=0.5)
    src = Loader(_dataset(nusc_dir, **aug), batch_size=1, n_points=256,
                 seed=0)  # 4 batches/epoch
    trg = Loader(
        _dataset(nusc_dir, split=("train_singapore",), **aug),
        batch_size=2, n_points=256, seed=1,
    )  # 2 batches/epoch -> cycled twice
    pairs = list(max_size_cycle(src, trg))
    assert len(pairs) == 4
    t = [np.asarray(p[1].coords) for p in pairs]
    # cycle 1 revisits the same scans with FRESH augmentations
    assert not np.array_equal(t[0], t[2])
    assert not np.array_equal(t[1], t[3])
    # reproducible: rerunning the same epoch yields the identical sequence
    src.set_epoch(0)
    trg.set_epoch(0)
    for a, b in zip(pairs, max_size_cycle(src, trg)):
        np.testing.assert_array_equal(np.asarray(a[1].coords),
                                      np.asarray(b[1].coords))
        np.testing.assert_array_equal(np.asarray(a[0].coords),
                                      np.asarray(b[0].coords))


def test_eval_n_points_budget(nusc_dir):
    """`eval_n_points` decouples the evaluation point budget from the
    training one: scans over the train budget evaluate UNTRUNCATED when it
    is set (the reference evaluates every in-bounds point)."""
    from mm2d3d_tpu.data.registry import load_datamodule

    base = dict(preprocess_dir=osp.join(nusc_dir, "preprocess"),
                nuscenes_dir=nusc_dir)
    kw = dict(
        cfg_source=dict(base, TRAIN=["train_usa"]),
        cfg_target=dict(base, TRAIN=["train_singapore"],
                        VAL=["val_singapore"], TEST=["test_singapore"]),
        batch_size=2,
        specific=dict(merge_classes=True, scale=20, full_scale=2048,
                      resize=RESIZE, use_rgb=True),
    )
    # misconfigured: the 300-point scans exceed the 128 budget at EVAL too
    dm = load_datamodule("nuscenes", n_points=128, **kw)
    val = next(iter(dm.target_val))
    assert val.coords.shape[1] == 128
    assert int(np.sum(np.asarray(val.n_dropped))) > 0
    # eval_n_points covers the scans: evaluation is untruncated while the
    # TRAIN loaders keep the tight budget
    dm2 = load_datamodule("nuscenes", n_points=128, eval_n_points=512, **kw)
    assert next(iter(dm2.source_train)).coords.shape[1] == 128
    val2 = next(iter(dm2.target_val))
    assert val2.coords.shape[1] == 512
    assert int(np.sum(np.asarray(val2.n_dropped))) == 0
    test2 = next(iter(dm2.target_test))
    assert test2.coords.shape[1] == 512

    # an image_normalizer under `augmentations` only reaches the TRAIN
    # datasets (reference load_datamodule does the same) — a silent
    # train/eval input mismatch; the registry must refuse loudly and point
    # at `specific`, which a) reaches all four datasets and b) forces the
    # host image path everywhere
    with pytest.raises(ValueError, match="specific"):
        load_datamodule(
            "nuscenes", n_points=128,
            augmentations=dict(image_normalizer=((0.5,) * 3, (0.5,) * 3)),
            **kw)
    norm_kw = dict(kw, specific=dict(
        kw["specific"], image_normalizer=((0.5,) * 3, (0.5,) * 3)))
    dm3 = load_datamodule("nuscenes", n_points=128, **norm_kw)
    for ds in (dm3.source_train.dataset, dm3.target_val.dataset):
        assert ds.image_normalizer is not None
        assert not ds.device_image_ops


def test_doctor_point_budget(tmp_path, rng, capsys):
    """doctor scans each split's point-count distribution, recommends both
    budgets, and FLAGS an eval budget smaller than the largest eval scan."""
    import pickle

    from PIL import Image

    from mm2d3d_tpu.tools import doctor

    root = str(tmp_path)
    os.makedirs(osp.join(root, "samples"))
    Image.fromarray(
        (rng.rand(45, 80, 3) * 255).astype(np.uint8)
    ).save(osp.join(root, "samples", "f0.jpg"))

    def rec(n):
        return {
            "points": rng.randn(n, 3).astype(np.float32),
            "pts_cam_coord": np.abs(rng.randn(n, 3).astype(np.float32)) + 1,
            "seg_labels": rng.randint(0, 17, n).astype(np.uint8),
            "points_img": np.stack(
                [rng.uniform(0, 44, n), rng.uniform(0, 79, n)], 1
            ).astype(np.float32),
            "camera_path": "samples/f0.jpg",
            "calib": {"cam_intrinsic": np.eye(3).tolist()},
        }

    for split, sizes in (
        ("train_usa", [100, 120]),
        ("train_singapore", [110, 130]),
        ("val_singapore", [90, 300]),   # 300 > eval budget below
        ("test_singapore", [80, 100]),
    ):
        with open(osp.join(root, f"{split}.pkl"), "wb") as f:
            pickle.dump([rec(n) for n in sizes], f)

    side = dict(preprocess_dir=root, nuscenes_dir=root)
    cfg = {
        "dataset": {
            "name": "nuscenes",
            "source": dict(side, TRAIN=["train_usa"]),
            "target": dict(side, TRAIN=["train_singapore"],
                           VAL=["val_singapore"], TEST=["test_singapore"]),
            "specific": {"resize": [40, 22]},
        },
        "train": {"n_points": 128, "eval_n_points": None},
    }
    rc = doctor.run_from_config(cfg)
    out = capsys.readouterr().out
    assert rc == 1, out
    assert "train.eval_n_points" in out and "truncate" in out
    # recommendation lines carry the measured distribution
    assert "recommended train.eval_n_points >= 1024" in out

    cfg["train"]["eval_n_points"] = 1024
    rc = doctor.run_from_config(cfg)
    out = capsys.readouterr().out
    assert rc == 0, out

    # With scale/full_scale configured the budget is checked against
    # IN-GRID counts (what pad_sample actually truncates), not raw record
    # lengths: 100 of val's 300 points land far outside the grid, so an
    # eval budget of 256 (< 300 raw, >= 200 in-grid) is fine.
    import pickle as pkl_mod

    far = rec(300)
    far["points"] = np.concatenate([
        rng.rand(200, 3).astype(np.float32),          # cluster: in grid
        rng.rand(100, 3).astype(np.float32) + 1000.0,  # far: out of grid
    ])
    with open(osp.join(root, "val_singapore.pkl"), "wb") as f:
        pkl_mod.dump([far], f)
    cfg["dataset"]["specific"].update(scale=20, full_scale=4096)
    cfg["train"]["eval_n_points"] = 256
    rc = doctor.run_from_config(cfg)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "in-grid points" in out

    # source and target TRAIN splits sharing a name must not overwrite
    # each other's distributions (a2d2/vkitti -> skitti both use "train")
    counts = {}
    for key in ("source/train", "target/train"):
        doctor.check_split(doctor.Doctor(), "nuscenes", root,
                           "train_usa", point_counts=counts, counts_key=key)
    capsys.readouterr()
    assert set(counts) == {"source/train", "target/train"}


def test_pooled_loader_early_exit_and_close(nusc_dir):
    """Abandoning a pooled epoch mid-way (limit_train_batches, exceptions)
    must not clog the pool: the next __iter__ drains the in-flight window,
    and close() drains then closes gracefully (Pool.terminate with results
    in flight deadlocks on the clogged result pipe)."""
    ds = _dataset(nusc_dir)
    lo = Loader(ds, batch_size=2, n_points=256, seed=0, num_workers=2)
    try:
        it = iter(lo)
        next(it)  # abandon with the rest of the window in flight
        b = next(iter(lo))  # a fresh epoch still serves batches
        assert b.coords.shape == (2, 256, 3)
    finally:
        lo.close()  # must return, not deadlock
    assert lo._pool is None

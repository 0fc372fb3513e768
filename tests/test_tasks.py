"""Pose / OBB / Classify task tests: builds, reference param parity, predict paths."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.nn import build_model

CFG = Path(__file__).resolve().parents[1] / "lpc_yolo_tpu" / "cfg" / "models"

# measured from the torch reference (ex the frozen DFL conv)
PARAM_COUNTS = {
    "v8/yolov8-pose.yaml": 3_295_454,
    "v8/yolov8-obb.yaml": 3_228_851,
    "v8/yolov8-cls.yaml": 2_719_288,
}


@pytest.mark.parametrize("cfg", sorted(PARAM_COUNTS))
def test_param_counts(cfg):
    m = build_model(CFG / cfg)
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    assert n == PARAM_COUNTS[cfg]


def test_pose_outputs():
    m = build_model(CFG / "v8/yolov8-pose.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    out = m.apply(v, jnp.zeros((2, 64, 64, 3)), training=False)
    A = 64 + 16 + 4
    assert out["pred"].shape == (2, A, 5)  # nc=1
    assert out["kpt"].shape == (2, A, 51)
    # visibility channel is sigmoid-bounded
    kv = np.asarray(out["kpt"]).reshape(2, A, 17, 3)[..., 2]
    assert kv.min() >= 0 and kv.max() <= 1


def test_obb_outputs():
    m = build_model(CFG / "v8/yolov8-obb.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)), training=False)
    assert out["pred"].shape[-1] == 4 + 80 + 1  # rbox + cls + angle
    ang = np.asarray(out["angle"])
    assert ang.min() >= -np.pi / 4 - 1e-6 and ang.max() <= 3 * np.pi / 4 + 1e-6


def test_classify_predict():
    m = YOLO("yolov8-cls.yaml")
    assert m.task == "classify"
    img = (np.random.rand(120, 160, 3) * 255).astype(np.uint8)
    r = m.predict(img, imgsz=64)[0]
    assert r.probs is not None and r.probs.shape == (1000,)
    np.testing.assert_allclose(r.probs.sum(), 1.0, atol=1e-4)


def test_pose_predict():
    m = YOLO("yolov8-pose.yaml")
    assert m.task == "pose"
    img = (np.random.rand(120, 160, 3) * 255).astype(np.uint8)
    r = m.predict(img, imgsz=64, conf=1e-6)[0]
    if len(r):
        assert r.keypoints is not None
        assert r.keypoints.shape[1:] == (17, 3)


def _tiny_rtdetr_yaml(tmp_path, nc=80):
    """Stock rtdetr graph with a small decoder (hd=64, nq=60, ndl=2) via the
    YAML decoder-override args — full decoder compiles for minutes on the
    1-vCPU runner; the tiny one exercises the same code paths."""
    import yaml as _yaml

    d = _yaml.safe_load((CFG / "v8/yolov8-rtdetr.yaml").read_text())
    head = d["head"][-1]
    assert head[2] == "RTDETRDecoder"
    head[3] = ["nc", 64, 60, 4, 4, 2, 256]  # nc, hd, nq, ndp, nh, ndl, d_ffn
    d["nc"] = nc
    out = tmp_path / "yolov8-rtdetr-tiny.yaml"
    out.write_text(_yaml.safe_dump(d))
    return out


def test_rtdetr_build_and_predict(tmp_path):
    """RTDETR: exact reference param count (9,623,388 + the 80x256 denoising
    class embedding, head.py:335) on the stock config via eval_shape; real
    forward/train-mode/predict on the tiny-decoder config."""
    m = build_model(CFG / "v8/yolov8-rtdetr.yaml")
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), training=True))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    assert n == 9_623_388 + 80 * 256
    out = jax.eval_shape(
        lambda: m.apply(
            m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), training=True),
            jnp.zeros((1, 128, 128, 3)), training=False,
        )
    )
    assert out["pred"].shape == (1, 300, 84)

    y = YOLO(str(_tiny_rtdetr_yaml(tmp_path)))
    assert y.task == "rtdetr"
    out = y.model.apply(y.variables, jnp.zeros((1, 64, 64, 3)), training=False)
    assert out["pred"].shape == (1, 60, 84)
    tr, _ = y.model.apply(y.variables, jnp.zeros((1, 64, 64, 3)), training=True, mutable=["batch_stats"])
    assert tr["dec_bboxes"].shape == (2, 1, 60, 4)
    img = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    r = y.predict(img, imgsz=64, conf=1e-6)[0]
    assert len(r) > 0  # sigmoid scores, no NMS: rows survive a tiny conf


def test_bilinear_sample_matches_manual():
    from lpc_yolo_tpu.nn.transformer import bilinear_sample

    v = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
    # center of pixel (1,2) in align_corners=False normalized coords
    gx = (2 + 0.5) / 4 * 2 - 1
    gy = (1 + 0.5) / 3 * 2 - 1
    out = bilinear_sample(v, jnp.asarray([[gx, gy]]))
    np.testing.assert_allclose(np.asarray(out)[0, 0], 6.0, atol=1e-5)
    # far outside -> zeros padding
    out = bilinear_sample(v, jnp.asarray([[-5.0, -5.0]]))
    np.testing.assert_allclose(np.asarray(out)[0, 0], 0.0)


@pytest.fixture(scope="module")
def cls_ds(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("clsds") / "cls"
    rng = np.random.RandomState(0)
    colors = {"red": (40, 40, 200), "green": (40, 200, 40)}
    for split, n in (("train", 6), ("val", 4)):
        for cname, col in colors.items():
            d = root / split / cname
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                img = np.clip(np.full((64, 64, 3), col, np.int16) + rng.randint(-20, 20, (64, 64, 3)), 0, 255)
                cv2.imwrite(str(d / f"{i}.jpg"), img.astype(np.uint8))
    return str(root)


def test_classify_dataset(cls_ds):
    from lpc_yolo_tpu.data import ClassificationDataset, check_cls_dataset

    info = check_cls_dataset(cls_ds)
    assert info["nc"] == 2 and info["names"] == {0: "green", 1: "red"}
    ds = ClassificationDataset(info["train"])
    assert len(ds) == 12
    item = ds.get_item_raw(0)
    assert item["label"] in (0, 1)


def test_classify_train_loop(cls_ds, tmp_path):
    m = YOLO(Path(__file__).resolve().parent / "assets" / "tiny-cls.yaml", nc=2)
    res = m.train(data=cls_ds, epochs=2, batch=4, imgsz=64, workers=0, save_dir=str(tmp_path / "run"))
    assert {"metrics/accuracy_top1", "metrics/accuracy_top5"} <= set(res)
    csv_text = (tmp_path / "run" / "results.csv").read_text()
    losses = [float(l.split(",")[1]) for l in csv_text.strip().splitlines()[1:]]
    assert losses[-1] < losses[0]  # CE decreases even in 2 tiny epochs


@pytest.mark.slow
def test_rtdetr_train_step(tmp_path):
    """RTDETR DETR-loss training: 1 epoch on synthetic data, losses finite.

    Slow-gated: the deformable-attention train-step compile alone costs
    ~4 min on the 1-vCPU runner; test_rtdetr_build_and_predict keeps the
    RT-DETR graph in the default suite and test_losses covers the DETR loss.
    """
    from lpc_yolo_tpu.data import make_synthetic_dataset

    y = make_synthetic_dataset(tmp_path / "ds", n_train=4, n_val=2, imgsz=64, nc=2)
    m = YOLO(str(_tiny_rtdetr_yaml(tmp_path, nc=2)), nc=2)
    res = m.train(data=y, epochs=1, batch=4, imgsz=64, workers=2, max_gt=8,
                  close_mosaic=0, save_dir=str(tmp_path / "run"))
    csv_text = (tmp_path / "run" / "results.csv").read_text()
    assert "train/giou" in csv_text


def test_hungarian_match_prefers_overlap():
    from lpc_yolo_tpu.losses.detr import hungarian_match

    # two queries, one gt exactly matching query 1
    pb = jnp.asarray([[[0.2, 0.2, 0.1, 0.1], [0.6, 0.6, 0.2, 0.2]]])
    logits = jnp.zeros((1, 2, 3))
    gtb = jnp.asarray([[[0.6, 0.6, 0.2, 0.2], [0, 0, 0, 0]]])
    gtc = jnp.asarray([[1, 0]], dtype=jnp.int32)
    mask = jnp.asarray([[True, False]])
    match = np.asarray(hungarian_match(pb, logits, gtb, gtc, mask))
    assert match[0, 0] == 1  # gt 0 matched to query 1
    assert match[0, 1] == -1  # padded gt unmatched


@pytest.fixture(scope="module")
def pose_ds(tmp_path_factory):
    import cv2
    import yaml

    tmp = tmp_path_factory.mktemp("poseds")
    rng = np.random.RandomState(0)
    imgsz = 96
    for split, n in (("train", 4), ("val", 2)):
        (tmp / "ds/images" / split).mkdir(parents=True, exist_ok=True)
        (tmp / "ds/labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.randint(90, 140, (imgsz, imgsz, 3), np.uint8)
            w = h = imgsz // 3
            x1 = y1 = imgsz // 4
            cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), (60, 60, 220), -1)
            kp = [(x1, y1), (x1 + w, y1), (x1 + w, y1 + h), (x1, y1 + h)]
            kps = " ".join(f"{x / imgsz:.4f} {y / imgsz:.4f} 2" for x, y in kp)
            row = f"0 {(x1 + w / 2) / imgsz:.4f} {(y1 + h / 2) / imgsz:.4f} {w / imgsz:.4f} {h / imgsz:.4f} {kps}"
            cv2.imwrite(str(tmp / "ds/images" / split / f"im{i}.jpg"), img)
            (tmp / "ds/labels" / split / f"im{i}.txt").write_text(row + "\n")
    (tmp / "ds/data.yaml").write_text(
        yaml.safe_dump({"path": str(tmp / "ds"), "train": "images/train", "val": "images/val",
                        "nc": 1, "names": {0: "box"}, "kpt_shape": [4, 3]})
    )
    pose_yaml = (Path(__file__).resolve().parent / "assets" / "tiny-pose.yaml").read_text().replace("kpt_shape: [17, 3]", "kpt_shape: [4, 3]")
    p = tmp / "pose.yaml"
    p.write_text(pose_yaml)
    return str(tmp / "ds/data.yaml"), str(p)


def test_pose_dataset_keypoints(pose_ds):
    from lpc_yolo_tpu.data import YOLODataset, check_det_dataset

    data_yaml, _ = pose_ds
    info = check_det_dataset(data_yaml)
    assert info["kpt_shape"] == (4, 3)
    ds = YOLODataset(info["train"], kpt_shape=info["kpt_shape"], cache=False)
    item = ds.get_item_raw(0)
    assert item["keypoints"].shape == (1, 4, 3)
    assert (item["keypoints"][..., 2] == 2).all()  # all visible


def test_pose_train_loop(pose_ds, tmp_path):
    data_yaml, model_yaml = pose_ds
    m = YOLO(model_yaml)
    assert m.task == "pose"
    m.train(data=data_yaml, epochs=1, batch=2, imgsz=64, workers=0, max_gt=4,
            close_mosaic=0, save_dir=str(tmp_path / "run"))
    header = (tmp_path / "run" / "results.csv").read_text().splitlines()[0]
    assert "train/pose" in header and "train/kobj" in header


def test_obb_train_loop(tmp_path):
    """OBB training: rotated TAL + probiou loss on synthetic rotated boxes."""
    import cv2
    import yaml

    rng = np.random.RandomState(0)
    imgsz = 96
    for split, n in (("train", 4), ("val", 2)):
        (tmp_path / "ds/images" / split).mkdir(parents=True, exist_ok=True)
        (tmp_path / "ds/labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.randint(90, 140, (imgsz, imgsz, 3), np.uint8)
            rect = cv2.boxPoints(((48.0, 48.0), (30.0, 16.0), 30.0))
            cv2.fillPoly(img, [rect.astype(np.int32)], (60, 60, 220))
            pts = " ".join(f"{p[0] / imgsz:.4f} {p[1] / imgsz:.4f}" for p in rect)
            cv2.imwrite(str(tmp_path / "ds/images" / split / f"im{i}.jpg"), img)
            (tmp_path / "ds/labels" / split / f"im{i}.txt").write_text(f"0 {pts}\n")
    (tmp_path / "ds/data.yaml").write_text(
        yaml.safe_dump({"path": str(tmp_path / "ds"), "train": "images/train",
                        "val": "images/val", "nc": 1, "names": {0: "obj"}})
    )
    m = YOLO(Path(__file__).resolve().parent / "assets" / "tiny-obb.yaml", nc=1)
    m.train(data=str(tmp_path / "ds/data.yaml"), epochs=1, batch=2, imgsz=64,
            workers=0, max_gt=4, close_mosaic=0, save_dir=str(tmp_path / "run"))
    assert "train/box" in (tmp_path / "run" / "results.csv").read_text()


def test_rotated_assigner_and_probiou():
    from lpc_yolo_tpu.losses import task_aligned_assigner
    from lpc_yolo_tpu.ops import make_anchors
    from lpc_yolo_tpu.ops.boxes import probiou, xywhr2xyxyxyxy

    # probiou basics (jnp version)
    a = jnp.asarray([[50.0, 50.0, 20.0, 10.0, 0.0]])
    assert float(probiou(a, a)[0]) > 0.99
    rot = a.at[0, 4].set(np.pi / 2)
    assert float(probiou(a, rot)[0]) < 0.99

    # corners of an axis-aligned rbox
    c = np.asarray(xywhr2xyxyxyxy(a))[0]
    assert sorted(map(tuple, np.round(c))) == sorted(
        [(60.0, 55.0), (60.0, 45.0), (40.0, 45.0), (40.0, 55.0)]
    )

    # rotated assigner: a gt centered on anchors gets fg anchors
    pts, strides = make_anchors([(8, 8), (4, 4), (2, 2)], [8, 16, 32])
    A = pts.shape[0]
    rng = np.random.RandomState(0)
    pd_scores = jnp.asarray(rng.rand(1, A, 2).astype(np.float32)) * 0.5
    pd_rb = jnp.concatenate(
        [jnp.asarray(rng.rand(1, A, 2).astype(np.float32)) * 64,
         jnp.full((1, A, 2), 16.0), jnp.zeros((1, A, 1))], -1
    )
    gt = jnp.asarray([[[32.0, 32.0, 24.0, 12.0, 0.5], [0, 0, 0, 0, 0]]])
    res = task_aligned_assigner(
        pd_scores, pd_rb, pts * strides, jnp.zeros((1, 2), jnp.int32), gt,
        jnp.asarray([[True, False]]), topk=10, num_classes=2, rotated=True,
    )
    assert bool(res.fg_mask.any())
    assert res.target_bboxes.shape[-1] == 5


def test_pose_val_oks_map(pose_ds):
    """Validator on a pose model reports OKS mAP keys ((P) suffix) —
    reference PoseMetrics semantics."""
    data_yaml, model_yaml = pose_ds
    m = YOLO(model_yaml)
    res = m.val(data=data_yaml, imgsz=96, batch=2, conf=0.001)
    assert "metrics/mAP50-95(B)" in res
    assert "metrics/mAP50-95(P)" in res and "metrics/mAP50(P)" in res
    assert np.isfinite(res["metrics/mAP50-95(P)"])


def test_obb_val_rotated_matching(tmp_path):
    """OBB validation matches with rotated probIoU (reference obb/val.py),
    not the axis-aligned hull."""
    import cv2
    import yaml

    rng = np.random.RandomState(0)
    imgsz = 96
    (tmp_path / "ds/images/val").mkdir(parents=True, exist_ok=True)
    (tmp_path / "ds/labels/val").mkdir(parents=True, exist_ok=True)
    for i in range(2):
        img = rng.randint(90, 140, (imgsz, imgsz, 3), np.uint8)
        rect = cv2.boxPoints(((48.0, 48.0), (30.0, 16.0), 30.0))
        cv2.fillPoly(img, [rect.astype(np.int32)], (60, 60, 220))
        pts = " ".join(f"{p[0] / imgsz:.4f} {p[1] / imgsz:.4f}" for p in rect)
        cv2.imwrite(str(tmp_path / "ds/images/val" / f"im{i}.jpg"), img)
        (tmp_path / "ds/labels/val" / f"im{i}.txt").write_text(f"0 {pts}\n")
    (tmp_path / "ds/data.yaml").write_text(
        yaml.safe_dump({"path": str(tmp_path / "ds"), "val": "images/val",
                        "nc": 1, "names": {0: "obj"}})
    )
    m = YOLO(Path(__file__).resolve().parent / "assets" / "tiny-obb.yaml", nc=1)
    res = m.val(data=str(tmp_path / "ds/data.yaml"), imgsz=96, batch=2, conf=0.001)
    assert "metrics/mAP50-95(B)" in res
    assert np.isfinite(res["metrics/mAP50-95(B)"])

"""Tests for infra utils, solutions, converter, autobackend, distributed helpers."""

import json
from pathlib import Path

import numpy as np
import pytest

from lpc_yolo_tpu.data.converter import coco91_to_coco80_class, convert_coco, verify_dataset
from lpc_yolo_tpu.engine.results import Results
from lpc_yolo_tpu.solutions import Heatmap, ObjectCounter, SpeedEstimator
from lpc_yolo_tpu.utils.infra import SettingsManager, ThreadingLocked, TryExcept, retry, threaded


def _tracked_frame(t, img_shape=(240, 320, 3)):
    img = np.zeros(img_shape, np.uint8)
    # one object moving right, id 1
    det = np.array([[40 + 20 * t, 100, 90 + 20 * t, 150, 1, 0.9, 0]], np.float32)
    return Results(img, f"f{t}", {0: "car"}, boxes=det)


def test_object_counter_line_crossing():
    counter = ObjectCounter(region=[(160, 0), (160, 240)], names={0: "car"})
    for t in range(8):
        counter.update(_tracked_frame(t))
    assert counter.in_count + counter.out_count == 1
    assert counter.class_counts["car"]["in"] + counter.class_counts["car"]["out"] == 1
    im = counter.annotate(np.zeros((240, 320, 3), np.uint8))
    assert im.shape == (240, 320, 3)


def test_heatmap_accumulates():
    hm = Heatmap((240, 320))
    for t in range(4):
        hm.update(_tracked_frame(t))
    assert hm.acc.max() > 0
    assert hm.render().shape == (240, 320, 3)


def test_object_counter_region_move():
    """set_region (headless twin of the reference's mouse-drag editing,
    object_counter.py:128-160): counts survive the move, the move itself
    never registers a crossing, and crossings after the move are judged
    against the NEW geometry."""
    counter = ObjectCounter(region=[(160, 0), (160, 240)], names={0: "car"})
    for t in range(8):  # crosses x=160 -> 1 count
        counter.update(_tracked_frame(t))
    assert counter.in_count + counter.out_count == 1
    counter.set_region([(1000, 0), (1000, 240)])  # move far right of the track
    assert counter.in_count + counter.out_count == 1  # move kept the tally
    for t in range(8, 12):  # keeps moving right but never reaches x=1000
        counter.update(_tracked_frame(t))
    assert counter.in_count + counter.out_count == 1  # no spurious crossing


def test_heatmap_shapes():
    """Reference set_args shape semantics (heatmap.py:92-156): 'rect' heats
    the whole box, 'circle' only the inscribed circle — so the box corners
    stay cold under circle and hot under rect."""
    rect = Heatmap((240, 320), heat_shape="rect")
    circ = Heatmap((240, 320), heat_shape="circle")
    frame = _tracked_frame(0)  # box (40,100)-(90,150)
    rect.update(frame)
    circ.update(frame)
    assert rect.acc[101, 41] > 0 and rect.acc[124, 64] > 0  # corner + center
    assert circ.acc[101, 41] == 0 and circ.acc[124, 64] > 0  # corner cold
    assert Heatmap((240, 320), heat_shape="bogus").heat_shape == "circle"


def test_heatmap_region_counts():
    """In/out counting against a 4-point region (heatmap.py:210-218): a track
    entering the region counts once; attribution by box-x1 vs centroid-x."""
    hm = Heatmap((240, 320), count_reg_pts=[(150, 80), (260, 80), (260, 170), (150, 170)])
    for t in range(8):  # moves right into the region
        hm.update(_tracked_frame(t))
    assert hm.in_counts + hm.out_counts == 1
    for t in range(8, 10):  # still inside — counted_ids dedups
        hm.update(_tracked_frame(t))
    assert hm.in_counts + hm.out_counts == 1
    out = hm.render(np.zeros((240, 320, 3), np.uint8))
    assert out.shape == (240, 320, 3)


def test_heatmap_line_counts():
    """2-point line counter with line_dist_thresh (heatmap.py:219-224)."""
    hm = Heatmap((240, 320), count_reg_pts=[(160, 0), (160, 240)])
    for t in range(8):
        hm.update(_tracked_frame(t))
    assert hm.in_counts + hm.out_counts == 1


def test_speed_estimator():
    se = SpeedEstimator(fps=30, pixels_per_meter=10)
    speeds = {}
    for t in range(5):
        speeds = se.update(_tracked_frame(t))
    # 20 px/frame at 30 fps, 10 px/m -> 2 m/frame... 60 m/s = 216 km/h
    assert 1 in speeds and speeds[1] > 0


def test_coco_converter(tmp_path):
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 100, "width": 200}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [20, 10, 40, 30], "iscrowd": 0},
            {"image_id": 1, "category_id": 3, "bbox": [0, 0, 10, 10], "iscrowd": 0},
        ],
    }
    j = tmp_path / "instances.json"
    j.write_text(json.dumps(coco))
    out = convert_coco(str(j), str(tmp_path / "labels"))
    rows = (Path(out) / "a.txt").read_text().strip().splitlines()
    assert len(rows) == 2
    c, cx, cy, w, h = map(float, rows[0].split())
    assert c == 0 and abs(cx - 0.2) < 1e-6 and abs(cy - 0.25) < 1e-6


def test_coco91_map():
    m = coco91_to_coco80_class()
    assert m[0] == 0  # person
    assert m[11] is None  # street sign (removed id 12)
    assert sum(v is not None for v in m) == 80


def test_verify_dataset(tmp_path):
    from lpc_yolo_tpu.data import make_synthetic_dataset

    y = make_synthetic_dataset(tmp_path / "ds", n_train=4, n_val=2, imgsz=64, nc=2)
    rep = verify_dataset(y)
    assert rep["splits"]["train"]["images"] == 4
    assert rep["splits"]["train"]["bad_labels"] == 0
    assert sum(rep["splits"]["train"]["class_histogram"]) == rep["splits"]["train"]["boxes"]


def test_settings_manager(tmp_path):
    f = tmp_path / "settings.yaml"
    s = SettingsManager(file=f)
    assert f.exists()
    s.update({"tensorboard": False})
    s2 = SettingsManager(file=f)
    assert s2["tensorboard"] is False
    s2.reset()
    assert SettingsManager(file=f)["tensorboard"] is True


def test_guards():
    @TryExcept("handled")
    def boom():
        raise RuntimeError("x")

    boom()  # swallowed

    calls = []

    @retry(times=3, delay=0.01)
    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise ValueError("try again")
        return "ok"

    assert flaky() == "ok" and len(calls) == 2

    lock = ThreadingLocked()

    @lock
    def critical():
        return 42

    assert critical() == 42

    t = threaded(lambda: None)()
    t.join(timeout=2)


def test_autobackend_stablehlo(tmp_path):
    from lpc_yolo_tpu import YOLO
    from lpc_yolo_tpu.engine.exporter import export_model
    from lpc_yolo_tpu.nn.autobackend import AutoBackend

    y = YOLO("yolov10n.yaml", nc=3)
    path = export_model(y, fmt="stablehlo", imgsz=64, out_dir=tmp_path)
    be = AutoBackend(path, imgsz=64)
    be.warmup()
    out = be(np.zeros((1, 64, 64, 3), np.float32))
    assert out.shape == (1, 300, 6)
    with pytest.raises(ValueError):
        AutoBackend("weights.xyz")


def test_distributed_single_host():
    from lpc_yolo_tpu.parallel.distributed import (
        broadcast_scalar,
        is_main_process,
        main_process_first,
        process_count,
    )

    assert process_count() == 1 and is_main_process()
    assert broadcast_scalar(3.5) == 3.5
    with main_process_first():
        pass


def test_distance_and_gym():
    from lpc_yolo_tpu.solutions import AIGym, DistanceCalculation

    # two tracked objects, fixed positions
    img = np.zeros((240, 320, 3), np.uint8)
    det = np.array(
        [[40, 100, 90, 150, 1, 0.9, 0], [200, 100, 250, 150, 2, 0.9, 0]], np.float32
    )
    r = Results(img, "f", {0: "p"}, boxes=det)
    dc = DistanceCalculation(pixels_per_meter=10)
    d = dc.update(r)
    assert abs(d[(1, 2)] - 16.0) < 1e-5  # 160 px / 10 ppm

    gym = AIGym(kpt_indices=(0, 1, 2))
    def pose_frame(angle_deg):
        kp = np.zeros((1, 3, 3), np.float32)
        kp[0, 0, :2] = [0, 0]
        kp[0, 1, :2] = [10, 0]
        # place c so that the angle at joint b (between b->a and b->c) is angle_deg
        a = np.radians(180 - angle_deg)
        kp[0, 2, :2] = [10 + 10 * np.cos(a), 10 * np.sin(a)]
        rr = Results(img, "f", {0: "p"}, boxes=det[:1])
        rr.keypoints = kp
        return rr
    for ang in (170, 60, 170, 60, 170):  # two full reps
        counts = gym.update(pose_frame(ang))
    assert counts.get(1, 0) == 2


def test_probiou():
    from lpc_yolo_tpu.utils.metrics import probiou_np

    a = np.array([[50, 50, 20, 10, 0.0]], np.float32)
    same = probiou_np(a, a)
    assert same[0] > 0.99
    rot = np.array([[50, 50, 20, 10, np.pi / 2]], np.float32)
    far = np.array([[150, 150, 20, 10, 0.0]], np.float32)
    assert probiou_np(a, rot)[0] < same[0]
    assert probiou_np(a, far)[0] < 0.1


def test_run_ray_tune_offline_fallback():
    """run_ray_tune falls back to local successive halving without ray."""
    from lpc_yolo_tpu.utils.tuner import DEFAULT_SPACE, run_ray_tune

    calls = []

    class FakeYolo:
        def train(self, data=None, epochs=1, hyp=None, **kw):
            calls.append((epochs, dict(hyp)))
            # fitness peaks when lr0 is high: makes the ranking deterministic
            return {"fitness": hyp["lr0"]}

    out = run_ray_tune(lambda: FakeYolo(), data="d.yaml", max_samples=4, grace_period=2, epochs=4)
    assert set(out) == {"best_hyp", "best_fitness", "trials"}
    assert out["trials"] == 4
    assert set(out["best_hyp"]) == set(DEFAULT_SPACE)
    short = [c for c in calls if c[0] == 2]
    full = [c for c in calls if c[0] == 4]
    assert len(short) == 4 and len(full) == 2  # halving kept the top half
    lr0s = [h["lr0"] for _, h in short]
    assert abs(out["best_fitness"] - max(lr0s)) < 1e-12


def test_annotator_masks_kpts_rotated():
    """Annotator renders masks (alpha composite), pose keypoints with the
    COCO skeleton, and rotated polygons (reference plotting.py:99-335)."""
    import numpy as np

    from lpc_yolo_tpu.utils.plotting import Annotator, colors

    im = np.zeros((96, 96, 3), np.uint8)
    ann = Annotator(im)
    mask = np.zeros((48, 48), np.float32)
    mask[8:20, 8:20] = 1.0
    ann.masks(np.stack([mask]), [colors(0, bgr=True)])
    assert ann.im[24, 24].sum() > 0  # blended color where the mask is
    assert ann.im[90, 90].sum() == 0  # untouched elsewhere

    kpts = np.zeros((17, 3), np.float32)
    kpts[:, 0] = np.linspace(10, 80, 17)
    kpts[:, 1] = np.linspace(10, 80, 17)
    kpts[:, 2] = 1.0
    ann.kpts(kpts)

    ann.box_label(np.array([10, 10, 30, 10, 30, 30, 10, 30]), "obb 0.9",
                  color=colors(1, bgr=True), rotated=True)
    ann.box_label([40, 40, 70, 70], "box 0.8", color=colors(2, bgr=True))
    out = ann.result()
    assert out.shape == (96, 96, 3) and out.dtype == np.uint8


def test_results_plot_with_masks_and_kpts():
    import numpy as np

    from lpc_yolo_tpu.engine.results import Results

    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[5, 5, 30, 30, 0.9, 0]], np.float32)
    mask = np.zeros((1, 32, 32), np.float32)
    mask[0, 4:12, 4:12] = 1.0
    kpts = np.zeros((1, 17, 3), np.float32)
    kpts[0, :, 0] = 16
    kpts[0, :, 1] = np.linspace(6, 28, 17)
    kpts[0, :, 2] = 1.0
    r = Results(img, "x.jpg", {0: "person"}, boxes=boxes, masks=mask, keypoints=kpts)
    out = r.plot()
    assert out.shape == img.shape and out.sum() > 0


def test_results_summary_tojson_verbose():
    """summary/tojson/verbose/new/Probs accessors (reference Results API:
    engine/results.py summary:390, tojson:420, verbose:330, Probs:585)."""
    import json as _json

    import numpy as np

    from lpc_yolo_tpu.engine.results import Probs, Results

    img = np.zeros((64, 128, 3), np.uint8)
    boxes = np.array(
        [[8, 8, 32, 32, 0.9, 0], [10, 10, 20, 20, 0.8, 0], [4, 4, 8, 8, 0.7, 1]],
        np.float32,
    )
    kpts = np.zeros((3, 17, 3), np.float32)
    r = Results(img, "x.jpg", {0: "person", 1: "car"}, boxes=boxes, keypoints=kpts)
    rows = r.summary()
    assert len(rows) == 3 and rows[0]["name"] == "person"
    assert set(rows[0]["box"]) == {"x1", "y1", "x2", "y2"}
    assert "visible" in rows[0]["keypoints"]
    norm = r.summary(normalize=True)
    assert norm[0]["box"]["x2"] == 32 / 128 and norm[0]["box"]["y2"] == 32 / 64
    assert _json.loads(r.tojson())[1]["confidence"] == 0.8
    assert r.verbose() == "2 persons, 1 car, "
    assert len(r.new()) == 0 and r.new().path == "x.jpg"
    assert r.cuda() is r and r.to("cpu") is r

    p = Probs(np.array([0.1, 0.6, 0.3], np.float32))
    assert p.top1 == 1 and p.top5 == [1, 2, 0]
    assert abs(p.top1conf - 0.6) < 1e-6
    rc = Results(img, "x.jpg", {1: "cat"}, probs=np.array([0.1, 0.9]))
    assert rc.summary() == [{"name": "cat", "class": 1, "confidence": 0.9}]
    assert rc.verbose().startswith("cat 0.90")


def test_obb_xyxyxyxyn():
    import numpy as np

    from lpc_yolo_tpu.engine.results import OBBoxes

    rb = np.array([[32, 16, 20, 10, 0.0, 0.9, 0]], np.float32)
    ob = OBBoxes(rb, (64, 128))
    n = ob.xyxyxyxyn
    assert n.shape == (1, 4, 2)
    np.testing.assert_allclose(sorted(np.unique(n[0, :, 0])), [22 / 128, 42 / 128], atol=1e-6)
    np.testing.assert_allclose(sorted(np.unique(n[0, :, 1])), [11 / 64, 21 / 64], atol=1e-6)


def test_hub_dataset_stats(tmp_path):
    """HUBDatasetStats: per-split instance/image stats + rounded labels +
    compressed previews (reference data/utils.py:424-585)."""
    import json

    import cv2
    import numpy as np
    import yaml

    from lpc_yolo_tpu.data import HUBDatasetStats

    root = tmp_path / "ds"
    (root / "images" / "val").mkdir(parents=True)
    (root / "labels" / "val").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(root / "images" / "val" / f"{i}.jpg"),
                    (rng.rand(40, 40, 3) * 255).astype(np.uint8))
        lines = [f"{i % 2} 0.5 0.5 0.25 0.25"] if i < 2 else []
        (root / "labels" / "val" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump({"path": str(root), "val": "images/val", "nc": 2,
                                   "names": {0: "a", 1: "b"}}))
    st = HUBDatasetStats(str(yml))
    out = st.get_json(save=True)
    assert out["nc"] == 2 and out["names"] == ["a", "b"]
    v = out["val"]
    assert v["instance_stats"]["total"] == 2
    assert v["instance_stats"]["per_class"] == [1, 1]
    assert v["image_stats"]["total"] == 3 and v["image_stats"]["unlabelled"] == 1
    assert any("0.jpg" in d for d in v["labels"])
    saved = json.loads((st.hub_dir / "stats.json").read_text())
    assert saved["nc"] == 2
    st.process_images()
    assert (st.im_dir / "0.jpg").exists()


def test_sliced_inference_grid_and_merge():
    """slice_grid covers the frame; sliced_predict merges tile detections."""
    import numpy as np

    from lpc_yolo_tpu.solutions import slice_grid, sliced_predict
    from lpc_yolo_tpu.solutions.sliced_inference import _nms_classwise

    g = slice_grid(100, 160, 64, 0.25)
    assert (0, 0) in g
    ys = {y for y, _ in g}
    xs = {x for _, x in g}
    assert max(ys) + 64 >= 100 and max(xs) + 64 >= 160  # full coverage

    # duplicate boxes from overlapping tiles dedupe to one per class
    dets = np.array([
        [10, 10, 30, 30, 0.9, 1],
        [11, 11, 31, 31, 0.8, 1],   # duplicate (same class, IoU > .45)
        [10, 10, 30, 30, 0.7, 2],   # different class survives
    ], np.float32)
    keep = _nms_classwise(dets, 0.45)
    assert sorted(dets[keep][:, 5].tolist()) == [1.0, 2.0]

    class _FakeResults:
        def __init__(self, data):
            import types
            self.boxes = types.SimpleNamespace(data=data)

    class _FakeYOLO:
        def predict(self, tiles, **kw):
            out = []
            for t in tiles:
                # one box in the tile's top-left corner
                out.append(_FakeResults(np.array([[2, 2, 12, 12, 0.9, 0]], np.float32)))
            return out

    img = np.zeros((100, 160, 3), np.uint8)
    dets = sliced_predict(_FakeYOLO(), img, tile=64, overlap=0.25)
    assert dets.shape[1] == 6 and len(dets) >= 1
    assert np.isfinite(dets).all()


def test_results_save_crop_and_masks_container(tmp_path):
    """Results.save_crop writes per-class crops; Masks exposes polygons and
    duck-types ndarray for existing consumers."""
    import numpy as np

    from lpc_yolo_tpu.engine.results import Masks, Results

    img = np.zeros((64, 64, 3), np.uint8)
    img[:] = 100
    boxes = np.array([[8, 8, 24, 24, 0.9, 0], [30, 30, 50, 60, 0.8, 1]], np.float32)
    mask = np.zeros((2, 32, 32), np.float32)
    mask[0, 4:12, 4:12] = 1.0
    r = Results(img, "x.jpg", {0: "cat", 1: "dog"}, boxes=boxes, masks=mask)

    r.save_crop(tmp_path, "crop.jpg")
    assert (tmp_path / "cat" / "crop.jpg").exists()
    assert (tmp_path / "dog" / "crop.jpg").exists()
    r.save_crop(tmp_path, "crop.jpg")  # second save increments, no overwrite
    assert (tmp_path / "cat" / "crop1.jpg").exists()

    m = r.masks
    assert isinstance(m, Masks)
    assert m.shape == (2, 32, 32) and len(m) == 2
    assert np.asarray(m).shape == (2, 32, 32)  # __array__ duck-typing
    assert isinstance(m[0], np.ndarray)  # int index -> raw mask
    polys = m.xy
    assert len(polys) == 2 and polys[0].shape[1] == 2
    assert polys[0][:, 0].max() <= 64  # scaled to orig frame
    assert m.xyn[0][:, 0].max() <= 1.0 + 1e-6

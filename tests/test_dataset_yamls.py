"""Bundled dataset-config family (the reference's third YAML family,
cfg/datasets/* — SURVEY §5 'Config / flag system').

check_det_dataset must resolve bare names ('coco8.yaml') against the bundled
family, resolve a bundled config's relative `path:` against the persisted
settings datasets_dir (the reference's DATASETS_DIR semantics,
data/utils.py:251), and accept list-valued splits (VOC.yaml's train list).
"""

from pathlib import Path

import pytest
import yaml

from lpc_yolo_tpu.data.dataset import YOLODataset, check_det_dataset

DATASETS_DIR = Path(__file__).parent.parent / "lpc_yolo_tpu" / "cfg" / "datasets"

# name -> (nc, a class name that must be present)
EXPECTED = {
    "coco8.yaml": (80, "person"),
    "coco.yaml": (80, "toothbrush"),
    "coco128.yaml": (80, "zebra"),
    "VOC.yaml": (20, "aeroplane"),
    "dota8.yaml": (15, "plane"),
    "DOTAv1.yaml": (15, "harbor"),
    "Objects365.yaml": (365, "Person"),
    "ImageNet.yaml": (1000, "tench"),
    "open-images-v7.yaml": (601, "Accordion"),
    "VisDrone.yaml": (10, "pedestrian"),
}


def test_family_complete():
    """All 25 reference dataset configs ship (reference cfg/datasets/*)."""
    names = sorted(p.name for p in DATASETS_DIR.glob("*.yaml"))
    assert len(names) == 25
    for required in EXPECTED:
        assert required in names


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_bare_name_resolves(name):
    info = check_det_dataset(name)
    nc, expect_cls = EXPECTED[name]
    assert info["nc"] == nc
    assert expect_cls in info["names"].values()
    # bundled relative path resolves under settings datasets_dir, not the package
    assert "lpc_yolo_tpu" not in info["path"]


def test_pose_configs_carry_kpt_shape():
    for name in ("coco8-pose.yaml", "coco-pose.yaml", "tiger-pose.yaml"):
        info = check_det_dataset(name)
        assert tuple(info["kpt_shape"]) == (17, 3) or len(info["kpt_shape"]) == 2
    info = check_det_dataset("coco8-pose.yaml")
    assert info["kpt_shape"] == (17, 3) and len(info["flip_idx"]) == 17


def test_list_splits_resolve_and_scan(tmp_path):
    """VOC-style list-valued train splits: resolution + dataset scanning."""
    import cv2
    import numpy as np

    for sub in ("images/a", "images/b", "labels/a", "labels/b"):
        (tmp_path / sub).mkdir(parents=True)
    for split, n in (("a", 2), ("b", 3)):
        for i in range(n):
            cv2.imwrite(str(tmp_path / "images" / split / f"{i}.jpg"),
                        np.zeros((32, 32, 3), np.uint8))
            (tmp_path / "labels" / split / f"{i}.txt").write_text("0 0.5 0.5 0.5 0.5\n")
    yml = tmp_path / "data.yaml"
    yml.write_text(yaml.safe_dump({
        "path": ".", "train": ["images/a", "images/b"], "val": "images/a",
        "names": {0: "thing"},
    }))
    info = check_det_dataset(str(yml))
    assert isinstance(info["train"], list) and len(info["train"]) == 2
    ds = YOLODataset(info["train"], imgsz=32, names=info["names"], cache=False)
    assert len(ds) == 5


def test_download_recipes_recorded():
    """Bundled configs carry the source URLs (zero-egress: recorded, not run)."""
    d = yaml.safe_load((DATASETS_DIR / "coco8.yaml").read_text())
    assert any(str(u).startswith("http") for u in d["download"])

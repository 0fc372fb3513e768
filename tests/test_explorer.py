"""Explorer, checks, and hub-shim tests (reference tests/test_explorer.py strategy)."""

import numpy as np
import pytest

from lpc_yolo_tpu.utils.checks import check_bf16, check_imgsz, check_version


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    from lpc_yolo_tpu.data import make_synthetic_dataset

    root = tmp_path_factory.mktemp("expds")
    return make_synthetic_dataset(root / "ds", n_train=6, n_val=2, imgsz=96, nc=2)


def test_explorer_similarity(ds):
    from lpc_yolo_tpu.data.explorer import Explorer

    ex = Explorer(ds, imgsz=96)
    emb = ex.create_embeddings_table()
    assert emb.shape[0] == 6
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    sim = ex.get_similar(0, limit=3)
    assert sim[0]["idx"] == 0 and sim[0]["similarity"] > 0.999
    idx = ex.similarity_index(top_k=2, sim_thres=0.5)
    assert len(idx) == 6
    rows = ex.query(lambda r: (r["cls"] == 0).any())
    assert all((r["cls"] == 0).any() for r in rows)


def test_checks():
    assert check_imgsz(639) == 640
    assert check_imgsz([100, 200]) == [128, 224]
    assert check_version("2.1.0", "2.0.0")
    assert not check_version("1.9", "2.0.0")
    with pytest.raises(AssertionError):
        check_version("1.0", "2.0", hard=True)
    assert check_bf16() in (True, False)


def test_hub_session():
    """Offline-default session queues locally; full HTTP transport behavior
    is covered against a loopback server in tests/test_hub.py."""
    from lpc_yolo_tpu.hub import HUBTrainingSession, login

    assert not login().authenticated and login("k").authenticated
    s = HUBTrainingSession("m2")  # zero-egress default: offline, queues persist
    assert s.offline
    s.upload_metrics(1, {"fitness": 0.1})
    assert 1 in s.metrics_queue
    s.upload_model(1, "w.ckpt", is_best=True)
    assert s.uploaded[0]["best"] is True


def test_explorer_dashboard(ds):
    """The stdlib-HTTP dashboard serves the reference dash.py operations
    (grid rows, SQL form, similarity search, thumbnails) over loopback."""
    import json
    from urllib.request import urlopen

    from lpc_yolo_tpu.data.explorer import Explorer
    from lpc_yolo_tpu.data.explorer_gui import ExplorerDash

    dash = ExplorerDash(Explorer(ds, imgsz=96))
    port = dash.start(port=0)
    base = f"http://127.0.0.1:{port}"
    try:
        page = urlopen(f"{base}/").read().decode()
        assert "Explorer" in page and "/api/sql" in page

        info = json.load(urlopen(f"{base}/api/info"))
        assert info["total"] == 6 and info["names"]

        grid = json.load(urlopen(f"{base}/api/images?limit=3"))
        assert grid["total"] == 6 and len(grid["rows"]) == 3
        assert grid["rows"][0]["idx"] == 0 and grid["rows"][0]["im_file"]

        rows = json.load(urlopen(f"{base}/api/sql?q=SELECT%20*%20FROM%20'table'%20LIMIT%202"))["rows"]
        assert len(rows) == 2 and rows[0]["idx"] == 0

        err = json.load(urlopen(f"{base}/api/sql?q=DROP%20TABLE"))
        assert "error" in err

        jpg = urlopen(f"{base}/img/0").read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic

        sim = json.load(urlopen(f"{base}/api/similar?idx=0&limit=3"))["rows"]
        assert sim[0]["idx"] == 0 and sim[0]["similarity"] > 0.999 and sim[0]["labels"] is not None
        prog = json.load(urlopen(f"{base}/api/progress"))
        assert prog["progress"] == 1.0
    finally:
        dash.stop()


def test_explorer_sql_query(tmp_path):
    """sql_query evaluates the reference's documented SQL grammar
    (explorer.py:173) without duckdb: LIKE over label names, numeric
    comparisons, AND/OR, LIMIT."""
    import cv2
    import numpy as np
    import yaml

    from lpc_yolo_tpu.data.explorer import Explorer

    root = tmp_path / "ds"
    (root / "images" / "val").mkdir(parents=True)
    (root / "labels" / "val").mkdir(parents=True)
    rng = np.random.RandomState(0)
    labels = [["0 0.5 0.5 0.2 0.2", "1 0.3 0.3 0.1 0.1"], ["1 0.5 0.5 0.2 0.2"], []]
    for i, lns in enumerate(labels):
        cv2.imwrite(str(root / "images" / "val" / f"{i}.jpg"),
                    (rng.rand(32, 32, 3) * 255).astype(np.uint8))
        (root / "labels" / "val" / f"{i}.txt").write_text("\n".join(lns) + "\n")
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump({"path": str(root), "val": "images/val", "nc": 2,
                                   "names": {0: "person", 1: "car"}}))
    ex = Explorer(str(yml))

    rows = ex.sql_query("SELECT * FROM 'table' WHERE labels LIKE '%person%'")
    assert len(rows) == 1 and rows[0]["im_file"].endswith("0.jpg")

    rows = ex.sql_query("SELECT * FROM 'table' WHERE labels LIKE '%car%' AND n_labels >= 2")
    assert len(rows) == 1 and "person" in rows[0]["labels"]

    rows = ex.sql_query("SELECT * FROM 'table' WHERE n_labels = 0 OR labels LIKE '%car%'")
    assert len(rows) == 3

    rows = ex.sql_query("SELECT * FROM 'table' LIMIT 2")
    assert len(rows) == 2

    rows = ex.sql_query("SELECT * FROM 'table' WHERE (cls = 0 AND n_labels > 1) OR n_labels = 0")
    assert len(rows) == 2

"""CLI + flag-system tests (mirrors reference tests/test_cli.py strategy but
in-process for speed; one subprocess test guards the real `python -m` path).
"""

import os
import subprocess
import sys

import pytest

from lpc_yolo_tpu.cfg import (
    DEFAULT_CFG_DICT,
    check_cfg,
    check_dict_alignment,
    entrypoint,
    get_cfg,
    merge_equals_args,
)


def test_default_cfg_keys():
    # the reference's flat namespace: all main sections present
    for k in ("task", "mode", "epochs", "batch", "imgsz", "lr0", "mosaic", "conf", "iou", "format"):
        assert k in DEFAULT_CFG_DICT


def test_merge_equals_args():
    assert merge_equals_args(["k", "=", "v"]) == ["k=v"]
    assert merge_equals_args(["k=", "v"]) == ["k=v"]
    assert merge_equals_args(["k", "=v"]) == ["k=v"]
    assert merge_equals_args(["k=v", "a=b"]) == ["k=v", "a=b"]


def test_get_cfg_type_validation():
    cfg = get_cfg(overrides={"epochs": "7", "lr0": "0.02", "save": "false"})
    assert cfg.epochs == 7 and abs(cfg.lr0 - 0.02) < 1e-9 and cfg.save is False
    with pytest.raises(ValueError):
        get_cfg(overrides={"mosaic": 2.0})  # fraction key out of range
    with pytest.raises(SyntaxError) as ei:
        get_cfg(overrides={"epohcs": 3})
    assert "epochs" in str(ei.value)  # fuzzy suggestion


def test_entrypoint_special_modes(capsys):
    entrypoint(["version"])
    out = capsys.readouterr().out
    assert out.strip()
    entrypoint(["cfg"])
    assert "epochs" in capsys.readouterr().out
    entrypoint(["help"])
    assert "usage" in capsys.readouterr().out.lower()


def test_entrypoint_task_default_models():
    from lpc_yolo_tpu.cfg import entrypoint as ep  # noqa: F401 — import sanity

    with pytest.raises(SyntaxError):
        entrypoint(["detect", "train", "bogus_key=1"])


def test_settings_update_and_reset(tmp_path, capsys, monkeypatch):
    """`yolo settings k=v` persists; `yolo settings reset` restores defaults
    (reference cfg/__init__.py:379 handle_yolo_settings)."""
    import lpc_yolo_tpu
    from lpc_yolo_tpu.utils.infra import SettingsManager

    s = SettingsManager(tmp_path / "cfg" / "settings.yaml")
    monkeypatch.setattr(lpc_yolo_tpu, "settings", s, raising=False)
    entrypoint(["settings", "tensorboard=false"])
    assert s["tensorboard"] is False
    assert "tensorboard" in capsys.readouterr().out
    # unknown key -> fuzzy rejection
    with pytest.raises(SyntaxError):
        entrypoint(["settings", "tensorbard=true"])
    entrypoint(["settings", "reset"])
    assert s["tensorboard"] is True


def test_login_logout_persist_key(tmp_path, capsys, monkeypatch):
    import lpc_yolo_tpu
    from lpc_yolo_tpu.utils.infra import SettingsManager

    s = SettingsManager(tmp_path / "cfg" / "settings.yaml")
    monkeypatch.setattr(lpc_yolo_tpu, "settings", s, raising=False)
    entrypoint(["login", "test-key-123"])
    assert s["api_key"] == "test-key-123"
    entrypoint(["logout"])
    assert s["api_key"] == ""
    capsys.readouterr()


def test_copy_cfg(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    entrypoint(["copy-cfg"])
    copies = list(tmp_path.glob("*_copy.yaml"))
    assert len(copies) == 1
    import yaml

    assert "epochs" in yaml.safe_load(copies[0].read_text())
    capsys.readouterr()


def test_module_invocation_subprocess():
    # pin the subprocess to CPU: it doesn't load conftest, and grabbing the
    # (possibly busy) real TPU makes this test minutes-slow and flaky
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, "-m", "lpc_yolo_tpu", "version"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0
    assert out.stdout.strip()

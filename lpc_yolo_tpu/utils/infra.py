"""Cross-cutting infra: logger, persisted settings, env detection, guard
decorators.

Behavioral spec: reference ultralytics/utils/__init__.py — LOGGER setup
(:232-271), SettingsManager persisted yaml (:906-1020), env detection
(:400-462), TryExcept/Retry/threaded/ThreadingLocked (:281,723,756,815).
"""

from __future__ import annotations

import logging
import os
import threading
import time
from functools import wraps
from pathlib import Path
from typing import Callable

import yaml

LOGGING_NAME = "lpc_yolo_tpu"


def set_logging(name: str = LOGGING_NAME, verbose: bool = True) -> logging.Logger:
    level = logging.INFO if verbose else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(message)s"))
        h.setLevel(level)
        logger.addHandler(h)
    logger.propagate = False
    return logger


LOGGER = set_logging()


def is_colab() -> bool:
    return "COLAB_RELEASE_TAG" in os.environ or "COLAB_BACKEND_VERSION" in os.environ


def is_kaggle() -> bool:
    return os.environ.get("PWD") == "/kaggle/working"


def is_docker() -> bool:
    try:
        return os.path.exists("/.dockerenv")
    except OSError:
        return False


def is_tpu_vm() -> bool:
    """TPU runtime present (libtpu or an axon tunnel)."""
    try:
        import jax

        return any(d.platform in ("tpu", "axon") or "TPU" in str(d) for d in jax.devices())
    except Exception:  # noqa: BLE001
        return False


USER_CONFIG_DIR = Path(os.environ.get("LPC_YOLO_CONFIG_DIR", Path.home() / ".config" / "lpc_yolo_tpu"))
SETTINGS_YAML = USER_CONFIG_DIR / "settings.yaml"


class SettingsManager(dict):
    """Persisted user settings (utils/__init__.py:906): datasets_dir,
    weights_dir, runs_dir + feature toggles, saved to settings.yaml."""

    def __init__(self, file: Path = SETTINGS_YAML):
        self.file = Path(file)
        root = self.file.parent.parent.parent if len(self.file.parents) > 2 else Path.home()
        defaults = {
            "settings_version": "0.1.0",
            "datasets_dir": str(Path.cwd() / "datasets"),
            "weights_dir": str(Path.cwd() / "weights"),
            "runs_dir": str(Path.cwd() / "runs"),
            "sync": False,  # no telemetry in this build
            "tensorboard": True,
            "api_key": "",  # HUB key persisted by `yolo login` (hub/auth.py)
        }
        super().__init__(defaults)
        try:
            if self.file.exists():
                stored = yaml.safe_load(self.file.read_text()) or {}
                self.update({k: v for k, v in stored.items() if k in defaults})
            else:
                self.save()
        except OSError:
            pass

    def save(self) -> None:
        try:
            self.file.parent.mkdir(parents=True, exist_ok=True)
            self.file.write_text(yaml.safe_dump(dict(self), sort_keys=False))
        except OSError:
            pass

    def update(self, *args, **kw):  # type: ignore[override]
        super().update(*args, **kw)
        self.save()

    def reset(self):
        self.file.unlink(missing_ok=True)
        self.__init__(self.file)


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp{sep}2, runs/exp{sep}3, ... (utils/files.py:85).

    Files keep their extension; directories append the number directly.
    """
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def get_save_dir(task: str = "detect", mode: str = "predict", project=None,
                 name=None, exist_ok: bool = False) -> Path:
    """Run directory from project/name flags (cfg/__init__.py get_save_dir):
    {project or <settings runs_dir>/task}/{name or mode}, incremented unless
    exist_ok."""
    project = Path(project) if project else Path(SettingsManager()["runs_dir"]) / task
    return increment_path(project / (name or mode), exist_ok=exist_ok)


class TryExcept:
    """Context manager / decorator swallowing exceptions with a log line
    (utils/__init__.py:723)."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __call__(self, fn: Callable) -> Callable:
        @wraps(fn)
        def wrapper(*a, **kw):
            with self:
                return fn(*a, **kw)

        return wrapper

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if self.verbose and value is not None:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


def retry(times: int = 3, delay: float = 2.0):
    """Exponential-backoff retry decorator (utils/__init__.py Retry)."""

    def deco(fn: Callable) -> Callable:
        @wraps(fn)
        def wrapper(*a, **kw):
            for i in range(times):
                try:
                    return fn(*a, **kw)
                except Exception:  # noqa: BLE001
                    if i == times - 1:
                        raise
                    time.sleep(delay * 2**i)

        return wrapper

    return deco


def threaded(fn: Callable) -> Callable:
    """Run in a daemon thread, return the Thread (utils/__init__.py:815)."""

    @wraps(fn)
    def wrapper(*a, **kw):
        t = threading.Thread(target=fn, args=a, kwargs=kw, daemon=True)
        t.start()
        return t

    return wrapper


class ThreadingLocked:
    """Decorator serializing calls with a lock (utils/__init__.py:281)."""

    def __init__(self):
        self.lock = threading.Lock()

    def __call__(self, fn: Callable) -> Callable:
        @wraps(fn)
        def wrapper(*a, **kw):
            with self.lock:
                return fn(*a, **kw)

        return wrapper

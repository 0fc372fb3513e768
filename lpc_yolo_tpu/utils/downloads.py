"""Download machinery: retrying HTTP fetch, size/checksum validation, archive
extraction, and release-asset resolution.

Behavioral spec: reference utils/downloads.py — `safe_download` (retries,
curl fallback, min-size check, unzip+delete options), `unzip_file` (skip
top-level dir duplication, exclude patterns), `attempt_download_asset`
(GitHub release URL synthesis for bare weight names like 'yolov10n.pt'),
`is_url`, `url2file`. TPU-native differences: stdlib urllib only (no
requests/curl), atomic .part rename so an interrupted fetch never leaves a
truncated artifact, optional sha256 pinning, and an overridable mirror base
so air-gapped deployments point at an internal artifact store (this build
environment is zero-egress; tests exercise the full stack against a loopback
HTTP server — tests/test_downloads.py).
"""

from __future__ import annotations

import hashlib
import shutil
import time
import urllib.error
import urllib.parse
import urllib.request
import zipfile
from pathlib import Path
from typing import Iterable, Optional

from .infra import LOGGER

# Release-asset base for bare weight names ('yolov10n.pt'); deployments behind
# an artifact mirror override this (reference GITHUB_ASSETS_REPO semantics).
ASSET_BASE_URL = "https://github.com/THU-MIG/yolov10/releases/download/v1.1"
ASSET_NAMES = tuple(
    f"yolov10{s}.pt" for s in "nsmblx"
) + tuple(f"yolov8{s}{t}.pt" for s in "nsmlx" for t in ("", "-seg", "-pose", "-obb", "-cls"))


def is_url(url: str, check_online: bool = False) -> bool:
    """True if the string parses as an http(s)/file URL (reference is_url)."""
    try:
        parsed = urllib.parse.urlparse(str(url))
        ok = bool(parsed.scheme in ("http", "https", "file") and parsed.netloc or parsed.scheme == "file")
        if ok and check_online:
            with urllib.request.urlopen(str(url), timeout=5) as r:
                return r.status < 400
        return ok
    except Exception:  # noqa: BLE001 — malformed URL / offline both mean "no"
        return False


def url2file(url: str) -> str:
    """Filename part of a URL, query string stripped (reference url2file)."""
    return Path(urllib.parse.unquote(str(url)).split("?")[0]).name


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def safe_download(
    url: str,
    file: Optional[str] = None,
    dir: Optional[str] = None,  # noqa: A002 — reference kwarg name
    unzip: bool = True,
    delete: bool = False,
    retry: int = 3,
    min_bytes: float = 1.0,
    sha256: Optional[str] = None,
    progress: bool = True,
    exist_ok: bool = False,
) -> Path:
    """Fetch `url` to `dir/file` with retries and validation.

    Mirrors reference safe_download semantics: retry loop with backoff,
    min-size check (a failed fetch that returns an HTML error page must not
    pass), optional unzip of .zip artifacts (returning the extract dir) and
    optional source deletion. Adds atomic .part rename and sha256 pinning.
    """
    f = Path(dir or ".") / (file or url2file(url))
    if f.exists() and not exist_ok and f.stat().st_size >= min_bytes:
        if sha256 is None or _sha256(f) == sha256:
            LOGGER.debug(f"downloads: {f} exists, skipping fetch")
            return _post_download(f, unzip, delete)
    f.parent.mkdir(parents=True, exist_ok=True)
    part = f.with_suffix(f.suffix + ".part")
    last_err: Optional[Exception] = None
    for attempt in range(retry + 1):
        try:
            req = urllib.request.Request(str(url), headers={"User-Agent": "lpc_yolo_tpu"})
            with urllib.request.urlopen(req, timeout=30) as r, open(part, "wb") as out:
                total = int(r.headers.get("Content-Length", 0) or 0)
                done = 0
                t0 = time.time()
                for chunk in iter(lambda: r.read(1 << 18), b""):
                    out.write(chunk)
                    done += len(chunk)
                    if progress and total and time.time() - t0 > 2:
                        LOGGER.info(f"downloads: {f.name} {done / total:.0%} of {total / 1e6:.1f} MB")
                        t0 = time.time()
            if part.stat().st_size < min_bytes:
                raise OSError(f"downloaded size {part.stat().st_size} B < min_bytes {min_bytes}")
            if sha256 is not None and _sha256(part) != sha256:
                raise OSError("sha256 mismatch")
            part.replace(f)  # atomic: never leaves a truncated artifact at `f`
            return _post_download(f, unzip, delete)
        except Exception as e:  # noqa: BLE001 — every failure mode retries
            last_err = e
            part.unlink(missing_ok=True)
            if attempt < retry:
                wait = 2**attempt
                LOGGER.warning(f"downloads: attempt {attempt + 1}/{retry + 1} for {url} failed ({e}); retrying in {wait}s")
                time.sleep(wait)
    raise ConnectionError(f"download failure for {url}: {last_err}") from last_err


def _post_download(f: Path, unzip: bool, delete: bool) -> Path:
    if unzip and f.suffix == ".zip":
        out = unzip_file(f, path=f.parent)
        if delete:
            f.unlink(missing_ok=True)
        return out
    return f


def unzip_file(file, path: Optional[str] = None, exclude: Iterable[str] = (".DS_Store", "__MACOSX"),
               exist_ok: bool = False) -> Path:
    """Extract a zip, avoiding the doubled top-level directory the reference
    guards against (utils/downloads.py unzip_file): if all members share one
    root folder, extract into `path`; otherwise extract into `path/<stem>`."""
    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as z:
        names = [n for n in z.namelist() if not any(x in n for x in exclude)]
        for n in names:
            # zip-slip guard: resolved member must stay inside the target tree
            if not str((path / n).resolve()).startswith(str(path.resolve())):
                raise ValueError(f"unsafe zip member path {n!r}")
        roots = {n.split("/")[0] for n in names}
        if len(roots) == 1 and list(roots)[0] and names and all("/" in n for n in names):
            extract_to, out = path, path / next(iter(roots))
        else:
            extract_to = out = path / file.stem
        if out.exists() and any(out.iterdir()) and not exist_ok:
            LOGGER.debug(f"downloads: {out} already populated, skipping extract")
            return out
        for n in names:
            z.extract(n, extract_to)
    return out


def attempt_download_asset(asset: str, repo_url: Optional[str] = None, release_dir: str = "weights") -> str:
    """Resolve a bare weight name to a local file, fetching from the release
    asset base when absent (reference attempt_download_asset). Names that are
    existing paths or URLs pass through safe_download directly."""
    name = str(asset).strip()
    if Path(name).exists():
        return name
    if is_url(name):
        return str(safe_download(name, dir=release_dir, unzip=False, min_bytes=1))
    if Path(name).name in ASSET_NAMES or name.endswith(".pt"):
        base = repo_url or ASSET_BASE_URL
        local = Path(release_dir) / Path(name).name
        if local.exists():
            return str(local)
        return str(safe_download(f"{base}/{Path(name).name}", dir=release_dir, unzip=False, min_bytes=1))
    return name  # not an asset (e.g. a YAML config) — caller resolves


def download(urls, dir: str = ".", unzip: bool = True, delete: bool = False, threads: int = 1,  # noqa: A002
             retry: int = 3) -> list:
    """Multi-URL convenience wrapper (reference download()): sequential or
    thread-pooled safe_download over an iterable of URLs."""
    urls = [urls] if isinstance(urls, str) else list(urls)
    if threads <= 1:
        return [safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry) for u in urls]
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(max_workers=threads) as ex:
        return list(ex.map(lambda u: safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry), urls))


def check_font(font: str = "Arial.ttf", dir: Optional[str] = None) -> Optional[Path]:
    """Reference check_font analog: return a usable font path if one exists
    locally (PIL bundles DejaVu); no network fetch in zero-egress deploys."""
    candidates = [Path(dir or ".") / font]
    try:
        import PIL

        candidates.append(Path(PIL.__file__).parent / "fonts" / "DejaVuSans.ttf")
    except Exception:  # noqa: BLE001
        pass
    for c in candidates:
        if c.exists():
            return c
    return None

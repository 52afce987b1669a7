"""HTTP download with file cache (SURVEY §2.1 S5).

Reference: fetch/noaa_hourly.py:103-118 (streamed download with
skip-if-cached) and :409-417 (corrupted-cache retry). Driver-side by
design — Spark reads the cached local/object-store files afterwards;
the data path never goes through the driver.

The transport is injectable so tests (and offline environments) run
without the ``requests`` package: pass ``fetcher=...`` any callable
``(url, out_path) -> None``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

Fetcher = Callable[[str, Path], None]


def _requests_fetcher(url: str, out_path: Path) -> None:
    import requests  # gated: only the live-download path needs it

    with requests.get(url, stream=True, timeout=60) as response:
        response.raise_for_status()
        with out_path.open("wb") as handle:
            for chunk in response.iter_content(chunk_size=1 << 20):
                handle.write(chunk)


def download_file(
    url: str,
    out_path: str | Path,
    force: bool = False,
    use_cache: bool = True,
    fetcher: Fetcher | None = None,
) -> Path:
    """Download ``url`` to ``out_path`` unless a cached copy exists.

    Atomic: writes to ``<name>.tmp`` then renames, so a concurrent
    Spark read never sees a partial file (the reference's tmp+rename
    idiom, clean_hourly.py:310-313)."""
    out = Path(out_path)
    if use_cache and not force and out.exists() and out.stat().st_size > 0:
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(out.suffix + ".tmp")
    (fetcher or _requests_fetcher)(url, tmp)
    tmp.replace(out)
    return out


def download_with_retry(
    url: str,
    out_path: str | Path,
    validate: Callable[[Path], bool],
    fetcher: Fetcher | None = None,
) -> Path:
    """Cached download; if validation fails (corrupted cache), re-fetch
    once with force (reference noaa_hourly.py:409-417)."""
    out = download_file(url, out_path, fetcher=fetcher)
    if validate(out):
        return out
    out.unlink(missing_ok=True)
    out = download_file(url, out_path, force=True, use_cache=False, fetcher=fetcher)
    if not validate(out):
        raise ValueError(f"Downloaded file failed validation twice: {url}")
    return out

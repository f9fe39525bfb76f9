"""Checkpoint fetcher — the reference's `load_file_from_url`
(basicsr/utils/download_util.py, used by inference_resshift.py:125-139).

Downloads a release URL into a local cache dir and returns the path.  The
build/CI environment has no network egress, so downloads only run when the
caller opts in (`allow_download=True` or RSTPU_ALLOW_DOWNLOAD=1); otherwise
a clear error tells the user to fetch the file out-of-band.
"""

from __future__ import annotations

import os
from pathlib import Path
from urllib.parse import urlparse

__all__ = ["load_file_from_url"]

DEFAULT_CACHE = Path(os.environ.get("RSTPU_WEIGHTS_DIR", "./weights"))


def load_file_from_url(url: str, model_dir: str | Path | None = None,
                       file_name: str | None = None,
                       allow_download: bool | None = None) -> Path:
    """Return the local path for `url`, downloading it if permitted."""
    model_dir = Path(model_dir) if model_dir else DEFAULT_CACHE
    name = file_name or Path(urlparse(url).path).name
    target = model_dir / name
    if target.exists():
        return target
    if allow_download is None:
        allow_download = bool(os.environ.get("RSTPU_ALLOW_DOWNLOAD"))
    if not allow_download:
        raise FileNotFoundError(
            f"{target} not found and downloads are disabled. Fetch it "
            f"out-of-band:\n  curl -L -o {target} {url}\n"
            "or set RSTPU_ALLOW_DOWNLOAD=1 on a machine with egress.")
    import urllib.request

    model_dir.mkdir(parents=True, exist_ok=True)
    tmp = target.with_suffix(target.suffix + ".part")
    print(f"downloading {url} -> {target}", flush=True)
    urllib.request.urlretrieve(url, tmp)  # noqa: S310 (https release URL)
    tmp.rename(target)
    return target

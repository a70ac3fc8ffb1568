"""Local artifact resolution + cache (reference: modules/file_utils.py).

The reference's cached_path downloads model tarballs/vocab files over
HTTP/S3 with an etag cache (file_utils.py:74-239). This deployment is
zero-egress: remote URLs raise with instructions instead of downloading.
Local behavior is kept: plain paths pass through, file:// URLs resolve, and
.tar.gz archives are extracted into the cache directory once (the reference
untars bert-base-uncased.tar.gz the same way, until_config.py:57-79).
"""

from __future__ import annotations

import hashlib
import os
import tarfile
from urllib.parse import urlparse

CACHE_DIR = os.environ.get(
    "UNIVL_TPU_CACHE", os.path.expanduser("~/.cache/univl_tpu/artifacts")
)


def cached_path(path_or_url: str, cache_dir: str = None) -> str:
    """Resolve to a local path; extract archives; never touches the network."""
    cache_dir = cache_dir or CACHE_DIR
    parsed = urlparse(path_or_url)
    if parsed.scheme in ("http", "https", "s3"):
        raise OSError(
            f"cached_path: remote fetch disabled (zero-egress deployment): "
            f"{path_or_url}. Download the artifact out of band and pass its "
            f"local path (or set UNIVL_TPU_CACHE and place it there)."
        )
    if parsed.scheme == "file":
        path = parsed.path
    else:
        path = path_or_url
    if not os.path.exists(path):
        raise FileNotFoundError(f"cached_path: {path} not found")

    if path.endswith((".tar.gz", ".tgz", ".tar")):
        # fingerprint = first 1 MiB + file size: two archives sharing a
        # 1 MiB prefix but differing later (e.g. a re-packaged weights
        # tarball) must not resolve to the same stale extraction
        st = os.stat(path)
        h = hashlib.sha256()
        with open(path, "rb") as f:
            h.update(f.read(1 << 20))
        h.update(str(st.st_size).encode())
        digest = h.hexdigest()[:16]
        out = os.path.join(cache_dir, f"extracted-{digest}")
        done = os.path.join(out, ".done")
        if not os.path.exists(done):
            os.makedirs(out, exist_ok=True)
            with tarfile.open(path) as tar:
                tar.extractall(out, filter="data")
            with open(done, "w") as f:
                f.write(path)
        return out
    return path

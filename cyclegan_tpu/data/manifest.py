"""Content-addressed dataset manifests — the DVC-equivalent capability.

The reference pins its datasets with DVC (.dvc/config:1-4) and fetches
them with ``dvc pull`` (Makefile:17-20). Here the same two capabilities
are native and dependency-free:

- **pin**: ``write_manifest`` records sha256 + byte size + record count of
  every ``*.tfrecords`` shard in a directory into ``manifest.json``
  (written automatically by ``tfrecord_writer``);
- **verify**: ``verify_manifest`` re-hashes and raises
  :class:`ManifestMismatch` on any content or shard-set drift;
- **fetch** (``dvc pull`` equivalent): ``fetch_from_remote`` materializes
  the pinned shards from a remote — a directory path or any URL scheme
  urllib can open (file://, http(s)://) — idempotently and
  sha256-verified, downloading only what is missing or corrupt.
"""

from __future__ import annotations

import hashlib
import json
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Dict, Optional, Union

MANIFEST_NAME = "manifest.json"


class ManifestMismatch(Exception):
    """Dataset content differs from its pinned manifest."""


def _sha256(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _sha256_file(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _count_records(path: Path) -> int:
    from cyclegan_tpu.data.streaming import index_shard

    return len(index_shard(path))


def write_manifest(
    records_dir: Union[str, Path], extra: Optional[Dict] = None
) -> Path:
    """Pin every ``*.tfrecords`` shard under ``records_dir``.

    Returns the manifest path. ``extra`` carries writer provenance
    (image_size/shard_size/seed/writer — see tfrecord.py:117,138).
    """
    records_dir = Path(records_dir)
    files = {}
    total = 0
    for shard in sorted(records_dir.glob("*.tfrecords")):
        count = _count_records(shard)
        files[shard.name] = {
            "sha256": _sha256_file(shard),
            "bytes": shard.stat().st_size,
            "records": count,
        }
        total += count
    manifest = {"files": files, "total_records": total}
    if extra:
        manifest["extra"] = dict(extra)
    path = records_dir / MANIFEST_NAME
    path.write_text(json.dumps(manifest, indent=2, sort_keys=True))
    return path


def load_manifest(records_dir: Union[str, Path]) -> Dict:
    return json.loads((Path(records_dir) / MANIFEST_NAME).read_text())


def verify_manifest(records_dir: Union[str, Path]) -> Dict:
    """Re-hash shards against the pinned manifest.

    Raises :class:`ManifestMismatch` on content drift (sha256 mismatch) or
    shard-set drift (missing or unexpected ``*.tfrecords``). Returns the
    manifest dict on success.
    """
    records_dir = Path(records_dir)
    manifest = load_manifest(records_dir)
    pinned = manifest["files"]
    on_disk = {p.name for p in records_dir.glob("*.tfrecords")}
    if on_disk != set(pinned):
        raise ManifestMismatch(
            f"shard set drift in {records_dir}: manifest pins "
            f"{sorted(pinned)}, directory has {sorted(on_disk)}"
        )
    for name, meta in pinned.items():
        digest = _sha256_file(records_dir / name)
        if digest != meta["sha256"]:
            raise ManifestMismatch(
                f"content drift in {records_dir / name}: "
                f"sha256 {digest} != pinned {meta['sha256']}"
            )
    return manifest


def _read_remote(remote: str, name: str) -> bytes:
    """Read one file from a remote: URL schemes via urllib, else a path."""
    if "://" in remote:
        base = remote if remote.endswith("/") else remote + "/"
        url = urllib.parse.urljoin(base, name)
        with urllib.request.urlopen(url) as response:
            return response.read()
    return (Path(remote) / name).read_bytes()


def fetch_from_remote(
    local_dir: Union[str, Path], remote: str
) -> Dict[str, list]:
    """``dvc pull`` equivalent: materialize manifest-pinned shards locally.

    Reads ``manifest.json`` from the remote, then fetches every shard that
    is missing locally or fails its sha256 — verified against the pin
    before it is moved into place (a ``.fetch`` temp name keeps partial
    downloads out of the shard namespace). A remote file that does not
    match its own manifest raises :class:`ManifestMismatch` and leaves no
    partial file behind. Returns ``{"fetched": [...], "cached": [...]}``.
    """
    local_dir = Path(local_dir)
    local_dir.mkdir(parents=True, exist_ok=True)
    manifest = json.loads(_read_remote(remote, MANIFEST_NAME).decode("utf-8"))

    fetched, cached = [], []
    for name, meta in sorted(manifest["files"].items()):
        dest = local_dir / name
        if dest.exists() and _sha256_file(dest) == meta["sha256"]:
            cached.append(name)
            continue
        data = _read_remote(remote, name)
        if _sha256(data) != meta["sha256"]:
            raise ManifestMismatch(
                f"remote shard {name} does not match its manifest pin "
                f"(remote {remote} is corrupt or mid-update)"
            )
        tmp = local_dir / (name + ".fetch")
        tmp.write_bytes(data)
        tmp.replace(dest)
        fetched.append(name)

    (local_dir / MANIFEST_NAME).write_text(
        json.dumps(manifest, indent=2, sort_keys=True)
    )
    return {"fetched": fetched, "cached": cached}

"""TAR archive source: the bundle format document corpora and model
checkpoints ship in (WebDataset shards are plain tars), parsed with the
stdlib only — the sibling of sources/warc.py for non-web bundles.

Reference analogue: the multipart upload source (S1) — an envelope wrapping
heterogeneous payload bytes + per-member metadata.

Scale shape: one parse task per archive via ``read_binary_files`` (WebDataset
ships ~100 MB–1 GB shards precisely so a file is a good task unit). Each
regular member becomes one row: tar metadata promoted to typed columns, the
member bytes left as an opaque ``binary`` column for downstream actor-pool
decode stages (stages/multimodal.py contract). gzip-compressed tars
(`.tar.gz`) are detected by magic and inflated in-task.

WebDataset grouping convention: ``sample_key`` is the member path minus its
final extension, so `0001.jpg` + `0001.json` share a key and a downstream
``groupby("sample_key")`` reassembles samples.
"""

from __future__ import annotations

import gzip
import io
import tarfile

import pyarrow as pa

import ray.data as rd

_TAR_SCHEMA = pa.schema(
    [
        ("archive_offset", pa.int64()),
        ("member_name", pa.string()),
        ("sample_key", pa.string()),
        ("ext", pa.string()),
        ("size", pa.int64()),
        ("mtime", pa.int64()),
        ("payload", pa.binary()),
    ]
)


def parse_tar_bytes(data: bytes) -> list[dict]:
    """All regular-file members of one tar (or tar.gz) as dicts."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: list[dict] = []
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:") as tf:
        for m in tf:
            if not m.isreg():
                continue
            f = tf.extractfile(m)
            payload = f.read() if f is not None else b""
            name = m.name
            dot = name.rfind(".")
            slash = name.rfind("/")
            has_ext = dot > slash
            rows.append(
                {
                    "archive_offset": int(m.offset),
                    "member_name": name,
                    "sample_key": name[:dot] if has_ext else name,
                    "ext": name[dot + 1 :] if has_ext else "",
                    "size": int(m.size),
                    "mtime": int(m.mtime),
                    "payload": payload,
                }
            )
    return rows


def read_tar(paths: str | list[str]) -> "rd.Dataset":
    """Distributed tar read: one parse task per archive, typed Arrow rows
    out, payload bytes opaque."""

    def parse(batch: "pa.Table") -> "pa.Table":
        rows: list[dict] = []
        for data in batch["bytes"].to_pylist():
            rows.extend(parse_tar_bytes(data))
        return pa.Table.from_pylist(rows, schema=_TAR_SCHEMA)

    files = rd.read_binary_files(paths)
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def build_tar_bytes(members: list[tuple[str, bytes]], *, compress: bool = False) -> bytes:
    """Serialize (name, payload) members into a tar (fixtures + round-trip
    sink); ``compress`` emits `.tar.gz` bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            info.mtime = 1704067200  # fixed 2024-01-01 for determinism
            tf.addfile(info, io.BytesIO(payload))
    data = buf.getvalue()
    return gzip.compress(data) if compress else data

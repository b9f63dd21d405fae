"""TAR / WebDataset-shard source (sources/tarsource.py)."""

from __future__ import annotations

import gzip

from medical_ocr_service_ray.sources.tarsource import (
    build_tar_bytes,
    parse_tar_bytes,
    read_tar,
)


MEMBERS = [
    ("000/0001.jpg", b"\xff\xd8\xffJPEGBYTES"),
    ("000/0001.json", b'{"label": 3}'),
    ("000/0002.jpg", b"\xff\xd8\xffMORE"),
    ("README", b"no extension member"),
]


class TestTarParse:
    def test_roundtrip_plain_and_gz(self):
        for compress in (False, True):
            data = build_tar_bytes(MEMBERS, compress=compress)
            if compress:
                assert data[:2] == b"\x1f\x8b"
            rows = parse_tar_bytes(data)
            assert [(r["member_name"], r["payload"]) for r in rows] == MEMBERS
            assert all(r["size"] == len(r["payload"]) for r in rows)

    def test_webdataset_sample_keys(self):
        rows = parse_tar_bytes(build_tar_bytes(MEMBERS))
        by_name = {r["member_name"]: r for r in rows}
        assert by_name["000/0001.jpg"]["sample_key"] == "000/0001"
        assert by_name["000/0001.json"]["sample_key"] == "000/0001"
        assert by_name["000/0001.jpg"]["ext"] == "jpg"
        # dot in a directory name must not truncate an extensionless member
        assert by_name["README"]["sample_key"] == "README"
        assert by_name["README"]["ext"] == ""

    def test_distributed_read_and_group(self, ray_session, tmp_path):
        """Two shards -> one Dataset; groupby(sample_key) reassembles the
        jpg+json pairs (the WebDataset contract)."""
        for i in range(2):
            shard = [(f"{i:03d}/{j:04d}.jpg", b"img" + bytes([j])) for j in range(3)]
            shard += [(f"{i:03d}/{j:04d}.json", b"{}") for j in range(3)]
            (tmp_path / f"shard-{i}.tar").write_bytes(build_tar_bytes(shard))
        ds = read_tar([str(tmp_path / f"shard-{i}.tar") for i in range(2)])
        df = ds.to_pandas()
        assert len(df) == 12
        sizes = df.groupby("sample_key").size()
        assert len(sizes) == 6 and (sizes == 2).all()

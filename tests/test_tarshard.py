"""WebDataset-style tar shard ingest (datapipe/tarshard.py)."""

import pytest
from pyspark.sql import functions as F

from pypond_spark.datapipe import tarshard


SAMPLES = [
    ("00000001", {"txt": b"caption one", "json": b'{"a":1}',
                  "img.bin": b"\x00\x01\xff"}),
    ("00000002", {"txt": b"caption two"}),
    ("sub/dir/00000003", {"txt": b"nested", "cls": b"7"}),
]


def test_roundtrip_members_and_keys():
    data = tarshard.encode_tar_shard(SAMPLES)
    members = tarshard.parse_tar_members(data)
    assert [n for n, _ in members] == [
        "00000001.img.bin", "00000001.json", "00000001.txt",
        "00000002.txt", "sub/dir/00000003.cls",
        "sub/dir/00000003.txt"]
    assert dict(members)["00000001.img.bin"] == b"\x00\x01\xff"
    # deterministic bytes
    assert data == tarshard.encode_tar_shard(SAMPLES)
    # gzip wrap auto-detects on read and is deterministic too
    gz = tarshard.encode_tar_shard(SAMPLES, gzip_level=6)
    assert gz[:2] == b"\x1f\x8b"
    assert tarshard.parse_tar_members(gz) == members
    assert gz == tarshard.encode_tar_shard(SAMPLES, gzip_level=6)


def test_key_ext_split():
    assert tarshard._split_key("a/b.seg.png") == ("a/b", "seg.png")
    assert tarshard._split_key("x.txt") == ("x", "txt")
    assert tarshard._split_key("noext") == ("noext", "")
    assert tarshard._split_key("d.ir/file.txt") == ("d.ir/file", "txt")


def test_corrupt_raises():
    with pytest.raises(ValueError, match="corrupt tar"):
        tarshard.parse_tar_members(b"not a tar at all" * 100)


def test_spark_members_and_samples(spark):
    shards = [(1, tarshard.encode_tar_shard(SAMPLES)),
              (2, tarshard.encode_tar_shard(
                  [("k", {"txt": b"solo"})], gzip_level=1))]
    df = spark.createDataFrame(shards,
                               "shard_id long, content binary")
    mem = tarshard.read_tar_members(df).collect()
    assert len(mem) == 7
    got = {(r["shard_id"], r["member_name"]):
           (r["sample_key"], r["ext"], r["n_bytes"], bytes(r["data"]))
           for r in mem}
    assert got[(1, "00000001.json")] == ("00000001", "json", 7,
                                         b'{"a":1}')
    assert got[(2, "k.txt")] == ("k", "txt", 4, b"solo")

    smp = tarshard.read_tar_samples(df).collect()
    by_key = {(r["shard_id"], r["sample_key"]): r for r in smp}
    assert len(smp) == 4
    r1 = by_key[(1, "00000001")]
    assert r1["n_parts"] == 3
    assert bytes(r1["parts"]["txt"]) == b"caption one"
    assert bytes(r1["parts"]["img.bin"]) == b"\x00\x01\xff"
    assert by_key[(1, "sub/dir/00000003")]["n_parts"] == 2


def test_non_adjacent_same_key_is_two_samples(spark):
    import io as _io
    import tarfile

    buf = _io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("a.txt", b"1"), ("b.txt", b"2"),
                           ("a.json", b"3")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
    df = spark.createDataFrame([(1, buf.getvalue())],
                               "shard_id long, content binary")
    smp = tarshard.read_tar_samples(df).collect()
    assert [(r["sample_key"], r["n_parts"]) for r in smp] == [
        ("a", 1), ("b", 1), ("a", 1)]


def test_roundtrip_through_parquet_shards(spark, tmp_path):
    """Couple with io.write_training_shards: samples -> parquet
    shards -> read back -> re-encode tars -> parse; content and
    pairing survive both shard formats."""
    from pypond_spark.datapipe import io as dp_io

    rows = [(f"{i:08d}", f"caption {i}".encode(),
             f'{{"i":{i}}}'.encode()) for i in range(50)]
    df = spark.createDataFrame(rows, "key string, txt binary, "
                                     "js binary")
    n = dp_io.write_training_shards(
        df, str(tmp_path / "shards"), records_per_shard=20,
        order_col="key")
    assert n == 3
    back = spark.read.parquet(str(tmp_path / "shards")).collect()
    assert len(back) == 50
    samples = sorted((r["key"], {"txt": bytes(r["txt"]),
                                 "json": bytes(r["js"])})
                     for r in back)
    tar = tarshard.encode_tar_shard(samples)
    df2 = spark.createDataFrame([(0, tar)],
                                "shard_id long, content binary")
    out = tarshard.read_tar_samples(df2) \
        .where(F.col("n_parts") == 2).collect()
    assert len(out) == 50
    assert {r["sample_key"]: bytes(r["parts"]["txt"])
            for r in out} == {k: p["txt"] for k, p in samples}

"""SequenceFile dseq/dsink (r12, SURVEY §2.4's one partial row): the
pure-Python v6 codec is cross-validated against Hadoop's OWN
implementation in both directions — it cannot be self-consistently
wrong — plus the DataFrame surface, NullWritable handling, VInt
goldens, and the honest unsupported-layout errors."""

import io
import struct

import pytest

from parkour_spark.sources.seqfile import (
    read_seqf,
    read_seqfile_header,
    read_seqfile_py,
    read_vlong,
    write_seqf,
    write_seqfile_py,
    write_vlong,
)

_H = "org.apache.hadoop.io."


def test_vlong_goldens_and_roundtrip():
    """Hand-computed WritableUtils.writeVLong goldens (public spec):
    one-byte range, multi-byte positive/negative."""
    def enc(n):
        b = io.BytesIO()
        write_vlong(b, n)
        return b.getvalue()

    assert enc(0) == b"\x00"
    assert enc(127) == b"\x7f"
    assert enc(-112) == struct.pack("b", -112)
    assert enc(128) == struct.pack("b", -113) + b"\x80"
    assert enc(255) == struct.pack("b", -113) + b"\xff"
    assert enc(256) == struct.pack("b", -114) + b"\x01\x00"
    assert enc(-113) == struct.pack("b", -121) + b"\x70"  # ~(-113)=112
    for n in [0, 1, -1, 127, 128, -112, -113, 2**31, -(2**31), 2**53]:
        assert read_vlong(io.BytesIO(enc(n))) == n


def test_hadoop_writes_python_reads(spark, tmp_path):
    """Files written by Hadoop's own SequenceFile.Writer (via core
    Spark's saveAsSequenceFile) decode byte-exactly with the
    pure-Python reader — uncompressed AND block-compressed (Spark
    emits BLOCK whenever a codec is given)."""
    rows = [(i, f"value-{i}") for i in range(250)]
    plain = str(tmp_path / "plain")
    spark.sparkContext.parallelize(rows, 1).saveAsSequenceFile(plain)
    comp = str(tmp_path / "comp")
    spark.sparkContext.parallelize(rows, 1).saveAsSequenceFile(
        comp, compressionCodecClass="org.apache.hadoop.io.compress.DefaultCodec"
    )
    for d in (plain, comp):
        got = list(read_seqfile_py(f"{d}/part-00000"))
        assert got == rows
    with open(f"{plain}/part-00000", "rb") as f:
        hdr = read_seqfile_header(f)
    assert hdr["key_cls"] == _H + "IntWritable"
    assert hdr["val_cls"] == _H + "Text"
    assert not hdr["compressed"]
    with open(f"{comp}/part-00000", "rb") as f:
        chdr = read_seqfile_header(f)
    assert chdr["block_compressed"]  # the layout Spark really emits


def test_python_writes_hadoop_reads(spark, tmp_path):
    """Files written by the pure-Python writer (sync markers included)
    read back through Hadoop's own reader — uncompressed and
    record-compressed."""
    rows = [(i, f"payload {i}") for i in range(300)]
    for compress in (False, True):
        d = tmp_path / ("pyw_c" if compress else "pyw")
        d.mkdir()
        p = str(d / "part-00000")
        n = write_seqfile_py(
            p, rows, _H + "LongWritable", _H + "Text",
            compress=compress, sync_every=64,
        )
        assert n == 300
        got = sorted(spark.sparkContext.sequenceFile(str(d)).collect())
        assert got == rows


def test_python_roundtrip_all_writables(tmp_path):
    cases = [
        (_H + "Text", _H + "DoubleWritable", [("a", 1.5), ("b", -2.25)]),
        (_H + "IntWritable", _H + "BooleanWritable", [(1, True), (2, False)]),
        (_H + "LongWritable", _H + "BytesWritable", [(9, b"\x00\xff"), (10, b"")]),
        (_H + "FloatWritable", _H + "NullWritable", [(1.5, None), (0.25, None)]),
    ]
    for i, (kc, vc, rows) in enumerate(cases):
        p = str(tmp_path / f"f{i}")
        write_seqfile_py(p, rows, kc, vc)
        assert list(read_seqfile_py(p)) == rows


def test_dataframe_surface_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"row {i}") for i in range(50)], "key long, value string"
    )
    out = str(tmp_path / "df_rt")
    write_seqf(df, out)
    back = read_seqf(spark, out)
    assert sorted((r.key, r.value) for r in back.collect()) == [
        (i, f"row {i}") for i in range(50)
    ]


def test_python_datasource_roundtrip(spark, tmp_path):
    """The parkour_seqf Python DataSource (the no-JVM-converters
    fallback), driven directly: write + read through the DataSource
    API with record compression."""
    from parkour_spark.sources.seqfile import register_seqf_source

    assert register_seqf_source(spark)
    df = spark.createDataFrame(
        [(i, float(i) / 4) for i in range(40)], "key int, value double"
    )
    out = str(tmp_path / "ds_rt")
    (
        df.write.format("parkour_seqf")
        .mode("overwrite")
        .option("compress", "true")
        .save(out)
    )
    back = (
        spark.read.format("parkour_seqf").option("path", out).load()
    )
    assert back.schema.simpleString() == "struct<key:int,value:double>"
    assert sorted((r.key, r.value) for r in back.collect()) == [
        (i, i / 4) for i in range(40)
    ]


def test_unsupported_codec_raises(tmp_path):
    """A header naming a codec we don't implement (e.g. Snappy) raises
    with a pointer at the JVM path — never a silent wrong decode."""
    import io as _io

    from parkour_spark.sources.seqfile import MAGIC, _write_text

    buf = _io.BytesIO()
    buf.write(MAGIC)
    _write_text(buf, _H + "IntWritable")
    _write_text(buf, _H + "Text")
    buf.write(b"\x01\x00")  # record-compressed, not block
    _write_text(buf, "org.apache.hadoop.io.compress.SnappyCodec")
    buf.write(struct.pack(">i", 0))
    buf.write(b"0123456789abcdef")
    p = str(tmp_path / "snappy.seq")
    with open(p, "wb") as f:
        f.write(buf.getvalue())
    with pytest.raises(ValueError, match="unsupported codec"):
        list(read_seqfile_py(p))

"""Avro OCF source/sink (sources/avrofmt.py): spec-compliance goldens
(hand-assembled bytes in both directions — the reader parses a file it
didn't write, the writer's bytes are checked against hand-computed
zigzag/varint encodings), Spark round-trips incl. deflate, schema
fidelity, null handling. Closes the reference avro dseq/dsink gap
(avro.clj:137-171) without the spark-avro jar."""

import datetime
import io
import json
import struct

import pytest
from pyspark.sql import functions as F, types as T

from parkour_spark.sources import avrofmt as A


def test_zigzag_varint_spec_values():
    """Spec examples: 0→0x00, -1→0x01, 1→0x02, -2→0x03, 2→0x04,
    -64→0x7f, 64→0x80 0x01."""
    def enc(n):
        b = io.BytesIO()
        A.write_long(b, n)
        return b.getvalue()

    assert enc(0) == b"\x00"
    assert enc(-1) == b"\x01"
    assert enc(1) == b"\x02"
    assert enc(-2) == b"\x03"
    assert enc(2) == b"\x04"
    assert enc(-64) == b"\x7f"
    assert enc(64) == b"\x80\x01"
    for n in (0, 1, -1, 63, -64, 64, 2**40, -(2**40), 2**62):
        assert A.read_long(io.BytesIO(enc(n))) == n


SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
    ],
}


def _hand_built_file() -> bytes:
    """An OCF assembled byte-by-byte WITHOUT the writer under test."""
    out = io.BytesIO()
    out.write(b"Obj\x01")

    def vlong(n):
        u = (n << 1) ^ (n >> 63)
        b = b""
        while True:
            x = u & 0x7F
            u >>= 7
            if u:
                b += bytes([x | 0x80])
            else:
                return b + bytes([x])

    schema_json = json.dumps(SCHEMA).encode()
    out.write(vlong(2))
    out.write(vlong(len(b"avro.schema")) + b"avro.schema")
    out.write(vlong(len(schema_json)) + schema_json)
    out.write(vlong(len(b"avro.codec")) + b"avro.codec")
    out.write(vlong(4) + b"null")
    out.write(vlong(0))
    sync = bytes(range(16))
    out.write(sync)
    # payload: (1, "foo") then (-2, None) — hand-computed encodings
    payload = (
        b"\x02"            # a = 1  (zigzag 2)
        b"\x02"            # union branch 1 (string)
        b"\x06foo"         # len 3 (zigzag 6) + bytes
        b"\x03"            # a = -2 (zigzag 3)
        b"\x00"            # union branch 0 (null)
    )
    out.write(vlong(2) + vlong(len(payload)) + payload + sync)
    return out.getvalue()


def test_reader_parses_hand_built_file(tmp_path):
    p = tmp_path / "hand.avro"
    p.write_bytes(_hand_built_file())
    rows = list(A.read_ocf(str(p)))
    assert rows == [(1, "foo"), (-2, None)]


def test_writer_bytes_match_hand_encoding(tmp_path):
    """The writer's block payload must equal the hand-computed bytes —
    the round-trip cannot be self-consistently wrong."""
    p = tmp_path / "w.avro"
    A.write_ocf(str(p), SCHEMA, [(1, "foo"), (-2, None)])
    raw = p.read_bytes()
    with open(p, "rb") as f:
        _, _, sync = A.read_ocf_header(f)
        body = raw[f.tell():]
    expected_payload = b"\x02\x02\x06foo\x03\x00"
    assert body == b"\x04" + bytes([len(expected_payload) << 1]) + (
        expected_payload
    ) + sync


def test_schema_mapping_round_trip():
    st = T.StructType(
        [
            T.StructField("l", T.LongType(), False),
            T.StructField("s", T.StringType(), True),
            T.StructField("d", T.DoubleType(), True),
            T.StructField("b", T.BooleanType(), False),
            T.StructField("ts", T.TimestampNTZType(), True),
            T.StructField("arr", T.ArrayType(T.LongType(), False), True),
        ]
    )
    assert A.avro_to_spark_schema(A.spark_to_avro_schema(st)) == st


def test_spark_round_trip_with_nulls_and_arrays(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "x", 1.5, True, datetime.datetime(2024, 5, 1, 12, 0, 0, 123456), [1, 2]),
            (2, None, None, False, None, []),
            (3, "z", -0.25, True, datetime.datetime(1969, 12, 31, 23, 59, 59), None),
        ],
        T.StructType(
            [
                T.StructField("l", T.LongType(), False),
                T.StructField("s", T.StringType(), True),
                T.StructField("d", T.DoubleType(), True),
                T.StructField("b", T.BooleanType(), False),
                T.StructField("ts", T.TimestampNTZType(), True),
                T.StructField("arr", T.ArrayType(T.LongType(), False), True),
            ]
        ),
    )
    path = str(tmp_path / "rt")
    A.write_avro(df, path)
    back = A.read_avro(spark, path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_spark_round_trip_deflate_smaller(spark, tmp_path):
    import glob
    import os

    df = spark.range(2000).select(
        F.col("id"), F.repeat(F.lit("abc"), 20).alias("pad")
    )
    p0, p1 = str(tmp_path / "null"), str(tmp_path / "defl")
    A.write_avro(df, p0)
    A.write_avro(df, p1, codec="deflate")
    assert sorted(map(tuple, A.read_avro(spark, p1).collect())) == sorted(
        map(tuple, df.collect())
    )
    size = lambda d: sum(os.path.getsize(f) for f in glob.glob(d + "/*.avro"))
    assert size(p1) < size(p0) / 2


def test_write_parallelism_one_file_per_task(spark, tmp_path):
    import glob

    df = spark.range(100).repartition(4)
    path = str(tmp_path / "par")
    A.write_avro(df, path)
    assert len(glob.glob(path + "/*.avro")) == 4
    assert A.read_avro(spark, path).count() == 100


def test_corrupt_sync_marker_detected(tmp_path):
    p = tmp_path / "c.avro"
    raw = bytearray(_hand_built_file())
    raw[-1] ^= 0xFF  # corrupt the trailing sync marker
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="sync marker"):
        list(A.read_ocf(str(p)))


# --- randomized codec round-trip (pure python, no Spark) -------------------

from hypothesis import given, settings, strategies as st

_long = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_row = st.tuples(
    _long,
    st.one_of(st.none(), st.text(max_size=40)),  # unicode incl. astral
    st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
    st.booleans(),
    st.one_of(st.none(), st.lists(_long, max_size=5)),
    st.binary(max_size=20),
)
_SCHEMA_P = {
    "type": "record",
    "name": "p",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "b", "type": "boolean"},
        {"name": "arr", "type": ["null", {"type": "array", "items": "long"}]},
        {"name": "raw", "type": "bytes"},
    ],
}


@given(rows=st.lists(_row, max_size=30))
@settings(max_examples=50, deadline=None)
def test_codec_roundtrip_property(tmp_path_factory, rows):
    """Any row set — int64 boundaries, unicode (incl. astral planes),
    ±inf doubles, empty arrays/bytes, nulls — must round-trip the OCF
    codec bit-exactly, under both codecs."""
    d = tmp_path_factory.mktemp("avroprop")
    for codec in ("null", "deflate"):
        p = str(d / f"p_{codec}.avro")
        A.write_ocf(p, _SCHEMA_P, rows, codec=codec)
        assert list(A.read_ocf(p)) == [tuple(r) for r in rows]

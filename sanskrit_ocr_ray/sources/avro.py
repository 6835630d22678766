"""Pure-Python Avro Object Container File codec + ingestion arm.

Avro OCF (the Hadoop-ecosystem interchange format; spec: Apache Avro
1.11 "Object Container Files") is a row-major block format: a header
``Obj\\x01`` + metadata map (schema JSON, codec) + 16-byte sync marker,
then blocks of ``(record_count, byte_size, payload, sync)`` where the
payload is consecutive binary-encoded records, optionally raw-DEFLATE
compressed. The sandbox ships no ``fastavro``/``avro`` package, so this
module implements the subset the engine's tables need, both directions:

- primitives ``null boolean int long float double string bytes`` (ints
  and longs are zigzag varints);
- nullable columns as the idiomatic ``["null", T]`` union;
- ``timestamp-micros`` logical type (→ Arrow ``timestamp[us]``);
- codecs ``null`` and ``deflate`` (raw DEFLATE, ``zlib`` wbits=-15).

Like the JSONL/CSV arms, Avro is an INGESTION EDGE only: the format is
row-major, so no storage-side projection exists — columns drop right
after each block decodes, and the documented guidance stays "convert to
Parquet/Lance for anything re-read more than once". The datasource
yields ONE Ray block per OCF block, so memory stays bounded by the
writer's block size, and each read task touches only its own file.

Reference scope note: the reference ingests HDF5 and text only
(datagen/translate_bookcorpus.py:46-49, h5_to_parquet.py:29); this arm
is part of the engine's format-breadth mandate, not a port.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import numpy as np
import pyarrow as pa

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# varint / zigzag primitives
# ---------------------------------------------------------------------------


def _zz_enc(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def long(self) -> int:
        u = 0
        shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def raw(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated Avro data")
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def double(self) -> float:
        return struct.unpack("<d", self.raw(8))[0]

    def float_(self) -> float:
        return struct.unpack("<f", self.raw(4))[0]

    def bool_(self) -> bool:
        return self.raw(1) != b"\x00"


# ---------------------------------------------------------------------------
# schema mapping (Arrow <-> Avro JSON)
# ---------------------------------------------------------------------------

_A2V = {
    pa.int64(): "long",
    pa.int32(): "int",
    pa.float64(): "double",
    pa.float32(): "float",
    pa.bool_(): "boolean",
    pa.binary(): "bytes",
}


def _arrow_field_to_avro(field: pa.Field) -> dict:
    t = field.type
    if pa.types.is_timestamp(t) and t.unit == "us":
        base: object = {"type": "long", "logicalType": "timestamp-micros"}
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        base = "string"
    elif t in _A2V:
        base = _A2V[t]
    else:
        raise NotImplementedError(f"Avro arm does not encode Arrow type {t}")
    return {"name": field.name, "type": ["null", base] if field.nullable else base}


def _avro_type_to_arrow(t) -> pa.DataType:
    if isinstance(t, list):  # union — engine subset is ["null", T]
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"unsupported Avro union {t}")
        return _avro_type_to_arrow(non_null[0])
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros":
            return pa.timestamp("us")
        return _avro_type_to_arrow(t["type"])
    return {
        "long": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "bytes": pa.binary(),
        "string": pa.string(),
        "null": pa.null(),
    }[t]


# ---------------------------------------------------------------------------
# encode (test/fixture writer)
# ---------------------------------------------------------------------------


def encode_avro(
    table: pa.Table,
    *,
    codec: str = "deflate",
    block_rows: int = 4096,
    sync: bytes = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f",
) -> bytes:
    """Serialize an Arrow table as an Avro OCF (record of the supported
    primitive/logical types; every field written as a ``["null", T]``
    union, the idiomatic nullable encoding)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    fields = [
        {**_arrow_field_to_avro(f), "type": ["null", _strip_union(_arrow_field_to_avro(f)["type"])]}
        for f in table.schema
    ]
    schema = {"type": "record", "name": "row", "fields": fields}
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out.write(_zz_enc(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_zz_enc(len(kb)) + kb + _zz_enc(len(v)) + v)
    out.write(_zz_enc(0))  # end of metadata map
    out.write(sync)

    cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
    types = [f["type"][1] for f in fields]  # the non-null branch
    for start in range(0, table.num_rows, block_rows):
        stop = min(start + block_rows, table.num_rows)
        payload = bytearray()
        for r in range(start, stop):
            for c, t in enumerate(types):
                v = cols[c][r]
                if v is None:
                    payload += _zz_enc(0)  # union branch 0 = null
                    continue
                payload += _zz_enc(1)  # union branch 1 = value
                payload += _encode_value(v, t)
        data = bytes(payload)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            data = comp.compress(data) + comp.flush()
        out.write(_zz_enc(stop - start) + _zz_enc(len(data)) + data + sync)
    return out.getvalue()


def _strip_union(t):
    return [x for x in t if x != "null"][0] if isinstance(t, list) else t


def _encode_value(v, t) -> bytes:
    if isinstance(t, dict):  # timestamp-micros rides its base long
        if t.get("logicalType") == "timestamp-micros":
            import pandas as pd

            if hasattr(v, "value"):  # pandas Timestamp: ns -> us
                v = v.value // 1000
            elif not isinstance(v, (int, np.integer)):
                v = int(pd.Timestamp(v).value // 1000)
            return _zz_enc(int(v))
        return _encode_value(v, t["type"])
    if t in ("long", "int"):
        return _zz_enc(int(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t == "string":
        b = v.encode("utf-8")
        return _zz_enc(len(b)) + b
    if t == "bytes":
        return _zz_enc(len(v)) + v
    raise NotImplementedError(f"Avro encode for type {t}")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def read_avro_header(buf: bytes):
    """Parse the OCF header → (fields, codec, sync, body_offset)."""
    if buf[:4] != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    rd = _Reader(buf)
    rd.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = rd.long()
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            rd.long()
        for _ in range(n):
            k = rd.string()
            meta[k] = rd.bytes_()
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} not supported")
    if schema.get("type") != "record":
        raise NotImplementedError("Avro arm reads record schemas only")
    sync = rd.raw(16)
    return schema["fields"], codec, sync, rd.pos


def iter_avro_blocks(buf: bytes):
    """Yield one decoded ``pa.Table`` per OCF block (bounded memory)."""
    fields, codec, sync, pos = read_avro_header(buf)
    names = [f["name"] for f in fields]
    types = [f["type"] for f in fields]
    arrow_types = [_avro_type_to_arrow(t) for t in types]
    rd = _Reader(buf)
    rd.pos = pos
    while rd.pos < len(buf):
        n_rows = rd.long()
        size = rd.long()
        data = rd.raw(size)
        if rd.raw(16) != sync:
            raise ValueError("Avro block sync marker mismatch")
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        yield _decode_block(data, n_rows, names, types, arrow_types)


def _decode_block(data: bytes, n_rows: int, names, types, arrow_types) -> pa.Table:
    rd = _Reader(data)
    cols: list[list] = [[] for _ in names]
    for _ in range(n_rows):
        for c, t in enumerate(types):
            cols[c].append(_decode_value(rd, t))
    if rd.pos != len(data):
        raise ValueError("Avro block has trailing bytes")
    return pa.table(
        {n: pa.array(v, type=at) for n, v, at in zip(names, cols, arrow_types)}
    )


def _decode_value(rd: _Reader, t):
    if isinstance(t, list):  # union
        branch = rd.long()
        return _decode_value(rd, t[branch])
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros":
            return rd.long()  # pa.array casts us-int to timestamp[us]
        return _decode_value(rd, t["type"])
    if t in ("long", "int"):
        return rd.long()
    if t == "double":
        return rd.double()
    if t == "float":
        return rd.float_()
    if t == "boolean":
        return rd.bool_()
    if t == "string":
        return rd.string()
    if t == "bytes":
        return rd.bytes_()
    if t == "null":
        return None
    raise NotImplementedError(f"Avro decode for type {t}")


def decode_avro(buf: bytes) -> pa.Table:
    """Whole-file decode (tests / small fixtures)."""
    blocks = list(iter_avro_blocks(buf))
    if not blocks:
        fields, _, _, _ = read_avro_header(buf)
        return pa.table(
            {
                f["name"]: pa.array([], type=_avro_type_to_arrow(f["type"]))
                for f in fields
            }
        )
    return pa.concat_tables(blocks)


def make_avro_datasource(paths, columns):
    """Ray datasource: one Ray block per OCF block, columns dropped right
    after decode (row-major format — no storage-side projection exists,
    same documented caveat as the JSONL arm)."""
    from ray.data.datasource import FileBasedDatasource

    class AvroDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["avro"]

        def _read_stream(self, f, path: str):
            buf = f.readall() if hasattr(f, "readall") else f.read()
            for t in iter_avro_blocks(buf):
                yield t.select(columns) if columns is not None else t

    return AvroDatasource(paths)


def ocf_schema(path: str) -> pa.Schema:
    """Arrow schema of an OCF file from its header only (the header is
    the first few KiB; no block is decoded)."""
    with open(path, "rb") as f:
        buf = f.read(1 << 20)  # header is tiny; 1 MiB covers huge metas
    fields, _, _, _ = read_avro_header(buf)
    return pa.schema(
        [pa.field(f["name"], _avro_type_to_arrow(f["type"])) for f in fields]
    )

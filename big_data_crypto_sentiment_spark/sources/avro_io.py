"""Pure-Python Avro Object Container File support (SURVEY.md S5).

The reference's batch layer reads Avro captures with the spark-avro
connector (`spark.read.format("avro")`, terraform/scripts/
batch_to_mongo.py:364). This environment ships Avro core jars but not
the spark-avro DataSource, so the same capability is rebuilt from the
PUBLIC Avro 1.x spec (container magic `Obj\\x01`, zigzag-varint binary
encoding, null/deflate codecs) with Spark-first plumbing:

  * `write_avro` — driver-side container writer (fixture/capture
    generation; one block, null or deflate codec).
  * `read_avro` — DISTRIBUTED reader: `spark.read.format("binaryFile")`
    lists and ships whole files to executors, and an Arrow-batched
    `mapInPandas` decodes each container there. Parallelism granularity
    is per-file (the natural unit for capture directories of many
    chunk files); each file is self-describing, so decode uses the
    file's own writer schema and projects to the expected columns.

Supported schema subset (covers the reference's tweet/price captures):
null, boolean, int, long, float, double, string, bytes, fixed, enum,
arrays/maps of those, nullable unions `[null, T]` / `[T, null]`, and a
top-level record. Anything else raises NotImplementedError loudly.
"""

from __future__ import annotations

import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic writer sync marker


# --- binary primitive codec (Avro spec: zigzag varints, LE floats) ---
def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
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
    def __init__(self, data: bytes):
        self.buf = memoryview(data)
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = bytes(self.buf[self.pos:self.pos + n])
        if len(out) != n:
            raise ValueError("truncated avro data")
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def read_long(self) -> int:
        shift, u = 0, 0
        while True:
            if self.pos >= len(self.buf):
                # truncated mid-varint: same loud ValueError as read(),
                # never an IndexError with a less useful message
                raise ValueError("truncated avro data")
            if shift > 63:
                # spec: a zigzag long fits 10 varint bytes; a crafted
                # run of continuation bytes must not build an
                # arbitrarily large Python int
                raise ValueError("avro varint longer than 10 bytes")
            b = self.buf[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


# Absolute per-block item budget for arrays/maps whose items encode to
# zero bytes — large enough for any real block, small enough that a
# crafted 2^60 count still dies loudly instead of hanging the executor.
_MAX_BLOCK_ITEMS = 1 << 20


def _block_count(r: _Reader) -> int:
    """One array/map block count (negative count = block byte-size
    follows, per spec), bounded against the remaining buffer: items
    whose encoding is zero bytes (empty records, `null`-typed fields)
    would otherwise let a crafted count of 2^60 hang the executor
    appending that many values — adversarial CPU/memory with no
    truncation error ever reached. Items with a non-empty encoding
    can never outnumber 8x the remaining bytes; zero-byte item
    encodings (items type `null`, empty records) are legal at ANY
    count, so they get an absolute per-block item budget instead of
    the byte-ratio bound (total appended work stays bounded because
    each further block costs at least one count varint)."""
    n = r.read_long()
    if n < 0:  # negative count: block byte-size follows
        n = -n
        r.read_long()
    remaining = len(r.buf) - r.pos
    if n > max(8 * remaining + 1024, _MAX_BLOCK_ITEMS):
        raise ValueError(
            f"avro block count {n} implausible for {remaining} "
            "remaining bytes")
    return n


def _union_null_branch(schema: list):
    """[null, T] / [T, null] -> (null_index, T); else NotImplementedError."""
    if len(schema) == 2 and "null" in schema:
        i = schema.index("null")
        return i, schema[1 - i]
    raise NotImplementedError(f"unsupported avro union {schema!r}")


def _decode(schema, r: _Reader):
    if isinstance(schema, list):
        idx = r.read_long()
        null_i, other = _union_null_branch(schema)
        return None if idx == null_i else _decode(other, r)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(f["type"], r)
                    for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = _block_count(r)
                if n == 0:
                    return out
                out.extend(_decode(schema["items"], r) for _ in range(n))
        if t == "map":
            out = {}
            while True:
                n = _block_count(r)
                if n == 0:
                    return out
                for _ in range(n):
                    out[r.read_bytes().decode()] = _decode(schema["values"], r)
        if t == "fixed":
            return r.read(schema["size"])
        if t == "enum":
            i = r.read_long()
            symbols = schema["symbols"]
            if not 0 <= i < len(symbols):
                # unvalidated, a NEGATIVE index would silently wrap via
                # Python list indexing and return the WRONG symbol (a
                # corruption, not a crash); out-of-range raises loudly
                raise ValueError(f"avro enum index {i} out of range")
            return symbols[i]
        return _decode(t, r)  # {"type": "string"} primitive wrapper
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) == b"\x01"
    if schema in ("int", "long"):
        return r.read_long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "string":
        return r.read_bytes().decode("utf-8")
    if schema == "bytes":
        return r.read_bytes()
    raise NotImplementedError(f"unsupported avro type {schema!r}")


def _encode(schema, val, out: bytearray) -> None:
    if isinstance(schema, list):
        null_i, other = _union_null_branch(schema)
        if val is None:
            out += _zigzag_encode(null_i)
        else:
            out += _zigzag_encode(1 - null_i)
            _encode(other, val, out)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], val[f["name"]], out)
            return
        if t == "array":
            if val:
                out += _zigzag_encode(len(val))
                for v in val:
                    _encode(schema["items"], v, out)
            out += _zigzag_encode(0)
            return
        if t == "map":
            if val:
                out += _zigzag_encode(len(val))
                for k, v in val.items():
                    kb = k.encode()
                    out += _zigzag_encode(len(kb)) + kb
                    _encode(schema["values"], v, out)
            out += _zigzag_encode(0)
            return
        if t == "fixed":
            out += bytes(val)
            return
        if t == "enum":
            out += _zigzag_encode(schema["symbols"].index(val))
            return
        _encode(t, val, out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out += b"\x01" if val else b"\x00"
        return
    if schema in ("int", "long"):
        out += _zigzag_encode(int(val))
        return
    if schema == "float":
        out += struct.pack("<f", val)
        return
    if schema == "double":
        out += struct.pack("<d", val)
        return
    if schema == "string":
        vb = val.encode("utf-8")
        out += _zigzag_encode(len(vb)) + vb
        return
    if schema == "bytes":
        out += _zigzag_encode(len(val)) + bytes(val)
        return
    raise NotImplementedError(f"unsupported avro type {schema!r}")


# --- container file (header, codec, sync-delimited blocks) ---
def write_avro(path: str, records: list[dict], schema: dict,
               codec: str = "null") -> None:
    """Write one Avro OCF with a single data block (fixture writer)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"unsupported codec {codec!r}")
    body = bytearray()
    for rec in records:
        _encode(schema, rec, body)
    data = bytes(body)
    if codec == "deflate":  # RFC 1951 raw deflate, per the avro spec
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = c.compress(bytes(body)) + c.flush()
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out = bytearray(MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += SYNC
    if records:
        out += _zigzag_encode(len(records))
        out += _zigzag_encode(len(data))
        out += data
        out += SYNC
    with open(path, "wb") as f:
        f.write(out)


def decode_container(content: bytes) -> tuple[dict, list[dict]]:
    """(writer_schema, records) from one container file's bytes."""
    r = _Reader(content)
    if r.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode()
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    records: list[dict] = []
    while not r.at_end():
        n_rec = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"unsupported codec {codec!r}")
        if not 0 <= n_rec <= 8 * len(block) + 1024:
            # records encoding to zero bytes (empty-record schemas)
            # would let a crafted count hang the executor; the same
            # plausibility bound as _block_count
            raise ValueError(
                f"avro block record count {n_rec} implausible for "
                f"{len(block)}-byte block")
        br = _Reader(block)
        records.extend(_decode(schema, br) for _ in range(n_rec))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records


# --- avro schema -> Spark schema ---
_PRIM = {"boolean": T.BooleanType(), "int": T.IntegerType(),
         "long": T.LongType(), "float": T.FloatType(),
         "double": T.DoubleType(), "string": T.StringType(),
         "bytes": T.BinaryType()}


def to_spark_type(schema) -> T.DataType:
    if isinstance(schema, list):
        return to_spark_type(_union_null_branch(schema)[1])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return T.StructType([
                T.StructField(f["name"], to_spark_type(f["type"]), True)
                for f in schema["fields"]])
        if t == "array":
            return T.ArrayType(to_spark_type(schema["items"]))
        if t == "map":
            return T.MapType(T.StringType(), to_spark_type(schema["values"]))
        if t == "fixed":
            return T.BinaryType()
        if t == "enum":
            return T.StringType()
        return to_spark_type(t)
    if schema in _PRIM:
        return _PRIM[schema]
    raise NotImplementedError(f"unsupported avro type {schema!r}")


_TO_AVRO = {T.BooleanType(): "boolean", T.IntegerType(): "int",
            T.LongType(): "long", T.FloatType(): "float",
            T.DoubleType(): "double", T.StringType(): "string",
            T.BinaryType(): "bytes"}


def to_avro_schema(schema: T.StructType, name: str = "record") -> dict:
    """Spark StructType -> Avro record schema (nullable primitives)."""
    fields = []
    for f in schema.fields:
        if f.dataType not in _TO_AVRO:
            raise NotImplementedError(
                f"no avro mapping for spark type {f.dataType!r}")
        t = _TO_AVRO[f.dataType]
        fields.append({"name": f.name,
                       "type": ["null", t] if f.nullable else t})
    return {"type": "record", "name": name, "fields": fields}


def read_avro(spark: SparkSession, path: str,
              avro_schema: dict | None = None) -> DataFrame:
    """Distributed OCF read: binaryFile listing + mapInPandas decode.

    Schema comes from `avro_schema` if given; otherwise it is inferred
    from one file's header on the driver (pass the schema explicitly on
    huge directories to skip that one-file read)."""
    files = spark.read.format("binaryFile").load(path)
    if avro_schema is None:
        head = files.select("content").head()
        if head is None:
            raise ValueError(f"no files at {path!r}")
        avro_schema, _ = decode_container(bytes(head.content))
    spark_schema = to_spark_type(avro_schema)
    if not isinstance(spark_schema, T.StructType):
        raise NotImplementedError("top-level avro schema must be a record")
    cols = [f.name for f in spark_schema.fields]

    def decode_files(batches):
        import pandas as pd
        for pdf in batches:
            for content in pdf["content"]:
                _, records = decode_container(bytes(content))
                yield pd.DataFrame(records, columns=cols)

    return files.select("content").mapInPandas(decode_files, spark_schema)

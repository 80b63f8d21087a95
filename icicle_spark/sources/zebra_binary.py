"""Zebra binary (``.zbin``) fact-store reader / writer.

The reference ingests striped columnar fact stores in the zebra
binary format (``icicle-compiler/src/Icicle/Runtime/Serial/Zebra.hs``
maps the striped tables onto runtime input; the wire format itself
lives in the external zebra-core package named in ``cabal.project``).
This module implements the format natively — pure Python + numpy, no
codec libraries — so the engine can ``:load file.zbin`` exactly like
the reference REPL does in ``test/cli/repl/t70-zebra/script``.

Wire format, verified byte-for-byte against
``data/example/sample.zbin`` (whose logical content is the known
plaintext ``sample.ztxt``):

.. code-block:: text

   file       = "||ZEBRA||00003||" byte_array(schema JSON) block*
   block      = table                      (root table, one per block)
   table      = u32 row_count  column*     (nested tables identical)
   column     = by schema node:
     int / date   u32 nbytes  i64 midpoint  zig-zag(x - midpoint)
                  — deltas are raw little-endian u64 * n when
                  nbytes == 8n, else snappy of those 8n bytes
     double       same, over the IEEE-754 bit patterns as int64
     binary       int column of lengths + byte_array(concat bytes)
     struct       field columns in declaration order
     enum         int column of tags + EVERY variant column (len n)
     array / map  int column of lengths + inner table
     reversed     the inner column (ordering annotation only)
     unit         nothing
   byte_array = u32 uncompressed_len  u32 compressed_len  snappy

Snappy is implemented here: the decoder covers the full block format
(literals incl. extended lengths, all three copy tags); the encoder
emits standard-compliant literal-only streams (self-describing, any
snappy reader accepts them).

Arrays packed with 64-value bit-packed frames (a size that is neither
raw nor snappy) have not been observed in the reference tree; the
decoder raises a loud ``NotImplementedError`` rather than guessing.

The legacy V2 layout (``||ZEBRA||00002||``, attribute-keyed blocks)
is intentionally out of scope: the reference's own CLI suites ship
``input.zbin2`` files but their run scripts exercise only the V3
path (``test/cli/zebra/run`` line 31 "Zebra v3").
"""

from __future__ import annotations

import datetime as dt
import json
import struct
from dataclasses import dataclass

import numpy as np

HEADER = b"||ZEBRA||00003||"
#: days from 1600-03-01 (the Ivory epoch, Time.hs:149-165) to 1970-01-01
_EPOCH = dt.date(1600, 3, 1)


# ------------------------------------------------------------------ snappy


def snappy_decompress(buf: bytes) -> bytes:
    """Decode one raw snappy block (format: varint uncompressed length,
    then literal/copy tagged chunks)."""
    i, n, shift = 0, 0, 0
    while True:
        b = buf[i]
        n |= (b & 0x7F) << shift
        i += 1
        shift += 7
        if not b & 0x80:
            break
    out = bytearray()
    ln = len(buf)
    while i < ln:
        t = buf[i]
        i += 1
        tag = t & 3
        if tag == 0:  # literal
            size = (t >> 2) + 1
            if size > 60:
                nb = size - 60
                size = int.from_bytes(buf[i:i + nb], "little") + 1
                i += nb
            out += buf[i:i + size]
            i += size
            continue
        if tag == 1:
            size = ((t >> 2) & 7) + 4
            off = ((t >> 5) << 8) | buf[i]
            i += 1
        elif tag == 2:
            size = (t >> 2) + 1
            off = int.from_bytes(buf[i:i + 2], "little")
            i += 2
        else:
            size = (t >> 2) + 1
            off = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise ValueError(f"snappy copy offset {off} out of range")
        for _ in range(size):  # overlapping copies are legal
            out.append(out[-off])
    if len(out) != n:
        raise ValueError(f"snappy length mismatch: {len(out)} != {n}")
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Encode as literal-only snappy (standard-compliant; every
    decoder, including :func:`snappy_decompress`, accepts it)."""
    out = bytearray()
    n = len(data)
    v = n
    while True:  # varint uncompressed length
        if v < 0x80:
            out.append(v)
            break
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    i = 0
    while i < n:
        chunk = data[i:i + 65536]
        size = len(chunk)
        if size <= 60:
            out.append((size - 1) << 2)
        else:  # 2-byte extended literal length (tag 61)
            out.append(61 << 2)
            out += (size - 1).to_bytes(2, "little")
        out += chunk
        i += size
    return bytes(out)


# ------------------------------------------------------------ wire streams


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def i64(self) -> int:
        v = struct.unpack_from("<q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated zebra file")
        self.pos += n
        return b

    def int_array(self, n: int) -> np.ndarray:
        """midpoint + zig-zag deltas -> int64 values (bit-exact for
        the full uint64 range — doubles ride through as bit patterns)."""
        nbytes = self.u32()
        mid = self.i64()
        if n == 0:
            if nbytes:
                raise ValueError("non-empty packed bytes for 0 rows")
            return np.zeros(0, dtype=np.int64)
        raw = self.take(nbytes)
        if nbytes != 8 * n:
            raw = snappy_decompress(raw)
            if len(raw) != 8 * n:
                raise NotImplementedError(
                    f"zebra int array: {nbytes} packed bytes for {n} "
                    "values is neither raw nor snappy-of-raw "
                    "(bit-packed frames unsupported)"
                )
        z = np.frombuffer(raw, dtype="<u8").astype(np.uint64)
        deltas = (z >> np.uint64(1)) ^ (~(z & np.uint64(1)) + np.uint64(1))
        mid_u = np.uint64(mid & ((1 << 64) - 1))
        return (mid_u + deltas).view(np.int64)  # wraparound-exact

    def byte_array(self) -> bytes:
        un = self.u32()
        co = self.u32()
        b = snappy_decompress(self.take(co))
        if len(b) != un:
            raise ValueError(f"byte array length {len(b)} != header {un}")
        return b


class _Writer:
    def __init__(self) -> None:
        self.parts: list[bytes] = []

    def u32(self, v: int) -> None:
        self.parts.append(struct.pack("<I", v))

    def i64(self, v: int) -> None:
        self.parts.append(struct.pack("<q", v))

    def int_array(self, vals: np.ndarray) -> None:
        vals = np.asarray(vals, dtype=np.int64)
        if len(vals) == 0:
            self.u32(0)
            self.i64(0)
            return
        # midpoint of min/max over the raw bit patterns, as observed
        u = vals.view(np.uint64) if vals.dtype == np.int64 else vals
        lo = int(vals.min())
        hi = int(vals.max())
        mid = (lo + hi) // 2
        d = (vals.astype(object) - mid)  # object: full-range safe
        z = np.array(
            [((int(x) << 1) ^ (int(x) >> 63)) & ((1 << 64) - 1) for x in d],
            dtype=np.uint64,
        )
        raw = z.astype("<u8").tobytes()
        self.u32(len(raw))
        self.i64(mid)
        self.parts.append(raw)
        del u

    def byte_array(self, b: bytes) -> None:
        c = snappy_compress(b)
        self.u32(len(b))
        self.u32(len(c))
        self.parts.append(c)

    def blob(self) -> bytes:
        return b"".join(self.parts)


# ----------------------------------------------------- schema + logical I/O


def _schema_node(schema: dict) -> tuple[str, dict]:
    if len(schema) != 1:
        raise ValueError(f"malformed zebra schema node: {schema}")
    (kind, body), = schema.items()
    return kind, body


def _decode_column(r: _Reader, schema: dict, n: int) -> list:
    """One striped column of length ``n`` -> logical Python values."""
    kind, body = _schema_node(schema)
    if kind == "int":
        vals = r.int_array(n)
        enc = body.get("encoding")
        if enc and "date" in enc:
            return [_EPOCH + dt.timedelta(days=int(v)) for v in vals]
        return [int(v) for v in vals]
    if kind == "double":
        bits = r.int_array(n)
        return [float(x) for x in bits.view(np.float64)]
    if kind == "binary":
        lens = r.int_array(n)
        blob = r.byte_array()
        enc = body.get("encoding", {})
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(int)
        chunks = [blob[offs[i]:offs[i + 1]] for i in range(n)]
        if "utf8" in enc:
            return [c.decode("utf-8") for c in chunks]
        return chunks
    if kind == "unit":
        return [()] * n
    if kind == "reversed":
        return _decode_column(r, body, n)
    if kind == "struct":
        fields = body["fields"]
        cols = [(f["name"], _decode_column(r, f["schema"], n))
                for f in fields]
        return [{name: col[i] for name, col in cols} for i in range(n)]
    if kind == "enum":
        variants = body["variants"]
        tags = r.int_array(n)
        vcols = [(v["name"], _decode_column(r, v["schema"], n))
                 for v in variants]
        return [
            (vcols[t][0], vcols[t][1][i])
            for i, t in enumerate(tags)
        ]
    if kind in ("array", "map"):
        lens = r.int_array(n)
        total = int(lens.sum()) if n else 0
        inner_n = r.u32()
        if inner_n != total:
            raise ValueError(
                f"nested table row count {inner_n} != sum of lengths {total}"
            )
        if kind == "array":
            elems = _decode_column(r, body["element"], inner_n)
            out, at = [], 0
            for ln in lens:
                out.append(elems[at:at + int(ln)])
                at += int(ln)
            return out
        keys = _decode_column(r, body["key"], inner_n)
        vals = _decode_column(r, body["value"], inner_n)
        pairs = list(zip(keys, vals))
        out, at = [], 0
        for ln in lens:
            out.append(pairs[at:at + int(ln)])
            at += int(ln)
        return out
    raise NotImplementedError(f"zebra schema kind {kind!r}")


def _encode_column(w: _Writer, schema: dict, vals: list) -> None:
    kind, body = _schema_node(schema)
    n = len(vals)
    if kind == "int":
        enc = body.get("encoding")
        if enc and "date" in enc:
            ints = [(v - _EPOCH).days for v in vals]
        else:
            ints = [int(v) for v in vals]
        w.int_array(np.array(ints, dtype=np.int64))
        return
    if kind == "double":
        bits = np.array(vals, dtype=np.float64).view(np.int64)
        w.int_array(bits)
        return
    if kind == "binary":
        enc = body.get("encoding", {})
        chunks = [v.encode("utf-8") if "utf8" in enc else v for v in vals]
        w.int_array(np.array([len(c) for c in chunks], dtype=np.int64))
        w.byte_array(b"".join(chunks))
        return
    if kind == "unit":
        return
    if kind == "reversed":
        _encode_column(w, body, vals)
        return
    if kind == "struct":
        for f in body["fields"]:
            _encode_column(w, f["schema"], [v[f["name"]] for v in vals])
        return
    if kind == "enum":
        variants = body["variants"]
        index = {v["name"]: i for i, v in enumerate(variants)}
        defaults = [_default_value(v["schema"]) for v in variants]
        tags = [index[v[0]] for v in vals]
        w.int_array(np.array(tags, dtype=np.int64))
        for vi, var in enumerate(variants):
            col = [v[1] if tags[i] == vi else defaults[vi]
                   for i, v in enumerate(vals)]
            _encode_column(w, var["schema"], col)
        return
    if kind in ("array", "map"):
        lens = [len(v) for v in vals]
        w.int_array(np.array(lens, dtype=np.int64))
        w.u32(sum(lens))
        flat = [x for v in vals for x in v]
        if kind == "array":
            _encode_column(w, body["element"], flat)
        else:
            _encode_column(w, body["key"], [k for k, _ in flat])
            _encode_column(w, body["value"], [v for _, v in flat])
        return
    raise NotImplementedError(f"zebra schema kind {kind!r}")


def _default_value(schema: dict):
    """Filler for unselected enum variant slots (any value round-trips;
    the tag decides which variant is read back)."""
    kind, body = _schema_node(schema)
    if kind == "int":
        enc = body.get("encoding")
        return _EPOCH if enc and "date" in enc else 0
    if kind == "double":
        return 0.0
    if kind == "binary":
        return "" if "utf8" in body.get("encoding", {}) else b""
    if kind == "unit":
        return ()
    if kind == "reversed":
        return _default_value(body)
    if kind == "struct":
        return {f["name"]: _default_value(f["schema"])
                for f in body["fields"]}
    if kind == "enum":
        v0 = body["variants"][0]
        return (v0["name"], _default_value(v0["schema"]))
    if kind in ("array", "map"):
        return []
    raise NotImplementedError(f"zebra schema kind {kind!r}")


def read_zbin_schema(path: str) -> dict:
    """Just the schema JSON of a ``.zbin`` file (no block decode)."""
    with open(path, "rb") as f:
        buf = f.read(len(HEADER) + 8)
        if buf[:len(HEADER)] != HEADER:
            raise ValueError(
                f"{path}: not a zebra V3 file (header {buf[:16]!r})"
            )
        _, co = struct.unpack_from("<II", buf, len(HEADER))
        blob = f.read(co)
    return json.loads(snappy_decompress(blob).decode("utf-8"))


def read_zbin(path: str) -> tuple[dict, list]:
    """Read a ``.zbin`` file -> (schema JSON, logical rows of the root
    table, all blocks concatenated).

    Root tables are maps in icicle fact stores, so rows are
    ``(key, value)`` pairs; a root array yields elements, a root
    struct/primitive yields one value per row.
    """
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:len(HEADER)] != HEADER:
        raise ValueError(
            f"{path}: not a zebra V3 file (header {buf[:16]!r})"
        )
    r = _Reader(buf, len(HEADER))
    schema = json.loads(r.byte_array().decode("utf-8"))
    kind, body = _schema_node(schema)
    rows: list = []
    while not r.eof():
        n = r.u32()
        if kind == "map":
            keys = _decode_column(r, body["key"], n)
            vals = _decode_column(r, body["value"], n)
            rows.extend(zip(keys, vals))
        elif kind == "array":
            rows.extend(_decode_column(r, body["element"], n))
        else:
            rows.extend(_decode_column(r, schema, n))
    return schema, rows


def write_zbin(path: str, schema: dict, rows: list) -> None:
    """Inverse of :func:`read_zbin` (one block). ``rows`` use the same
    logical representation read_zbin returns."""
    w = _Writer()
    w.parts.append(HEADER)
    w.byte_array(json.dumps(schema, separators=(",", ":")).encode())
    kind, body = _schema_node(schema)
    w.u32(len(rows))
    if kind == "map":
        _encode_column(w, body["key"], [k for k, _ in rows])
        _encode_column(w, body["value"], [v for _, v in rows])
    elif kind == "array":
        _encode_column(w, body["element"], list(rows))
    else:
        _encode_column(w, schema, list(rows))
    with open(path, "wb") as f:
        f.write(w.blob())


# --------------------------------------------------- icicle fact adapter


def _is_option(schema: dict) -> dict | None:
    """``enum { none: unit, some: X }`` -> X's schema, else None."""
    kind, body = _schema_node(schema)
    if kind != "enum":
        return None
    variants = body["variants"]
    if (
        len(variants) == 2
        and variants[0]["name"] == "none"
        and variants[1]["name"] == "some"
        and _schema_node(variants[0]["schema"])[0] == "unit"
    ):
        return variants[1]["schema"]
    return None


def _spark_type(schema: dict):
    from pyspark.sql import types as T

    opt = _is_option(schema)
    if opt is not None:
        return _spark_type(opt)
    kind, body = _schema_node(schema)
    if kind == "int":
        enc = body.get("encoding")
        if enc and "date" in enc:
            return T.TimestampType()
        return T.LongType()
    if kind == "double":
        return T.DoubleType()
    if kind == "binary":
        return T.StringType() if "utf8" in body.get("encoding", {}) \
            else T.BinaryType()
    if kind == "unit":
        return T.BooleanType()
    if kind == "reversed":
        return _spark_type(body)
    if kind == "struct":
        return T.StructType(
            [T.StructField(f["name"], _spark_type(f["schema"]))
             for f in body["fields"]]
        )
    if kind == "array":
        return T.ArrayType(_spark_type(body["element"]))
    raise NotImplementedError(
        f"zebra input value kind {kind!r} has no fact-column mapping"
    )


@dataclass(frozen=True)
class ZebraInput:
    """One icicle input found in a zebra fact store."""

    namespace: str
    name: str
    value_schema: dict   # zebra schema of the fact value (Option peeled)


def zebra_inputs(schema: dict) -> list[ZebraInput]:
    """The icicle inputs declared by a fact-store schema. The store
    root is ``map (entity_hash, entity_id) (struct of "ns:input")``
    with each input a ``map (time, factset_id) (array (Option value))``
    — the shape Runtime/Serial/Zebra.hs decodes."""
    kind, body = _schema_node(schema)
    if kind != "map":
        raise ValueError(f"fact store root must be a map, got {kind!r}")
    vkind, vbody = _schema_node(body["value"])
    if vkind != "struct":
        raise ValueError("fact store value must be a struct of inputs")
    out = []
    for f in vbody["fields"]:
        ns, _, name = f["name"].rpartition(":")
        ikind, ibody = _schema_node(f["schema"])
        if ikind != "map":
            raise ValueError(f"input {f['name']!r} is not a fact map")
        akind, abody = _schema_node(ibody["value"])
        if akind != "array":
            raise ValueError(f"input {f['name']!r} facts are not an array")
        elem = _is_option(abody["element"])
        if elem is None:
            raise ValueError(
                f"input {f['name']!r} fact element is not Option-shaped"
            )
        out.append(ZebraInput(ns or "default", name, elem))
    return out


def zebra_dictionary(schema: dict):
    """Derive the engine Dictionary a ``:load file.zbin`` implies
    (the reference REPL prints "Loaded dictionary with N inputs").
    Struct values keep their field names; primitive values become the
    single implicit ``value`` column, as in PSV dictionaries."""
    from pyspark.sql import types as T

    from icicle_spark.dictionary import Dictionary, DictionaryInput

    inputs = []
    for zi in zebra_inputs(schema):
        st = _spark_type(zi.value_schema)
        vfields = (
            list(st.fields) if isinstance(st, T.StructType)
            else [T.StructField("value", st)]
        )
        full = T.StructType(
            [
                T.StructField("entity", T.StringType()),
                T.StructField("time", T.TimestampType()),
                T.StructField("seq", T.LongType()),
                *vfields,
            ]
        )
        inputs.append(
            DictionaryInput(name=zi.name, schema=full, seq_col="seq")
        )
    return Dictionary(inputs=inputs, outputs=[])


def _logical_to_cell(schema: dict, v):
    """Zebra logical value -> Spark row cell (Options peeled to null,
    dates to midnight timestamps, enums beyond Option rejected)."""
    opt = _is_option(schema)
    if opt is not None:
        tag, inner = v
        return None if tag == "none" else _logical_to_cell(opt, inner)
    kind, body = _schema_node(schema)
    if kind == "reversed":
        return _logical_to_cell(body, v)
    if kind == "int":
        if isinstance(v, dt.date):
            return dt.datetime(v.year, v.month, v.day)
        return int(v)
    if kind == "struct":
        return {f["name"]: _logical_to_cell(f["schema"], v[f["name"]])
                for f in body["fields"]}
    if kind == "array":
        return [_logical_to_cell(body["element"], x) for x in v]
    if kind in ("double", "binary", "unit"):
        return v if kind != "unit" else True
    raise NotImplementedError(f"zebra value kind {kind!r} in facts")


def zebra_fact_rows(path: str) -> tuple[dict, dict[str, list[dict]]]:
    """Read a fact store -> (schema, input name -> engine fact rows).

    Rows carry ``entity`` / ``time`` / value fields / ``tombstone`` /
    ``seq`` — the same frame shape ``repl.load_typed_facts`` builds
    from PSV, so every downstream plan path is shared. ``seq`` is the
    store order (entity-major, then map order), the ingestion order
    ties on ``time`` resolve by.
    """
    schema, rows = read_zbin(path)
    inputs = zebra_inputs(schema)
    kind, body = _schema_node(schema)
    per_input: dict[str, list[dict]] = {zi.name: [] for zi in inputs}
    vfields = _schema_node(body["value"])[1]["fields"]
    seq = 0
    for key, val in rows:
        entity = key["entity_id"]
        if isinstance(entity, bytes):
            entity = entity.decode("utf-8")
        for zi, f in zip(inputs, vfields):
            for fact_key, fact_vals in val[f["name"]]:
                t = fact_key["time"]
                if isinstance(t, dt.date) and not isinstance(t, dt.datetime):
                    t = dt.datetime(t.year, t.month, t.day)
                for tag, inner in fact_vals:
                    if tag == "none":
                        row = {"entity": entity, "time": t,
                               "tombstone": True, "seq": seq}
                    else:
                        cell = _logical_to_cell(zi.value_schema, inner)
                        if not isinstance(cell, dict):
                            cell = {"value": cell}
                        row = {"entity": entity, "time": t, **cell,
                               "tombstone": False, "seq": seq}
                    per_input[zi.name].append(row)
                    seq += 1
    return schema, per_input


def load_zebra_facts(spark, path: str, input_name: str):
    """Spark facts frame for one input of a ``.zbin`` store — same
    schema as ``repl.load_typed_facts`` (entity, time, value fields,
    tombstone, seq)."""
    from pyspark.sql import types as T

    schema, per_input = zebra_fact_rows(path)
    if input_name not in per_input:
        raise ValueError(
            f"input {input_name!r} not in {path} "
            f"(has {sorted(per_input)})"
        )
    dic = zebra_dictionary(schema)
    inp = dic.inputs[input_name]
    vfields = inp.value_fields()
    fact_schema = T.StructType(
        [
            T.StructField("entity", T.StringType()),
            T.StructField("time", T.TimestampType()),
            *[T.StructField(f.name, f.dataType) for f in vfields],
            T.StructField("tombstone", T.BooleanType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    rows = [
        {**{f.name: None for f in vfields}, **r}
        for r in per_input[input_name]
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, fact_schema)
    if len(vfields) > 1:
        df = df.withColumn(
            "fields",
            F.when(
                ~F.col("tombstone"),
                F.struct(*[F.col(f.name) for f in
                           sorted(vfields, key=lambda x: x.name)]),
            ),
        )
    return df

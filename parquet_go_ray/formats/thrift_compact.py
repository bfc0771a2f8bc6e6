"""Minimal Thrift Compact Protocol — just enough for Parquet file metadata.

Hand-rolled from the public Thrift compact-protocol spec (THRIFT-110) and the
public parquet-format IDL; no thrift runtime exists in this container.  The
reference reads/writes the same wire format through its generated bindings
(reference: parquet/parquet.go — thrift-generated; footer I/O at
writer/writer.go:206-223 and reader/reader.go:148-176).

Structs are described declaratively: ``{field_id: (name, ftype)}`` with
ftype one of ``bool i8 i16 i32 i64 double binary string struct:<Name>
list:<ftype>``.  Values are plain dicts keyed by field name; ``None`` /
missing fields are skipped on write, unknown fields are skipped on read
(full skip support, so foreign writers' extra fields are tolerated).
"""

from __future__ import annotations

# compact-protocol type codes
CT_STOP = 0
CT_TRUE = 1
CT_FALSE = 2
CT_BYTE = 3
CT_I16 = 4
CT_I32 = 5
CT_I64 = 6
CT_DOUBLE = 7
CT_BINARY = 8
CT_LIST = 9
CT_SET = 10
CT_MAP = 11
CT_STRUCT = 12

_CTYPE = {
    "bool": CT_TRUE,  # placeholder; actual field header carries the value
    "i8": CT_BYTE,
    "i16": CT_I16,
    "i32": CT_I32,
    "i64": CT_I64,
    "double": CT_DOUBLE,
    "binary": CT_BINARY,
    "string": CT_BINARY,
}


def _uvarint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _zig(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzig(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _base_ct(ftype: str) -> int:
    if ftype.startswith("struct:"):
        return CT_STRUCT
    if ftype.startswith("list:"):
        return CT_LIST
    return _CTYPE[ftype]


class CompactWriter:
    def __init__(self, specs: dict[str, dict[int, tuple[str, str]]]):
        self.specs = specs
        self.out = bytearray()

    def write_struct(self, spec_name: str, obj: dict) -> None:
        fields = self.specs[spec_name]
        last = 0
        for fid in sorted(fields):
            name, ftype = fields[fid]
            val = obj.get(name)
            if val is None:
                continue
            if ftype == "bool":
                ct = CT_TRUE if val else CT_FALSE
            else:
                ct = _base_ct(ftype)
            delta = fid - last
            if 1 <= delta <= 15:
                self.out.append((delta << 4) | ct)
            else:
                self.out.append(ct)
                self.out += _uvarint(_zig(fid))
            if ftype != "bool":
                self._write_value(ftype, val)
            last = fid
        self.out.append(CT_STOP)

    def _write_value(self, ftype: str, val) -> None:
        out = self.out
        if ftype in ("i16", "i32", "i64"):
            out += _uvarint(_zig(int(val)))
        elif ftype == "i8":
            out.append(int(val) & 0xFF)
        elif ftype == "double":
            import struct

            out += struct.pack("<d", float(val))
        elif ftype in ("binary", "string"):
            if isinstance(val, str):
                val = val.encode()
            out += _uvarint(len(val))
            out += val
        elif ftype.startswith("struct:"):
            self.write_struct(ftype[7:], val)
        elif ftype.startswith("list:"):
            elem = ftype[5:]
            ect = _base_ct(elem) if elem != "bool" else CT_TRUE
            n = len(val)
            if n < 15:
                out.append((n << 4) | ect)
            else:
                out.append(0xF0 | ect)
                out += _uvarint(n)
            for v in val:
                if elem == "bool":
                    out.append(CT_TRUE if v else CT_FALSE)
                else:
                    self._write_value(elem, v)
        else:
            raise TypeError(f"unsupported ftype {ftype}")


class CompactReader:
    def __init__(self, specs: dict[str, dict[int, tuple[str, str]]], buf: bytes):
        self.specs = specs
        self.buf = buf

    def read_struct(self, spec_name: str, pos: int = 0) -> tuple[dict, int]:
        fields = self.specs[spec_name]
        buf = self.buf
        obj: dict = {}
        last = 0
        while True:
            header = buf[pos]
            pos += 1
            if header == CT_STOP:
                return obj, pos
            ct = header & 0x0F
            delta = header >> 4
            if delta:
                fid = last + delta
            else:
                zz, pos = _read_uvarint(buf, pos)
                fid = _unzig(zz)
            last = fid
            spec = fields.get(fid)
            if spec is None:
                pos = self._skip(ct, pos)
                continue
            name, ftype = spec
            if ct in (CT_TRUE, CT_FALSE):
                obj[name] = ct == CT_TRUE
            else:
                obj[name], pos = self._read_value(ftype, pos)
        # unreachable

    def _read_value(self, ftype: str, pos: int):
        buf = self.buf
        if ftype in ("i16", "i32", "i64"):
            zz, pos = _read_uvarint(buf, pos)
            return _unzig(zz), pos
        if ftype == "i8":
            v = buf[pos]
            return (v - 256 if v >= 128 else v), pos + 1
        if ftype == "double":
            import struct

            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        if ftype in ("binary", "string"):
            ln, pos = _read_uvarint(buf, pos)
            raw = bytes(buf[pos : pos + ln])
            return (raw.decode() if ftype == "string" else raw), pos + ln
        if ftype.startswith("struct:"):
            return self.read_struct(ftype[7:], pos)
        if ftype.startswith("list:"):
            elem = ftype[5:]
            header = buf[pos]
            pos += 1
            n = header >> 4
            if n == 15:
                n, pos = _read_uvarint(buf, pos)
            out = []
            for _ in range(n):
                if elem == "bool":
                    out.append(buf[pos] == CT_TRUE)
                    pos += 1
                else:
                    v, pos = self._read_value(elem, pos)
                    out.append(v)
            return out, pos
        raise TypeError(f"unsupported ftype {ftype}")

    # -- skipping unknown fields ----------------------------------------

    def _skip(self, ct: int, pos: int) -> int:
        buf = self.buf
        if ct in (CT_TRUE, CT_FALSE):
            return pos
        if ct == CT_BYTE:
            return pos + 1
        if ct in (CT_I16, CT_I32, CT_I64):
            _, pos = _read_uvarint(buf, pos)
            return pos
        if ct == CT_DOUBLE:
            return pos + 8
        if ct == CT_BINARY:
            ln, pos = _read_uvarint(buf, pos)
            return pos + ln
        if ct in (CT_LIST, CT_SET):
            header = buf[pos]
            pos += 1
            n = header >> 4
            ect = header & 0x0F
            if n == 15:
                n, pos = _read_uvarint(buf, pos)
            for _ in range(n):
                pos = self._skip_elem(ect, pos)
            return pos
        if ct == CT_MAP:
            n, pos = _read_uvarint(buf, pos)
            if n == 0:
                return pos
            kv = buf[pos]
            pos += 1
            for _ in range(n):
                pos = self._skip_elem(kv >> 4, pos)
                pos = self._skip_elem(kv & 0x0F, pos)
            return pos
        if ct == CT_STRUCT:
            while True:
                header = buf[pos]
                pos += 1
                if header == CT_STOP:
                    return pos
                if (header >> 4) == 0:
                    _, pos = _read_uvarint(buf, pos)
                pos = self._skip(header & 0x0F, pos)
        raise TypeError(f"cannot skip compact type {ct}")

    def _skip_elem(self, ect: int, pos: int) -> int:
        # container element bools are one byte, unlike field bools
        if ect in (CT_TRUE, CT_FALSE):
            return pos + 1
        return self._skip(ect, pos)

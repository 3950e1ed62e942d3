#!/usr/bin/env python3
"""Independent Zarr conformance fixture generator — Python STDLIB ONLY.

Writes Zarr v2 and v3 stores from the format specifications directly
(json + zlib + gzip + struct), with no zarr-python/numcodecs involved, so
the Scala reader is checked against a SECOND, independently-written
implementation of the wire format. A self-consistent-but-wrong assumption
shared by the Scala writer and reader (byte order, chunk overhang, vlen
framing, half-float packing, subarray layout) cannot survive this sweep;
fixtures produced by the engine's own ZarrStoreWriter could never catch it.

Output: src/test/resources/zarr_conformance/<store>/... plus manifest.json
describing every array's expected values. ZarrConformanceSpec reads each
store with the production reader and compares cell-by-cell.

Matrix: v2 {zlib, gzip, uncompressed} x {i4, >f8, u2 (unsigned widen),
b1, f2 (IEEE half), |S6, >U4 (big-endian UCS4), M8[s] (incl. NaT),
>i2 + fill_value + missing chunk, vlen-utf8 (unicode + empty), structured
with per-field SHAPES}; v3 {bytes(le)+gzip 2-D, bytes(BIG)+crc32c,
fill_value + missing chunk}. Every 2-D case has edge (overhang) chunks;
overhang cells are zero-packed and must be ignored by the reader.

Run: python3 scripts/gen_conformance_fixtures.py   (idempotent, rewrites)
"""
import gzip as gzip_mod
import json
import os
import shutil
import struct
import sys
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "zarr_conformance")

manifest = []


def cells_c_order(shape):
    """All coordinates of `shape`, row-major."""
    if not shape:
        yield ()
        return
    head, tail = shape[0], shape[1:]
    for i in range(head):
        for rest in cells_c_order(tail):
            yield (i,) + rest


def chunk_grid(shape, chunks):
    n = [(s + c - 1) // c for s, c in zip(shape, chunks)]
    return cells_c_order(n)


def pack_scalar(dtype, v):
    """One cell of a scalar numpy dtype string -> bytes (spec packing)."""
    order = "<" if dtype[0] in "<|=" else ">"
    kind = dtype[1:] if dtype[0] in "<>|=" else dtype
    if kind == "i4":
        return struct.pack(order + "i", v)
    if kind == "i2":
        return struct.pack(order + "h", v)
    if kind == "i8":
        return struct.pack(order + "q", v)
    if kind == "u2":
        return struct.pack(order + "H", v)
    if kind == "f8":
        return struct.pack(order + "d", v)
    if kind == "f4":
        return struct.pack(order + "f", v)
    if kind == "f2":
        return struct.pack(order + "e", v)
    if kind == "b1":
        return bytes([1 if v else 0])
    if kind.startswith("S"):
        width = int(kind[1:])
        b = v.encode("utf-8")
        assert len(b) <= width
        return b + b"\x00" * (width - len(b))
    if kind.startswith("U"):
        width = int(kind[1:])
        cps = [ord(c) for c in v]
        assert len(cps) <= width
        cps += [0] * (width - len(cps))
        return b"".join(struct.pack(order + "I", c) for c in cps)
    if kind == "M8[s]":
        return struct.pack(order + "q", v)
    raise ValueError(dtype)


def compress_v2(compressor, raw):
    if compressor is None:
        return raw
    if compressor["id"] == "zlib":
        return zlib.compress(raw, compressor.get("level", 6))
    if compressor["id"] == "gzip":
        return gzip_mod.compress(raw, compresslevel=compressor.get("level", 6))
    raise ValueError(compressor)


def write_v2_array(store, name, shape, chunks, dtype, value_fn, compressor,
                   fill_json="null", filters=None, cell_packer=None, item_size=None):
    """One v2 array: .zarray + .zattrs + dotted chunk files. `value_fn` maps
    a coordinate tuple to the python value; None skips the whole chunk
    (missing -> fill). Overhang cells pack as zeros."""
    adir = os.path.join(OUT, store, name)
    os.makedirs(adir, exist_ok=True)
    dtype_json = dtype if dtype.startswith("[") else '"%s"' % dtype
    meta = ('{"zarr_format": 2, "shape": %s, "chunks": %s, "dtype": %s, '
            '"order": "C", "compressor": %s, "fill_value": %s, "filters": %s}') % (
        json.dumps(list(shape)), json.dumps(list(chunks)), dtype_json,
        "null" if compressor is None else json.dumps(compressor),
        fill_json, "null" if not filters else json.dumps(filters))
    with open(os.path.join(adir, ".zarray"), "w") as f:
        f.write(meta)
    dims = ["d%d" % i for i in range(len(shape))]
    with open(os.path.join(adir, ".zattrs"), "w") as f:
        f.write(json.dumps({"_ARRAY_DIMENSIONS": dims}))
    packer = cell_packer or (lambda v: pack_scalar(dtype, v))
    if item_size is None:
        item_size = len(packer(value_fn(tuple(0 for _ in shape))))
    for cidx in chunk_grid(shape, chunks):
        cell_values = []
        skip = False
        for local in cells_c_order(chunks):
            coord = tuple(ci * ch + lo for ci, ch, lo in zip(cidx, chunks, local))
            if all(x < s for x, s in zip(coord, shape)):
                v = value_fn(coord)
                if v is SKIP_CHUNK:
                    skip = True
                    break
                cell_values.append(packer(v))
            else:
                cell_values.append(b"\x00" * item_size)  # overhang: ignored
        if skip:
            continue
        raw = b"".join(cell_values)
        with open(os.path.join(adir, ".".join(str(i) for i in cidx) or "0"), "wb") as f:
            f.write(compress_v2(compressor, raw))


SKIP_CHUNK = object()


def write_v2_vlen(store, name, n, chunk, strings, compressor):
    """numcodecs vlen-utf8 chunk body: u32-LE item count, then per item
    u32-LE byte length + UTF-8 bytes (numcodecs VLenUTF8 buffer layout)."""
    adir = os.path.join(OUT, store, name)
    os.makedirs(adir, exist_ok=True)
    meta = ('{"zarr_format": 2, "shape": [%d], "chunks": [%d], "dtype": "|O", '
            '"order": "C", "compressor": %s, "fill_value": null, '
            '"filters": [{"id": "vlen-utf8"}]}') % (
        n, chunk, "null" if compressor is None else json.dumps(compressor))
    with open(os.path.join(adir, ".zarray"), "w") as f:
        f.write(meta)
    with open(os.path.join(adir, ".zattrs"), "w") as f:
        f.write(json.dumps({"_ARRAY_DIMENSIONS": ["d0"]}))
    for c0 in range((n + chunk - 1) // chunk):
        items = []
        count = 0
        for lo in range(chunk):
            i = c0 * chunk + lo
            if i < n:
                b = strings[i].encode("utf-8")
                items.append(struct.pack("<I", len(b)) + b)
                count += 1
            # numpy object chunks are full-size too; numcodecs encodes the
            # full chunk's item count — overhang items encode as empty
            else:
                items.append(struct.pack("<I", 0))
                count += 1
        raw = struct.pack("<I", count) + b"".join(items)
        with open(os.path.join(adir, str(c0)), "wb") as f:
            f.write(compress_v2(compressor, raw))


def write_group_v2(store):
    d = os.path.join(OUT, store)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zgroup"), "w") as f:
        f.write('{"zarr_format": 2}')


def write_v3_array(store, name, shape, chunks, data_type, pack, value_fn,
                   endian, codec, fill_scalar=0):
    """One v3 array: zarr.json + c/-prefixed chunk files."""
    root = os.path.join(OUT, store)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "zarr.json"), "w") as f:
        f.write('{"zarr_format": 3, "node_type": "group"}')
    adir = os.path.join(root, name)
    os.makedirs(adir, exist_ok=True)
    codecs = [{"name": "bytes", "configuration": {"endian": endian}}]
    if codec == "gzip":
        codecs.append({"name": "gzip", "configuration": {"level": 5}})
    elif codec == "crc32c":
        codecs.append({"name": "crc32c"})
    meta = {
        "zarr_format": 3, "node_type": "array", "shape": list(shape),
        "data_type": data_type,
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": list(chunks)}},
        "chunk_key_encoding": {"name": "default"},
        "fill_value": fill_scalar, "codecs": codecs,
        "dimension_names": ["d%d" % i for i in range(len(shape))],
    }
    with open(os.path.join(adir, "zarr.json"), "w") as f:
        f.write(json.dumps(meta))
    order = "<" if endian == "little" else ">"
    item = len(pack(order, value_fn(tuple(0 for _ in shape))))
    for cidx in chunk_grid(shape, chunks):
        cells = []
        skip = False
        for local in cells_c_order(chunks):
            coord = tuple(ci * ch + lo for ci, ch, lo in zip(cidx, chunks, local))
            if all(x < s for x, s in zip(coord, shape)):
                v = value_fn(coord)
                if v is SKIP_CHUNK:
                    skip = True
                    break
                cells.append(pack(order, v))
            else:
                cells.append(b"\x00" * item)
        if skip:
            continue
        raw = b"".join(cells)
        if codec == "gzip":
            raw = gzip_mod.compress(raw, compresslevel=5)
        elif codec == "crc32c":
            raw = raw + struct.pack("<I", crc32c(raw))
        path = os.path.join(adir, "c", *[str(i) for i in cidx]) if cidx else os.path.join(adir, "c")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(raw)


_CRC32C_TABLE = None


def crc32c(data):
    """CRC-32C (Castagnoli), stdlib-free (zlib.crc32 is the other poly)."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        poly = 0x82F63B78
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def add(store, array, kind, values):
    manifest.append({"store": store, "array": array, "kind": kind, "values": values})


def main():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)

    # ---- v2 scalar matrix ------------------------------------------------
    write_group_v2("v2_i4_zlib")
    write_v2_array("v2_i4_zlib", "a", (5, 7), (2, 3), "<i4",
                   lambda c: c[0] * 100 + c[1] - 17, {"id": "zlib", "level": 6})
    add("v2_i4_zlib", "a", "long", [r * 100 + c - 17 for r in range(5) for c in range(7)])

    write_group_v2("v2_f8be_gzip")
    write_v2_array("v2_f8be_gzip", "a", (11,), (4,), ">f8",
                   lambda c: c[0] * 0.25 - 1.5, {"id": "gzip", "level": 5})
    add("v2_f8be_gzip", "a", "double", [i * 0.25 - 1.5 for i in range(11)])

    write_group_v2("v2_u2_raw")
    write_v2_array("v2_u2_raw", "a", (9,), (4,), "<u2",
                   lambda c: c[0] * 7000, None)
    add("v2_u2_raw", "a", "long", [i * 7000 for i in range(9)])  # 56000 > int16

    write_group_v2("v2_b1_zlib")
    write_v2_array("v2_b1_zlib", "a", (10,), (3,), "|b1",
                   lambda c: c[0] % 3 == 0, {"id": "zlib", "level": 1})
    add("v2_b1_zlib", "a", "bool", [i % 3 == 0 for i in range(10)])

    write_group_v2("v2_f2_zlib")
    write_v2_array("v2_f2_zlib", "a", (9,), (4,), "<f2",
                   lambda c: c[0] * 0.25 - 1.0, {"id": "zlib", "level": 6})
    add("v2_f2_zlib", "a", "double", [i * 0.25 - 1.0 for i in range(9)])  # half-exact

    write_group_v2("v2_s6_zlib")
    s6 = ["w%d" % i if i != 3 else "" for i in range(8)]
    write_v2_array("v2_s6_zlib", "a", (8,), (3,), "|S6",
                   lambda c: s6[c[0]], {"id": "zlib", "level": 6})
    add("v2_s6_zlib", "a", "string", s6)

    write_group_v2("v2_u4be_zlib")
    u4 = ["ä%d" % i if i % 2 == 0 else "x%d" % i for i in range(6)]
    write_v2_array("v2_u4be_zlib", "a", (6,), (4,), ">U4",
                   lambda c: u4[c[0]], {"id": "zlib", "level": 6})
    add("v2_u4be_zlib", "a", "string", u4)

    write_group_v2("v2_m8s_raw")
    NAT = -(2 ** 63)
    m8 = [NAT if i == 2 else 1700000000 + i * 3600 for i in range(7)]
    write_v2_array("v2_m8s_raw", "a", (7,), (3,), "<M8[s]",
                   lambda c: m8[c[0]], None)
    add("v2_m8s_raw", "a", "ts_us",
        [None if v == NAT else v * 1000000 for v in m8])

    write_group_v2("v2_i2be_fill")
    write_v2_array("v2_i2be_fill", "a", (10,), (4,), ">i2",
                   lambda c: SKIP_CHUNK if 4 <= c[0] < 8 else c[0] * 11 - 40,
                   {"id": "zlib", "level": 6}, fill_json="7")
    add("v2_i2be_fill", "a", "long",
        [7 if 4 <= i < 8 else i * 11 - 40 for i in range(10)])

    write_group_v2("v2_vlen_zlib")
    vl = ["", "héllo", "wörld7", "a", "日本", "zz zz", "q"]
    write_v2_vlen("v2_vlen_zlib", "a", 7, 3, vl, {"id": "zlib", "level": 6})
    add("v2_vlen_zlib", "a", "string", vl)

    # structured with per-field SHAPES: [pos f4 x2, s i4] — 12 B cells
    write_group_v2("v2_struct_shaped")
    def pack_struct(i):
        return (pack_scalar("<f4", i * 2.0) + pack_scalar("<f4", i * 2.0 + 1.0)
                + pack_scalar("<i4", i * 9 - 4))
    write_v2_array("v2_struct_shaped", "a", (6,), (4,),
                   '[["pos", "<f4", [2]], ["s", "<i4"]]',
                   lambda c: c[0], {"id": "zlib", "level": 6},
                   cell_packer=pack_struct, item_size=12)
    add("v2_struct_shaped", "a", "struct_shaped",
        [[[i * 2.0, i * 2.0 + 1.0], i * 9 - 4] for i in range(6)])

    # ---- v3 --------------------------------------------------------------
    write_v3_array("v3_i4_gzip", "a", (5, 3), (2, 2), "int32",
                   lambda o, v: struct.pack(o + "i", v),
                   lambda c: c[0] * 10 + c[1], "little", "gzip")
    add("v3_i4_gzip", "a", "long", [r * 10 + c for r in range(5) for c in range(3)])

    write_v3_array("v3_f8be_crc", "a", (6,), (4,), "float64",
                   lambda o, v: struct.pack(o + "d", v),
                   lambda c: c[0] * 1.5 - 2.0, "big", "crc32c")
    add("v3_f8be_crc", "a", "double", [i * 1.5 - 2.0 for i in range(6)])

    write_v3_array("v3_i8_fill", "a", (8,), (3,), "int64",
                   lambda o, v: struct.pack(o + "q", v),
                   lambda c: SKIP_CHUNK if 3 <= c[0] < 6 else c[0] * 5 + 1,
                   "little", None, fill_scalar=42)
    add("v3_i8_fill", "a", "long", [42 if 3 <= i < 6 else i * 5 + 1 for i in range(8)])

    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, ensure_ascii=False)
    n_files = sum(len(fs) for _, _, fs in os.walk(OUT))
    print("wrote %d fixture files, %d manifest entries under %s" %
          (n_files, len(manifest), os.path.relpath(OUT)))


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Write GRIB2 ensemble fixtures + the expected long-form parquet.

Fully INDEPENDENT of the Scala reader (graft.sources.grib.Grib2File):
this builds the byte layout straight from the public WMO FM 92 GRIB2
spec — indicator section, identification (1), lat/lon grid template 3.0
(3), individual-ensemble product template 4.1 (4), simple packing
template 5.0 (5), no bitmap (6), big-endian packed data (7), "7777".
The expected parquet is computed from the value FORMULA, not by reading
the GRIB bytes back, so a Scala-side hash match cross-validates both
implementations of the format.

Fixture shape (mirrors the reference's cf/pf ensemble split,
io_managers.py:193-210):
  data/ens_cf.grib2 : 1 control message   (type=1, number=0)
  data/ens_pf.grib2 : 2 perturbed messages (type=3, number=1,2)
  grid: 3 lat rows from 60.0 step 0.5 south, 4 lon cols from 10.0
        step 0.5 east, scanning mode 0 (+i, -j, i fastest)
  value(m, j, i) = m*1000 + j*10 + i   (exact in 16-bit simple packing
        with R=0, E=0, D=0 — integer-valued doubles, no float drift)
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "data")
NI, NJ = 4, 3
LA1, LO1, DI, DJ = 60.0, 10.0, 0.5, 0.5
BPV = 16


def sec(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def bitmap_sec(mask: list) -> bytes:
    """Section 6 with indicator 0: one MSB-first bit per grid point,
    1 = datum present, 0 = missing (WMO spec section 6)."""
    bits = "".join(str(b) for b in mask)
    return sec(6, struct.pack(">B", 0) + _pad_bits(bits))


def message(ens_type: int, number: int, values: list, mask=None) -> bytes:
    # section 1: identification (centre 98/ECMWF, forecast data)
    s1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 98, 0, 2, 1, 1,
                            2026, 1, 1, 0, 0, 0, 0, 1))
    # section 3: grid definition, template 3.0 regular lat/lon
    tmpl3 = struct.pack(">BBIBIBIIIII", 6, 0, 0, 0, 0, 0, 0, NI, NJ, 0, 0)
    tmpl3 += struct.pack(">iI", int(LA1 * 1e6), int(LO1 * 1e6))  # la1, lo1
    tmpl3 += struct.pack(">B", 0x30)                             # res flags
    tmpl3 += struct.pack(">iI", int((LA1 - (NJ - 1) * DJ) * 1e6),
                         int((LO1 + (NI - 1) * DI) * 1e6))       # la2, lo2
    tmpl3 += struct.pack(">IIB", int(DI * 1e6), int(DJ * 1e6), 0)  # di dj scan
    s3 = sec(3, struct.pack(">BIBBH", 0, NI * NJ, 0, 0, 0) + tmpl3)
    # section 4: product definition, template 4.1 individual ensemble fc
    tmpl4 = struct.pack(">BBBBBHBBi", 0, 192, 2, 0, 0, 0, 0, 1, 24)
    tmpl4 += struct.pack(">BbI", 1, 0, 0)      # first fixed surface
    tmpl4 += struct.pack(">BbI", 255, 0, 0)    # second fixed surface
    tmpl4 += struct.pack(">BBB", ens_type, number, 3)
    s4 = sec(4, struct.pack(">HH", 0, 1) + tmpl4)
    # section 5: simple packing, R=0 E=0 D=0, 16 bits; nVals counts only
    # the PRESENT (packed) points when a bitmap applies
    s5 = sec(5, struct.pack(">IHfhhBB", len(values), 0, 0.0, 0, 0, BPV, 0))
    # section 6: bitmap (indicator 0) or none (255)
    s6 = bitmap_sec(mask) if mask is not None else sec(6, struct.pack(">B", 255))
    # section 7: big-endian 16-bit packed values
    s7 = sec(7, b"".join(struct.pack(">H", int(v)) for v in values))
    body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
    total = 16 + len(body)
    s0 = b"GRIB" + struct.pack(">HBBQ", 0, 0, 2, total)
    return s0 + body


def values(m: int) -> list:
    return [m * 1000 + j * 10 + i for j in range(NJ) for i in range(NI)]


# ---------------------------------------------------------------------------
# Complex packing (data representation templates 5.2 / 5.3) and the plain
# deterministic product template 4.0 — the combination genuine CDS GloFAS
# downloads use. Packing decisions (group split, widths, scaled lengths,
# spatial differencing prelude) are made HERE from the WMO spec text, fully
# independent of the Scala decoder.
# ---------------------------------------------------------------------------

def _pad_bits(bitstr: str) -> bytes:
    bitstr += "0" * (-len(bitstr) % 8)
    return bytes(int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8))


def _sm_bytes(v: int, octets: int) -> bytes:
    """GRIB sign-and-magnitude integer in `octets` whole bytes."""
    mag = -v if v < 0 else v
    raw = mag | (1 << (octets * 8 - 1)) if v < 0 else mag
    return raw.to_bytes(octets, "big")


def message_complex(product, vals: list, order: int, ngroups: int = 3,
                    mask=None) -> bytes:
    """One GRIB2 message with complex packing (template 5.2 if order==0,
    else 5.3 with spatial differencing of the given order). `product` is
    None for product template 4.0 (deterministic) or (ens_type, number)
    for 4.1. R=0, E=0, D=0 so integer values survive exactly. With a
    `mask`, `vals` holds only the PRESENT points (spatial differencing
    and grouping operate on the compressed present-only sequence, per
    the spec's bitmap+packing composition) and section 6 carries the
    bitmap.
    """
    n = len(vals)
    assert n == (NI * NJ if mask is None else sum(mask))
    if order:
        if order == 1:
            d = [vals[k] - vals[k - 1] for k in range(1, n)]
        else:
            d = [vals[k] - 2 * vals[k - 1] + vals[k - 2] for k in range(2, n)]
        gmin = min(d)
        xs = [0] * order + [v - gmin for v in d]
    else:
        assert min(vals) >= 0
        xs = list(vals)

    # deliberately uneven group lengths to exercise the scaled-length path
    lens = [n // ngroups + (1 if g < n % ngroups else 0) for g in range(ngroups)]
    lens[0] += lens[-1] - 1
    lens[-1] = 1
    assert sum(lens) == n
    groups, pos = [], 0
    for L in lens:
        groups.append(xs[pos:pos + L])
        pos += L
    grefs = [min(g) for g in groups]
    gwidths = [(max(g) - min(g)).bit_length() for g in groups]
    bpv = max(max(r.bit_length() for r in grefs), 1)
    bits_gw = max(max(w.bit_length() for w in gwidths), 1)
    reflen, inc = min(lens), 1
    scaled = [(L - reflen) // inc for L in lens]
    bits_gl = max(max(s.bit_length() for s in scaled), 1)

    s1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 98, 0, 2, 1, 1,
                            2026, 1, 1, 0, 0, 0, 0, 1))
    tmpl3 = struct.pack(">BBIBIBIIIII", 6, 0, 0, 0, 0, 0, 0, NI, NJ, 0, 0)
    tmpl3 += struct.pack(">iI", int(LA1 * 1e6), int(LO1 * 1e6))
    tmpl3 += struct.pack(">B", 0x30)
    tmpl3 += struct.pack(">iI", int((LA1 - (NJ - 1) * DJ) * 1e6),
                         int((LO1 + (NI - 1) * DI) * 1e6))
    tmpl3 += struct.pack(">IIB", int(DI * 1e6), int(DJ * 1e6), 0)
    s3 = sec(3, struct.pack(">BIBBH", 0, NI * NJ, 0, 0, 0) + tmpl3)

    tmpl4 = struct.pack(">BBBBBHBBi", 0, 192, 2, 0, 0, 0, 0, 1, 24)
    tmpl4 += struct.pack(">BbI", 1, 0, 0) + struct.pack(">BbI", 255, 0, 0)
    if product is None:
        s4 = sec(4, struct.pack(">HH", 0, 0) + tmpl4)  # template 4.0
    else:
        ens_type, number = product
        s4 = sec(4, struct.pack(">HH", 0, 1) + tmpl4 +
                 struct.pack(">BBB", ens_type, number, 3))

    tmpl5 = struct.pack(">IHfhhBB", n, 3 if order else 2, 0.0, 0, 0, bpv, 0)
    tmpl5 += struct.pack(">BBIIIBBIBIB", 1, 0, 0, 0, ngroups, 0, bits_gw,
                         reflen, inc, lens[-1], bits_gl)
    ww = 2
    if order:
        tmpl5 += struct.pack(">BB", order, ww)
    s5 = sec(5, tmpl5)
    s6 = bitmap_sec(mask) if mask is not None else sec(6, struct.pack(">B", 255))

    body = b""
    if order:
        body += b"".join(_sm_bytes(v, ww) for v in vals[:order])
        body += _sm_bytes(gmin, ww)
    body += _pad_bits("".join(format(r, f"0{bpv}b") for r in grefs))
    body += _pad_bits("".join(format(w, f"0{bits_gw}b") for w in gwidths))
    body += _pad_bits("".join(format(s, f"0{bits_gl}b") for s in scaled))
    data_bits = ""
    for g, gref, w in zip(groups, grefs, gwidths):
        data_bits += "".join(format(v - gref, f"0{w}b") if w else "" for v in g)
    body += _pad_bits(data_bits)
    s7 = sec(7, body)

    full = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
    return b"GRIB" + struct.pack(">HBBQ", 0, 0, 2, 16 + len(full)) + full


def complex_values(spec: str) -> list:
    if spec == "A":   # template 5.2, varied magnitudes
        return [50 + (k * 37) % 101 for k in range(NI * NJ)]
    if spec == "B":   # 5.3 order 1, non-monotone differences
        return [500 + (k * k * 13) % 89 for k in range(NI * NJ)]
    return [300 + (k * 29) % 53 for k in range(NI * NJ)]  # "C": 5.3 order 2


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "ens_cf.grib2"), "wb") as f:
        f.write(message(ens_type=1, number=0, values=values(0)))
    with open(os.path.join(OUT, "ens_pf.grib2"), "wb") as f:
        f.write(message(ens_type=3, number=1, values=values(1)))
        f.write(message(ens_type=3, number=2, values=values(2)))

    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [(m, LA1 - j * DJ, LO1 + i * DI, float(m * 1000 + j * 10 + i))
            for m in range(3) for j in range(NJ) for i in range(NI)]
    table = pa.table({
        "number": pa.array([r[0] for r in rows], pa.int32()),
        "latitude": pa.array([r[1] for r in rows], pa.float64()),
        "longitude": pa.array([r[2] for r in rows], pa.float64()),
        "dis24": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(table, os.path.join(OUT, "ens_expected.parquet"))

    # complex packing: 5.2 (pf 11), 5.3 order 1 (pf 12), 5.3 order 2 on
    # the deterministic product template 4.0 (-> cf 0)
    msgs = [
        ("pf", 11, complex_values("A"), (3, 11), 0),
        ("pf", 12, complex_values("B"), (3, 12), 1),
        ("cf", 0, complex_values("C"), None, 2),
    ]
    with open(os.path.join(OUT, "ens_complex.grib2"), "wb") as f:
        for _, _, vals, product, order in msgs:
            f.write(message_complex(product, vals, order))
    crows = [(dt, num, LA1 - j * DJ, LO1 + i * DI, float(vals[j * NI + i]))
             for dt, num, vals, _, _ in msgs
             for j in range(NJ) for i in range(NI)]
    ctable = pa.table({
        "data_type": pa.array([r[0] for r in crows], pa.string()),
        "number": pa.array([r[1] for r in crows], pa.int32()),
        "latitude": pa.array([r[2] for r in crows], pa.float64()),
        "longitude": pa.array([r[3] for r in crows], pa.float64()),
        "value": pa.array([r[4] for r in crows], pa.float64()),
    })
    pq.write_table(ctable, os.path.join(OUT, "ens_complex_expected.parquet"))

    # bitmap-masked messages (section 6 indicator 0) — the shape genuine
    # masked CDS fields (ocean/invalid cells) arrive in. One simple-packed
    # control and one complex-5.3-order-1 perturbed member share a mask
    # that drops every third point plus the first/last (edge bits of the
    # bitmap bytes). Expected parquet lists PRESENT points only — the
    # masked points decode to NaN and the query drops them, mirroring
    # cfgrib NaN + the reference's drop-NA.
    npts = NI * NJ
    bmask = [0 if (k % 3 == 0 or k == npts - 1) else 1 for k in range(npts)]
    cf_full = [200 + (k * 31) % 83 for k in range(npts)]
    pf_full = [700 + (k * k * 17) % 71 for k in range(npts)]
    cf_present = [v for v, b in zip(cf_full, bmask) if b]
    pf_present = [v for v, b in zip(pf_full, bmask) if b]
    with open(os.path.join(OUT, "ens_bitmap.grib2"), "wb") as f:
        f.write(message(ens_type=1, number=0, values=cf_present, mask=bmask))
        f.write(message_complex((3, 7), pf_present, order=1, mask=bmask))
    brows = [(dt, num, LA1 - (k // NI) * DJ, LO1 + (k % NI) * DI,
              float(full[k]))
             for dt, num, full in [("cf", 0, cf_full), ("pf", 7, pf_full)]
             for k in range(npts) if bmask[k]]
    btable = pa.table({
        "data_type": pa.array([r[0] for r in brows], pa.string()),
        "number": pa.array([r[1] for r in brows], pa.int32()),
        "latitude": pa.array([r[2] for r in brows], pa.float64()),
        "longitude": pa.array([r[3] for r in brows], pa.float64()),
        "value": pa.array([r[4] for r in brows], pa.float64()),
    })
    pq.write_table(btable, os.path.join(OUT, "ens_bitmap_expected.parquet"))

    # PNG packing (template 5.41/7.41): section 7 is a 16-bit grayscale
    # PNG of the scaled values, built from the PNG spec with stdlib zlib
    # (filter-0 scanlines, big-endian u16 samples) — independent of the
    # JVM's javax.imageio decoder.
    import zlib

    def png_chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", zlib.crc32(typ + data)))

    def png16(vals, w, h):
        ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
        raw = b"".join(
            b"\x00" + b"".join(struct.pack(">H", vals[y * w + x])
                               for x in range(w))
            for y in range(h))
        return (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr) +
                png_chunk(b"IDAT", zlib.compress(raw)) +
                png_chunk(b"IEND", b""))

    def png24(vals, w, h):
        # color type 2 (RGB), 8-bit: X packs across the bands, R most
        # significant (template 7.41's 24-bit form)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(
            b"\x00" + b"".join(
                bytes(((v >> 16) & 255, (v >> 8) & 255, v & 255))
                for v in (vals[y * w + x] for x in range(w)))
            for y in range(h))
        return (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr) +
                png_chunk(b"IDAT", zlib.compress(raw)) +
                png_chunk(b"IEND", b""))

    def message_png(ens_type, number, vals, bpv=16, enc=None):
        s1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 98, 0, 2, 1, 1,
                                2026, 1, 1, 0, 0, 0, 0, 1))
        tmpl3 = struct.pack(">BBIBIBIIIII", 6, 0, 0, 0, 0, 0, 0, NI, NJ, 0, 0)
        tmpl3 += struct.pack(">iI", int(LA1 * 1e6), int(LO1 * 1e6))
        tmpl3 += struct.pack(">B", 0x30)
        tmpl3 += struct.pack(">iI", int((LA1 - (NJ - 1) * DJ) * 1e6),
                             int((LO1 + (NI - 1) * DI) * 1e6))
        tmpl3 += struct.pack(">IIB", int(DI * 1e6), int(DJ * 1e6), 0)
        s3 = sec(3, struct.pack(">BIBBH", 0, NI * NJ, 0, 0, 0) + tmpl3)
        tmpl4 = struct.pack(">BBBBBHBBi", 0, 192, 2, 0, 0, 0, 0, 1, 24)
        tmpl4 += struct.pack(">BbI", 1, 0, 0) + struct.pack(">BbI", 255, 0, 0)
        s4 = sec(4, struct.pack(">HH", 0, 1) + tmpl4 +
                 struct.pack(">BBB", ens_type, number, 3))
        # template 5.41: same scalar fields as 5.0; bpv picks PNG depth
        s5 = sec(5, struct.pack(">IHfhhBB", NI * NJ, 41, 0.0, 0, 0, bpv, 0))
        s6 = sec(6, struct.pack(">B", 255))
        s7 = sec(7, (enc or png16)(vals, NI, NJ))
        body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
        return b"GRIB" + struct.pack(">HBBQ", 0, 0, 2, 16 + len(body)) + body

    pvals = [(1000 + k * 517) % 65536 for k in range(NI * NJ)]
    pvals24 = [(100000 + k * 700001) % (1 << 24) for k in range(NI * NJ)]
    with open(os.path.join(OUT, "ens_png.grib2"), "wb") as f:
        f.write(message_png(3, 21, pvals))
        f.write(message_png(3, 22, pvals24, bpv=24, enc=png24))
    prows = [("pf", num, LA1 - j * DJ, LO1 + i * DI, float(vv[j * NI + i]))
             for num, vv in [(21, pvals), (22, pvals24)]
             for j in range(NJ) for i in range(NI)]
    ptable = pa.table({
        "data_type": pa.array([r[0] for r in prows], pa.string()),
        "number": pa.array([r[1] for r in prows], pa.int32()),
        "latitude": pa.array([r[2] for r in prows], pa.float64()),
        "longitude": pa.array([r[3] for r in prows], pa.float64()),
        "value": pa.array([r[4] for r in prows], pa.float64()),
    })
    pq.write_table(ptable, os.path.join(OUT, "ens_png_expected.parquet"))
    print("wrote ens_cf.grib2, ens_pf.grib2, ens_expected.parquet, "
          "ens_complex.grib2, ens_complex_expected.parquet, "
          "ens_bitmap.grib2, ens_bitmap_expected.parquet")


if __name__ == "__main__":
    main()

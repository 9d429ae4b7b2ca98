#!/usr/bin/env python3
"""Independent check for JPEG-compressed tiled TIFFs (pure stdlib).

Walks the first IFD of a little-endian classic TIFF straight from the
TIFF 6.0 spec, requires compression 7 (JPEG), and decodes every tile's
standalone baseline JPEG stream with a minimal T.81 Huffman decoder (no
shared code with the Scala writer OR the JDK decoder): DQT must be the
all-ones table and every 8x8 block must be DC-ONLY — the exact regime
the graft JPEG sink gates on (quality 100 + block-uniform content).
Reconstructs every pixel (DC-only IDCT: pixel = DC/8 + 128), verifies
each block is a legal uniform value, clips padding, and prints

    OK tiles=<n> pixsum=<sum of in-image pixels>

so the caller can compare the sum against the generating formula.
Raises on the first structural or arithmetic violation.
Usage: jpeg_tile_check.py FILE
"""
import struct
import sys

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def huff_decode_table(bits, vals):
    """(code, length) -> symbol, per T.81 C.2 canonical assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(code, length)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class BitReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self):
        if self.n == 0:
            assert self.pos < len(self.data), "entropy data exhausted"
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                assert self.pos < len(self.data) and self.data[self.pos] == 0, \
                    "unexpected marker inside entropy data"
                self.pos += 1  # skip stuffed 0x00
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read(self, length):
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table):
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            if (code, length) in table:
                return table[(code, length)]
        raise AssertionError("invalid Huffman code")


def extend(v, t):
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_dc_only_jpeg(buf):
    """Returns (w, h, row-major pixels). Requires the graft contract:
    1 grayscale component, all-ones DQT, DC-only blocks."""
    assert buf[:2] == b"\xFF\xD8", "missing SOI"
    pos = 2
    w = h = None
    dc_table = ac_table = None
    while True:
        assert buf[pos] == 0xFF, f"expected marker at {pos}"
        marker = buf[pos + 1]
        if marker == 0xD9:
            raise AssertionError("EOI before SOS")
        seg_len = struct.unpack_from(">H", buf, pos + 2)[0]
        body = buf[pos + 4:pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:
            assert body[0] == 0 and all(q == 1 for q in body[1:65]), \
                "DQT is not the all-ones table (exact regime violated)"
        elif marker == 0xC0:
            prec, ih, iw, ncomp = struct.unpack_from(">BHHB", body, 0)
            assert prec == 8 and ncomp == 1, "need 8-bit grayscale"
            assert body[6] == 1 and body[7] == 0x11 and body[8] == 0
            w, h = iw, ih
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                tbl = huff_decode_table(bits, vals)
                if tc_th == 0x00:
                    assert bits == DC_BITS and vals == DC_VALS, "non-K.3 DC"
                    dc_table = tbl
                elif tc_th == 0x10:
                    assert bits == AC_BITS and vals == AC_VALS, "non-K.5 AC"
                    ac_table = tbl
                else:
                    raise AssertionError(f"unexpected DHT class/id {tc_th:#x}")
                i += 17 + nv
        elif marker == 0xDA:
            assert body[0] == 1 and body[1] == 1 and body[2] == 0x00
            assert body[3] == 0 and body[4] == 63 and body[5] == 0
            break
        else:
            raise AssertionError(f"unexpected marker {marker:#x}")
    assert w and h and dc_table and ac_table, "incomplete headers"
    assert w % 8 == 0 and h % 8 == 0, "tile dims not /8"
    entropy = buf[pos:-2]
    assert buf[-2:] == b"\xFF\xD9", "missing EOI"
    br = BitReader(entropy)
    px = [0] * (w * h)
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            t = br.huff(dc_table)
            diff = extend(br.read(t), t) if t else 0
            prev_dc += diff
            sym = br.huff(ac_table)
            assert sym == 0x00, \
                f"block ({bx},{by}) has AC energy — not the DC-only regime"
            assert prev_dc % 8 == 0, f"DC {prev_dc} not a multiple of 8"
            v = prev_dc // 8 + 128
            assert 0 <= v <= 255, f"block value {v} out of range"
            for yy in range(8):
                for xx in range(8):
                    px[(by * 8 + yy) * w + bx * 8 + xx] = v
    return w, h, px


def main():
    path = sys.argv[1]
    buf = open(path, "rb").read()
    assert buf[:4] == b"II\x2A\x00", "need classic little-endian TIFF"
    ifd_off = struct.unpack_from("<I", buf, 4)[0]
    n = struct.unpack_from("<H", buf, ifd_off)[0]
    tags = {}
    for i in range(n):
        tag, typ, cnt, val = struct.unpack_from(
            "<HHII", buf, ifd_off + 2 + 12 * i)
        tags[tag] = (typ, cnt, val)

    def arr(tag):
        typ, cnt, val = tags[tag]
        assert typ in (3, 4)
        if cnt == 1:
            return [val]
        sz, fmt = (2, "<H") if typ == 3 else (4, "<I")
        return [struct.unpack_from(fmt, buf, val + sz * i)[0]
                for i in range(cnt)]

    width, height = tags[256][2], tags[257][2]
    assert tags[258][2] == 8, "need 8-bit samples"
    assert tags[259][2] == 7, f"compression {tags[259][2]} != 7 (JPEG)"
    tw, th = tags[322][2], tags[323][2]
    offs, cnts = arr(324), arr(325)
    ta = (width + tw - 1) // tw
    td = (height + th - 1) // th
    assert len(offs) == ta * td == len(cnts)

    pixsum = 0
    for t in range(len(offs)):
        jw, jh, px = decode_dc_only_jpeg(buf[offs[t]:offs[t] + cnts[t]])
        assert jw == tw and jh == th, f"tile {t}: {jw}x{jh} != {tw}x{th}"
        col0, row0 = (t % ta) * tw, (t // ta) * th
        for yy in range(th):
            for xx in range(tw):
                c, r = col0 + xx, row0 + yy
                if c < width and r < height:
                    pixsum += px[yy * tw + xx]
    print(f"OK tiles={len(offs)} pixsum={pixsum}")


if __name__ == "__main__":
    main()

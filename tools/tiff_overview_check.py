#!/usr/bin/env python3
"""Independent IFD-chain check for COG overviews (pure stdlib).

Walks EVERY IFD of a little-endian classic/BigTIFF straight from the
public TIFF 6.0 / BigTIFF specs (struct + zlib only — no shared code
with the Scala writer/reader), decodes all tiles, and asserts:

  1. chain structure: first IFD is full-resolution with GeoTIFF
     scale/tiepoint tags; every later IFD has NewSubfileType=1 (reduced
     resolution), no geo tags, and dims ceil(prev-level base dims / f);
  2. values: overview pixel (c, r) at factor f equals the half-up
     rounded mean  (2*sum + n) // (2*n)  of the non-nodata full-res
     pixels in its f x f block, and is nodata where the block is empty.

Prints "OK levels=<k>" and exits 0, or raises on the first mismatch.
Usage: tiff_overview_check.py FILE [nodata]
"""
import struct
import sys
import zlib


def read_ifds(buf):
    order = buf[:2]
    assert order == b"II", f"byte order {order!r} (writer emits LE only)"
    magic = struct.unpack_from("<H", buf, 2)[0]
    assert magic in (42, 43), f"magic {magic}"
    big = magic == 43
    if big:
        assert struct.unpack_from("<HH", buf, 4) == (8, 0)
        off = struct.unpack_from("<Q", buf, 8)[0]
    else:
        off = struct.unpack_from("<I", buf, 4)[0]
    ifds = []
    while off != 0:
        if big:
            n = struct.unpack_from("<Q", buf, off)[0]
            base, stride = off + 8, 20
        else:
            n = struct.unpack_from("<H", buf, off)[0]
            base, stride = off + 2, 12
        tags = {}
        for i in range(n):
            e = base + i * stride
            tag, typ = struct.unpack_from("<HH", buf, e)
            if big:
                cnt, = struct.unpack_from("<Q", buf, e + 4)
                val_off, inline = e + 12, 8
            else:
                cnt, = struct.unpack_from("<I", buf, e + 4)
                val_off, inline = e + 8, 4
            size = {1: 1, 3: 2, 4: 4, 12: 8, 16: 8}[typ] * cnt
            pos = val_off if size <= inline else (
                struct.unpack_from("<Q" if big else "<I", buf, val_off)[0])
            fmt = {3: "H", 4: "I", 12: "d", 16: "Q"}[typ]
            tags[tag] = list(struct.unpack_from(f"<{cnt}{fmt}", buf, pos))
        ifds.append(tags)
        next_pos = base + n * stride
        off = struct.unpack_from("<Q" if big else "<I", buf, next_pos)[0]
    return ifds


def decode_level(buf, tags):
    """Full raster of one IFD as a row-major list (padding clipped)."""
    w, h = tags[256][0], tags[257][0]
    bits, comp = tags[258][0], tags[259][0]
    tw, th = tags[322][0], tags[323][0]
    offs, cnts = tags[324], tags[325]
    ta = (w + tw - 1) // tw
    fmt = {8: "B", 16: "H", 32: "I"}[bits]
    grid = [0] * (w * h)
    for t, (o, c) in enumerate(zip(offs, cnts)):
        raw = buf[o:o + c]
        if comp == 8:
            raw = zlib.decompress(raw)
        samples = struct.unpack(f"<{tw * th}{fmt}", raw)
        r0, c0 = (t // ta) * th, (t % ta) * tw
        for lr in range(min(th, h - r0)):
            row = (r0 + lr) * w + c0
            src = lr * tw
            for lc in range(min(tw, w - c0)):
                grid[row + lc] = samples[src + lc]
    return w, h, grid


def main():
    path = sys.argv[1]
    nodata = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    buf = open(path, "rb").read()
    ifds = read_ifds(buf)
    assert 254 not in ifds[0] or ifds[0][254][0] == 0, "main IFD marked reduced"
    assert 33550 in ifds[0] and 33922 in ifds[0], "main IFD missing geo tags"
    w0, h0, base = decode_level(buf, ifds[0])
    for lvl, tags in enumerate(ifds[1:], start=1):
        assert tags.get(254) == [1], f"L{lvl}: NewSubfileType != 1"
        assert 33550 not in tags and 33922 not in tags, \
            f"L{lvl}: overview IFD carries geo tags"
        w, h, got = decode_level(buf, tags)
        f = round(w0 / w)
        assert (w, h) == ((w0 + f - 1) // f, (h0 + f - 1) // f), \
            f"L{lvl}: dims {w}x{h} not ceil of {w0}x{h0} / {f}"
        for r in range(h):
            for c in range(w):
                vals = [base[rr * w0 + cc]
                        for rr in range(r * f, min((r + 1) * f, h0))
                        for cc in range(c * f, min((c + 1) * f, w0))
                        if base[rr * w0 + cc] != nodata]
                want = ((2 * sum(vals) + len(vals)) // (2 * len(vals))
                        if vals else nodata)
                assert got[r * w + c] == want, \
                    f"L{lvl} ({c},{r}): {got[r * w + c]} != {want}"
    print(f"OK levels={len(ifds)}")


if __name__ == "__main__":
    main()

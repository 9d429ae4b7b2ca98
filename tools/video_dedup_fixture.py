#!/usr/bin/env python3
"""Video near-dup fixture: RIFF/AVI clips + independent per-frame dHash
expected parquet (pure stdlib + pyarrow).

Same container construction discipline as tools/avi_fixture.py (24-bit
DIB frames straight from the RIFF/AVI spec), but a NONLINEAR pixel
formula — q94's formula is additive in (f, c), and dHash is
offset-invariant, so its frames would all hash alike; here

    v(x, y, ch; f, c) = (3x² + 5y² + 7xy + 11f² + 2fx + 29c·x + 5ch) % 256

carries the frame and clip ids into the gradient structure, giving
diverse frame hashes.

Clips (data/avi_dedup/):
  clip_1: c=1, 24x16, 9 frames
  clip_2: c=2, 24x16, 9 frames
  clip_3: c=3, 20x12, 6 frames
  clip_4: SOURCE FORMULA c=1, 12 frames — frames 0..8 are byte-identical
          to clip_1's (the duplicated-footage plant); 9..11 are new.
At every-3rd sampling clip_1 contributes hashes {f0,f3,f6} and clip_4
{f0,f3,f6,f9}: 3 shared of union 4 → Jaccard 3/4 ≥ 1/2. The script
ASSERTS that (1,4) is the only qualifying pair and that base clips
share no frame hash, so the gate is closed-form.

Expected parquet (data/video_dhash_expected.parquet): (media_id,
frame_idx, dhash) for the SAMPLED frames, dHash computed from the pixel
formula with the 9×8 pooling of Multimodal.imageDhash — an engine-side
container-walk, row-order, or pooling deviation breaks the q209 hash
compare.
"""
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = "/root/repo/data/avi_dedup"
EXPECTED = "/root/repo/data/video_dhash_expected.parquet"
COLS, ROWS = 9, 8
EVERY = 3

# (media_id, source_formula_id, width, height, n_frames)
CLIPS = [
    (1, 1, 24, 16, 9),
    (2, 2, 24, 16, 9),
    (3, 3, 20, 12, 6),
    (4, 1, 24, 16, 12),  # near-dup of clip_1 with 3 extra frames
]


def pix(c, f, x, y, ch):
    return (3 * x * x + 5 * y * y + 7 * x * y + 11 * f * f + 2 * f * x +
            29 * c * x + 5 * ch) % 256


def frame_bytes(c, f, w, h):
    row_len = (w * 3 + 3) // 4 * 4
    out = bytearray()
    for y in reversed(range(h)):
        row = bytearray()
        for x in range(w):
            for ch in range(3):
                row.append(pix(c, f, x, y, ch))
        row += b"\0" * (row_len - len(row))
        out += row
    return bytes(out)


def chunk(fourcc, payload):
    pad = b"\0" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def lst(fourcc, payload):
    return chunk(b"LIST", fourcc + payload)


def avi_bytes(c, w, h, n):
    frames = [frame_bytes(c, f, w, h) for f in range(n)]
    fsize = len(frames[0])
    avih = struct.pack("<14I", 33333, fsize * 30, 0, 0x10, n, 0, 1, fsize,
                       w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " +
            struct.pack("<I", 0) + struct.pack("<HH", 0, 0) +
            struct.pack("<8I", 0, 1, 30, 0, n, fsize, 0xFFFFFFFF, 0) +
            struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", fr) for fr in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def frame_dhash(c, f, w, h):
    cell_sum = [0] * (COLS * ROWS)
    cell_n = [0] * (COLS * ROWS)
    for y in range(h):
        r = y * ROWS // h
        for x in range(w):
            cell = r * COLS + x * COLS // w
            for ch in range(3):
                cell_sum[cell] += pix(c, f, x, y, ch)
            cell_n[cell] += 3
    def cv(i):
        return cell_sum[i] // cell_n[i] if cell_n[i] else 0
    hv = 0
    for r in range(ROWS):
        for c0 in range(COLS - 1):
            if cv(r * COLS + c0) < cv(r * COLS + c0 + 1):
                hv |= 1 << (r * (COLS - 1) + c0)
    if hv >= 1 << 63:
        hv -= 1 << 64
    return hv


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    rows = []
    for mid, src, w, h, n in CLIPS:
        with open(os.path.join(OUT_DIR, f"clip_{mid}.avi"), "wb") as fo:
            fo.write(avi_bytes(src, w, h, n))
        for f in range(0, n, EVERY):
            rows.append((mid, f, frame_dhash(src, f, w, h)))
    pq.write_table(pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "frame_idx": pa.array([r[1] for r in rows], pa.int32()),
        "dhash": pa.array([r[2] for r in rows], pa.int64()),
    }), EXPECTED)

    # closed-form gate sanity: (1,4) is the ONLY pair at Jaccard >= 1/2,
    # and the three base clips share no sampled frame hash at all
    sets = {}
    for mid, f, hv in rows:
        sets.setdefault(mid, set()).add(hv)
    pairs = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if 2 * inter >= union:
                pairs.append((a, b, inter, len(sets[a]), len(sets[b])))
            elif {a, b} != {1, 4}:
                assert inter == 0, f"base clips {a},{b} share {inter} hashes"
    assert pairs == [(1, 4, 3, 3, 4)], pairs
    print("wrote data/avi_dedup/clip_{1..4}.avi + expected;"
          f" qualifying pairs = {pairs}")


if __name__ == "__main__":
    main()

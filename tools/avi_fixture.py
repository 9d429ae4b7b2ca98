#!/usr/bin/env python3
"""Independent AVI fixture writer for the REAL video decode path
(graft.operators.Multimodal.decodeAviFrames + q94): pure-stdlib
construction of a spec-conformant RIFF/AVI container with UNCOMPRESSED
24-bit DIB frames (biCompression=0, bottom-up BGR rows padded to 4
bytes) — the one video codec a pure-JVM engine can decode without
native libs. The expected parquet is computed from the pixel FORMULA,
so the Scala container+frame parser is cross-validated against an
independent implementation of the format.

Pixel (x, y, ch∈{B,G,R}) of frame f in clip c:
  v = (x*3 + y*7 + f*11 + ch*5 + c*13) % 256
Frames are sampled every 3rd (idx 0,3,...); per sampled frame the
expected table carries the exact integer pixel sum and a 2x2 pooled
mean grid (pool col = x*2//w, row = y*2//h, over all 3 channels).
"""
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = "/root/repo/data/avi"
EXPECTED = "/root/repo/data/avi_expected.parquet"

CLIPS = [  # (clip_id, width, height, n_frames)
    (1, 24, 16, 7),
    (2, 17, 11, 10),  # odd width: row padding exercised
    (3, 32, 8, 4),
]
EVERY = 3


def pix(c, f, x, y, ch):
    return (x * 3 + y * 7 + f * 11 + ch * 5 + c * 13) % 256


def frame_bytes(c, f, w, h):
    # DIB: bottom-up rows, BGR byte order, rows padded to 4-byte multiple
    row_len = (w * 3 + 3) // 4 * 4
    out = bytearray()
    for y in reversed(range(h)):
        row = bytearray()
        for x in range(w):
            for ch in range(3):  # file order B,G,R == ch 0,1,2
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


# ---------------------------------------------------------------------------
# MJPEG clips: each "00dc" chunk is a standalone baseline grayscale JPEG
# written by the independent pure-stdlib encoder in jpeg_min.py. Blocks are
# uniform 8x8 with an all-ones quant table, so decode is exact and the
# expected parquet is a pure FORMULA of block_val — same cross-validation
# story as the DIB clips.
# ---------------------------------------------------------------------------
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from jpeg_min import encode_gray_blocks  # noqa: E402

MJPG_DIR = "/root/repo/data/avi_mjpg"
MJPG_EXPECTED = "/root/repo/data/avi_mjpg_expected.parquet"

MJPG_CLIPS = [  # (clip_id, blocks_w, blocks_h, n_frames, color)
    (1, 4, 2, 7, False),   # 32x16 grayscale
    (2, 3, 3, 5, False),   # 24x24 grayscale
    (3, 2, 2, 6, True),    # 16x16 color (4:4:4, constant chroma)
]


def block_val(c, f, by, bx):
    return (37 * f + 11 * by + 23 * bx + 97 * c) % 256


def mjpg_avi_bytes(c, bw_, bh, n, color):
    w, h = 8 * bw_, 8 * bh
    frames = [encode_gray_blocks(
        [[block_val(c, f, by, bx) for bx in range(bw_)] for by in range(bh)],
        bw_, bh, color=color) for f in range(n)]
    fsize = max(len(fr) for fr in frames)
    avih = struct.pack("<14I", 33333, fsize * 30, 0, 0x10, n, 0, 1, fsize,
                       w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" +
            struct.pack("<I", 0) + struct.pack("<HH", 0, 0) +
            struct.pack("<8I", 0, 1, 30, 0, n, fsize, 0xFFFFFFFF, 0) +
            struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
                       fsize, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", fr) for fr in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def mjpg_rows():
    rows = []
    for c, bw_, bh, n, color in MJPG_CLIPS:
        w, h = 8 * bw_, 8 * bh
        ch = 3 if color else 1  # color decodes to R=G=B=Y: 3 samples per px
        for f in range(0, n, EVERY):
            total = 0
            cell_sum = [0] * 4
            cell_n = [0] * 4
            for y in range(h):
                for x in range(w):
                    cell = (y * 2 // h) * 2 + (x * 2 // w)
                    v = block_val(c, f, y // 8, x // 8)
                    total += v * ch
                    cell_sum[cell] += v * ch
                    cell_n[cell] += ch
            rows.append({
                "media_id": c, "frame_idx": f, "width": w, "height": h,
                "n_frames": n, "pix_sum": total,
                "p00": cell_sum[0] / cell_n[0], "p01": cell_sum[1] / cell_n[1],
                "p10": cell_sum[2] / cell_n[2], "p11": cell_sum[3] / cell_n[3],
            })
    return rows


def rows_to_table(rows):
    return pa.table({
        "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
        "frame_idx": pa.array([r["frame_idx"] for r in rows], pa.int32()),
        "width": pa.array([r["width"] for r in rows], pa.int32()),
        "height": pa.array([r["height"] for r in rows], pa.int32()),
        "n_frames": pa.array([r["n_frames"] for r in rows], pa.int32()),
        "pix_sum": pa.array([r["pix_sum"] for r in rows], pa.int64()),
        "p00": pa.array([r["p00"] for r in rows], pa.float64()),
        "p01": pa.array([r["p01"] for r in rows], pa.float64()),
        "p10": pa.array([r["p10"] for r in rows], pa.float64()),
        "p11": pa.array([r["p11"] for r in rows], pa.float64()),
    })


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    rows = []
    for c, w, h, n in CLIPS:
        path = f"{OUT_DIR}/clip_{c}.avi"
        open(path, "wb").write(avi_bytes(c, w, h, n))
        for f in range(0, n, EVERY):
            total = 0
            cell_sum = [0] * 4
            cell_n = [0] * 4
            for y in range(h):
                for x in range(w):
                    cell = (y * 2 // h) * 2 + (x * 2 // w)
                    for ch in range(3):
                        v = pix(c, f, x, y, ch)
                        total += v
                        cell_sum[cell] += v
                    cell_n[cell] += 3
            rows.append({
                "media_id": c, "frame_idx": f, "width": w, "height": h,
                "n_frames": n, "pix_sum": total,
                "p00": cell_sum[0] / cell_n[0], "p01": cell_sum[1] / cell_n[1],
                "p10": cell_sum[2] / cell_n[2], "p11": cell_sum[3] / cell_n[3],
            })
        print(f"{path}: {w}x{h} x{n} frames")
    table = rows_to_table(rows)
    pq.write_table(table, EXPECTED, compression="zstd")
    print(f"{EXPECTED}: {table.num_rows} rows")

    os.makedirs(MJPG_DIR, exist_ok=True)
    for c, bw_, bh, n, color in MJPG_CLIPS:
        path = f"{MJPG_DIR}/clip_{c}.avi"
        open(path, "wb").write(mjpg_avi_bytes(c, bw_, bh, n, color))
        kind = "color" if color else "gray"
        print(f"{path}: {8*bw_}x{8*bh} x{n} {kind} MJPEG frames")
    mtable = rows_to_table(mjpg_rows())
    pq.write_table(mtable, MJPG_EXPECTED, compression="zstd")
    print(f"{MJPG_EXPECTED}: {mtable.num_rows} rows")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Independent WAV/PCM fixture writer for the REAL audio decode path
(graft.operators.Multimodal.decodeWav + q92): the python stdlib `wave`
module writes the RIFF/WAVE bytes, and the expected parquet is computed
from the sample FORMULA — so the Scala byte-level parser is
cross-validated against an independent implementation of the format,
the same triangle as the PNG/GRIB/TIFF fixtures.

Samples are integer-exact: s(clip, k) = ((k*k*7 + k*13 + clip*101)
% 4001) - 2000, within 16-bit range. Clips 1-3 are mono at different
rates/lengths; clip 4 is stereo (channel c adds c*17 before the mod).
Bin b of frame k among n frames: b = k*4 // n; bin means are one exact
integer sum over one division, reproducible bit-for-bit in IEEE double.
"""
import os
import wave

import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = "/root/repo/data/wav"
EXPECTED = "/root/repo/data/wav_expected.parquet"

CLIPS = [  # (clip_id, sample_rate, n_frames, channels)
    (1, 8000, 1200, 1),
    (2, 16000, 4000, 1),
    (3, 44100, 333, 1),   # odd length: uneven bins
    (4, 22050, 2048, 2),  # stereo: interleaved frames
]


def sample(clip, k, c):
    return ((k * k * 7 + k * 13 + clip * 101 + c * 17) % 4001) - 2000


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    rows = []
    for clip, rate, n, channels in CLIPS:
        frames = bytearray()
        abs_sum = 0
        peak = 0
        bin_sum = [0] * 4
        bin_n = [0] * 4
        for k in range(n):
            b = k * 4 // n
            for c in range(channels):
                v = sample(clip, k, c)
                frames += int(v).to_bytes(2, "little", signed=True)
                a = abs(v)
                abs_sum += a
                peak = max(peak, a)
                bin_sum[b] += a
                bin_n[b] += 1
            # bin_n counts samples (frames x channels), matching the decoder
        path = f"{OUT_DIR}/clip_{clip}.wav"
        w = wave.open(path, "wb")
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(frames))
        w.close()
        rows.append({
            "media_id": clip, "sample_rate": rate, "channels": channels,
            "n_frames": n, "abs_sum": abs_sum, "peak": peak,
            "b0": bin_sum[0] / bin_n[0], "b1": bin_sum[1] / bin_n[1],
            "b2": bin_sum[2] / bin_n[2], "b3": bin_sum[3] / bin_n[3],
        })
        print(f"{path}: rate={rate} n={n} ch={channels} abs_sum={abs_sum}")
    table = pa.table({
        "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
        "sample_rate": pa.array([r["sample_rate"] for r in rows], pa.int32()),
        "channels": pa.array([r["channels"] for r in rows], pa.int32()),
        "n_frames": pa.array([r["n_frames"] for r in rows], pa.int64()),
        "abs_sum": pa.array([r["abs_sum"] for r in rows], pa.int64()),
        "peak": pa.array([r["peak"] for r in rows], pa.int32()),
        "b0": pa.array([r["b0"] for r in rows], pa.float64()),
        "b1": pa.array([r["b1"] for r in rows], pa.float64()),
        "b2": pa.array([r["b2"] for r in rows], pa.float64()),
        "b3": pa.array([r["b3"] for r in rows], pa.float64()),
    })
    pq.write_table(table, EXPECTED, compression="zstd")
    print(f"{EXPECTED}: {table.num_rows} rows")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Independent expected-output writer for the audio Haar fingerprint
(graft.operators.Multimodal.wavFingerprint + q170): fingerprints are
computed from the sample FORMULA of tools/wav_fixture.py (never by
re-reading the WAV bytes), so the Scala path — byte-level RIFF parse +
integer Haar transform + sign-bit packing — is cross-validated
end-to-end against an independent implementation, the q92 triangle.

Per non-overlapping 256-sample window of channel 0:
  repeatedly pair-reduce xs -> (a_i, d_i) with
    a_i = tdiv(xs[2i] + xs[2i+1], 2)   (truncation toward zero,
                                        matching Scala/Java int division)
    d_i = xs[2i] - xs[2i+1]            (exact)
  fp bit order (32 bits, bit set iff coeff >= 0):
    bit 0            = final approx
    bits 1..31       = detail levels coarsest-first
                       (1 + 2 + 4 + 8 + 16 coefficients)
"""
import pyarrow as pa
import pyarrow.parquet as pq

EXPECTED = "/root/repo/data/audio_fp_expected.parquet"
WINDOW = 256

CLIPS = [  # (clip_id, sample_rate, n_frames, channels) — wav_fixture.py
    (1, 8000, 1200, 1),
    (2, 16000, 4000, 1),
    (3, 44100, 333, 1),
    (4, 22050, 2048, 2),
]


def sample(clip, k, c):
    return ((k * k * 7 + k * 13 + clip * 101 + c * 17) % 4001) - 2000


def tdiv2(s):
    return -((-s) // 2) if s < 0 else s // 2


def fingerprint(xs):
    levels = []
    while len(xs) > 1:
        a, d = [], []
        for i in range(len(xs) // 2):
            a.append(tdiv2(xs[2 * i] + xs[2 * i + 1]))
            d.append(xs[2 * i] - xs[2 * i + 1])
        levels.append(d)
        xs = a
    fp = 0
    bit = 0
    coeffs = [xs[0]]
    for d in reversed(levels):
        coeffs.extend(d)
    for v in coeffs[:32]:
        if v >= 0:
            fp |= 1 << bit
        bit += 1
    return fp, xs[0]


def main():
    rows = []
    for clip, _rate, n, _channels in CLIPS:
        for w in range(n // WINDOW):
            xs = [sample(clip, w * WINDOW + i, 0) for i in range(WINDOW)]
            fp, approx = fingerprint(xs)
            rows.append((clip, w, fp, approx))
    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "win": pa.array([r[1] for r in rows], pa.int32()),
        "fp": pa.array([r[2] for r in rows], pa.int64()),
        "approx": pa.array([r[3] for r in rows], pa.int64()),
    })
    pq.write_table(table, EXPECTED)
    print(f"wrote {EXPECTED}: {len(rows)} windows")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Independent pure-python implementation of the 2x cubic-convolution
overview level (the reference pyramid step's kernel: gdal_retile.py
-r cubic, sentinel/postprocessing.py:69-71).

Keys (1981) a=-1/2 cubic evaluated at the dyadic 2x offsets gives taps at
source distances {1.5, 0.5, 0.5, 1.5} -> separable axis weights exactly
[-1/16, 9/16, 9/16, -1/16]; 2-D weight of tap (i, j) = C[i]*C[j]/256 with
C in {-1, 9}. Edges replicate (clamp). Integer pixels make the numerator
an exact integer, so rounding is half-up floor((num+128)/256) and the
clamp is the UInt16 range -- the TiffWriter resampling="cubic" contract,
computed here WITHOUT any engine code: this file and the Spark side share
only the published kernel.

Writes data/cubic_expected.parquet with the level-1 pixel centers in the
georeferenced frame q155's graft-cog read-back reports.
"""
import os

W, H = 100, 72
OX, OY, SX, SY = 500000.0, 7000000.0, 30.0, 30.0
C = [-1, 9, 9, -1]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data")


def val(c, r):
    return (7 * c + 13 * r) % 997 + 1


def clampi(i, n):
    return 0 if i < 0 else (n - 1 if i >= n else i)


def main():
    wo, ho = (W + 1) // 2, (H + 1) // 2
    xs, ys, vs = [], [], []
    for tr in range(ho):
        for tc in range(wo):
            num = 0
            for j in range(4):
                for i in range(4):
                    sc = clampi(2 * tc - 1 + i, W)
                    sr = clampi(2 * tr - 1 + j, H)
                    num += C[i] * C[j] * val(sc, sr)
            v = (num + 128) // 256  # python floor-div == floor((num+128)/256)
            v = max(0, min(65535, v))
            xs.append(OX + (tc + 0.5) * 2 * SX)
            ys.append(OY - (tr + 0.5) * 2 * SY)
            vs.append(v)
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "x": pa.array(xs, pa.float64()),
        "y": pa.array(ys, pa.float64()),
        "value": pa.array(vs, pa.int32()),
    }), os.path.join(OUT, "cubic_expected.parquet"))
    print(f"wrote cubic_expected.parquet ({wo}x{ho} pixels)")


if __name__ == "__main__":
    main()

"""Minimal baseline JPEG encoder (pure stdlib) for the MJPEG AVI fixture.

Writes GRAYSCALE baseline JPEGs whose 8x8 blocks are each UNIFORM: every
block carries only a DC coefficient (all AC zero) under an all-ones
quantisation table, so any spec-conformant decoder reconstructs the exact
block value with no loss (DC = 8*(v-128) is divisible by 8; the IDCT of a
DC-only block is the constant DC/8). This makes the decoded pixels a pure
FORMULA of the block-value function — the property the oracle parquet
relies on. Huffman tables are the public JPEG Annex K defaults.

Independent of the Scala decoder (javax.imageio): this implements the
byte layout straight from the ITU T.81 spec.
"""
import struct

# JPEG Annex K table K.3 (luminance DC) and K.5 (luminance AC)
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


def _codes(bits):
    """Canonical Huffman codes per T.81 C.2: (code, length) per symbol index."""
    out = []
    code = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length))
            code += 1
        code <<= 1
    return out


DC_CODE = dict(zip(DC_VALS, _codes(DC_BITS)))
AC_EOB = _codes(AC_BITS)[AC_VALS.index(0x00)]  # run/size 0x00 = EOB


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, length):
        for i in reversed(range(length)):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def done(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_gray_blocks(block_vals, blocks_w, blocks_h, color=False):
    """Baseline JPEG of (8*blocks_w) x (8*blocks_h) pixels where block
    (by, bx) is uniformly block_vals[by][bx] (0..255).

    color=False: single-component grayscale.
    color=True: three components, 4:4:4, with CONSTANT chroma Cb=Cr=128
    and luma Y = the block value. The YCbCr->RGB conversion terms all
    carry a (C-128) factor, so zero chroma offsets decode to EXACTLY
    R=G=B=Y in any conformant decoder — exercising the interleaved
    3-component MCU path while keeping the pixel formula exact.
    """
    w, h = 8 * blocks_w, 8 * blocks_h
    ncomp = 3 if color else 1
    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xDB, b"\x00" + b"\x01" * 64)  # DQT: table 0, all ones
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # no subsampling, quant table 0
    out += _seg(0xC0, sof)
    out += _seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS) +
                b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))  # DHT DC0 + AC0
    sos = bytes([ncomp]) + b"".join(
        bytes([cid, 0x00]) for cid in range(1, ncomp + 1)) + bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    bw = _BitWriter()

    def put_dc(diff):
        mag = abs(diff)
        t = mag.bit_length()
        code, length = DC_CODE[t]
        bw.put(code, length)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        bw.put(*AC_EOB)

    prev = [0] * ncomp  # per-component DC prediction
    for by in range(blocks_h):
        for bx in range(blocks_w):
            # component values for this MCU: Y = block value; Cb = Cr = 128
            comps = ([block_vals[by][bx], 128, 128] if color
                     else [block_vals[by][bx]])
            for c, v in enumerate(comps):
                dc = 8 * (v - 128)
                put_dc(dc - prev[c])
                prev[c] = dc
    out += bw.done()
    out += b"\xFF\xD9"  # EOI
    return bytes(out)

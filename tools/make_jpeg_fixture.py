"""Generate the committed baseline-JPEG test fixture WITHOUT PIL.

A minimal spec-conformant baseline sequential grayscale JPEG encoder
(ITU-T T.81): 8x8 block DCT, uniform quant table, single-length
canonical Huffman tables (every needed symbol coded in 9 bits — legal,
merely suboptimal). The output is a real JPEG byte-stream any decoder
(PIL, browsers, finmlkit_spark's native jpeg_gray_pixels) reads.

Deliberately a SEPARATE implementation from the decoder in
operators/multimodal.py: forward DCT vs inverse DCT, Huffman code
assignment vs code lookup — a shared bug cannot silently cancel out.

Usage: python tools/make_jpeg_fixture.py
Writes tests/fixtures/gradient_32x24.jpg and prints its md5 and the
md5 of the decoded pixel matrix (paste into the golden test).
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "gradient_32x24.jpg")

W, H = 32, 24
QUANT = 16  # uniform quant step


def pattern() -> np.ndarray:
    """Deterministic test image: diagonal gradient + a block checker."""
    y, x = np.mgrid[0:H, 0:W]
    img = (x * 5 + y * 3 + ((x // 8 + y // 8) % 2) * 64) % 256
    return img.astype(np.uint8)


def zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
    )
    return np.array([r * 8 + c for r, c in order])


def dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    C = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    C[0] /= np.sqrt(2.0)
    return C


def huff_uniform(symbols: list[int], nbits: int = 9) -> tuple[bytes, bytes, dict]:
    """Canonical table giving every symbol a code of length ``nbits``."""
    assert len(symbols) < (1 << nbits) - 1  # keep the all-ones code unused
    counts = bytearray(16)
    counts[nbits - 1] = len(symbols)
    codes = {s: (nbits, i) for i, s in enumerate(symbols)}
    return bytes(counts), bytes(symbols), codes


class BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode() -> bytes:
    img = pattern().astype(np.float64) - 128.0
    C = dct_matrix()
    zz = zigzag_order()
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    dc_counts, dc_symbols, dc_codes = huff_uniform(dc_syms)
    ac_counts, ac_symbols, ac_codes = huff_uniform(ac_syms)

    bw = BitWriter()
    pred = 0
    for br in range(H // 8):
        for bc in range(W // 8):
            blk = img[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8]
            coef = C @ blk @ C.T
            qz = np.round(coef.reshape(64)[zz] / QUANT).astype(int)
            # DC
            diff = int(qz[0]) - pred
            pred = int(qz[0])
            t = category(diff)
            ln, code = dc_codes[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            # AC
            run = 0
            for k in range(1, 64):
                v = int(qz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    ln, code = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = category(v)
                ln, code = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                ln, code = ac_codes[0x00]
                bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qtbl = bytes([0x00]) + bytes([QUANT] * 64)
    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, qtbl)
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", H, W) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + dc_counts + dc_symbols)
    out += seg(0xC4, bytes([0x10]) + ac_counts + ac_symbols)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"
    return out


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    b = encode()
    with open(OUT, "wb") as f:
        f.write(b)
    print(f"wrote {OUT}: {len(b)} bytes, md5 {hashlib.md5(b).hexdigest()}")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from finmlkit_spark.operators.multimodal import decode_payload, jpeg_gray_pixels

    print("dims:", decode_payload(b))
    px = jpeg_gray_pixels(b)
    print("decoded shape:", px.shape, "md5", hashlib.md5(px.tobytes()).hexdigest())
    ref = pattern()
    err = np.abs(px[:, :, 0].astype(int) - ref.astype(int))
    print("max |decoded - source|:", int(err.max()), "mean:", float(err.mean()))


if __name__ == "__main__":
    main()

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


def _tables():
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    dc_counts, dc_symbols, dc_codes = huff_uniform(dc_syms)
    ac_counts, ac_symbols, ac_codes = huff_uniform(ac_syms)
    return dc_counts, dc_symbols, dc_codes, ac_counts, ac_symbols, ac_codes


def _encode_block(bw: BitWriter, blk: np.ndarray, pred: int, quant: int,
                  dc_codes: dict, ac_codes: dict,
                  C: np.ndarray, zz: np.ndarray) -> int:
    """Forward-DCT, quantize, and Huffman-code ONE level-shifted 8x8
    block; returns the updated DC predictor."""
    coef = C @ blk @ C.T
    qz = np.round(coef.reshape(64)[zz] / quant).astype(int)
    diff = int(qz[0]) - pred
    t = category(diff)
    ln, code = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
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
    return int(qz[0])


def encode() -> bytes:
    img = pattern().astype(np.float64) - 128.0
    C = dct_matrix()
    zz = zigzag_order()
    dc_counts, dc_symbols, dc_codes, ac_counts, ac_symbols, ac_codes = _tables()

    bw = BitWriter()
    pred = 0
    for br in range(H // 8):
        for bc in range(W // 8):
            blk = img[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8]
            pred = _encode_block(bw, blk, pred, QUANT, dc_codes, ac_codes, C, zz)
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


OUT420 = os.path.join(os.path.dirname(OUT), "gradient_420_32x24.jpg")
CQUANT = 8  # tighter step for the color fixture (smooth gradients)


def pattern_rgb() -> np.ndarray:
    """Smooth full-color test image — linear per-channel gradients with
    NO mod-256 wrap edges, so the 2x2-mean chroma subsample vs the
    decoder's replication upsample stays within a small, pinnable
    bound."""
    y, x = np.mgrid[0:H, 0:W]
    r = x * 6 + y * 2          # 0..232
    g = 60 + x * 3 + y * 4     # 60..245
    b = 200 - x * 4 - y * 2    # 26..200
    return np.stack([r, g, b], axis=-1).astype(np.float64)


def encode_color_420() -> bytes:
    """Baseline 4:2:0 interleaved color JPEG (the shape real photo
    corpora are full of): JFIF YCbCr forward transform, 2x2-mean chroma
    subsample, MCU interleave of 4 luma + 1 Cb + 1 Cr data units, luma
    on quant/Huffman tables 0 and chroma on tables 1 — exercising the
    decoder's table-id routing, MCU walk, partial-MCU clipping (H=24 is
    half an MCU row), and chroma upsample."""
    rgb = pattern_rgb()
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    cb2 = cb.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))

    def pad(p: np.ndarray, tile: int) -> np.ndarray:
        ph = (-p.shape[0]) % tile
        pw = (-p.shape[1]) % tile
        return np.pad(p, ((0, ph), (0, pw)), mode="edge")

    yp, cbp, crp = pad(yy, 16), pad(cb2, 8), pad(cr2, 8)
    C = dct_matrix()
    zz = zigzag_order()
    dc_counts, dc_symbols, dc_codes, ac_counts, ac_symbols, ac_codes = _tables()

    bw = BitWriter()
    preds = [0, 0, 0]
    for my in range(yp.shape[0] // 16):
        for mx in range(yp.shape[1] // 16):
            for vv in range(2):
                for hh in range(2):
                    r0, c0 = (my * 2 + vv) * 8, (mx * 2 + hh) * 8
                    blk = yp[r0 : r0 + 8, c0 : c0 + 8] - 128.0
                    preds[0] = _encode_block(
                        bw, blk, preds[0], QUANT, dc_codes, ac_codes, C, zz
                    )
            for i, plane in ((1, cbp), (2, crp)):
                blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
                preds[i] = _encode_block(
                    bw, blk, preds[i], CQUANT, dc_codes, ac_codes, C, zz
                )
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes([QUANT] * 64))
    out += seg(0xDB, bytes([0x01]) + bytes([CQUANT] * 64))
    out += seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", H, W)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    # the same uniform canonical tables registered under BOTH table ids
    # (legal; the point is exercising the decoder's id routing)
    out += seg(0xC4, bytes([0x00]) + dc_counts + dc_symbols)
    out += seg(0xC4, bytes([0x10]) + ac_counts + ac_symbols)
    out += seg(0xC4, bytes([0x01]) + dc_counts + dc_symbols)
    out += seg(0xC4, bytes([0x11]) + ac_counts + ac_symbols)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
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

    from finmlkit_spark.operators.multimodal import jpeg_pixels

    b420 = encode_color_420()
    with open(OUT420, "wb") as f:
        f.write(b420)
    print(f"wrote {OUT420}: {len(b420)} bytes, md5 {hashlib.md5(b420).hexdigest()}")
    print("dims:", decode_payload(b420))
    px3 = jpeg_pixels(b420)
    print("decoded shape:", px3.shape, "md5", hashlib.md5(px3.tobytes()).hexdigest())
    ref3 = pattern_rgb()
    err3 = np.abs(px3.astype(float) - ref3)
    print("max |decoded - source| per channel:",
          [int(err3[..., c].max()) for c in range(3)],
          "mean:", float(err3.mean()))


if __name__ == "__main__":
    main()

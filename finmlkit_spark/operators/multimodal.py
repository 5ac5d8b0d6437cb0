"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each executor touches only its partition's
bytes (no driver collect, no shuffle of blobs).

Decode tiers:

- ``decode='fake'``: deterministic dims from the payload (plumbing
  tests — schema, partitioning, batch shapes).
- ``decode='real'``: REAL pure-python decoders — WAV (RIFF PCM), BMP
  (BITMAPINFOHEADER), PPM (P6), and compressed PNG (stdlib zlib
  inflate + spec scanline unfiltering) — parsed with
  ``struct``/``zlib``/numpy only; no external image/audio libs
  needed. Codecs with no pure-python path (JPEG/MP4/...) raise
  NotImplementedError at the exact seam where PIL/ffmpeg would plug
  in (not available in this container).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, byte_len long, content_md5 string, width int, height int, channels int"


def _parse_wav(b: bytes) -> tuple[int, int, int]:
    """RIFF/WAVE PCM header walk -> (n_samples, 1, n_channels)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, channels, bits, data_size = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if cid == b"fmt ":
            (channels,) = struct.unpack_from("<H", b, pos + 10)
            (bits,) = struct.unpack_from("<H", b, pos + 22)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or bits is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    n_samples = data_size // (channels * (bits // 8))
    return int(n_samples), 1, int(channels)


def _parse_bmp(b: bytes) -> tuple[int, int, int]:
    """BMP BITMAPINFOHEADER -> (width, height, channels)."""
    if len(b) < 30 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    return int(width), abs(int(height)), max(1, bpp // 8)


def _parse_ppm(b: bytes) -> tuple[int, int, int]:
    """PPM P6 ASCII header -> (width, height, 3)."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3 and pos < len(b):
        # skip whitespace and comment lines
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    if len(fields) < 3:
        raise ValueError("truncated PPM header")
    return fields[0], fields[1], 3


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def _png_chunks(b: bytes) -> Iterator[tuple[bytes, bytes]]:
    pos = 8
    while pos + 8 <= len(b):
        (size,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        yield ctype, b[pos + 8 : pos + 8 + size]
        if ctype == b"IEND":
            return
        pos += 12 + size  # length + type + data + crc


def _parse_png(b: bytes) -> tuple[int, int, int]:
    """PNG IHDR -> (width, height, channels); header-only, no inflate."""
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            width, height = struct.unpack_from(">II", data, 0)
            color_type = data[9]
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"bad PNG color type {color_type}")
            return int(width), int(height), _PNG_CHANNELS[color_type]
        break  # IHDR must come first
    raise ValueError("missing PNG IHDR")


def png_pixels(b: bytes) -> np.ndarray:
    """Full PNG decode -> uint8 array (height, width, channels).

    Real DEFLATE decode (stdlib ``zlib``) + scanline unfiltering
    (None/Sub/Up/Average/Paeth per the PNG spec). Supports bit depth 8,
    color types 0/2/4/6, non-interlaced — the shape every standard
    encoder emits by default. Sub/Up rows reconstruct vectorized
    (per-lane cumsum / row add); Average/Paeth fall back to the
    sequential per-byte recurrence the spec defines.
    """
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    width = height = ch = None
    idat = bytearray()
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            width, height = struct.unpack_from(">II", data, 0)
            depth, color_type, _comp, _filt, interlace = data[8:13]
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("Adam7 interlace not supported")
            if color_type == 3:
                raise ValueError("palette PNG not supported")
            ch = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += data
    if width is None or not idat:
        raise ValueError("missing PNG IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * ch
    if raw.size != height * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    raw = raw.reshape(height, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f, line = int(filters[y]), rows[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            out[y] = np.cumsum(line.reshape(width, ch), axis=0, dtype=np.uint32).astype(
                np.uint8
            ).reshape(stride)
        elif f == 2:  # Up
            out[y] = line + prev
        elif f == 3:  # Average
            o = out[y]
            for x in range(stride):
                a = int(o[x - ch]) if x >= ch else 0
                o[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            o = out[y]
            for x in range(stride):
                a = int(o[x - ch]) if x >= ch else 0
                bb = int(prev[x])
                c = int(out[y - 1][x - ch]) if (x >= ch and y) else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                o[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0, one IDAT) for uint8 (h, w) or
    (h, w, {1,2,3,4}) arrays — lets tests and demo pipelines produce
    real compressed payloads without PIL."""
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * ch).astype(np.uint8)], axis=1
    )
    idat = zlib.compress(scan.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


# --- JPEG (ITU-T T.81, public spec) ------------------------------------------
# Native codec: SOF dims parse for ANY JPEG; pure-numpy pixel decode for
# baseline/extended SEQUENTIAL (grayscale + interleaved YCbCr color up
# to 2x2 sampling) and PROGRESSIVE (Annex G spectral selection +
# successive approximation) Huffman scans, restart intervals included.
# Remaining PIL seams: arithmetic coding, 12-bit precision, CMYK/4-comp,
# >2x2 sampling, lossless and hierarchical modes.

_JPEG_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def _jpeg_segments(b: bytes):
    """Yield (marker, payload_offset, payload_len) for each JPEG marker
    segment; stops at SOS (whose entropy-coded data follows) or EOI."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        # T.81 §B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them so a spec-legal padded stream doesn't
        # parse a fill byte as a marker with a garbage length
        while i + 4 <= n and b[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            break
        m = b[i + 1]
        if m == 0xD9:  # EOI
            return
        (ln,) = struct.unpack_from(">H", b, i + 2)
        yield m, i + 4, ln - 2
        i += 2 + ln
        if m == 0xDA:  # SOS — entropy data next, no more segments
            return
    raise ValueError("truncated JPEG")


def _parse_jpeg(b: bytes) -> tuple[int, int, int]:
    """(width, height, components) from the SOF segment — any baseline/
    extended/progressive JPEG; raises ValueError when no SOF exists."""
    for m, off, _ln in _jpeg_segments(b):
        if m in _JPEG_SOF_MARKERS:
            h, w = struct.unpack_from(">HH", b, off + 1)
            ncomp = b[off + 5]
            return (w, h, ncomp)
    raise ValueError("JPEG without SOF segment")


def _jpeg_zigzag() -> np.ndarray:
    """Zigzag scan order (T.81 Figure 5): element i = the raster index
    of zigzag position i. Built by the diagonal rule (even diagonals run
    bottom-left -> top-right) rather than a typed-in table."""
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZZ = _jpeg_zigzag()


def _jpeg_huff_table(counts: bytes, symbols: bytes) -> dict:
    """Canonical JPEG Huffman table -> {(bit_len, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    C = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    C[0] /= np.sqrt(2.0)
    return C


class _JpegBits:
    """MSB-first bit reader over ONE scan's entropy-coded bytes (0xFF00
    stuffing removed; stops before the next non-restart marker).

    RSTn markers (0xFFD0-D7) inside the scan are consumed and their
    byte positions in the CLEANED stream recorded (``self.marks``) —
    :meth:`restart` jumps the cursor to the next one, which is how the
    MCU loops realign at DRI boundaries. ``self.end`` is the
    original-buffer offset of the marker that TERMINATED the scan, so
    a multi-scan (progressive) walker can resume segment parsing
    there."""

    def __init__(self, b: bytes, start: int):
        data = bytearray()
        marks: list[int] = []
        i = start
        n = len(b)
        while i < n:
            x = b[i]
            if x == 0xFF:
                nx = b[i + 1] if i + 1 < n else 0xD9
                if nx == 0x00:
                    data.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nx <= 0xD7:  # RSTn: a restart boundary
                    marks.append(len(data))
                    i += 2
                    continue
                break  # a real marker (EOI/DHT/SOS/...) ends the scan
            data.append(x)
            i += 1
        self.d = bytes(data)
        self.pos = 0  # bit position
        self.marks = marks
        self._next_mark = 0
        self.end = i  # original-buffer offset of the terminating marker

    def restart(self) -> None:
        """Byte-align onto the next recorded RSTn boundary (caller
        resets DC predictors / EOB run). Raises the documented error
        when the stream declared DRI but carries no marker."""
        if self._next_mark >= len(self.marks):
            raise ValueError(
                "JPEG declares a restart interval but the scan has no "
                "further RSTn marker"
            )
        self.pos = self.marks[self._next_mark] * 8
        self._next_mark += 1

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            if (self.pos >> 3) >= len(self.d):
                # exhausted mid-image (truncated payloads end early) —
                # surface a clean error, never a raw IndexError
                raise ValueError(
                    "JPEG scan data exhausted mid-image (truncated "
                    "payload or corrupt entropy stream)"
                )
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """DC/AC magnitude-category decode (T.81 F.12)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_decode_block(bits: "_JpegBits", dc_tab: dict, ac_tab: dict,
                       q: np.ndarray, C: np.ndarray, pred: int):
    """Decode ONE 8x8 data unit (T.81 F.2.2): Huffman DC diff + AC
    run/size pairs, dequant in zigzag order, de-scan, orthonormal IDCT.
    Returns (spatial 8x8 block, updated DC predictor)."""
    zz = np.zeros(64, dtype=np.float64)
    t = bits.huff(dc_tab)
    pred += _jpeg_extend(bits.read(t), t)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = bits.huff(ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        if k > 63:
            # hostile/corrupt AC stream: the run-length pushed the
            # zigzag index past the block — documented seam, never a
            # raw numpy IndexError
            raise ValueError("invalid JPEG AC run past block end")
        zz[k] = _jpeg_extend(bits.read(sym & 15), sym & 15)
        k += 1
    blk = np.zeros(64, dtype=np.float64)
    # DQT stores the table in ZIGZAG order — same order the coefficient
    # vector is decoded in, so dequant multiplies before the de-scan
    blk[_ZZ] = zz * q
    return C.T @ blk.reshape(8, 8) @ C, pred


def jpeg_pixels(b: bytes) -> np.ndarray:
    """JPEG -> uint8 pixels: (h, w, 1) for grayscale, (h, w, 3) RGB
    for interleaved YCbCr color — including the 4:2:0 / 4:2:2 chroma
    subsampling real corpora use. Baseline/extended sequential (SOF0/1)
    decodes here; progressive (SOF2) routes to
    :func:`_jpeg_progressive_pixels`; both honor restart intervals
    (DRI + RSTn realign, DC predictors reset — T.81 F.2.2.1).

    Pure numpy/stdlib: marker walk, canonical Huffman decode, dequant,
    zigzag de-scan, orthonormal 8x8 IDCT per data unit in MCU
    interleave order (T.81 A.2.3), chroma upsampled by replication,
    JFIF/CCIR-601 YCbCr->RGB, level shift + clamp — ITU-T T.81 Annex F.
    Arithmetic-coded, 12-bit, CMYK/4-component, >2x2-sampled,
    non-interleaved-multi-scan-sequential, lossless and hierarchical
    payloads raise NotImplementedError (the documented PIL seam); dims
    for those still parse natively via :func:`_parse_jpeg`."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    comps: list[list[int]] | None = None
    scan = None
    # Adobe APP14 color-transform tag: None = untagged (JFIF convention:
    # 3 components are YCbCr), 0 = components stored as plain R,G,B,
    # 1 = YCbCr. 2 (YCCK) only occurs on 4-component streams, which the
    # SOF gate already routes to the PIL seam.
    adobe_transform = None
    ri = 0  # restart interval in MCUs (0 = none)
    for m, off, ln in _jpeg_segments(b):
        if (m == 0xEE and b[off : off + 5] == b"Adobe" and ln >= 12
                and off + 12 <= len(b)):
            adobe_transform = b[off + 11]
        elif m == 0xDD:  # DRI — every `ri` MCUs the stream byte-aligns
            # on an RSTn marker and the DC predictors reset (T.81
            # F.2.2.1); tracked and honored in the MCU loops below
            (ri,) = struct.unpack_from(">H", b, off)
        elif m == 0xDB:  # DQT (possibly several tables per segment)
            j = off
            while j < off + ln:
                pq, tq = b[j] >> 4, b[j] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                qt[tq] = np.frombuffer(b, np.uint8, 64, j + 1).astype(np.float64)
                j += 65
        elif m in _JPEG_SOF_MARKERS:
            if m == 0xC2:
                # progressive DCT: multi-scan spectral-selection /
                # successive-approximation decode (T.81 Annex G)
                return _jpeg_progressive_pixels(b)
            if m not in (0xC0, 0xC1):
                raise NotImplementedError(
                    "only baseline/extended sequential and progressive "
                    "Huffman JPEG decode natively (arithmetic-coded, "
                    "lossless and hierarchical modes need PIL)"
                )
            if b[off] != 8:
                raise NotImplementedError("12-bit JPEG precision needs PIL")
            h, w = struct.unpack_from(">HH", b, off + 1)
            ncomp = b[off + 5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "native JPEG pixel decode covers grayscale and "
                    "3-component YCbCr; CMYK/4-component needs PIL"
                )
            comps = []
            for i in range(ncomp):
                cid = b[off + 6 + 3 * i]
                hv = b[off + 7 + 3 * i]
                ch_, cv_ = hv >> 4, hv & 15
                if not (1 <= ch_ <= 2 and 1 <= cv_ <= 2):
                    raise NotImplementedError(
                        "JPEG sampling factors beyond 2x2 need PIL"
                    )
                comps.append([cid, ch_, cv_, b[off + 8 + 3 * i]])
            sof = (h, w)
        elif m == 0xC4:  # DHT (possibly several tables per segment)
            j = off
            while j < off + ln:
                tc, th = b[j] >> 4, b[j] & 15
                counts = b[j + 1 : j + 17]
                nsym = sum(counts)
                huff[(tc, th)] = _jpeg_huff_table(
                    counts, b[j + 17 : j + 17 + nsym]
                )
                j += 17 + nsym
        elif m == 0xDA:  # SOS
            ns = b[off]
            stabs = {}
            for j in range(ns):
                cs = b[off + 1 + 2 * j]
                tdta = b[off + 2 + 2 * j]
                stabs[cs] = (tdta >> 4, tdta & 15)
            scan = (ns, stabs, off + 1 + 2 * ns + 3)
    if sof is None or comps is None or scan is None:
        raise ValueError("JPEG without SOF/SOS")
    h, w = sof
    ns, stabs, data_off = scan
    if ns != len(comps):
        raise NotImplementedError(
            "non-interleaved multi-scan baseline JPEG decode requires PIL"
        )
    bits = _JpegBits(b, data_off)
    C = _jpeg_dct_matrix()
    if ns == 1:
        # single-component scan is non-interleaved by definition
        # (T.81 A.2.2): MCU = one data unit, sampling factors ignored
        cid, _ch, _cv, tq = comps[0]
        td, ta = stabs[cid]
        dc_tab, ac_tab, q = huff[(0, td)], huff[(1, ta)], qt[tq]
        by, bx = (h + 7) // 8, (w + 7) // 8
        out = np.empty((by * 8, bx * 8), dtype=np.float64)
        pred = 0
        nmcu = 0
        for r in range(by):
            for c in range(bx):
                if ri and nmcu and nmcu % ri == 0:
                    bits.restart()
                    pred = 0
                px, pred = _jpeg_decode_block(bits, dc_tab, ac_tab, q, C, pred)
                out[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = px
                nmcu += 1
        img = np.clip(np.round(out[:h, :w] + 128.0), 0, 255).astype(np.uint8)
        return img[:, :, None]
    # interleaved YCbCr scan: each MCU carries ch_i x cv_i data units
    # per component in SOF order (T.81 A.2.3)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.empty((mcuy * cv_ * 8, mcux * ch_ * 8), dtype=np.float64)
        for _cid, ch_, cv_, _tq in comps
    ]
    preds = [0] * len(comps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and nmcu and nmcu % ri == 0:
                bits.restart()
                preds = [0] * len(comps)
            nmcu += 1
            for i, (cid, ch_, cv_, tq) in enumerate(comps):
                td, ta = stabs[cid]
                dc_tab, ac_tab, q = huff[(0, td)], huff[(1, ta)], qt[tq]
                for vv in range(cv_):
                    for hh in range(ch_):
                        px, preds[i] = _jpeg_decode_block(
                            bits, dc_tab, ac_tab, q, C, preds[i]
                        )
                        r0 = (my * cv_ + vv) * 8
                        c0 = (mx * ch_ + hh) * 8
                        planes[i][r0 : r0 + 8, c0 : c0 + 8] = px
    full = []
    for i, (_cid, ch_, cv_, _tq) in enumerate(comps):
        # component dims = ceil(dim * factor / max_factor) (T.81 A.1.1),
        # then replication-upsample back to full resolution
        chh = (h * cv_ + vmax - 1) // vmax
        cww = (w * ch_ + hmax - 1) // hmax
        p = planes[i][:chh, :cww]
        p = np.repeat(np.repeat(p, vmax // cv_, axis=0), hmax // ch_, axis=1)
        full.append(p[:h, :w] + 128.0)
    if adobe_transform == 0:
        # Adobe APP14 transform 0: the three components ARE R,G,B —
        # applying the YCbCr inverse would silently mis-decode them
        rgb = np.stack(full, axis=-1)
    else:
        y, cb, cr = full
        # JFIF / CCIR 601 inverse transform
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _prog_dc_scan(bits, scomps, coefs, huff, stabs, Ah, Al, ri, geom, true_dims):
    """One progressive DC scan (T.81 G.2): first pass (Ah=0) decodes
    Huffman DC diffs into bit-plane-shifted coefficients; refinement
    passes (Ah>0) append one bit per block at position Al (two's-
    complement OR — the libjpeg convention the spec's successive
    approximation reduces to). Interleaved over the full MCU grid when
    the scan carries several components, raster over the component's
    TRUE block grid — ceil(comp_h/8) x ceil(comp_w/8), T.81 A.2.2 —
    when it carries one: the storage array is MCU-padded, but a
    non-interleaved scan encodes only the true blocks, so iterating
    the padded shape would over-read and desync the Huffman stream on
    subsampled components whose dims aren't a multiple of the MCU."""
    mcux, mcuy = geom
    preds = {ci: 0 for ci, _c in scomps}
    if len(scomps) == 1:
        ci, comp = scomps[0]
        BH, BW = true_dims[ci]
        units = [(ci, by, bx) for by in range(BH) for bx in range(BW)]
    else:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (_cid, ch_, cv_, _tq) in scomps:
                    for vv in range(cv_):
                        for hh in range(ch_):
                            units.append((ci, my * cv_ + vv, mx * ch_ + hh))
        # restart counts MCUs, not data units
        upm = sum(c[1] * c[2] for _ci, c in scomps)
    nmcu = 0
    for j, (ci, by, bx) in enumerate(units):
        at_mcu = (j % upm == 0) if len(scomps) > 1 else True
        if ri and at_mcu:
            if nmcu and nmcu % ri == 0:
                bits.restart()
                preds = {k: 0 for k in preds}
            nmcu += 1
        if Ah == 0:
            td = stabs[ci][0]
            t = bits.huff(huff[(0, td)])
            preds[ci] += _jpeg_extend(bits.read(t), t)
            coefs[ci][by, bx, 0] = preds[ci] << Al
        elif bits.read(1):
            coefs[ci][by, bx, 0] |= 1 << Al


def _prog_ac_first(bits, arr, ac_tab, Ss, Se, Al, ri, true_bh, true_bw):
    """Progressive AC first scan (Ah=0, T.81 G.2.2 / F.2.2.2 with EOB
    runs): non-interleaved raster over the component's true block
    grid; an EOBn symbol skips 2^r-1+ext further all-zero bands."""
    eobrun = 0
    nmcu = 0
    for by in range(true_bh):
        for bx in range(true_bw):
            if ri:
                if nmcu and nmcu % ri == 0:
                    bits.restart()
                    eobrun = 0
                nmcu += 1
            if eobrun > 0:
                eobrun -= 1
                continue
            blk = arr[by, bx]
            k = Ss
            while k <= Se:
                sym = bits.huff(ac_tab)
                r, s = sym >> 4, sym & 15
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += bits.read(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > Se:
                    raise ValueError("invalid JPEG AC run past band end")
                blk[k] = _jpeg_extend(bits.read(s), s) << Al
                k += 1


def _prog_ac_refine(bits, arr, ac_tab, Ss, Se, Al, ri, true_bh, true_bw):
    """Progressive AC refinement scan (Ah=Al+1, T.81 G.2.2): newly
    significant coefficients arrive as ±2^Al; every already-nonzero
    coefficient traversed emits one correction bit (added at bit Al
    when set and not yet present) — the libjpeg decode_mcu_AC_refine
    control flow, which is the de-facto reading of the spec."""
    p1, m1 = 1 << Al, -1 << Al
    eobrun = 0
    nmcu = 0
    for by in range(true_bh):
        for bx in range(true_bw):
            if ri:
                if nmcu and nmcu % ri == 0:
                    bits.restart()
                    eobrun = 0
                nmcu += 1
            blk = arr[by, bx]
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    sym = bits.huff(ac_tab)
                    r, s = sym >> 4, sym & 15
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += bits.read(r)
                            break
                        # r == 15: ZRL — skip 16 zero-history slots
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid JPEG refinement magnitude"
                            )
                        val = p1 if bits.read(1) else m1
                    while k <= Se:
                        c = int(blk[k])
                        if c != 0:
                            if bits.read(1) and (c & p1) == 0:
                                blk[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s and k <= Se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= Se:
                    c = int(blk[k])
                    if c != 0 and bits.read(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1


def _jpeg_progressive_pixels(b: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2) -> uint8 pixels, pure numpy/stdlib —
    ITU-T T.81 Annex G spectral-selection + successive-approximation
    Huffman decode, restart intervals included. Every scan accumulates
    into per-component zigzag coefficient planes; dequant, IDCT,
    upsample, and color transform run ONCE at the end and reproduce the
    baseline path's float expressions exactly, so a progressive
    re-encode of the same quantized coefficients decodes bit-identically
    to the sequential stream (pinned by the golden tests). Same scope
    gates as the baseline path: 8-bit precision, 1 or 3 components,
    sampling factors <= 2."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    comps: list[list[int]] | None = None
    coefs: list[np.ndarray] | None = None
    adobe_transform = None
    ri = 0
    hmax = vmax = mcux = mcuy = 1
    true_dims: list[tuple[int, int]] = []
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    i, n = 2, len(b)
    while i + 2 <= n:
        if b[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while i + 2 <= n and b[i + 1] == 0xFF:
            i += 1
        m = b[i + 1] if i + 1 < n else 0xD9
        if m == 0xD9:  # EOI
            break
        if i + 4 > n:
            raise ValueError("truncated JPEG")
        (seglen,) = struct.unpack_from(">H", b, i + 2)
        off, ln = i + 4, seglen - 2
        if m == 0xEE and b[off : off + 5] == b"Adobe" and ln >= 12 and off + 12 <= n:
            adobe_transform = b[off + 11]
        elif m == 0xDD:
            (ri,) = struct.unpack_from(">H", b, off)
        elif m == 0xDB:
            j = off
            while j < off + ln:
                pq, tq = b[j] >> 4, b[j] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                qt[tq] = np.frombuffer(b, np.uint8, 64, j + 1).astype(np.float64)
                j += 65
        elif m == 0xC4:
            j = off
            while j < off + ln:
                tc, th = b[j] >> 4, b[j] & 15
                counts = b[j + 1 : j + 17]
                nsym = sum(counts)
                huff[(tc, th)] = _jpeg_huff_table(counts, b[j + 17 : j + 17 + nsym])
                j += 17 + nsym
        elif m in _JPEG_SOF_MARKERS:
            if m != 0xC2:
                raise ValueError("non-progressive SOF inside progressive decode")
            if b[off] != 8:
                raise NotImplementedError("12-bit JPEG precision needs PIL")
            h, w = struct.unpack_from(">HH", b, off + 1)
            ncomp = b[off + 5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "native JPEG pixel decode covers grayscale and "
                    "3-component YCbCr; CMYK/4-component needs PIL"
                )
            comps = []
            for ci in range(ncomp):
                cid = b[off + 6 + 3 * ci]
                hv = b[off + 7 + 3 * ci]
                ch_, cv_ = hv >> 4, hv & 15
                if not (1 <= ch_ <= 2 and 1 <= cv_ <= 2):
                    raise NotImplementedError(
                        "JPEG sampling factors beyond 2x2 need PIL"
                    )
                comps.append([cid, ch_, cv_, b[off + 8 + 3 * ci]])
            if ncomp == 1:
                # single-component frames decode non-interleaved
                # throughout (T.81 A.2.2) — sampling factors moot
                comps[0][1] = comps[0][2] = 1
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs, true_dims = [], []
            for _cid, ch_, cv_, _tq in comps:
                coefs.append(
                    np.zeros((mcuy * cv_, mcux * ch_, 64), dtype=np.int32)
                )
                chh = (h * cv_ + vmax - 1) // vmax
                cww = (w * ch_ + hmax - 1) // hmax
                true_dims.append(((chh + 7) // 8, (cww + 7) // 8))
            sof = (h, w)
        elif m == 0xDA:
            if sof is None or comps is None or coefs is None:
                raise ValueError("JPEG SOS before SOF")
            ns = b[off]
            stabs = {}
            order = []
            for j in range(ns):
                cs = b[off + 1 + 2 * j]
                tdta = b[off + 2 + 2 * j]
                ci = next(
                    (x for x, c in enumerate(comps) if c[0] == cs), None
                )
                if ci is None:
                    raise ValueError("JPEG scan names unknown component")
                stabs[ci] = (tdta >> 4, tdta & 15)
                order.append(ci)
            Ss = b[off + 1 + 2 * ns]
            Se = b[off + 2 + 2 * ns]
            ahal = b[off + 3 + 2 * ns]
            Ah, Al = ahal >> 4, ahal & 15
            bits = _JpegBits(b, off + 4 + 2 * ns)
            if Ss == 0:
                if Se != 0:
                    raise ValueError(
                        "progressive frame carries a sequential "
                        "(Ss=0, Se>0) scan"
                    )
                if ns > 1 and ns != len(comps):
                    raise NotImplementedError(
                        "partially-interleaved progressive DC scans "
                        "need PIL"
                    )
                scomps = [(ci, comps[ci]) for ci in order]
                _prog_dc_scan(
                    bits, scomps, coefs, huff, stabs, Ah, Al, ri,
                    (mcux, mcuy), true_dims,
                )
            else:
                if ns != 1:
                    raise ValueError("progressive AC scan must be single-component")
                ci = order[0]
                ta = stabs[ci][1]
                tbh, tbw = true_dims[ci]
                if Ah == 0:
                    _prog_ac_first(
                        bits, coefs[ci], huff[(1, ta)], Ss, Se, Al, ri, tbh, tbw
                    )
                else:
                    _prog_ac_refine(
                        bits, coefs[ci], huff[(1, ta)], Ss, Se, Al, ri, tbh, tbw
                    )
            i = bits.end
            continue
        i += 2 + seglen
    if sof is None or comps is None or coefs is None:
        raise ValueError("JPEG without SOF/SOS")
    h, w = sof
    C = _jpeg_dct_matrix()
    full = []
    for ci, (_cid, ch_, cv_, tq) in enumerate(comps):
        q = qt[tq]
        arr = coefs[ci]
        BH, BW = arr.shape[:2]
        plane = np.empty((BH * 8, BW * 8), dtype=np.float64)
        for by in range(BH):
            for bx in range(BW):
                blk = np.zeros(64, dtype=np.float64)
                # DQT is zigzag-ordered like the coefficient vector;
                # dequant multiplies before the de-scan (baseline path)
                blk[_ZZ] = arr[by, bx].astype(np.float64) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    C.T @ blk.reshape(8, 8) @ C
                )
        if len(comps) == 1:
            img = np.clip(np.round(plane[:h, :w] + 128.0), 0, 255).astype(np.uint8)
            return img[:, :, None]
        chh = (h * cv_ + vmax - 1) // vmax
        cww = (w * ch_ + hmax - 1) // hmax
        p = plane[:chh, :cww]
        p = np.repeat(np.repeat(p, vmax // cv_, axis=0), hmax // ch_, axis=1)
        full.append(p[:h, :w] + 128.0)
    if adobe_transform == 0:
        rgb = np.stack(full, axis=-1)
    else:
        y, cb, cr = full
        # JFIF / CCIR 601 inverse transform — identical expressions to
        # the baseline path so shared-coefficient streams match bit-for-bit
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_gray_pixels(b: bytes) -> np.ndarray:
    """Historical entry point (round 9 shipped grayscale only) — now a
    thin alias of :func:`jpeg_pixels`, which also decodes baseline
    interleaved color: (h, w, 1) for grayscale payloads, (h, w, 3) RGB
    for YCbCr (4:4:4 / 4:2:2 / 4:2:0)."""
    return jpeg_pixels(b)


def image_pixels(b: bytes) -> np.ndarray:
    """Pixel matrix (h, w, ch) for any decodable image payload
    (PNG / BMP 24-bit / PPM P6)."""
    if b[:8] == _PNG_SIG:
        return png_pixels(b)
    if b[:2] == b"BM":
        w, h, ch = _parse_bmp(b)
        if ch != 3:
            raise ValueError("only 24-bit BMP pixel decode supported")
        (off,) = struct.unpack_from("<I", b, 10)
        row = ((w * 3 + 3) // 4) * 4  # rows pad to 4 bytes
        px = np.frombuffer(b, np.uint8, row * h, off).reshape(h, row)[:, : w * 3]
        return px.reshape(h, w, 3)[::-1, :, ::-1].copy()  # bottom-up BGR -> RGB
    if b[:2] == b"P6":
        w, h, _ = _parse_ppm(b)
        return np.frombuffer(b[-w * h * 3 :], np.uint8).reshape(h, w, 3).copy()
    if b[:2] == b"\xff\xd8":
        return jpeg_pixels(b)
    raise ValueError("not a decodable image payload")


def _pil():
    """Probe-once feature gate for the optional PIL-backed codecs
    (JPEG/GIF/TIFF/...). Returns the PIL.Image module or None; the
    container this engine is developed in has no PIL, so the probe
    result is the documented seam, not an assumption."""
    global _PIL_MOD
    if _PIL_MOD is _UNPROBED:
        try:
            from PIL import Image as _PIL_Image  # noqa: PLC0415

            _PIL_MOD = _PIL_Image
        except ImportError:
            _PIL_MOD = None
    return _PIL_MOD


_UNPROBED = object()
_PIL_MOD = _UNPROBED


def decode_payload(b: bytes) -> tuple[int, int, int]:
    """Sniff + decode a payload's dims. WAV/BMP/PPM/PNG decode natively
    (struct/zlib/numpy — no external libs); JPEG and the other
    compressed codecs go through the PIL feature gate (:func:`_pil`):
    decoded when PIL is installed, else the documented
    ``NotImplementedError`` seam."""
    if b[:4] == b"RIFF":
        if b[8:12] == b"AVI ":
            return _parse_avi(b)
        return _parse_wav(b)
    if b[4:8] == b"ftyp":  # ISO BMFF (MP4/MOV/3GP): box walk for dims
        try:
            return _parse_mp4(b)
        except ValueError:
            pass  # no sized video track — fall through to the PIL gate/seam
    if b[:2] == b"BM":
        return _parse_bmp(b)
    if b[:2] == b"P6":
        return _parse_ppm(b)
    if b[:8] == _PNG_SIG:
        return _parse_png(b)
    if b[: len(_Y4M_SIG)] == _Y4M_SIG:
        return _parse_y4m(b)
    if b[:2] == b"\xff\xd8":
        try:
            return _parse_jpeg(b)
        except ValueError:
            pass  # malformed/SOF-less — fall through to the PIL gate/seam
    pil = _pil()
    if pil is not None:
        import io

        try:
            with pil.open(io.BytesIO(b)) as im:
                w, h = im.size
                bands = len(im.getbands())
            # (width, height, channels) — the same order as the native
            # BMP/PPM/PNG parsers
            return (w, h, bands)
        except Exception:  # noqa: BLE001 — PIL cannot decode it either:
            pass  # fall through to the documented seam below
    raise NotImplementedError(
        "codec decode for JPEG/MP4/... requires PIL/ffmpeg (not in this "
        "container); WAV/BMP/PPM/PNG decode natively (struct/zlib/numpy)"
    )


def wav_samples(b: bytes) -> np.ndarray:
    """PCM16 sample matrix (n_samples, channels) from a WAV payload."""
    n, _, ch = _parse_wav(b)
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if cid == b"data":
            raw = np.frombuffer(b, dtype="<i2", count=n * ch, offset=pos + 8)
            return raw.reshape(n, ch)
        pos += 8 + size + (size & 1)
    raise ValueError("missing data chunk")


def encode_wav(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE PCM16 encoder for int16 (n, channels) arrays —
    the audio counterpart of :func:`encode_png` (real payloads without
    external libs)."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


SPECTRAL_SCHEMA = "doc_id long, n_samples long, channels int, dominant_bin int"


def audio_spectral(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Spectral feature-extract over WAV payloads: dominant rFFT bin of
    the channel-mean signal (DC excluded), Arrow-batched numpy FFT in
    mapInPandas — real DSP on the executors, no audio libs. For a pure
    sine at integer bin k the dominant bin is exactly k (quantization
    noise spreads across the spectrum; the tone's peak dominates), which
    is what the ``audio_spectral_stats`` oracle replays symbolically."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                s = wav_samples(bytes(b))
                mono = s.astype(np.float64).mean(axis=1)
                if mono.size < 2:
                    rows.append((int(i), s.shape[0], s.shape[1], 0))
                    continue
                mag = np.abs(np.fft.rfft(mono))
                dom = int(np.argmax(mag[1:]) + 1)  # exclude DC
                rows.append((int(i), s.shape[0], s.shape[1], dom))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "channels", "dominant_bin"]
            )

    return df.select(id_col, "payload").mapInPandas(_batch, schema=SPECTRAL_SCHEMA)


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: utf-8 bytes of the text as the opaque binary column
    (stands in for image/audio bytes; everything downstream is
    payload-agnostic)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_meta(df: DataFrame, mode: str = "fake", id_col: str = "doc_id") -> DataFrame:
    """Decode stage: binary payload -> typed metadata via mapInPandas.

    mode='fake': deterministic dims from byte length (plumbing test);
    mode='real': native WAV/BMP/PPM decode (``decode_payload``); a
    compressed codec in the batch raises at the PIL/ffmpeg seam.
    """

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            n = pdf["payload"].map(len)
            if mode == "real":
                dims = [decode_payload(bytes(b)) for b in pdf["payload"]]
                width = pd.Series([d[0] for d in dims], dtype="int32")
                height = pd.Series([d[1] for d in dims], dtype="int32")
                channels = pd.Series([d[2] for d in dims], dtype="int32")
            else:
                width = (n % 64 + 1).astype("int32")
                height = (n % 48 + 1).astype("int32")
                channels = pd.Series([3] * len(pdf), dtype="int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "byte_len": n.astype("int64").to_numpy(),
                    "content_md5": [hashlib.md5(b).hexdigest() for b in pdf["payload"]],
                    "width": width.to_numpy(),
                    "height": height.to_numpy(),
                    "channels": channels.to_numpy(),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_decode_batch, schema=META_SCHEMA)


AUDIO_FEAT_SCHEMA = "doc_id long, n_samples long, channels int, rms double, peak int"


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extract stage over WAV payloads: RMS + peak amplitude per
    payload, Arrow-batched (numpy over the PCM16 matrix)."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                s = wav_samples(bytes(b))
                rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2))) if s.size else 0.0
                peak = int(np.max(np.abs(s))) if s.size else 0
                rows.append((int(i), s.shape[0], s.shape[1], rms, peak))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "channels", "rms", "peak"]
            )

    return df.select(id_col, "payload").mapInPandas(_batch, schema=AUDIO_FEAT_SCHEMA)


IMAGE_FEAT_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "mean_lum double, std_lum double, edge_energy double"
)


def image_features(
    df: DataFrame, id_col: str = "doc_id", on_error: str = "raise"
) -> DataFrame:
    """Feature-extract stage over image payloads (PNG/BMP/PPM): per-image
    luminance mean/std + horizontal-gradient edge energy, Arrow-batched.
    Decode runs where the bytes live — no blob shuffle, no driver pull.

    ``on_error`` (round 13 — the poisoned-corpus contract): ``"raise"``
    keeps the strict behavior (one undecodable payload fails the task —
    right for curated fixtures); ``"null"`` adds an ``error`` column
    and emits a null-stats row carrying the decoder's exact message for
    payloads that hit a documented codec seam (NotImplementedError —
    e.g. arithmetic-coded/12-bit/CMYK JPEG awaiting the PIL plug) or
    are malformed (ValueError), so one bad row in a billion-row corpus
    degrades to a filterable row instead of killing the batch. The
    seam-path tests pin the exact messages end-to-end."""
    if on_error not in ("raise", "null"):
        raise ValueError("image_features: on_error must be 'raise' or 'null'")
    safe = on_error == "null"

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                if safe:
                    try:
                        px = image_pixels(bytes(b)).astype(np.float64)
                    except (NotImplementedError, ValueError) as e:
                        rows.append(
                            (int(i), None, None, None, None, None, None,
                             f"{type(e).__name__}: {e}")
                        )
                        continue
                else:
                    px = image_pixels(bytes(b)).astype(np.float64)
                h, w, ch = px.shape
                lum = px.mean(axis=2)  # channel-mean luminance proxy
                grad = np.abs(np.diff(lum, axis=1))
                rows.append(
                    (
                        int(i),
                        w,
                        h,
                        ch,
                        float(lum.mean()),
                        float(lum.std()),
                        float(grad.mean()) if grad.size else 0.0,
                    )
                    + ((None,) if safe else ())
                )
            cols = [
                "doc_id", "width", "height", "channels",
                "mean_lum", "std_lum", "edge_energy",
            ] + (["error"] if safe else [])
            yield pd.DataFrame(rows, columns=cols)

    schema = IMAGE_FEAT_SCHEMA + (", error string" if safe else "")
    return df.select(id_col, "payload").mapInPandas(_batch, schema=schema)


RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int"


def image_resize(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize stage: decode (PNG/BMP/PPM) -> nearest-neighbor resample ->
    PNG re-encode, Arrow-batched mapInPandas where the bytes live (no
    blob shuffle, no driver pull).

    Nearest-neighbor with the top-left convention
    ``src = floor(dst * in / out)`` — exact integer arithmetic, so an
    oracle can replay the index mapping symbolically (see
    ``image_resize_stats``). Real interpolating kernels (bilinear,
    Lanczos) belong to the PIL seam (``decode_payload``); the Spark-side
    plumbing — batch shape, binary column in AND out, schema — is
    identical for any kernel.
    """

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                px = image_pixels(bytes(b))
                h, w, _ch = px.shape
                ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                ids.append(int(i))
                payloads.append(encode_png(px[ys][:, xs]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "width": [out_w] * len(ids),
                    "height": [out_h] * len(ids),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_batch, schema=RESIZE_SCHEMA)


# --- Y4M video (YUV4MPEG2, public spec) --------------------------------------
# The REAL uncompressed video path: YUV4MPEG2 is the standard
# UNCOMPRESSED interchange format (ffmpeg/mjpegtools) — a one-line
# ASCII header, then "FRAME\n" + raw planes per frame, so a pure-python
# parser covers it completely. For COMPRESSED containers see the AVI
# MJPEG section below (native frame decode) and _parse_mp4 (native
# metadata; H.264 frame decode is the documented ffmpeg seam).

_Y4M_SIG = b"YUV4MPEG2 "


def _parse_y4m_header(b: bytes) -> tuple[int, int, str, int]:
    """(width, height, colorspace, header_end) from the stream header."""
    if b[: len(_Y4M_SIG)] != _Y4M_SIG:
        raise ValueError("not a YUV4MPEG2 payload")
    nl = b.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w = h = None
    cs = "C420jpeg"  # spec default when the C tag is absent
    for tag in b[len(_Y4M_SIG) : nl].split(b" "):
        if not tag:
            continue
        k, v = tag[:1], tag[1:]
        if k == b"W":
            w = int(v)
        elif k == b"H":
            h = int(v)
        elif k == b"C":
            cs = "C" + v.decode("ascii")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    return w, h, cs, nl + 1


def _y4m_frame_size(w: int, h: int, cs: str) -> int:
    if cs == "Cmono":
        return w * h
    if cs in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        return w * h + 2 * ((w // 2) * (h // 2))
    raise NotImplementedError(
        f"Y4M colorspace {cs} — mono and 4:2:0 decode natively; "
        "4:2:2/4:4:4 need ffmpeg"
    )


def _parse_y4m(b: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) — header walk only, O(frames) seeks."""
    w, h, cs, pos = _parse_y4m_header(b)
    fsz = _y4m_frame_size(w, h, cs)
    n = 0
    while pos < len(b):
        nl = b.find(b"\n", pos)
        if nl < 0 or b[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M FRAME marker")
        pos = nl + 1 + fsz
        if pos > len(b):
            raise ValueError("truncated Y4M frame")
        n += 1
    return w, h, n


def y4m_luma_frames(b: bytes, every: int = 1):
    """Yield (frame_idx, luma uint8 (h, w)) for every ``every``-th frame
    — the frame-sampling decode (chroma planes are skipped, which is the
    standard featurization shortcut for luminance stats)."""
    w, h, cs, pos = _parse_y4m_header(b)
    fsz = _y4m_frame_size(w, h, cs)
    idx = 0
    while pos < len(b):
        nl = b.find(b"\n", pos)
        if nl < 0 or b[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M FRAME marker")
        data_at = nl + 1
        if data_at + fsz > len(b):
            raise ValueError("truncated Y4M frame")
        if idx % every == 0:
            luma = np.frombuffer(b, np.uint8, w * h, data_at).reshape(h, w)
            yield idx, luma
        pos = data_at + fsz
        idx += 1


def encode_y4m(frames: np.ndarray, colorspace: str = "Cmono") -> bytes:
    """Minimal Y4M encoder for uint8 (n, h, w) luma frames (mono, or
    4:2:0 with neutral 128 chroma) — real spec-valid streams for tests
    and demo pipelines without ffmpeg."""
    frames = np.ascontiguousarray(frames)
    if frames.dtype != np.uint8:
        raise ValueError("encode_y4m expects uint8 luma frames")
    n, h, w = frames.shape
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 {colorspace}\n".encode("ascii")
    )
    chroma = (
        b""
        if colorspace == "Cmono"
        else bytes([128]) * (2 * (w // 2) * (h // 2))
    )
    for i in range(n):
        out += b"FRAME\n"
        out += frames[i].tobytes()
        out += chroma
    return bytes(out)


# --- AVI (RIFF) MJPEG video + MP4 metadata -----------------------------------
# The COMPRESSED video path next to Y4M: Motion-JPEG-in-AVI is the
# classic compressed interchange container whose frames are plain
# baseline JPEGs — so the RIFF walk composes with the native JPEG codec
# above for REAL compressed-frame decode without ffmpeg. MP4 (ISO BMFF)
# parses its box tree natively for metadata (dims, track count); MP4
# FRAME decode (H.264/H.265) stays behind the documented ffmpeg seam.


def _jpeg_encode_gray(px: np.ndarray, quant: int = 8) -> bytes:
    """Minimal baseline grayscale JPEG ENCODER (uniform quant table,
    single-length canonical Huffman tables — legal, merely suboptimal):
    the compressed-codec analog of :func:`encode_png` /
    :func:`encode_y4m`, producing spec-valid streams for payload
    synthesis in tests and demo pipelines without PIL. With
    ``quant=8`` a CONSTANT 8x8 block round-trips EXACTLY through
    :func:`jpeg_pixels` (its only nonzero coefficient is
    DC = 8·(v−128), which the step-8 quantizer preserves losslessly) —
    that exactness is what lets the MJPEG query oracle replay decoded
    stats symbolically."""
    px = np.asarray(px)
    if px.dtype != np.uint8 or px.ndim != 2:
        raise ValueError("_jpeg_encode_gray expects a uint8 (h, w) matrix")
    h, w = px.shape
    C = _jpeg_dct_matrix()
    # canonical single-length tables: every symbol coded in 9 bits
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]

    def table(symbols):
        counts = bytearray(16)
        counts[8] = len(symbols)  # all 9-bit codes
        return bytes(counts), bytes(symbols), {s: (9, i) for i, s in enumerate(symbols)}

    dc_counts, dc_symbols, dc_codes = table(dc_syms)
    ac_counts, ac_symbols, ac_codes = table(ac_syms)

    out_bits = bytearray()
    acc = [0, 0]  # bit accumulator, bit count

    def wbits(val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            acc[0] = (acc[0] << 1) | ((val >> i) & 1)
            acc[1] += 1
            if acc[1] == 8:
                out_bits.append(acc[0])
                if acc[0] == 0xFF:
                    out_bits.append(0x00)  # byte stuffing
                acc[0] = acc[1] = 0

    img = px.astype(np.float64) - 128.0
    # pad to 8-multiples by edge replication
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    pred = 0
    for br in range(img.shape[0] // 8):
        for bc in range(img.shape[1] // 8):
            blk = img[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8]
            coef = C @ blk @ C.T
            qz = np.round(coef.reshape(64)[_ZZ] / quant).astype(int)
            diff = int(qz[0]) - pred
            pred = int(qz[0])
            t = 0 if diff == 0 else abs(diff).bit_length()
            ln, code = dc_codes[t]
            wbits(code, ln)
            if t:
                wbits(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            for k in range(1, 64):
                v = int(qz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    ln, code = ac_codes[0xF0]
                    wbits(code, ln)
                    run -= 16
                s = abs(v).bit_length()
                ln, code = ac_codes[(run << 4) | s]
                wbits(code, ln)
                wbits(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                ln, code = ac_codes[0x00]
                wbits(code, ln)
    if acc[1]:
        acc[0] <<= 8 - acc[1]
        acc[0] |= (1 << (8 - acc[1])) - 1  # pad with 1s per spec
        out_bits.append(acc[0])
        if acc[0] == 0xFF:
            out_bits.append(0x00)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes([quant]) * 64)
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + dc_counts + dc_symbols)
    out += seg(0xC4, bytes([0x10]) + ac_counts + ac_symbols)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(out_bits)
    out += b"\xff\xd9"
    return out


def encode_avi_mjpeg(
    frames: np.ndarray, fps: int = 25, quant: int = 8
) -> bytes:
    """Minimal spec-valid Motion-JPEG AVI for uint8 (n, h, w) luma
    frames: RIFF('AVI ') with hdrl (avih + one 'vids'/'MJPG' strl),
    movi ('00dc' chunks, each a complete baseline JPEG), and an idx1
    index — the real compressed-container shape, readable by ffmpeg/
    players and by :func:`avi_mjpeg_frames`."""
    frames = np.ascontiguousarray(frames)
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("encode_avi_mjpeg expects uint8 (n, h, w) frames")
    n, h, w = frames.shape
    jpegs = [_jpeg_encode_gray(frames[i], quant) for i in range(n)]

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    maxsz = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxsz * fps,       # dwMaxBytesPerSec
        0, 0x10,           # padding, AVIF_HASINDEX
        n, 0, 1, maxsz,    # totalFrames, initialFrames, streams, bufSize
        w, h, 0, 0, 0, 0,  # width, height, reserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, maxsz, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<I2i2H", 40, w, h, 1, 24) + b"MJPG" + struct.pack(
        "<I2i2I", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload = b""
    idx = b""
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<3I", 0x10, 4 + len(movi_payload), len(j))
        movi_payload += chunk(b"00dc", j)
    movi = lst(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, payload_offset, payload_len) inside a RIFF span;
    truncated chunk headers raise ValueError (the seam contract), never
    a raw struct.error."""
    end = min(end, len(b))
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        if pos + 8 + ln > end:
            raise ValueError("truncated RIFF chunk payload")
        yield cid, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # chunks pad to even


def _parse_avi(b: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from the avih header — box walk only."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    for cid, off, ln in _riff_chunks(b, 12, len(b)):
        if cid == b"LIST" and b[off : off + 4] == b"hdrl":
            for c2, o2, l2 in _riff_chunks(b, off + 4, off + ln):
                if c2 == b"avih":
                    if l2 < 40:
                        raise ValueError("truncated AVI avih header")
                    tot, _ini, _ns, _buf, w, h = struct.unpack_from("<6I", b, o2 + 16)
                    return w, h, tot
    raise ValueError("AVI without avih header")


def _avi_video_stream(b: bytes) -> bytes:
    """Two-digit chunk-id prefix of the FIRST 'vids' stream: stream
    numbers are strl positions within hdrl, so an AVI muxed audio-first
    carries its video as '01dc' — hardcoding '00' would silently yield
    zero frames for it. Raises when no video stream exists."""
    for cid, off, ln in _riff_chunks(b, 12, len(b)):
        if cid == b"LIST" and b[off : off + 4] == b"hdrl":
            idx = 0
            for c2, o2, l2 in _riff_chunks(b, off + 4, off + ln):
                if c2 == b"LIST" and b[o2 : o2 + 4] == b"strl":
                    for c3, o3, l3 in _riff_chunks(b, o2 + 4, o2 + l2):
                        if c3 == b"strh":
                            if b[o3 : o3 + 4] == b"vids":
                                return b"%02d" % idx
                            break
                    idx += 1
    raise ValueError("AVI without a video stream")


def _avi_video_chunks(b: bytes, pos: int, end: int, prefix: bytes):
    """Yield the selected video stream's frame payload spans in storage
    order, recursing into ``LIST 'rec '`` groups (the classic VfW
    interleaved layout wraps each frame group in one). Only the video
    stream's ``dc``/``db`` chunks count — another stream's frames must
    not shift the video stream's frame numbering."""
    for cid, off, ln in _riff_chunks(b, pos, end):
        if cid == b"LIST" and b[off : off + 4] == b"rec ":
            yield from _avi_video_chunks(b, off + 4, off + ln, prefix)
        elif cid[:2] == prefix and cid[2:4] in (b"dc", b"db"):
            yield off, ln


def avi_mjpeg_frames(b: bytes, every: int = 1):
    """Yield (frame_idx, luma uint8 (h, w)) for every ``every``-th video
    frame of a Motion-JPEG AVI: the RIFF walk locates the 'vids'
    stream via the strl headers, then finds that stream's ``dc``/``db``
    chunks in ``movi`` (including inside ``rec `` groups)
    and only the SAMPLED ones pay the JPEG Huffman+IDCT decode (color
    frames reduce to channel-mean luma). Non-MJPEG codecs inside AVI
    raise at the JPEG sniff — the documented ffmpeg seam."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    prefix = _avi_video_stream(b)
    idx = 0
    for cid, off, ln in _riff_chunks(b, 12, len(b)):
        if cid == b"LIST" and b[off : off + 4] == b"movi":
            for o2, l2 in _avi_video_chunks(b, off + 4, off + ln, prefix):
                if idx % every == 0:
                    payload = b[o2 : o2 + l2]
                    if payload[:2] != b"\xff\xd8":
                        raise NotImplementedError(
                            "non-MJPEG AVI video codec decode requires ffmpeg"
                        )
                    px = jpeg_pixels(payload).astype(np.float64)
                    yield idx, np.round(px.mean(axis=2)).astype(np.uint8)
                idx += 1


def _parse_mp4(b: bytes) -> tuple[int, int, int]:
    """(width, height, n_video_tracks_as_channels≡3) from the ISO BMFF
    box tree (moov → trak → tkhd, 16.16 fixed-point dims) — metadata
    parses natively; FRAME decode (H.264/H.265) is the ffmpeg seam."""

    def boxes(pos: int, end: int):
        end = min(end, len(b))
        while pos + 8 <= end:
            (sz,) = struct.unpack_from(">I", b, pos)
            btype = b[pos + 4 : pos + 8]
            hdr = 8
            if sz == 1:  # 64-bit largesize
                if pos + 16 > end:
                    raise ValueError("truncated MP4 largesize header")
                (sz,) = struct.unpack_from(">Q", b, pos + 8)
                hdr = 16
            elif sz == 0:  # box extends to EOF
                sz = end - pos
            if sz < hdr or pos + sz > end:
                raise ValueError("bad MP4 box size")
            yield btype, pos + hdr, pos + sz
            pos += sz

    def find(btype: bytes, pos: int, end: int):
        for t, o, e in boxes(pos, end):
            if t == btype:
                yield o, e

    for mo, me in find(b"moov", 0, len(b)):
        for to, te in find(b"trak", mo, me):
            for ko, ke in find(b"tkhd", to, te):
                if ke - ko < 1:
                    raise ValueError("empty MP4 tkhd box")
                ver = b[ko]
                base = ko + (36 if ver == 0 else 48)  # skip to layer field
                if base + 48 > ke:
                    raise ValueError("truncated MP4 tkhd box")
                w16, h16 = struct.unpack_from(">II", b, base + 40)
                w, h = w16 >> 16, h16 >> 16
                if w and h:
                    return w, h, 3
    raise ValueError("MP4 without a sized video track")


def _video_frames(b: bytes, every: int):
    """Container sniff for the frame-sampling decode: Y4M streams read
    raw luma planes; RIFF-AVI streams decode their MJPEG frames through
    the native JPEG codec. Anything else (MP4/H.264, ...) is the
    documented ffmpeg seam."""
    if b[: len(_Y4M_SIG)] == _Y4M_SIG:
        return y4m_luma_frames(b, every)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return avi_mjpeg_frames(b, every)
    raise NotImplementedError(
        "video frame decode covers Y4M and MJPEG-AVI natively; "
        "MP4/H.264 frame decode requires ffmpeg"
    )


def video_frame_stats(
    df: DataFrame, every: int = 2, id_col: str = "doc_id", on_error: str = "raise"
) -> DataFrame:
    """Frame-sampled luminance stats over video payloads (Y4M or
    MJPEG-AVI, sniffed per row): one row per sampled frame (doc_id,
    frame_idx, mean_lum, std_lum) — decode runs where the bytes live
    (Arrow-batched mapInPandas), the video modality analog of
    ``image_features``.

    ``on_error="null"`` (round 13 — the poisoned-corpus contract):
    adds an ``error`` column; a payload hitting a documented codec
    seam (NotImplementedError — e.g. MP4/H.264 frame decode awaiting
    the ffmpeg plug) or malformed bytes (ValueError) emits ONE
    null-stats row carrying the decoder's exact message instead of
    killing the batch. Default ``"raise"`` keeps strict behavior."""
    if on_error not in ("raise", "null"):
        raise ValueError("video_frame_stats: on_error must be 'raise' or 'null'")
    safe = on_error == "null"

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            # ids pass through uncoerced (mirrors pq_encode): the output
            # schema carries the input id dtype, so string/decimal doc
            # ids survive instead of crashing an int() in the executor
            for i, b in zip(pdf[id_col], pdf["payload"]):
                try:
                    for idx, luma in _video_frames(bytes(b), every):
                        lf = luma.astype(np.float64)
                        rows.append(
                            (i, idx, float(lf.mean()), float(lf.std()))
                            + ((None,) if safe else ())
                        )
                except (NotImplementedError, ValueError) as e:
                    if not safe:
                        raise
                    rows.append((i, None, None, None, f"{type(e).__name__}: {e}"))
            cols = [id_col, "frame_idx", "mean_lum", "std_lum"] + (
                ["error"] if safe else []
            )
            yield pd.DataFrame(rows, columns=cols)

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, frame_idx int, mean_lum double, std_lum double" + (
        ", error string" if safe else ""
    )
    return df.select(id_col, "payload").mapInPandas(_batch, schema=schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled offset (video frame
    analog) — explode of a computed offset sequence, no UDF."""
    n = F.length("payload")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return df.select("doc_id", F.explode(offsets).alias("frame_offset"))


def phash64(px: np.ndarray) -> int:
    """64-bit perceptual hash of a decoded image: nearest-neighbor
    32×32 luminance resample → 2D DCT-II (explicit matmul in float64 —
    deterministic, no FFT library variance) → 8×8 low-frequency block
    (DC excluded) → bit_i = coeff_i > median(coeffs). Classic pHash;
    robust to resizing/re-encoding, so equal content hashes equal even
    across codecs."""
    lum = px.astype(np.float64).mean(axis=2)
    h, w = lum.shape
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    s = lum[ys][:, xs]
    n = 32
    k = np.arange(n)
    # DCT-II basis: C[u, x] = cos(pi*(2x+1)*u/(2n))
    C = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    d = C @ s @ C.T
    block = d[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = block > med
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # wrap into signed int64 domain for a Spark LongType column
    return out - (1 << 64) if out >= (1 << 63) else out


def image_phash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual-hash stage over image payloads (PNG/BMP/PPM):
    (doc_id, phash) via mapInPandas where the bytes live."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (int(i), phash64(image_pixels(bytes(b))))
                for i, b in zip(pdf[id_col], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return df.select(id_col, "payload").mapInPandas(
        _batch, schema="doc_id long, phash long"
    )


def phash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """Image NEAR-duplicate pairs: pHash fingerprints through the shared
    pigeonhole banding (``dedup.hamming_near_pairs``) — candidates from
    a (band, 8-bit segment) equi-join, exact popcount(xor) verify.
    Catches re-encoded / slightly-filtered copies that the exact join
    misses."""
    from .dedup import hamming_near_pairs

    d = image_phash(df, id_col=id_col).select(
        F.col("doc_id").alias("doc"), F.col("phash").alias("fp")
    )
    return hamming_near_pairs(d, bits=64, bands=bands, max_hamming=max_hamming)


def phash_dup_pairs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Image exact-perceptual-duplicate pairs: equi-join on the 64-bit
    pHash (one shuffle of 8-byte keys; near-dup with hamming tolerance:
    :func:`phash_near_pairs`)."""
    d = image_phash(df, id_col=id_col)
    l = d.select(F.col("doc_id").alias("doc_a"), "phash")
    r = d.select(F.col("doc_id").alias("doc_b"), "phash")
    return (
        l.join(r, "phash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "phash")
    )

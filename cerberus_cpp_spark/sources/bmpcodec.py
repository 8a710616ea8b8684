"""In-repo Windows BMP codec (decode + encode).

Built from the public BMP/DIB file-format documentation (Microsoft
"Bitmap Storage" / BITMAPFILEHEADER / BITMAPINFOHEADER references and
the Wikipedia "BMP file format" layout tables): 14-byte file header,
CORE (12) / INFO (40) / V2-V5 (52/56/108/124) DIB headers, 1/4/8-bit
palette rows, 16/24/32-bit truecolor rows, BI_RLE8 / BI_RLE4
run-length compression (encoded runs, absolute mode, end-of-line /
end-of-bitmap / delta escapes), BI_BITFIELDS channel masks, 4-byte
row alignment, and bottom-up vs top-down (negative height) row order.

Reference parity anchor: the brief's image leg (cerberus-cpp custom
type equality, ``types.hh:41-48``, promoted to pixel equality) over
one more real-world container. Conformance strategy mirrors
``gifcodec``/``jpegcodec``: Java ImageIO (an independent
spec-conformant implementation the container already ships for
Spark) must decode our streams and we must decode its, both
bit-exactly — BMP is lossless at >=24 bpp, so the interop gate is
exact equality (``tests/test_bmp_interop.py``); sub-byte and 16-bit
paths are planted by our own encoder and cross-checked against
ImageIO's decode of the same stream. Pure-numpy row reshaping on the
uncompressed paths; the RLE paths are per-token Python (RLE payloads
are small by construction — the scale pipeline stores photos as
PNG/JPEG/WebP; BMP/RLE appears as a long-tail crawl format).

Decoder output is always RGB uint8 (H, W, 3); 32-bit alpha and
BITFIELDS alpha channels are dropped after unpacking, matching the
fidelity contract (`operators/image_checks.py` compares RGB planes).
"""

from __future__ import annotations

import struct

import numpy as np

_DIB_SIZES = {12, 40, 52, 56, 64, 108, 124}

BI_RGB = 0
BI_RLE8 = 1
BI_RLE4 = 2
BI_BITFIELDS = 3


def sniff_bmp(data: bytes) -> bool:
    """True iff ``data`` starts like a BMP: 'BM' magic plus a DIB
    header size field from the known family ('BM' alone is two ASCII
    letters — far too weak a magic for a format sniffer that also
    sees text captions)."""
    if data is None or len(data) < 18 or data[:2] != b"BM":
        return False
    (dib,) = struct.unpack_from("<I", data, 14)
    return dib in _DIB_SIZES


def _parse_header(data: bytes):
    if not sniff_bmp(data):
        raise ValueError("not a BMP stream")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (dib,) = struct.unpack_from("<I", data, 14)
    if len(data) < 14 + dib:
        raise ValueError("truncated BMP DIB header")
    if dib == 12:  # BITMAPCOREHEADER: uint16 dims, always bottom-up
        w, h, planes, bpp = struct.unpack_from("<HHHH", data, 18)
        comp, clr_used = BI_RGB, 0
        top_down = False
    else:
        w, h, planes, bpp, comp = struct.unpack_from("<iihHI", data, 18)
        (clr_used,) = struct.unpack_from("<I", data, 46)
        top_down = h < 0
        h = abs(h)
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    if w <= 0 or h <= 0 or w > 1 << 24 or h > 1 << 24:
        raise ValueError("implausible BMP dimensions")
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    return pix_off, dib, w, h, bpp, comp, clr_used, top_down


def bmp_header_info(data: bytes) -> tuple[int, int]:
    """(w, h) from the DIB header alone — no pixel decode (the
    header-only tier of ``imagegen.image_header_info``)."""
    _, _, w, h, _, _, _, _ = _parse_header(data)
    return w, h


def _read_palette(data: bytes, dib: int, bpp: int, clr_used: int
                  ) -> np.ndarray:
    n = clr_used or (1 << bpp)
    if n > 256:
        raise ValueError("BMP palette larger than 256 entries")
    pos = 14 + dib
    entry = 3 if dib == 12 else 4  # CORE palettes are BGR, later BGRX
    end = pos + n * entry
    if end > len(data):
        raise ValueError("truncated BMP palette")
    raw = np.frombuffer(data, np.uint8, n * entry, pos).reshape(n, entry)
    return raw[:, 2::-1].copy()  # BGR(X) -> RGB


def _mask_shift_scale(mask: int) -> tuple[int, int]:
    """(right-shift, max-value) for a contiguous BITFIELDS mask."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    if (mask >> shift) != (1 << width) - 1:
        raise ValueError("non-contiguous BMP channel mask")
    return shift, (1 << width) - 1


def _scale_channel(vals: np.ndarray, shift: int, maxv: int) -> np.ndarray:
    """Channel expansion to 8-bit: round(v * 255 / maxv), the same
    arithmetic java.awt.image.DirectColorModel uses, so 16-bit
    interop with ImageIO is bit-exact."""
    if maxv == 0:
        return np.zeros(vals.shape, np.uint8)
    v = (vals >> shift) & maxv
    if maxv == 255:
        return v.astype(np.uint8)
    return ((v.astype(np.uint32) * 255 + maxv // 2) // maxv).astype(np.uint8)


def _decode_rle(data: bytes, pos: int, w: int, h: int, bpp: int
                ) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 to a (h, w) index raster (bottom-up order as
    stored; caller flips). Escapes per the public spec: 00 00 = end
    of line, 00 01 = end of bitmap, 00 02 dx dy = delta, 00 n>=3 =
    absolute run padded to a 16-bit boundary."""
    idx = np.zeros((h, w), np.uint8)
    x = y = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if bpp == 8:
                pix = [val] * cnt
            else:
                pix = [(val >> 4) & 0xF, val & 0xF] * ((cnt + 1) // 2)
                pix = pix[:cnt]
            take = min(cnt, w - x)
            if y < h and take > 0:
                idx[y, x:x + take] = pix[:take]
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return idx
        elif val == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("truncated BMP RLE delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val literal pixels
            if bpp == 8:
                need = val
                if pos + need > n:
                    raise ValueError("truncated BMP RLE absolute run")
                pix = list(data[pos:pos + need])
            else:
                need = (val + 1) // 2
                if pos + need > n:
                    raise ValueError("truncated BMP RLE absolute run")
                raw = data[pos:pos + need]
                pix = []
                for b in raw:
                    pix.extend(((b >> 4) & 0xF, b & 0xF))
                pix = pix[:val]
            pos += need + (need & 1)  # word-aligned
            take = min(val, w - x)
            if y < h and take > 0:
                idx[y, x:x + take] = pix[:take]
            x += val
    raise ValueError("BMP RLE stream missing end-of-bitmap")


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode to RGB uint8 (h, w, 3)."""
    pix_off, dib, w, h, bpp, comp, clr_used, top_down = _parse_header(data)
    if comp not in (BI_RGB, BI_RLE8, BI_RLE4, BI_BITFIELDS):
        raise ValueError(f"unsupported BMP compression {comp}")

    if comp in (BI_RLE8, BI_RLE4):
        if (comp == BI_RLE8 and bpp != 8) or (comp == BI_RLE4 and bpp != 4):
            raise ValueError("BMP RLE compression / bit depth mismatch")
        if top_down:
            raise ValueError("top-down BMP cannot be RLE-compressed")
        pal = _read_palette(data, dib, bpp, clr_used)
        idx = _decode_rle(data, pix_off, w, h, bpp)
        idx = idx[::-1]
        if int(idx.max()) >= len(pal):
            raise ValueError("BMP RLE index outside palette")
        return pal[idx]

    if comp == BI_BITFIELDS:
        if bpp not in (16, 32):
            raise ValueError("BI_BITFIELDS requires 16 or 32 bpp")
        if dib == 40:
            masks = struct.unpack_from("<III", data, 14 + 40)
        elif dib >= 52:
            masks = struct.unpack_from("<III", data, 14 + 40)
        else:
            raise ValueError("BI_BITFIELDS needs an INFO-family header")
    elif bpp == 16:
        masks = (0x7C00, 0x03E0, 0x001F)  # default RGB555
    else:
        masks = None

    stride = ((w * bpp + 31) // 32) * 4
    need = stride * h
    if pix_off + need > len(data):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, np.uint8, need, pix_off).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp in (1, 4, 8):
        pal = _read_palette(data, dib, bpp, clr_used)
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            hi = rows >> 4
            lo = rows & 0xF
            idx = np.empty((h, stride * 2), np.uint8)
            idx[:, 0::2] = hi
            idx[:, 1::2] = lo
            idx = idx[:, :w]
        else:
            idx = np.unpackbits(rows, axis=1)[:, :w]
        if int(idx.max()) >= len(pal):
            raise ValueError("BMP palette index out of range")
        return pal[idx]

    if bpp == 24:
        bgr = rows[:, :w * 3].reshape(h, w, 3)
        return bgr[:, :, ::-1].copy()

    if bpp == 16:
        pix = rows[:, :w * 2].reshape(h, w, 2)
        v = pix[:, :, 0].astype(np.uint32) | (
            pix[:, :, 1].astype(np.uint32) << 8)
    else:  # 32
        pix = rows[:, :w * 4].reshape(h, w, 4)
        v = (pix[:, :, 0].astype(np.uint32)
             | (pix[:, :, 1].astype(np.uint32) << 8)
             | (pix[:, :, 2].astype(np.uint32) << 16)
             | (pix[:, :, 3].astype(np.uint32) << 24))
        if masks is None:
            masks = (0x00FF0000, 0x0000FF00, 0x000000FF)  # BGRX
    out = np.empty((h, w, 3), np.uint8)
    for c, mask in enumerate(masks):
        shift, maxv = _mask_shift_scale(mask)
        out[:, :, c] = _scale_channel(v, shift, maxv)
    return out


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _assemble(w: int, h: int, bpp: int, comp: int, pal: bytes,
              pix: bytes, top_down: bool,
              masks: tuple[int, int, int] | None = None) -> bytes:
    mask_bytes = struct.pack("<III", *masks) if masks else b""
    pix_off = 14 + 40 + len(mask_bytes) + len(pal)
    info = struct.pack(
        "<IiihHIIiiII", 40, w, -h if top_down else h, 1, bpp, comp,
        len(pix), 2835, 2835, len(pal) // 4, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", pix_off + len(pix), 0, 0,
                           pix_off)
    return file_hdr + info + mask_bytes + pal + pix


def _pad_rows(rows: np.ndarray, w_bytes: int) -> bytes:
    h = rows.shape[0]
    stride = (w_bytes + 3) & ~3
    buf = np.zeros((h, stride), np.uint8)
    buf[:, :w_bytes] = rows[:, :w_bytes]
    return buf.tobytes()


def _palettize(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h, w, _ = rgb.shape
    flat = rgb.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("more than 256 distinct colors; use bpp=24")
    return pal, inv.reshape(h, w).astype(np.uint8)


def _pal_bytes(pal: np.ndarray, n: int) -> bytes:
    full = np.zeros((n, 4), np.uint8)
    full[:len(pal), 0] = pal[:, 2]
    full[:len(pal), 1] = pal[:, 1]
    full[:len(pal), 2] = pal[:, 0]
    return full.tobytes()


def _rle8_encode(idx: np.ndarray) -> bytes:
    """Spec-shaped BI_RLE8: per-row encoded runs (max 255), absolute
    mode for literal stretches of >=3 distinct pixels, 00 00 EOL per
    row and 00 01 EOB at the end."""
    out = bytearray()
    h, w = idx.shape
    for y in range(h - 1, -1, -1):  # stored bottom-up
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while (x + run < w and row[x + run] == row[x]
                   and run < 255):
                run += 1
            if run >= 2 or w - x == run:
                out += bytes((run, int(row[x])))
                x += run
                continue
            # literal stretch: scan until a run of >=3 starts
            start = x
            while x < w and x - start < 254:
                r2 = 1
                while x + r2 < w and row[x + r2] == row[x] and r2 < 3:
                    r2 += 1
                if r2 >= 3:
                    break
                x += r2
            n = x - start
            if n >= 3:
                out += bytes((0, n)) + bytes(int(v) for v in row[start:x])
                if n & 1:
                    out += b"\x00"
            else:
                for i in range(start, x):
                    out += bytes((1, int(row[i])))
        out += b"\x00\x00"
    out[-2:] = b"\x00\x01"
    return bytes(out)


def encode_bmp(rgb: np.ndarray, *, bpp: int = 24, rle: bool = False,
               top_down: bool = False,
               bitfields_565: bool = False) -> bytes:
    """Encode RGB uint8 (h, w, 3).

    Modes (each plants a distinct decoder path):
      * ``bpp=24`` BI_RGB (default; what ImageIO's writer emits too);
        ``top_down=True`` stores rows with negative height.
      * ``bpp=32`` BI_RGB BGRX rows.
      * ``bpp=16`` RGB555 (or BI_BITFIELDS 565 with
        ``bitfields_565=True``) — LOSSY quantization: feed pixels
        already on the 5/6-bit grid for exact roundtrips.
      * ``bpp=8/4/1`` palette (``rle=True`` adds BI_RLE8 for bpp=8);
        >2**bpp distinct colors raises ValueError.
    """
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_bmp expects uint8 (h, w, 3)")
    h, w, _ = rgb.shape
    if bpp == 24:
        bgr = rgb[:, :, ::-1]
        rows = bgr.reshape(h, w * 3)
        if not top_down:
            rows = rows[::-1]
        pix = _pad_rows(rows, w * 3)
        return _assemble(w, h, 24, BI_RGB, b"", pix, top_down)
    if bpp == 32:
        buf = np.zeros((h, w, 4), np.uint8)
        buf[:, :, 0] = rgb[:, :, 2]
        buf[:, :, 1] = rgb[:, :, 1]
        buf[:, :, 2] = rgb[:, :, 0]
        rows = buf.reshape(h, w * 4)
        if not top_down:
            rows = rows[::-1]
        pix = _pad_rows(rows, w * 4)
        return _assemble(w, h, 32, BI_RGB, b"", pix, top_down)
    if bpp == 16:
        r = rgb[:, :, 0].astype(np.uint16)
        g = rgb[:, :, 1].astype(np.uint16)
        b = rgb[:, :, 2].astype(np.uint16)
        if bitfields_565:
            v = ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)
            comp, masks = BI_BITFIELDS, (0xF800, 0x07E0, 0x001F)
        else:
            v = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
            comp, masks = BI_RGB, None
        le = np.empty((h, w, 2), np.uint8)
        le[:, :, 0] = v & 0xFF
        le[:, :, 1] = v >> 8
        rows = le.reshape(h, w * 2)
        if not top_down:
            rows = rows[::-1]
        pix = _pad_rows(rows, w * 2)
        return _assemble(w, h, 16, comp, b"", pix, top_down, masks)
    if bpp in (1, 4, 8):
        pal, idx = _palettize(rgb)
        if len(pal) > (1 << bpp):
            raise ValueError(f"too many colors for bpp={bpp}")
        palb = _pal_bytes(pal, 1 << bpp)
        if rle:
            if bpp != 8:
                raise ValueError("RLE encoding implemented for bpp=8")
            pix = _rle8_encode(idx)
            return _assemble(w, h, 8, BI_RLE8, palb, pix, False)
        if bpp == 8:
            rows = idx
            w_bytes = w
        elif bpp == 4:
            padded = np.zeros((h, (w + 1) & ~1), np.uint8)
            padded[:, :w] = idx
            rows = (padded[:, 0::2] << 4) | padded[:, 1::2]
            w_bytes = (w + 1) // 2
        else:
            rows = np.packbits(idx, axis=1)
            w_bytes = (w + 7) // 8
        if not top_down:
            rows = rows[::-1]
        pix = _pad_rows(rows, w_bytes)
        return _assemble(w, h, bpp, BI_RGB, palb, pix, top_down)
    raise ValueError(f"unsupported encode bit depth {bpp}")

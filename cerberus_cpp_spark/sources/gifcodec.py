"""In-repo GIF87a/GIF89a codec (decode + encode, static + animated).

Built from the public GIF89a specification: logical screen descriptor,
global/local color tables, variable-width LSB-first LZW with CLEAR/EOI
codes and 4096-entry dictionary reset, 4-pass interlacing, Graphic
Control Extensions (delay, transparency index, disposal methods
none/keep/restore-background/restore-previous), and the NETSCAPE2.0
looping application extension.

Reference parity anchor: the brief's image leg (cerberus-cpp custom
type equality, ``types.hh:41-48``, promoted to pixel equality) over
one more real-world container. Conformance strategy mirrors
``jpegcodec``: Java ImageIO (an independent spec implementation the
container already ships for Spark) must decode our streams and we
must decode its, both bit-exactly — GIF is lossless, so unlike JPEG
the interop gate is exact equality, not PSNR
(``tests/test_gif_interop.py``). Composition semantics additionally
pinned by hand-planted disposal/transparency cases and a hypothesis
roundtrip sweep (``tests/test_gifcodec.py``).

Encoder contract: palette-based — more than 256 distinct colors
raises ValueError (no quantizer; the validation engine checks stored
payloads, it does not author lossy re-encodes).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def sniff_gif(data: bytes) -> bool:
    return len(data) >= 6 and data[:6] in GIF_MAGICS


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first variable width, CLEAR / EOI)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    if not 2 <= min_code_size <= 8:
        raise ValueError("bad LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    pos = 0
    bitbuf = 0
    nbits = 0

    def read_code(width: int) -> Optional[int]:
        nonlocal pos, bitbuf, nbits
        while nbits < width:
            if pos >= len(data):
                return None
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        return code

    table: List[bytes] = []

    def reset_table():
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]

    reset_table()
    width = min_code_size + 1
    prev: Optional[bytes] = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code is None:
            raise ValueError("truncated LZW stream")
        if code == clear:
            reset_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended before the frame filled")
    return bytes(out[:n_pixels])


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        # widen AFTER assigning: the decoder widens when its table
        # reaches 2^width, which happens one step later on its side
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _interlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    return idx[order]


# ---------------------------------------------------------------------------
# container parse
# ---------------------------------------------------------------------------


def _read_color_table(data: bytes, pos: int, size_field: int
                      ) -> Tuple[np.ndarray, int]:
    n = 2 << size_field
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("truncated color table")
    tab = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
    return tab, end


def _read_subblocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("truncated sub-block")
        out += data[pos:pos + n]
        pos += n


def gif_header_info(data: bytes) -> Tuple[int, int]:
    """(w, h) of the logical screen — header bytes only."""
    if not sniff_gif(data):
        raise ValueError("not a GIF stream")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack("<HH", data[6:10])
    if w == 0 or h == 0:
        raise ValueError("zero GIF canvas dimension")
    return w, h


@dataclass
class _Frame:
    x: int
    y: int
    w: int
    h: int
    indices: np.ndarray          # (h, w) uint8 palette indices
    palette: np.ndarray          # (n, 3) uint8
    transparent: Optional[int]
    delay_cs: int
    disposal: int


def _parse(data: bytes) -> Tuple[int, int, List[_Frame]]:
    cw, ch = gif_header_info(data)
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, flags & 0x07)
    frames: List[_Frame] = []
    transparent: Optional[int] = None
    delay_cs = 0
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                body, pos = _read_subblocks(data, pos)
                if len(body) < 4:
                    raise ValueError("short graphic control extension")
                packed = body[0]
                delay_cs = struct.unpack("<H", body[1:3])[0]
                transparent = body[3] if packed & 1 else None
                disposal = (packed >> 2) & 0x7
            else:  # comment / application / plain text: skip
                _, pos = _read_subblocks(data, pos)
            continue
        if b == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("truncated image descriptor")
            x, y, fw, fh = struct.unpack("<HHHH", data[pos:pos + 8])
            iflags = data[pos + 8]
            pos += 9
            pal = gct
            if iflags & 0x80:
                pal, pos = _read_color_table(data, pos, iflags & 0x07)
            if pal is None:
                raise ValueError("frame without any color table")
            if fw == 0 or fh == 0 or x + fw > cw or y + fh > ch:
                raise ValueError("frame exceeds GIF canvas")
            if pos >= len(data):
                raise ValueError("truncated image data")
            mcs = data[pos]
            pos += 1
            lzw, pos = _read_subblocks(data, pos)
            raw = _lzw_decode(mcs, lzw, fw * fh)
            idx = np.frombuffer(raw, np.uint8).reshape(fh, fw)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max()) >= len(pal):
                raise ValueError("palette index out of range")
            frames.append(_Frame(x, y, fw, fh, idx, pal, transparent,
                                 delay_cs, disposal))
            transparent = None
            delay_cs = 0
            disposal = 0
            continue
        raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF with no image frames")
    return cw, ch, frames


# ---------------------------------------------------------------------------
# decode (composed canvases, RGBA — transparent = alpha 0)
# ---------------------------------------------------------------------------


def decode_gif_frames(data: bytes) -> List[Tuple[np.ndarray, int]]:
    """All frames as ``[(canvas_rgba, delay_cs), ...]`` — one fully
    COMPOSED (h, w, 4) canvas per frame, disposal methods applied
    between frames (1=keep, 2=restore to transparent background,
    3=restore previous canvas), transparent palette indices leaving
    the underlying canvas pixels visible."""
    cw, ch, frames = _parse(data)
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
    out: List[Tuple[np.ndarray, int]] = []
    for f in frames:
        before = canvas.copy() if f.disposal == 3 else None
        rect = canvas[f.y:f.y + f.h, f.x:f.x + f.w]
        rgb = f.palette[f.indices]
        opaque = (np.ones(f.indices.shape, dtype=bool)
                  if f.transparent is None
                  else f.indices != f.transparent)
        rect[opaque, :3] = rgb[opaque]
        rect[opaque, 3] = 255
        out.append((canvas.copy(), f.delay_cs))
        if f.disposal == 2:
            canvas[f.y:f.y + f.h, f.x:f.x + f.w] = 0
        elif f.disposal == 3:
            canvas = before
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """(h, w, 3) RGB of the first composed frame (transparent pixels
    come back black, matching the ANIM convention)."""
    return decode_gif_frames(data)[0][0][..., :3].copy()


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _build_palette(arrays: List[np.ndarray],
                   reserve_transparent: bool
                   ) -> Tuple[np.ndarray, dict, Optional[int]]:
    colors: List[Tuple[int, int, int]] = []
    seen = {}
    for a in arrays:
        for c in np.unique(a.reshape(-1, 3), axis=0):
            t = (int(c[0]), int(c[1]), int(c[2]))
            if t not in seen:
                seen[t] = len(colors)
                colors.append(t)
    limit = 255 if reserve_transparent else 256
    if len(colors) > limit:
        raise ValueError(
            f"GIF encoder is palette-based: {len(colors)} distinct "
            f"colors exceed the {limit} available entries")
    transparent = len(colors) if reserve_transparent else None
    n = len(colors) + (1 if reserve_transparent else 0)
    size_field = max(1, (max(n, 2) - 1).bit_length())
    table = np.zeros((1 << size_field, 3), dtype=np.uint8)
    for i, c in enumerate(colors):
        table[i] = c
    return table, seen, transparent


def _write_subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        part = payload[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def _min_code_size(table_len: int) -> int:
    return max(2, (table_len - 1).bit_length())


@dataclass
class GifFrame:
    """One animation frame: (h, w, 3) RGB placed at (x, y), shown for
    ``delay_cs`` hundredths of a second; ``disposal`` per GIF89a
    (1=keep, 2=restore background, 3=restore previous);
    ``transparent_mask`` (h, w) bool marks pixels left showing the
    prior canvas."""

    rgb: np.ndarray
    delay_cs: int = 10
    x: int = 0
    y: int = 0
    disposal: int = 1
    transparent_mask: Optional[np.ndarray] = None


def encode_gif(rgb: np.ndarray, *, interlace: bool = False) -> bytes:
    """Static GIF89a of an (h, w, 3) uint8 array (≤256 colors)."""
    return encode_gif_anim([GifFrame(rgb)], loop_count=None,
                           interlace=interlace)


def encode_gif_anim(frames: List[GifFrame], *,
                    canvas: Optional[Tuple[int, int]] = None,
                    loop_count: Optional[int] = 0,
                    interlace: bool = False) -> bytes:
    """Animated GIF89a (one global color table across all frames).
    ``loop_count``: 0 = forever, None = omit the NETSCAPE extension
    (static files)."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    cw = ch = 0
    any_transparent = False
    for f in frames:
        fh, fw = f.rgb.shape[:2]
        if f.x < 0 or f.y < 0:
            raise ValueError("frame offsets must be non-negative")
        if f.disposal not in (0, 1, 2, 3):
            raise ValueError("disposal must be 0..3")
        if not 0 <= f.delay_cs < 1 << 16:
            raise ValueError("delay_cs must fit 16 bits")
        if f.transparent_mask is not None:
            if f.transparent_mask.shape != (fh, fw):
                raise ValueError("transparent_mask shape mismatch")
            any_transparent = True
        cw = max(cw, f.x + fw)
        ch = max(ch, f.y + fh)
    if canvas is not None:
        if canvas[0] < cw or canvas[1] < ch:
            raise ValueError("canvas smaller than frame extents")
        cw, ch = canvas
    if cw >= 1 << 16 or ch >= 1 << 16:
        raise ValueError("GIF dims must fit 16 bits")
    table, index_of, transparent = _build_palette(
        [np.asarray(f.rgb, dtype=np.uint8) for f in frames],
        any_transparent)
    size_field = (len(table) - 1).bit_length() - 1
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", cw, ch)
    out += bytes([0x80 | size_field, 0, 0])  # GCT present, bg 0
    out += table.tobytes()
    if loop_count is not None:
        out += (b"\x21\xff\x0bNETSCAPE2.0"
                + bytes([3, 1]) + struct.pack("<H", loop_count)
                + b"\x00")
    for f in frames:
        rgb = np.asarray(f.rgb, dtype=np.uint8)
        fh, fw = rgb.shape[:2]
        flat = (rgb[..., 0].astype(np.int64) * 65536
                + rgb[..., 1].astype(np.int64) * 256
                + rgb[..., 2].astype(np.int64))
        mapping = {k[0] * 65536 + k[1] * 256 + k[2]: v
                   for k, v in index_of.items()}
        idx = np.vectorize(mapping.get)(flat).astype(np.uint8)
        if f.transparent_mask is not None:
            idx = np.where(f.transparent_mask, transparent, idx) \
                .astype(np.uint8)
        needs_gce = (loop_count is not None or f.delay_cs
                     or f.transparent_mask is not None or f.disposal)
        if needs_gce:
            packed = (f.disposal << 2) | (
                1 if f.transparent_mask is not None else 0)
            out += (b"\x21\xf9\x04" + bytes([packed])
                    + struct.pack("<H", f.delay_cs)
                    + bytes([transparent or 0]) + b"\x00")
        iflags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHH", f.x, f.y, fw, fh) \
            + bytes([iflags])
        rows = _interlace(idx) if interlace else idx
        mcs = _min_code_size(len(table))
        out += bytes([mcs])
        out += _write_subblocks(_lzw_encode(mcs, rows.tobytes()))
    out += b"\x3b"
    return bytes(out)

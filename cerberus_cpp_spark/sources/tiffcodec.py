"""In-repo baseline TIFF 6.0 codec (decode + encode).

Built from the public Adobe TIFF 6.0 specification (June 1992) and
the TIFF LZW clarifications in the public libtiff documentation:
both byte orders (II/MM), IFD entry walk (BYTE/ASCII/SHORT/LONG/
RATIONAL value types, inline vs offset storage), strip- and
tile-organized rasters, Compression 1 (none) / 5 (LZW, MSB-first
variable-width codes with the spec's "early change" and 4096-entry
dictionary reset) / 8 and 32946 (Deflate via zlib) / 32773
(PackBits), Predictor 2 (horizontal differencing), Photometric 0
(WhiteIsZero) / 1 (BlackIsZero) / 2 (RGB) / 3 (palette via the
16-bit ColorMap), 1-bit bilevel and 8-bit samples, and RGBA extra
samples (alpha dropped after unpack, matching the RGB fidelity
contract in ``operators/image_checks.py``).

Reference parity anchor: the brief's image leg (cerberus-cpp custom
type equality, ``types.hh:41-48``, promoted to pixel equality) over
one more real-world container. Conformance strategy mirrors
``gifcodec``/``bmpcodec``: Java ImageIO's TIFF plugin (independent,
spec-conformant, in the container's JDK since Java 9) must decode
our streams and we must decode its — TIFF here is lossless, so the
interop gate is exact pixel equality (``tests/test_tiff_interop.py``)
across compression codecs and both byte orders. Decompression and
row assembly are numpy-vectorized; the LZW token loop is per-code
Python (same tradeoff as the GIF codec — crawl-tail format, small
payloads in the contract corpus).

Out of (documented) scope: PlanarConfiguration 2, 16-bit samples,
CCITT fax codings, JPEG-in-TIFF. These raise ``ValueError`` with the
offending tag value; dataset checks route such rows to the
``decode_error`` verdict rather than killing the job.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_II = b"II\x2a\x00"
_MM = b"MM\x00\x2a"

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def sniff_tiff(data: bytes) -> bool:
    return data is not None and len(data) >= 8 and (
        data[:4] == _II or data[:4] == _MM)


def _read_entries(data: bytes, ifd_off: int | None = None
                  ) -> tuple[str, dict[int, list[int]]]:
    """Byte-order prefix + tag → value-list for IFD 0 (or the IFD at
    an explicit ``ifd_off`` — how EXIF sub-IFDs are walked)."""
    if not sniff_tiff(data):
        raise ValueError("not a TIFF stream")
    bo = "<" if data[:2] == b"II" else ">"
    if ifd_off is None:
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD offset")
    (n,) = struct.unpack_from(bo + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        if pos + 12 > len(data):
            raise ValueError("truncated TIFF IFD")
        tag, typ, count = struct.unpack_from(bo + "HHI", data, pos)
        if typ not in _TYPE_SIZES:
            continue  # unknown value type: skip per spec
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", data, pos + 8)
        if voff + size > len(data):
            raise ValueError(f"TIFF tag {tag} value out of bounds")
        if typ == 1 or typ == 2:
            vals = list(data[voff:voff + count])
        elif typ == 3:
            vals = list(struct.unpack_from(bo + "H" * count, data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(bo + "I" * count, data, voff))
        else:  # RATIONAL: keep numerators (resolution tags, unused)
            raw = struct.unpack_from(bo + "II" * count, data, voff)
            vals = list(raw[0::2])
        tags[tag] = vals
    return bo, tags


def tiff_header_info(data: bytes) -> tuple[int, int]:
    """(w, h) from IFD 0 alone — no pixel decode (the header-only
    tier of ``imagegen.image_header_info``)."""
    _, tags = _read_entries(data)
    try:
        return tags[256][0], tags[257][0]
    except KeyError:
        raise ValueError("TIFF missing ImageWidth/ImageLength")


# ---------------------------------------------------------------------------
# Codecs: PackBits, TIFF-LZW, Deflate
# ---------------------------------------------------------------------------


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < expect:
        b = data[pos]
        pos += 1
        if b < 128:  # literal run of b+1
            out += data[pos:pos + b + 1]
            pos += b + 1
        elif b > 128:  # replicate next byte 257-b times
            if pos >= n:
                raise ValueError("truncated PackBits stream")
            out += bytes((data[pos],)) * (257 - b)
            pos += 1
        # b == 128: no-op per spec
    if len(out) < expect:
        raise ValueError("short PackBits stream")
    return bytes(out[:expect])


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes((257 - run, row[i]))
            i += run
            continue
        start = i
        while i < n and i - start < 128:
            r2 = 1
            while i + r2 < n and row[i + r2] == row[i] and r2 < 3:
                r2 += 1
            if r2 >= 3:
                break
            i += r2
        if i - start > 128:
            i = start + 128
        out += bytes((i - start - 1,)) + row[start:i]
    return bytes(out)


_CLEAR = 256
_EOI = 257


def _lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit order, 9→12-bit codes with the
    spec's early width change (the writer switches one code before
    the table actually overflows), CLEAR resets the table."""
    out = bytearray()
    table: list[bytes] = []
    bitbuf = 0
    nbits = 0
    pos = 0
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes((i,)) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    n = len(data)
    while len(out) < expect:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated TIFF LZW stream")
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            reset()
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("bad first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # TIFF early change (interop-pinned against ImageIO's LZW in
        # tests/test_tiff_interop.py): the READER widens as soon as
        # its table reaches 2^w - 1 entries
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("short TIFF LZW stream")
    return bytes(out[:expect])


def _lzw_encode(raw: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    cur = b""
    for byte in raw:
        cand = cur + bytes((byte,))
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # the reader's table lags the writer's by one entry at each
        # read, so the writer widens one assignment AFTER the
        # reader's 2^w - 1 threshold
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code >= 4094:  # table nearly full: reset
            emit(_CLEAR, width)
            table = {bytes((i,)): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes((byte,))
    if cur:
        emit(table[cur], width)
    emit(_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _none_decode(d: bytes, expect: int) -> bytes:
    if len(d) < expect:
        raise ValueError("short uncompressed TIFF chunk")
    return d[:expect]


def _zlib_decode(d: bytes, expect: int) -> bytes:
    try:
        out = zlib.decompress(d)
    except zlib.error as e:  # decode errors surface as ValueError so
        raise ValueError(f"bad TIFF deflate stream: {e}")  # checks route them
    if len(out) < expect:
        raise ValueError("short TIFF deflate stream")
    return out[:expect]


_DECODERS = {
    1: _none_decode,
    5: _lzw_decode,
    8: _zlib_decode,
    32946: _zlib_decode,
    32773: _packbits_decode,
}


def _undo_predictor(block: np.ndarray, spp: int) -> np.ndarray:
    """Predictor 2: cumulative sum along the row per sample plane
    (uint8 wraparound)."""
    h, wbytes = block.shape
    cols = wbytes // spp
    planes = block.reshape(h, cols, spp)
    return np.cumsum(planes, axis=1, dtype=np.uint8).reshape(h, wbytes)


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode IFD 0 to RGB uint8 (h, w, 3)."""
    bo, tags = _read_entries(data)
    w, h = tiff_header_info(data)
    if w <= 0 or h <= 0 or w > 1 << 24 or h > 1 << 24:
        raise ValueError("implausible TIFF dimensions")
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1] * spp)
    planar = tags.get(284, [1])[0]
    predictor = tags.get(317, [1])[0]
    if planar != 1:
        raise ValueError(f"unsupported TIFF PlanarConfiguration {planar}")
    if comp not in _DECODERS:
        raise ValueError(f"unsupported TIFF compression {comp}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    bilevel = bits == [1] and spp == 1 and photo in (0, 1)
    if not bilevel:
        if any(b != 8 for b in bits) or spp not in (1, 3, 4):
            raise ValueError(
                f"unsupported TIFF sample layout bits={bits} spp={spp}")
    if photo == 3 and spp != 1:
        raise ValueError("palette TIFF must have one sample per pixel")
    dec = _DECODERS[comp]

    def row_bytes(width: int) -> int:
        return (width + 7) // 8 if bilevel else width * spp

    if 322 in tags:  # tiled organization
        tw = tags[322][0]
        th = tags[323][0]
        offs = tags.get(324, [])
        cnts = tags.get(325, [])
        if tw % 16 or th % 16 or tw == 0 or th == 0:
            raise ValueError("TIFF tile size must be a multiple of 16")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if len(offs) != across * down or len(cnts) != len(offs):
            raise ValueError("TIFF tile table mismatch")
        raster = np.zeros((h, row_bytes(w) if bilevel else w * spp),
                          np.uint8)
        trb = row_bytes(tw)
        for ty in range(down):
            for tx in range(across):
                i = ty * across + tx
                raw = dec(data[offs[i]:offs[i] + cnts[i]], trb * th)
                block = np.frombuffer(raw, np.uint8).reshape(th, trb)
                if predictor == 2 and not bilevel:
                    block = _undo_predictor(block, spp)
                ys = ty * th
                xs = tx * tw
                hh = min(th, h - ys)
                if bilevel:
                    # stitch at bit granularity via unpack/repack later;
                    # keep tiles byte-aligned only when xs%8==0
                    if xs % 8:
                        raise ValueError("unaligned bilevel TIFF tile")
                    ww = min(trb, raster.shape[1] - xs // 8)
                    raster[ys:ys + hh, xs // 8:xs // 8 + ww] = \
                        block[:hh, :ww]
                else:
                    ww = min(tw, w - xs) * spp
                    raster[ys:ys + hh, xs * spp:xs * spp + ww] = \
                        block[:hh, :ww]
    else:  # strips
        offs = tags.get(273)
        cnts = tags.get(279)
        if not offs or not cnts or len(offs) != len(cnts):
            raise ValueError("TIFF strip table mismatch")
        rps = tags.get(278, [h])[0] or h
        rows = []
        remaining = h
        for i, (o, c) in enumerate(zip(offs, cnts)):
            sh = min(rps, remaining)
            remaining -= sh
            raw = dec(data[o:o + c], row_bytes(w) * sh)
            block = np.frombuffer(raw, np.uint8).reshape(sh, row_bytes(w))
            if predictor == 2 and not bilevel:
                block = _undo_predictor(block, spp)
            rows.append(block)
        raster = np.concatenate(rows, axis=0)

    if bilevel:
        bits_arr = np.unpackbits(raster, axis=1)[:, :w]
        gray = np.where(bits_arr == 1, 255, 0).astype(np.uint8)
        if photo == 0:  # WhiteIsZero: 0 bit = white
            gray = 255 - gray
        return np.repeat(gray[:, :, None], 3, axis=2)
    if photo in (0, 1):
        gray = raster[:, :w]
        if photo == 0:
            gray = 255 - gray
        return np.repeat(gray[:, :, None], 3, axis=2)
    if photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("TIFF palette ColorMap missing or non-8-bit")
        pal = (np.array(cmap, np.uint16).reshape(3, 256).T >> 8
               ).astype(np.uint8)
        idx = raster[:, :w]
        return pal[idx]
    px = raster.reshape(h, w, spp)
    return px[:, :, :3].copy()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

_COMP_IDS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def _compress(raw: bytes, comp: str) -> bytes:
    if comp == "none":
        return raw
    if comp == "packbits":
        return _packbits_encode(raw)
    if comp == "lzw":
        return _lzw_encode(raw)
    return zlib.compress(raw, 6)


def encode_tiff(rgb: np.ndarray, *, compression: str = "none",
                predictor: bool = False, byte_order: str = "<",
                mode: str = "rgb", tile: int | None = None,
                rows_per_strip: int | None = None,
                meta_tags: dict[int, object] | None = None) -> bytes:
    """Encode RGB uint8 (h, w, 3) as a single-IFD TIFF.

    Modes (each plants a distinct decoder path):
      * ``mode="rgb"`` — chunky 8,8,8 (default).
      * ``mode="gray"`` — Photometric 1; requires R==G==B.
      * ``mode="gray0"`` — Photometric 0 (WhiteIsZero), inverted.
      * ``mode="palette"`` — Photometric 3 with a 16-bit ColorMap;
        >256 distinct colors raises ValueError.
    ``compression`` in {none, packbits, lzw, deflate}; ``predictor``
    applies horizontal differencing (LZW/Deflate only, per spec
    practice); ``tile`` switches to a tiled layout (multiple of 16);
    ``byte_order`` "<" (II) or ">" (MM).
    """
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_tiff expects uint8 (h, w, 3)")
    if compression not in _COMP_IDS:
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and compression in ("none", "packbits"):
        raise ValueError("predictor pairs with lzw/deflate")
    if byte_order not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    h, w, _ = rgb.shape

    cmap: list[int] | None = None
    if mode == "rgb":
        photo, spp = 2, 3
        raster = rgb.reshape(h, w * 3)
    elif mode in ("gray", "gray0"):
        if not (np.array_equal(rgb[:, :, 0], rgb[:, :, 1])
                and np.array_equal(rgb[:, :, 0], rgb[:, :, 2])):
            raise ValueError("gray mode requires R==G==B")
        gray = rgb[:, :, 0]
        if mode == "gray0":
            photo = 0
            raster = (255 - gray).reshape(h, w)
        else:
            photo = 1
            raster = gray.reshape(h, w)
        spp = 1
    elif mode == "palette":
        flat = rgb.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError("more than 256 distinct colors")
        full = np.zeros((256, 3), np.uint16)
        full[:len(pal)] = pal.astype(np.uint16) * 257  # 8→16-bit
        cmap = list(full.T.reshape(-1))
        raster = inv.reshape(h, w).astype(np.uint8)
        photo, spp = 3, 1
    else:
        raise ValueError(f"unknown mode {mode!r}")

    def prep(block: np.ndarray) -> bytes:
        if predictor:
            bh, bw = block.shape
            planes = block.reshape(bh, bw // spp, spp).astype(np.int16)
            diff = np.empty_like(planes)
            diff[:, 0, :] = planes[:, 0, :]
            diff[:, 1:, :] = planes[:, 1:, :] - planes[:, :-1, :]
            block = (diff & 0xFF).astype(np.uint8).reshape(bh, bw)
        return block.tobytes()

    chunks: list[bytes] = []
    if tile is not None:
        if tile % 16 or tile <= 0:
            raise ValueError("tile must be a positive multiple of 16")
        across = (w + tile - 1) // tile
        down = (h + tile - 1) // tile
        padded = np.zeros((down * tile, across * tile * spp), np.uint8)
        padded[:h, :w * spp] = raster
        for ty in range(down):
            for tx in range(across):
                blk = padded[ty * tile:(ty + 1) * tile,
                             tx * tile * spp:(tx + 1) * tile * spp]
                chunks.append(_compress(prep(blk), compression))
    else:
        rps = rows_per_strip or max(1, min(h, 8192 // max(1, w * spp)))
        for y0 in range(0, h, rps):
            chunks.append(_compress(prep(raster[y0:y0 + rps]), compression))
        tile_rps = rps

    bo = byte_order

    # --- assemble: header, IFD, values, chunk data -----------------
    entries: list[tuple[int, int, int, list[int]]] = []

    def add(tag: int, typ: int, vals):
        entries.append((tag, typ, len(vals), vals))

    if meta_tags:
        # descriptive IFD0 tags (ImageDescription / Orientation /
        # Software / DateTime, ...): str → ASCII (type 2, NUL-
        # terminated), int → SHORT — the same vocabulary
        # ``imagemeta.build_exif`` emits for standalone EXIF blocks
        for tag, val in meta_tags.items():
            if isinstance(val, str):
                add(tag, 2, val.encode("ascii") + b"\x00")
            elif isinstance(val, int):
                # EXIF pixel-dim tags are LONG; descriptive ints are
                # SHORT. (Interop note: for single-IFD validation
                # streams these live at IFD0 level; imagemeta's
                # reader merges IFD0 and the EXIF sub-IFD, so both
                # layouts parse.)
                add(tag, 4 if tag >= 32768 else 3, [val])
            else:
                raise ValueError(f"meta tag {tag}: str or int only")

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [8] * spp)
    add(259, 3, [_COMP_IDS[compression]])
    add(262, 3, [photo])
    add(277, 3, [spp])
    if predictor:
        add(317, 3, [2])
    if cmap is not None:
        add(320, 3, cmap)
    n_chunks = len(chunks)
    if tile is not None:
        add(322, 3, [tile])
        add(323, 3, [tile])
        add(324, 4, [0] * n_chunks)  # offsets patched below
        add(325, 4, [len(c) for c in chunks])
        off_tag = 324
    else:
        add(273, 4, [0] * n_chunks)
        add(278, 4, [tile_rps])
        add(279, 4, [len(c) for c in chunks])
        off_tag = 273
    entries.sort(key=lambda e: e[0])

    # --- two-pass layout: placeholder offsets first, then patch ----
    ifd_off = 8
    n = len(entries)
    value_base = ifd_off + 2 + 12 * n + 4

    def build(chunk_offsets: list[int]) -> bytes:
        out = bytearray()
        out += (b"II\x2a\x00" if bo == "<" else b"MM\x00\x2a")
        out += struct.pack(bo + "I", ifd_off)
        out += struct.pack(bo + "H", n)
        overflow = bytearray()
        cursor = value_base
        for tag, typ, count, vals in entries:
            if tag == off_tag:
                vals = chunk_offsets
            if typ == 2:
                payload = bytes(vals)
            else:
                fmt = {3: "H", 4: "I"}[typ]
                payload = struct.pack(bo + fmt * count, *vals)
            if len(payload) <= 4:
                out += struct.pack(bo + "HHI", tag, typ, count)
                out += payload.ljust(4, b"\0")
            else:
                out += struct.pack(bo + "HHII", tag, typ, count, cursor)
                overflow += payload
                cursor += len(payload)
        out += struct.pack(bo + "I", 0)  # next-IFD pointer
        out += overflow
        return bytes(out)

    head_len = len(build([0] * n_chunks))
    offsets = []
    pos = head_len
    for c in chunks:
        offsets.append(pos)
        pos += len(c)
    return build(offsets) + b"".join(chunks)

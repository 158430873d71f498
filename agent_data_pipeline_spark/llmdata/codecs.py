"""Stdlib-only media codecs: BMP (24-bit uncompressed) and WAV (PCM16).

These are REAL binary format implementations — `struct`-packed headers,
padded pixel rows, RIFF chunk walking — not fakes: bytes produced by
``make_bmp``/``make_wav`` open in any image viewer / audio player, and
the parsers accept files produced by standard tools (24bpp BI_RGB BMPs,
canonical PCM WAVs). They exist so the multimodal operators
(`multimodal.decode_and_featurize`, `multimodal.resize_images`) can
exercise a genuine decode path in a container that ships no PIL/ffmpeg:
the container constraint rules out *libraries*, not *parsing*.

Everything here is per-payload pure Python used inside Arrow-batched
``mapInPandas`` kernels; nothing imports Spark. At 100 TB the cost model
is the kernel's: O(payload bytes) per row, no shuffle implications.

Format references (public): BMP = Windows BITMAPFILEHEADER +
BITMAPINFOHEADER layout; WAV = RIFF/WAVE with fmt/data chunks.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# BMP (24-bit, BI_RGB)
# --------------------------------------------------------------------------

# Format strings, not struct.Struct instances: this module is pickled
# by value into Spark worker closures and Struct objects can't pickle.
_BMP_FILE_FMT = "<2sIHHI"      # magic, file size, res1, res2, data offset
_BMP_INFO_FMT = "<IiiHHIIiiII"  # 40-byte BITMAPINFOHEADER
_BMP_FILE_SIZE = struct.calcsize(_BMP_FILE_FMT)
_BMP_INFO_SIZE = struct.calcsize(_BMP_INFO_FMT)


def _bmp_row_size(width: int) -> int:
    """Each pixel row is padded to a 4-byte boundary (3 bytes/px at 24bpp)."""
    return ((3 * width + 3) // 4) * 4


def make_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Build a valid bottom-up 24bpp BMP. ``pixels`` is ``3*width*height``
    bytes of BGR triplets in raster order (top row first; rows are
    flipped into the file's bottom-up layout here)."""
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")
    if len(pixels) != 3 * width * height:
        raise ValueError(f"need {3 * width * height} pixel bytes, got {len(pixels)}")
    row_size = _bmp_row_size(width)
    pad = b"\x00" * (row_size - 3 * width)
    # file stores rows bottom-up
    body = b"".join(
        pixels[3 * width * y : 3 * width * (y + 1)] + pad
        for y in range(height - 1, -1, -1)
    )
    data_offset = _BMP_FILE_SIZE + _BMP_INFO_SIZE
    file_hdr = struct.pack(_BMP_FILE_FMT, b"BM", data_offset + len(body), 0, 0, data_offset)
    info_hdr = struct.pack(
        _BMP_INFO_FMT, _BMP_INFO_SIZE, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body


def parse_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a 24bpp uncompressed BMP: returns
    ``(width, height, bpp, pixels)`` with pixels as BGR triplets in
    top-first raster order (both bottom-up and top-down files handled).
    Raises ValueError on anything that is not such a BMP."""
    if len(payload) < _BMP_FILE_SIZE + _BMP_INFO_SIZE or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, data_offset = struct.unpack_from(_BMP_FILE_FMT, payload, 0)
    (hdr_size, width, height, _planes, bpp, compression, *_rest) = struct.unpack_from(
        _BMP_INFO_FMT, payload, _BMP_FILE_SIZE
    )
    if hdr_size < 40 or compression != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP variant (hdr={hdr_size} comp={compression} bpp={bpp})")
    # Bounds-check header dims BEFORE deriving sizes from them: a crafted
    # header with width <= 0 would make row_size non-positive, letting the
    # truncation check below pass trivially and the parse silently return
    # empty/garbage pixels instead of raising. 1<<20 per side (~3 TB of
    # pixels at the pair) is far beyond any real 24bpp BMP.
    if width <= 0 or height == 0 or width > (1 << 20) or abs(height) > (1 << 20):
        raise ValueError(f"implausible BMP dimensions ({width}x{height})")
    if data_offset < _BMP_FILE_SIZE + _BMP_INFO_SIZE or data_offset > len(payload):
        raise ValueError(f"implausible BMP data offset ({data_offset})")
    top_down = height < 0
    height = abs(height)
    row_size = _bmp_row_size(width)
    if len(payload) < data_offset + row_size * height:
        raise ValueError("truncated BMP pixel data")
    rows = []
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        start = data_offset + y * row_size
        rows.append(payload[start : start + 3 * width])
    return width, height, bpp, b"".join(rows)


def resize_bmp(payload: bytes, new_width: int, new_height: int) -> bytes:
    """Nearest-neighbor resize of a 24bpp BMP — a real resample over the
    decoded pixel grid, re-encoded as a valid BMP."""
    width, height, _bpp, pixels = parse_bmp(payload)
    out = bytearray(3 * new_width * new_height)
    for y in range(new_height):
        src_y = min(height - 1, (y * height) // new_height)
        row_base = 3 * width * src_y
        dst_base = 3 * new_width * y
        for x in range(new_width):
            src_x = min(width - 1, (x * width) // new_width)
            s = row_base + 3 * src_x
            d = dst_base + 3 * x
            out[d : d + 3] = pixels[s : s + 3]
    return make_bmp(new_width, new_height, bytes(out))


# --------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM16)
# --------------------------------------------------------------------------


def make_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Build a canonical PCM16 WAV. ``samples`` are interleaved int16
    frames (len must be a multiple of ``channels``)."""
    if sample_rate <= 0 or channels <= 0:
        raise ValueError("sample_rate and channels must be positive")
    if len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def parse_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a PCM16 WAV by walking RIFF chunks: returns
    ``(sample_rate, channels, n_frames, samples)`` with samples as
    interleaved int16 values. Raises ValueError for non-PCM16 input."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt_info, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt_info = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt_info
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format} bits={bits})")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: 2 * n]))
    return sample_rate, channels, n // channels, samples


# --------------------------------------------------------------------------
# Shared sniffing helper for decode kernels
# --------------------------------------------------------------------------


def sniff(payload: bytes) -> str:
    """Cheap magic-byte modality sniff: 'bmp', 'wav', or 'unknown'."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"

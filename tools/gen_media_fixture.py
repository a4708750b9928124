"""Materialize the committed media-header fixture: real PNG and JPEG
byte streams (valid signatures, chunk/segment structure, CRCs) whose
dimensions the m03 header kernel must recover from the BYTES — plus a
handful of adversarial rows (non-image payload, truncated JPEG, JPEG
with extra APP/COM segments pushing SOF0 to a variable offset).

Deterministic (dimensions and segment paddings derive from media_id
arithmetic, no RNG), written as ONE sorted parquet file so both engines
read identical bytes and git diffs stay stable:

    PYTHONPATH=. python tools/gen_media_fixture.py
"""

from __future__ import annotations

import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "media_headers.parquet",
)

N_ROWS = 400


def png_bytes(width: int, height: int, pad: int) -> bytes:
    """Minimal structurally-valid PNG: signature, IHDR (always the
    first chunk, per spec — fixed offsets 17-20/21-24 for w/h), a
    deterministic IDAT payload, IEND.  Real CRCs."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_data = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
    ihdr = (
        struct.pack(">I", 13)
        + b"IHDR"
        + ihdr_data
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data))
    )
    idat_data = bytes((i * 37 + pad) % 251 for i in range(pad))
    idat = (
        struct.pack(">I", len(idat_data))
        + b"IDAT"
        + idat_data
        + struct.pack(">I", zlib.crc32(b"IDAT" + idat_data))
    )
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    return sig + ihdr + idat + iend


def jpeg_bytes(width: int, height: int, comment: str, app1: bool = False) -> bytes:
    """Minimal structurally-valid JFIF stream: SOI, APP0, an optional
    APP1 (EXIF-shaped filler), a variable-length COM segment (so SOF0
    sits at a DIFFERENT offset per row — the parser must genuinely walk
    segments), SOF0 carrying height/width, EOI.  Segment payloads are
    ASCII/fixed bytes, so no 0xFFC0 false marker can occur."""
    soi = b"\xff\xd8"
    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00"
        + bytes([1, 1, 0])
        + struct.pack(">HH", 1, 1)
        + bytes([0, 0])
    )
    extra = b""
    if app1:
        body = b"Exif\x00\x00" + b"MM" + struct.pack(">H", 42) + b"pad-bytes-ascii"
        extra = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    com_data = comment.encode("ascii")
    com = b"\xff\xfe" + struct.pack(">H", len(com_data) + 2) + com_data
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    return soi + app0 + extra + com + sof0 + b"\xff\xd9"


def jpeg_with_decoy(width: int, height: int, dw: int, dh: int) -> bytes:
    """JPEG whose COM payload embeds a byte-exact FAKE SOF0 marker
    claiming different dimensions — a substring-scanning parser reports
    the decoy; the byte-aligned segment walk jumps over the COM body
    and reads the real frame header."""
    fake = b"\xff\xc0" + struct.pack(">H", 17) + bytes([8]) + struct.pack(">HH", dh, dw)
    com = b"\xff\xfe" + struct.pack(">H", len(fake) + 2) + fake
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    return b"\xff\xd8" + com + sof0 + b"\xff\xd9"


AUDIO_OUT = OUT.replace("media_headers.parquet", "audio_headers.parquet")
N_AUDIO = 50

LEGACY_OUT = OUT.replace("media_headers.parquet", "legacy_image_headers.parquet")
N_LEGACY = 60


def gif_bytes(width: int, height: int, v89: bool, pad: int) -> bytes:
    """Minimal structurally-valid GIF: magic, logical screen descriptor
    (little-endian u16 dims at fixed bytes 7-8/9-10), a global color
    table stub, trailer.  Deterministic filler."""
    magic = b"GIF89a" if v89 else b"GIF87a"
    lsd = struct.pack("<HH", width, height) + bytes([0x80, 0, 0])
    gct = bytes((i * 29 + pad) % 251 for i in range(6))
    return magic + lsd + gct + b"\x3b"


def bmp_bytes(width: int, height: int, dib_size: int = 40, pad: int = 7) -> bytes:
    """Minimal structurally-valid BMP: 'BM' file header, then a DIB
    header of the INFOHEADER family (signed little-endian i32 dims at
    fixed bytes 19-22/23-26; a NEGATIVE height is the spec's top-down
    flag).  Pixel data is deterministic filler."""
    dib = struct.pack("<IiiHH", dib_size, width, height, 1, 24)
    dib += b"\x00" * (dib_size - len(dib))
    pixels = bytes((i * 41 + pad) % 251 for i in range(12))
    hdr = b"BM" + struct.pack("<IHHI", 14 + dib_size + len(pixels), 0, 0, 14 + dib_size)
    return hdr + dib + pixels


def build_legacy_rows() -> list[tuple[int, bytes, str]]:
    """GIF/BMP fixture (m05): the fixed-offset legacy formats plus the
    edges — truncated magic, cut-mid-field reads, a top-down (negative
    height) BMP, V4/V5 DIB headers, the out-of-contract
    BITMAPCOREHEADER, and dispatch checks (a PNG, a JPEG, raw junk)."""
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_LEGACY):
        mid = 2000 + i
        if i % 12 == 11:
            rows.append((mid, f"not-an-image-{i}".encode("ascii") * 2, "raw"))
        elif i % 2 == 0:
            w, h = 8 + (i * 7) % 900, 8 + (i * 13) % 700
            rows.append((mid, gif_bytes(w, h, v89=(i % 4 == 0), pad=i), "gif"))
        else:
            w, h = 8 + (i * 11) % 1200, 8 + (i * 5) % 800
            dib = (40, 108, 124)[i % 3]
            rows.append((mid, bmp_bytes(w, h, dib_size=dib, pad=i), "bmp"))
    edge = 2000 + N_LEGACY
    rows += [
        (edge, bmp_bytes(640, -480), "bmp"),          # top-down: height < 0
        (edge + 1, b"GIF89a", "gif"),                 # magic only → NULL dims
        (edge + 2, gif_bytes(300, 200, True, 0)[:8], "gif"),   # cut mid-width
        (edge + 3, b"BM", "bmp"),                     # header only → NULL dims
        (edge + 4, bmp_bytes(100, 50)[:20], "bmp"),   # cut mid-width field
        # BITMAPCOREHEADER (dib size 12): fmt 'bmp', dims out of contract
        (edge + 5, b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
         + struct.pack("<IHHHH", 12, 100, 50, 1, 24), "bmp"),
        (edge + 6, png_bytes(77, 33, pad=9), "png"),  # dispatch check
        (edge + 7, jpeg_bytes(66, 44, "legacy-mix"), "jpeg"),
    ]
    return rows


def wav_bytes(
    n_channels: int,
    sample_rate: int,
    bits: int,
    n_frames: int,
    list_pad: int = 0,
    decoy: bool = False,
) -> bytes:
    """Minimal structurally-valid RIFF/WAVE: optional LIST chunk before
    fmt (so the fmt offset varies per row and the parser must walk),
    PCM fmt chunk (little-endian fields), data chunk sized
    n_frames × block_align.  ``decoy`` embeds the literal bytes
    'fmt ' inside the data payload — an aligned chunk walk jumps the
    whole data chunk and never sees it."""
    block_align = n_channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = (
        b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, bits)
    )
    payload = bytes((i * 31) % 251 for i in range(n_frames * block_align))
    if decoy and len(payload) >= 12:
        payload = b"fmt " + struct.pack("<I", 9999) + payload[8:]
    data = b"data" + struct.pack("<I", len(payload)) + payload
    lst = b""
    if list_pad:
        body = b"INFO" + (b"x" * list_pad)
        if len(body) % 2:
            body += b"\x00"
        lst = b"LIST" + struct.pack("<I", len(body)) + body
    body = b"WAVE" + lst + fmt + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_audio_rows() -> list[tuple[int, bytes, str]]:
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_AUDIO):
        mid = 1000 + i
        if i % 10 == 9:
            rows.append((mid, b"RIFF\x08\x00\x00\x00WAVE", "wav"))  # truncated
        elif i % 10 == 4:
            rows.append((mid, f"not-audio-{i}".encode("ascii") * 2, "raw"))
        else:
            rows.append(
                (
                    mid,
                    wav_bytes(
                        n_channels=1 + i % 2,
                        sample_rate=(8000, 16000, 22050, 44100, 48000)[i % 5],
                        bits=(8, 16, 24, 32)[i % 4],
                        n_frames=100 + (i * 37) % 400,
                        list_pad=(0 if i % 3 == 0 else 7 + i % 23),
                        decoy=(i % 7 == 3),
                    ),
                    "wav",
                )
            )
    # budget-exceeding row: 20 junk chunks before fmt/data — both
    # engines cap the chunk walk at 16 visits and must report NULLs
    junk = b"".join(
        b"JUNK" + struct.pack("<I", 4) + b"pad!" for _ in range(20)
    )
    wav = wav_bytes(2, 44100, 16, 100)
    body = b"WAVE" + junk + wav[12:]
    rows.append(
        (1000 + N_AUDIO, b"RIFF" + struct.pack("<I", len(body)) + body, "wav")
    )
    # truncated-mid-field rows: the fmt chunk's 8-byte header is fully
    # readable (the walk bound admits it) but its FIELDS are cut — both
    # engines must degrade to NULL identically (engine conv('')→NULL,
    # twin TRY_CAST('0x')→NULL), never throw
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    rows.append(
        (1001 + N_AUDIO, b"RIFF" + struct.pack("<I", len(body)) + body, "wav")
    )
    # partial-field row: channels readable, sample rate cut mid-word —
    # both engines zero-pad the missing high bytes to the same value
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HH", 1, 2)
        + b"\x44\xac"  # low half of 44100, high half missing
    )
    rows.append(
        (1002 + N_AUDIO, b"RIFF" + struct.pack("<I", len(body)) + body, "wav")
    )
    return rows


def build_rows() -> list[tuple[int, bytes, str]]:
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_ROWS):
        if i % 20 == 19:
            # non-image payload: the parser must report 'unknown'
            rows.append((i, f"not-an-image-{i}".encode("ascii") * 3, "raw"))
        elif i % 20 == 9:
            # truncated JPEG (SOI only): jpeg format, no dims
            rows.append((i, b"\xff\xd8\xff\xd9", "jpeg"))
        elif i % 2 == 0:
            w, h = 16 + (i * 7) % 500, 16 + (i * 13) % 400
            rows.append((i, png_bytes(w, h, pad=32 + i % 97), "png"))
        else:
            w, h = 16 + (i * 11) % 800, 16 + (i * 5) % 600
            comment = "c" * (5 + i % 40) + f"-{i}"
            rows.append((i, jpeg_bytes(w, h, comment, app1=(i % 6 == 3)), "jpeg"))
    for i in range(N_ROWS, N_ROWS + 10):
        # decoy block: embedded fake SOF inside a COM segment
        rows.append((i, jpeg_with_decoy(100 + i, 50 + i, dw=7, dh=9), "jpeg"))
    # budget-exceeding block: 30 COM segments before SOF0 — both engines
    # cap the segment walk at 24 visits and must report NULL dims, which
    # the oracle value-checks (a deeper-hidden SOF is entropy-scan
    # territory, out of the header parser's contract)
    soi, tail = b"\xff\xd8", b"\xff\xd9"
    coms = b"".join(
        b"\xff\xfe" + struct.pack(">H", 6) + b"pad!" for _ in range(30)
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + bytes([8])
        + struct.pack(">HH", 123, 456)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    rows.append((N_ROWS + 10, soi + coms + sof0 + tail, "jpeg"))
    # truncated-mid-field rows (the audio twins' TRY_CAST lesson): a PNG
    # cut before the IHDR width field (empty read → NULL both engines),
    # a PNG cut mid-width (partial read → both engines zero-pad the
    # available bytes to the same value), and a JPEG cut one byte into a
    # segment's 2-byte length field (the walk jumps by the zero-padded
    # partial length, runs off the end, and reports NULL dims)
    full_png = png_bytes(100, 50, pad=16)
    rows.append((N_ROWS + 11, full_png[:16], "png"))
    rows.append((N_ROWS + 12, full_png[:18], "png"))
    rows.append((N_ROWS + 13, b"\xff\xd8\xff\xe0\x10", "jpeg"))
    return rows


def _write(rows: list[tuple[int, bytes, str]], kind: str, out: str) -> None:
    table = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
            "meta": pa.array(
                [{"kind": kind, "format": r[2], "n_bytes": len(r[1])} for r in rows],
                pa.struct(
                    [
                        ("kind", pa.string()),
                        ("format", pa.string()),
                        ("n_bytes", pa.int64()),
                    ]
                ),
            ),
        }
    )
    pq.write_table(table, out, compression="snappy")
    print(f"wrote {table.num_rows} rows to {out}")


def main() -> None:
    _write(build_rows(), "image", OUT)
    _write(build_audio_rows(), "audio", AUDIO_OUT)
    _write(build_legacy_rows(), "image", LEGACY_OUT)


if __name__ == "__main__":
    main()

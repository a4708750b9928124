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


MP3_OUT = OUT.replace("media_headers.parquet", "mp3_headers.parquet")
N_MP3 = 50

MP3_BITRATES = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
MP3_RATES = (44100, 48000, 32000)


def mp3_frame(bi: int, sri: int, pad: int, mode: int = 0) -> bytes:
    """One structurally-valid MPEG-1 Layer III frame: 4-byte header
    (sync/version/layer/bitrate/rate/padding/mode) + deterministic
    filler sized to the spec's frame length."""
    b1 = 0xFF
    b2 = 0xE0 | (3 << 3) | (1 << 1) | 1  # sync, MPEG-1, Layer III, no CRC
    b3 = (bi << 4) | (sri << 2) | (pad << 1)
    b4 = mode << 6
    flen = 144000 * MP3_BITRATES[bi - 1] // MP3_RATES[sri] + pad
    body = bytes((i * 17 + bi + sri) % 251 for i in range(flen - 4))
    return bytes([b1, b2, b3, b4]) + body


def mp3_bytes(
    bi: int,
    sri: int,
    n_frames: int,
    id3_pad: int = 0,
    decoy: bool = False,
    pad_alternates: bool = False,
    mode: int = 0,
    tag_v1: bool = False,
) -> bytes:
    """Minimal structurally-valid MP3: optional ID3v2 tag (syncsafe
    size; ``decoy`` plants 0xFF sync-like bytes INSIDE the tag — the
    size-based skip never sees them), then CBR Layer III frames whose
    padding bit may alternate (frame lengths genuinely vary, so the
    walk is exercised), optionally a trailing ID3v1 'TAG' block (the
    walk must stop cleanly on it)."""
    out = b""
    if id3_pad:
        body = (b"\xff\xfb\x90" if decoy else b"pad") * (id3_pad // 3 + 1)
        body = body[:id3_pad]
        sz = len(body)
        syncsafe = bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        )
        out += b"ID3" + bytes([4, 0, 0]) + syncsafe + body
    for i in range(n_frames):
        out += mp3_frame(bi, sri, pad=(i % 2 if pad_alternates else 0), mode=mode)
    if tag_v1:
        out += b"TAG" + bytes(125)
    return out


def build_mp3_rows() -> list[tuple[int, bytes, str]]:
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_MP3):
        mid = 3000 + i
        if i % 10 == 9:
            rows.append((mid, f"not-audio-{i}".encode("ascii") * 3, "raw"))
        else:
            rows.append(
                (
                    mid,
                    mp3_bytes(
                        bi=1 + (i * 5) % 14,
                        sri=i % 3,
                        n_frames=1 + i % 12,
                        id3_pad=(0 if i % 4 == 0 else 20 + i % 60),
                        decoy=(i % 5 == 2),
                        pad_alternates=(i % 3 == 1),
                        mode=(3 if i % 6 == 3 else 0),
                        tag_v1=(i % 7 == 4),
                    ),
                    "mp3",
                )
            )
    edge = 3000 + N_MP3
    rows += [
        # budget-exceeding: 30 frames, the 24-step walk is still
        # mid-chain → NULL n_frames/duration, est_duration still real
        (edge, mp3_bytes(5, 0, 30), "mp3"),
        # exactly at the budget: 24 frames consume the payload precisely
        # → the walk ends with p past the end, count is EXACT
        (edge + 1, mp3_bytes(5, 0, 24), "mp3"),
        (edge + 2, b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + b"0123456789", "mp3"),
        (edge + 3, b"\xff\xfb", "mp3"),  # sync bytes, header truncated
        # MPEG-2 Layer III header: fmt recognized, fields out of contract
        (edge + 4, bytes([0xFF, 0xF0 | (1 << 1) | 1, 0x52, 0]) + bytes(100), "mp3"),
        # Layer II MPEG-1: same contract edge
        (edge + 5, bytes([0xFF, 0xE0 | (3 << 3) | (2 << 1) | 1, 0x52, 0]) + bytes(100), "mp3"),
    ]
    return rows


MP4_OUT = OUT.replace("media_headers.parquet", "mp4_headers.parquet")
N_MP4 = 50


def _box(fourcc: bytes, payload: bytes, extended: bool = False) -> bytes:
    if extended:
        return struct.pack(">I", 1) + fourcc + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def mp4_bytes(
    timescale: int,
    duration: int,
    n_traks: int = 1,
    brand: bytes = b"isom",
    pre_boxes: int = 0,
    v1: bool = False,
    extended_mdat: bool = False,
    decoy: bool = False,
    mdat_last_size0: bool = False,
) -> bytes:
    """Minimal structurally-valid MP4: ftyp, optional free boxes before
    moov (so the moov offset varies), moov containing an mvhd (version
    0 or 1 — different field offsets/widths) and opaque trak children,
    then mdat.  ``decoy`` plants the literal bytes 'moov'/'mvhd' inside
    the mdat payload — a box-aligned walk never sees them.  ``extended_
    mdat`` puts a 64-bit-size mdat BEFORE moov; ``mdat_last_size0``
    ends with a size-0 box (spec: extends to EOF)."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + b"isomiso2")
    if v1:
        mvhd = _box(
            b"mvhd",
            bytes([1, 0, 0, 0])
            + struct.pack(">QQIQ", 3521280000, 3521280000, timescale, duration)
            + bytes(80),
        )
    else:
        mvhd = _box(
            b"mvhd",
            bytes([0, 0, 0, 0])
            + struct.pack(">IIII", 3521280000, 3521280000, timescale, duration)
            + bytes(80),
        )
    traks = b"".join(
        _box(b"trak", bytes((i * 13 + j) % 251 for j in range(20 + i * 7)))
        for i in range(n_traks)
    )
    moov = _box(b"moov", mvhd + traks)
    payload = bytes((i * 23) % 251 for i in range(64))
    if decoy:
        payload = b"moovmvhd" + payload[8:]
    parts = [ftyp]
    for i in range(pre_boxes):
        parts.append(_box(b"free", bytes(5 + i * 3)))
    if extended_mdat:
        parts.append(_box(b"mdat", payload, extended=True))
    parts.append(moov)
    if mdat_last_size0:
        parts.append(struct.pack(">I", 0) + b"mdat" + payload)
    else:
        parts.append(_box(b"mdat", payload))
    return b"".join(parts)


def build_mp4_rows() -> list[tuple[int, bytes, str]]:
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_MP4):
        mid = 4000 + i
        if i % 10 == 9:
            rows.append((mid, f"not-video-{i}".encode("ascii") * 3, "raw"))
        else:
            rows.append(
                (
                    mid,
                    mp4_bytes(
                        timescale=(600, 1000, 90000, 44100)[i % 4],
                        duration=1000 + (i * 997) % 900000,
                        n_traks=1 + i % 3,
                        brand=(b"isom", b"mp42", b"qt  ")[i % 3],
                        pre_boxes=i % 4,
                        v1=(i % 5 == 2),
                        extended_mdat=(i % 6 == 3),
                        decoy=(i % 7 == 1),
                        mdat_last_size0=(i % 8 == 5),
                    ),
                    "mp4",
                )
            )
    edge = 4000 + N_MP4
    rows += [
        (edge, b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00", "mp4"),  # ftyp only
        (edge + 1, mp4_bytes(600, 1200)[:30], "mp4"),  # truncated mid-moov hunt
        # moov whose mvhd is cut mid-fields: timescale NULL both engines
        (edge + 2, mp4_bytes(600, 1200)[: 24 + 8 + 8 + 10], "mp4"),
        # 20 free boxes before moov: walk budget (16) exhausted → NULLs
        (edge + 3,
         _box(b"ftyp", b"isom" + struct.pack(">I", 0))
         + b"".join(_box(b"free", b"xx") for _ in range(20))
         + mp4_bytes(600, 1200)[24:],
         "mp4"),
    ]
    return rows


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


TIFF_OUT = OUT.replace("media_headers.parquet", "tiff_headers.parquet")

N_TIFF = 48


def tiff_entry(e: str, tag: int, typ: int, cnt: int, val: bytes) -> bytes:
    assert len(val) == 4
    return struct.pack(f"{e}HHI", tag, typ, cnt) + val


def tiff_bytes(
    width: int,
    height: int,
    big_endian: bool = False,
    long_types: bool = False,
    pre_tags: int = 0,
    bps: int | None = 8,
    bps_count: int = 1,
    gap: int = 0,
    dup_bad_width: bool = False,
    junk_entries: int = 0,
    trailer: int = 0,
) -> bytes:
    """Minimal structurally-valid TIFF in either byte order: header
    (BOM, magic 42, IFD0 offset — optionally pushed past a gap), one
    IFD whose entries carry ImageWidth/ImageLength as SHORT or LONG
    (left-justified value fields — the spec detail the decoder must
    honor), optional junk tags before/after, an optional MALFORMED
    duplicate width entry (type 2 ASCII — a well-typed later entry
    must win), BitsPerSample with count 1 (inline SHORT) or 3 (value
    field holds an offset → NULL by contract), and a zero next-IFD
    pointer plus optional trailing pixel junk."""
    e = ">" if big_endian else "<"
    bom = b"MM" if big_endian else b"II"
    ifd_off = 8 + gap
    dim_typ = 4 if long_types else 3

    def dim_val(v: int) -> bytes:
        if long_types:
            return struct.pack(f"{e}I", v)
        return struct.pack(f"{e}H", v) + b"\x00\x00"

    entries: list[bytes] = []
    for t in range(pre_tags):
        entries.append(tiff_entry(e, 254 if t % 2 == 0 else 255, 4, 1,
                                  struct.pack(f"{e}I", t + 1)))
    if dup_bad_width:
        entries.append(tiff_entry(e, 256, 2, 1, b"XX\x00\x00"))
    entries.append(tiff_entry(e, 256, dim_typ, 1, dim_val(width)))
    entries.append(tiff_entry(e, 257, dim_typ, 1, dim_val(height)))
    if bps is not None:
        if bps_count == 1:
            entries.append(tiff_entry(e, 258, 3, 1,
                                      struct.pack(f"{e}H", bps) + b"\x00\x00"))
        else:
            # count>1: the value field is an OFFSET into the file
            entries.append(tiff_entry(e, 258, 3, bps_count,
                                      struct.pack(f"{e}I", 2**16)))
    for j in range(junk_entries):
        entries.append(tiff_entry(e, 273 + j, 4, 1, struct.pack(f"{e}I", j)))
    header = bom + struct.pack(f"{e}H", 42) + struct.pack(f"{e}I", ifd_off)
    ifd = struct.pack(f"{e}H", len(entries)) + b"".join(entries)
    ifd += struct.pack(f"{e}I", 0)  # next-IFD: none (IFD0-only contract)
    junk = bytes((k * 29) % 251 for k in range(trailer))
    return header + (b"\x00" * gap) + ifd + junk


def build_tiff_rows() -> list[tuple[int, bytes, str]]:
    """TIFF fixture (m08): both byte orders x both dim types, variable
    junk-tag prefixes and IFD gaps, plus the edges — a budget-length
    IFD (dims past the scan cap), a malformed duplicate width entry, a
    count-3 BitsPerSample (offset, NULL by contract), BigTIFF magic,
    truncated header/count/mid-value reads, an out-of-payload IFD
    offset, an in-payload 'II*' decoy, and dispatch checks."""
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_TIFF):
        mid = 7000 + i
        if i % 12 == 11:
            rows.append((mid, f"not-a-tiff-{i}".encode("ascii") * 3, "raw"))
            continue
        rows.append((
            mid,
            tiff_bytes(
                16 + (i * 7) % 4000,
                16 + (i * 13) % 3000,
                big_endian=i % 2 == 1,
                long_types=i % 4 >= 2,
                pre_tags=i % 5,
                bps=(8, 16, None)[i % 3],
                gap=(0, 6)[i % 7 == 3],
                junk_entries=i % 3,
                trailer=i * 5 % 64,
            ),
            "tiff",
        ))
    edge = 7000 + N_TIFF
    rows += [
        # IFD longer than the 32-entry budget: dims sit past the cap
        (edge, tiff_bytes(900, 700, junk_entries=0, pre_tags=0, bps=None,
                          big_endian=False, dup_bad_width=False, trailer=0,
                          gap=0, long_types=True)[:8]  # header, then custom IFD
         + struct.pack("<H", 40)
         + b"".join(tiff_entry("<", 300 + j, 4, 1, struct.pack("<I", j))
                    for j in range(38))
         + tiff_entry("<", 256, 4, 1, struct.pack("<I", 900))
         + tiff_entry("<", 257, 4, 1, struct.pack("<I", 700))
         + struct.pack("<I", 0), "tiff"),
        # malformed (ASCII-typed) width entry first — valid one wins
        (edge + 1, tiff_bytes(123, 45, dup_bad_width=True), "tiff"),
        (edge + 2, tiff_bytes(222, 111, bps=12, bps_count=3), "tiff"),
        (edge + 3, b"II" + struct.pack("<H", 43) + struct.pack("<I", 8), "bigtiff"),
        (edge + 4, b"II*\x00", "tiff"),                       # magic only
        (edge + 5, tiff_bytes(640, 480)[:9], "tiff"),          # cut mid-count
        # LONG height value cut to 2 of 4 bytes (LE: low bytes survive —
        # the height entry's value field spans bytes 30-33, cut at 32)
        (edge + 6, tiff_bytes(640, 0x00030002, long_types=True,
                              bps=None)[: 8 + 2 + 24 - 2], "tiff"),
        (edge + 7, b"MM\x00\x2A" + struct.pack(">I", 2**24), "tiff"),  # IFD off EOF
        (edge + 8, b"ptr->" + b"II*\x00" + struct.pack("<I", 8), "raw"),  # decoy
        (edge + 9, tiff_bytes(50, 60, big_endian=True)[:4], "tiff"),  # no IFD ptr
        (edge + 10, png_bytes(31, 17, pad=5), "png"),          # dispatch check
    ]
    return rows


GZIP_OUT = OUT.replace("media_headers.parquet", "gzip_headers.parquet")

N_GZIP = 40


def gzip_member(
    data: bytes,
    fname: bytes | None = None,
    mtime: int = 0,
    ftext: bool = False,
    fextra: bytes | None = None,
    os_code: int = 3,
    fhcrc: bool = False,
    comment: bytes | None = None,
) -> bytes:
    """RFC 1952 member with a REAL deflate body (zlib raw stream, so
    the fixture's compressed bytes are genuine, not filler) and a real
    CRC32/ISIZE trailer."""
    flg = (
        (1 if ftext else 0)
        | (2 if fhcrc else 0)
        | (4 if fextra is not None else 0)
        | (8 if fname is not None else 0)
        | (16 if comment is not None else 0)
    )
    hdr = b"\x1f\x8b\x08" + bytes([flg]) + struct.pack("<I", mtime) + bytes([0, os_code])
    if fextra is not None:
        hdr += struct.pack("<H", len(fextra)) + fextra
    if fname is not None:
        hdr += fname + b"\x00"
    if comment is not None:
        hdr += comment + b"\x00"
    if fhcrc:
        hdr += struct.pack("<H", zlib.crc32(hdr) & 0xFFFF)
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = comp.compress(data) + comp.flush()
    return hdr + body + struct.pack(
        "<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) % 2**32
    )


def build_gzip_rows() -> list[tuple[int, bytes, str]]:
    """gzip fixture (m09): real deflate members varying FLG combos,
    names, mtimes and OS codes, plus the edges — concatenated members
    (trailer read = LAST member's ISIZE), an FNAME whose terminator
    sits past the scan budget, a zero-length FNAME, CM!=8, header-only
    and mid-mtime truncations, a flag-byte-missing 3-byte stub, and an
    in-payload magic decoy."""
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_GZIP):
        mid = 8000 + i
        if i % 10 == 9:
            rows.append((mid, f"plain-bytes-{i}".encode("ascii") * 2, "raw"))
            continue
        data = bytes((k * 17 + i) % 251 for k in range((i + 1) * 37 % 400 + 5))
        rows.append((
            mid,
            gzip_member(
                data,
                fname=f"shard-{i:03d}.warc".encode("ascii") if i % 3 else None,
                mtime=i * 86400,
                ftext=i % 4 == 1,
                fextra=b"RA\x04\x00abcd" if i % 5 == 2 else None,
                os_code=(3, 0, 255)[i % 3],
                fhcrc=i % 7 == 3,
                comment=b"round-trip" if i % 6 == 4 else None,
            ),
            "gzip",
        ))
    edge = 8000 + N_GZIP
    two = gzip_member(b"first" * 20, fname=b"a.txt") + gzip_member(
        b"second-member" * 9, fname=b"b.txt"
    )
    rows += [
        (edge, two, "gzip"),                                   # concatenated
        (edge + 1, gzip_member(b"x", fname=b"A" * 80), "gzip"),  # name > budget
        (edge + 2, gzip_member(b"y" * 30, fname=b""), "gzip"),   # empty name
        (edge + 3, b"\x1f\x8b\x07" + bytes(15), "lzh"),          # CM != 8
        (edge + 4, gzip_member(b"z" * 50)[:10], "gzip"),         # header only
        (edge + 5, gzip_member(b"w" * 50, mtime=0x01020304)[:6], "gzip"),  # cut mid-mtime
        (edge + 6, b"\x1f\x8b\x08", "gzip"),                     # no flag byte
        (edge + 7, b"pad:" + gzip_member(b"q" * 9), "raw"),      # decoy magic
        # non-ASCII FNAME (latin-1 'café.txt' — legal per RFC 1952,
        # invalid UTF-8): the ASCII gate surfaces NULL on both engines
        # instead of U+FFFD-vs-error divergence
        (edge + 8, gzip_member(b"n" * 12, fname=b"caf\xe9.txt"), "gzip"),
    ]
    return rows


BMPPX_OUT = OUT.replace("media_headers.parquet", "bmp_pixels.parquet")

N_BMPPX = 40


def bmp_pixel_bytes(
    width: int,
    height: int,
    dib_size: int = 40,
    bpp: int = 24,
    compression: int = 0,
    gap: int = 0,
    seed: int = 0,
    truncate: int = 0,
) -> bytes:
    """BMP with a REAL pixel array: BGR triples per pixel, every row
    padded to a 4-byte boundary, bottom-up (height > 0) or top-down
    (height < 0 — the spec's flag; the pixel VALUES are identical so
    whole-image channel means are orientation-invariant).  ``gap``
    inserts filler between the headers and the pixel data so the data
    offset at file bytes 11-14 must actually be read, not assumed."""
    absh = abs(height)
    stride = (3 * width + 3) // 4 * 4
    dib = struct.pack("<IiiHHI", dib_size, width, height, 1, bpp, compression)
    dib += b"\x00" * (dib_size - len(dib))
    data_off = 14 + dib_size + gap
    out = bytearray()
    for r in range(absh):
        for c in range(width):
            base = (r * width + c) * 3 + seed
            out += bytes(((base * k + 37) % 256 for k in (7, 11, 13)))  # B,G,R
        out += b"\xAA" * (stride - 3 * width)  # pad bytes NOT in the stats
    pixels = bytes(out)
    if truncate:
        pixels = pixels[:-truncate]
    hdr = b"BM" + struct.pack(
        "<IHHI", 14 + dib_size + gap + len(pixels), 0, 0, data_off
    )
    return hdr + dib + b"\xEE" * gap + pixels


def build_bmp_pixel_rows() -> list[tuple[int, bytes, str]]:
    """BMP pixel fixture (m10): small 24bpp images varying width mod 4
    (all four row-padding residues), bottom-up AND top-down, DIB
    40/108/124, header→data gaps, plus the edges — truncated pixel
    array, 8bpp and BI_RLE8 out-of-contract rows, a COREHEADER, a
    pixel count past the fold budget, and dispatch checks."""
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_BMPPX):
        mid = 9000 + i
        if i % 10 == 9:
            rows.append((mid, f"not-a-bitmap-{i}".encode("ascii") * 2, "raw"))
            continue
        w = 1 + (i * 5) % 12          # covers every (3*w) % 4 residue
        h = (1 + (i * 3) % 9) * (-1 if i % 4 == 3 else 1)
        rows.append((
            mid,
            bmp_pixel_bytes(
                w, h,
                dib_size=(40, 108, 124)[i % 3],
                gap=(0, 4, 9)[i % 5 % 3],
                seed=i * 17,
            ),
            "bmp",
        ))
    edge = 9000 + N_BMPPX
    rows += [
        # pixel array cut short: geometry decodes, stats must be NULL
        (edge, bmp_pixel_bytes(6, 5, seed=3, truncate=7), "bmp"),
        # 8bpp: out of the 24bpp stats contract (dims still decode)
        (edge + 1, bmp_pixel_bytes(4, 4, bpp=8, seed=5), "bmp"),
        # BI_RLE8 compression: stats NULL by contract
        (edge + 2, bmp_pixel_bytes(4, 4, compression=1, seed=6), "bmp"),
        # BITMAPCOREHEADER: out of the DIB family, NULL dims and stats
        (edge + 3, b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
         + struct.pack("<IHHHH", 12, 10, 5, 1, 24), "bmp"),
        # 80x60 = 4800 px: past the 4096-px expression budget → NULL
        # stats (the mapInPandas kernel is the at-scale path)
        (edge + 4, bmp_pixel_bytes(80, 60, seed=9), "bmp"),
        (edge + 5, bmp_pixel_bytes(1, 1, seed=11), "bmp"),   # single pixel
        (edge + 6, b"BM" + struct.pack("<IHHI", 14, 0, 0, 14), "bmp"),  # no DIB
        (edge + 7, png_bytes(21, 13, pad=3), "png"),         # dispatch check
    ]
    return rows


WAVPCM_OUT = OUT.replace("media_headers.parquet", "wav_pcm.parquet")

N_WAVPCM = 40


def pcm16_samples(n: int, seed: int) -> list[int]:
    """Deterministic signed 16-bit pattern: full-range coverage
    including both extremes and sign changes, no RNG."""
    out = []
    for i in range(n):
        v = ((i * i * 31 + i * 7919 + seed * 1013) % 65536) - 32768
        out.append(v)
    if n >= 2:
        out[0], out[1] = -32768, 32767  # pin both extremes
    return out


def wav_pcm_bytes(
    n_channels: int,
    sample_rate: int,
    n_samples: int,
    seed: int = 0,
    list_pad: int = 0,
    fmt_code: int = 1,
    bits: int = 16,
    truncate: int = 0,
    lie_size: int | None = None,
) -> bytes:
    """RIFF/WAVE with REAL 16-bit PCM samples in the data chunk.
    ``n_samples`` counts TOTAL samples (all channels interleaved).
    ``truncate`` cuts payload bytes after the header is written (the
    declared data size then exceeds the payload — stats must be NULL);
    ``lie_size`` overrides the declared data-chunk size."""
    samples = pcm16_samples(n_samples, seed)
    payload = struct.pack(f"<{len(samples)}h", *samples)
    if bits == 8:
        payload = bytes((s + 32768) // 256 for s in samples)
    block_align = n_channels * bits // 8
    fmt = (
        b"fmt "
        + struct.pack("<I", 16)
        + struct.pack(
            "<HHIIHH", fmt_code, n_channels, sample_rate,
            sample_rate * block_align, block_align, bits,
        )
    )
    declared = len(payload) if lie_size is None else lie_size
    data = b"data" + struct.pack("<I", declared) + payload
    lst = b""
    if list_pad:
        body = b"INFO" + (b"x" * list_pad)
        if len(body) % 2:
            body += b"\x00"
        lst = b"LIST" + struct.pack("<I", len(body)) + body
    body = b"WAVE" + lst + fmt + data
    out = b"RIFF" + struct.pack("<I", len(body)) + body
    if truncate:
        out = out[:-truncate]
    return out


def build_wav_pcm_rows() -> list[tuple[int, bytes, str]]:
    """WAV PCM fixture (m11): real 16-bit sample data (both extremes
    pinned, varied lengths, LIST-shifted fmt offsets), plus the edges —
    8-bit and IEEE-float fmt codes (out of the s16 contract), an
    empty data chunk, a truncated payload, a declared size past the
    payload end, a sample count past the fold budget, and junk."""
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_WAVPCM):
        mid = 9500 + i
        if i % 10 == 9:
            rows.append((mid, f"not-a-wave-{i}".encode("ascii") * 2, "raw"))
            continue
        rows.append((
            mid,
            wav_pcm_bytes(
                n_channels=1 + i % 2,
                sample_rate=(8000, 16000, 44100)[i % 3],
                n_samples=3 + (i * 29) % 220,
                seed=i * 11,
                list_pad=(0 if i % 3 == 0 else 5 + i % 19),
            ),
            "wav",
        ))
    edge = 9500 + N_WAVPCM
    rows += [
        (edge, wav_pcm_bytes(1, 8000, 40, seed=1, bits=8), "wav"),       # 8-bit
        (edge + 1, wav_pcm_bytes(1, 8000, 40, seed=2, fmt_code=3), "wav"),  # float
        (edge + 2, wav_pcm_bytes(1, 8000, 0, seed=3), "wav"),            # empty data
        (edge + 3, wav_pcm_bytes(1, 8000, 60, seed=4, truncate=33), "wav"),  # cut
        (edge + 4, wav_pcm_bytes(1, 8000, 10, seed=5, lie_size=999), "wav"),  # lie
        # 4500 samples: past the 4096-sample expression budget → NULL
        # stats (header fields still decode)
        (edge + 5, wav_pcm_bytes(2, 44100, 4500, seed=6), "wav"),
        (edge + 6, wav_pcm_bytes(1, 8000, 1, seed=7), "wav"),            # 1 sample
        (edge + 7, b"RIFF\x08\x00\x00\x00WAVE", "wav"),                  # no chunks
    ]
    return rows


WARC_OUT = OUT.replace("media_headers.parquet", "warc_members.parquet")

N_WARC = 32


def stored_member(
    data: bytes,
    fname: bytes | None = None,
    mtime: int = 0,
    os_code: int = 3,
    multi_block: bool = False,
    level: int | None = None,
) -> bytes:
    """gzip member whose deflate body is a STORED block (BTYPE=00) —
    the one deflate shape whose content is scan-readable without a
    codec, and the layout random-access WARC tooling relies on.
    ``multi_block`` splits the data over two stored blocks (out of the
    single-final-block expression contract; the zlib kernel still
    decodes it); ``level`` emits a genuinely COMPRESSED body instead
    (same: kernel-only).  Trailer CRC32/ISIZE are real."""
    flg = 8 if fname is not None else 0
    hdr = b"\x1f\x8b\x08" + bytes([flg]) + struct.pack("<I", mtime) + bytes([0, os_code])
    if fname is not None:
        hdr += fname + b"\x00"
    if level is not None:
        comp = zlib.compressobj(level, zlib.DEFLATED, -15)
        body = comp.compress(data) + comp.flush()
    elif multi_block:
        half = len(data) // 2
        a, b = data[:half], data[half:]
        body = (
            b"\x00" + struct.pack("<HH", len(a), len(a) ^ 0xFFFF) + a
            + b"\x01" + struct.pack("<HH", len(b), len(b) ^ 0xFFFF) + b
        )
    else:
        body = b"\x01" + struct.pack("<HH", len(data), len(data) ^ 0xFFFF) + data
    return hdr + body + struct.pack(
        "<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) % 2**32
    )


def warc_record(
    rec_type: str,
    uri: str | None,
    body: str | bytes,
    date: str = "2024-01-15T08:00:00Z",
) -> bytes:
    """One WARC/1.0 record: CRLF header block (ASCII per spec), blank
    line, content, trailing CRLF CRLF."""
    payload = body if isinstance(body, bytes) else body.encode("utf-8")
    lines = [f"WARC/1.0", f"WARC-Type: {rec_type}", f"WARC-Date: {date}"]
    if uri is not None:
        lines.append(f"WARC-Target-URI: {uri}")
    lines.append(f"Content-Length: {len(payload)}")
    hdr = "\r\n".join(lines) + "\r\n\r\n"
    return hdr.encode("ascii") + payload + b"\r\n\r\n"


_HTTP_REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
                 500: "Internal Server Error"}


def http_payload(
    body: str | bytes,
    status: int = 200,
    ctype: str | None = "text/html",
    header_case: str = "Content-Type",
) -> bytes:
    """Full HTTP response payload for a WARC ``response`` record's
    content block: status line, headers, CRLF CRLF, body — what real
    crawl shards store (``header_case`` varies the Content-Type header
    casing to exercise the case-insensitive field regex)."""
    b = body if isinstance(body, bytes) else body.encode("utf-8")
    lines = [f"HTTP/1.1 {status} {_HTTP_REASONS.get(status, 'OK')}",
             "Server: crawler-sim/1.0"]
    if ctype is not None:
        lines.append(f"{header_case}: {ctype}")
    lines.append(f"Content-Length: {len(b)}")
    return ("\r\n".join(lines) + "\r\n\r\n").encode("ascii") + b


#: multi-byte UTF-8 bodies (2/3/4-byte sequences, combining marks) —
#: the well-formed-UTF-8 gate must pass these identically in both
#: engines so real web text flows through the ingest oracle-checked.
UTF8_BODIES = [
    "plain ascii only here",
    "café au lait — naïve résumé",
    "東京都 渋谷区 テスト 頁",
    "emoji \U0001f600 \U0001f680 clef \U0001d11e done",
    "combining: é ö ñ å",
]


def html_page(body_text: str, seed: int) -> str:
    """A deterministic real-markup HTML page around ``body_text`` —
    hostile to naive tag-stripping on purpose (script body with bare
    '<' and quotes, style braces, comment, entities, attributes)."""
    return (
        "<html><head><title>t</title><style>p{margin:0}</style>"
        f'<script type="text/x">if(a<{seed}){{go("x&y")}}</script></head>'
        "<body><!-- boiler --><nav>Home | Archive &amp; Help</nav>"
        f'<h1>Page {seed}</h1><p class="lead">{body_text}</p>'
        "<p>&quot;cited&quot;&nbsp;&#39;aside&#39;</p></body></html>"
    )


def build_warc_rows() -> list[tuple[int, bytes, str]]:
    """WARC shard fixture (m12/m14/ll15/ll16): payloads of 1-4
    CONCATENATED stored-deflate gzip members, each wrapping one WARC
    record.  Response records carry FULL HTTP payloads (status line +
    headers + body, incl. multi-byte UTF-8 bodies); conversion records
    model WET shards (bare extracted text, no HTTP block); plus the
    edges — a multi-block member and a compressed member (expression
    walk stops, zlib kernel decodes), non-200 / malformed-HTTP /
    invalid-UTF-8 / bare-body responses, binary content right after
    the header block, a truncated final member, a missing blank-line
    terminator inside the header window, and junk."""
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_WARC):
        mid = 9800 + i
        if i % 8 == 7:
            rows.append((mid, f"not-a-warc-{i}".encode("ascii") * 3, "raw"))
            continue
        n_members = 1 + i % 4
        parts = []
        for k in range(n_members):
            if k == 0 and i % 3 == 0:
                rec = warc_record("warcinfo", None, f"software: crawler/{i}\r\n")
            elif (i + k) % 5 == 2:
                # cross-shard DUPLICATE response BODIES (mirror pages):
                # the ingest chain's fingerprint dedup must pick one
                # canonical copy per body across media rows — bodies
                # are byte-identical, HTTP headers may differ
                rec = warc_record(
                    "response",
                    f"https://mirror-{i % 3}.example.org/boiler/{k}",
                    http_payload(
                        "shared boilerplate body text " * (2 + k % 2),
                        ctype=("text/html", "text/html; charset=utf-8")[i % 2],
                    ),
                )
            else:
                typ = ("response", "request", "conversion", "metadata")[(i + k) % 4]
                body = (
                    f"content-{i}-{k} " * (1 + (i * k) % 9)
                    + UTF8_BODIES[(i + k) % len(UTF8_BODIES)]
                )
                if typ == "response":
                    content: bytes | str = http_payload(
                        body,
                        ctype=("text/html", "text/plain; charset=utf-8")[k % 2],
                        header_case=("Content-Type", "content-type")[i % 2],
                    )
                elif typ == "request":
                    content = (
                        f"GET /page/{i}/{k} HTTP/1.1\r\nHost: example.org\r\n\r\n"
                    )
                else:  # conversion (WET extracted text) / metadata
                    content = body
                rec = warc_record(typ, f"https://example.org/page/{i}/{k}", content)
            parts.append(
                stored_member(
                    rec,
                    fname=f"rec-{i:02d}-{k}.warc".encode("ascii") if (i + k) % 2 else None,
                    mtime=i * 3600 + k,
                )
            )
        rows.append((mid, b"".join(parts), "warc"))
    edge = 9800 + N_WARC
    rec = warc_record(
        "response", "https://example.org/big",
        http_payload("payload éè " * 40, ctype="text/plain"),
    )
    binrec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://example.org/bin\r\n"
        b"Content-Length: 8\r\n\r\n" + bytes(range(248, 256)) + b"\r\n\r\n"
    )
    rows += [
        # stored member then MULTI-BLOCK member: expression walk emits
        # member 0 and stops; the zlib kernel emits both
        (edge, stored_member(warc_record("response", "https://a.example/x",
                                         http_payload("aa")))
         + stored_member(rec, multi_block=True), "warc"),
        # COMPRESSED member first: expression emits nothing, kernel parses
        (edge + 1, stored_member(rec, level=9), "warc"),
        # binary content directly after the header block: header parse
        # must succeed (boundary found in hex, not in decoded text)
        (edge + 2, stored_member(binrec, fname=b"bin.warc"), "warc"),
        # final member truncated mid-body: prior members still emit
        (edge + 3, stored_member(warc_record("request", "https://a.example/q", "q"))
         + stored_member(rec)[:20], "warc"),
        # no blank line inside the 1 KiB header window → NULL fields
        (edge + 4, stored_member(b"WARC/1.0\r\nWARC-Type: response\r\n" + b"X" * 1200),
         "warc"),
        # record that is not WARC at all: member enumerates, fields NULL
        (edge + 5, stored_member(b"HTTP/1.1 200 OK\r\n\r\nhello"), "warc"),
        (edge + 6, b"\x1f\x8b\x08", "warc"),          # bare magic, no header
        (edge + 7, b"lead-in" + stored_member(rec), "raw"),  # decoy offset
        # HTTP edges (m14 crawl-health view; ll15/ll16 must drop all
        # but the bare-body one):
        # non-200: surfaces in m14 with status 404, never ingests
        (edge + 8, stored_member(warc_record(
            "response", "https://example.org/gone",
            http_payload("it went away", status=404))), "warc"),
        # redirect with empty body and no Content-Type header
        (edge + 9, stored_member(warc_record(
            "response", "https://example.org/moved",
            http_payload(b"", status=301, ctype=None))), "warc"),
        # HTTP header block never terminates (no CRLF CRLF in content):
        # status/type/body all NULL in m14, text NULL in the ingest
        (edge + 10, stored_member(warc_record(
            "response", "https://example.org/noterm",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nX-More: y")), "warc"),
        # 200 with an INVALID-UTF-8 body: m14 row utf8_ok=false, drops
        # from the ingest (the NULL contract, not U+FFFD substitution)
        (edge + 11, stored_member(warc_record(
            "response", "https://example.org/latin1",
            http_payload(b"caf\xe9 legacy latin-1 bytes"))), "warc"),
        # bare-body response (pre-split archive, no HTTP block): the
        # degenerate case keeps ingesting with NULL http fields
        (edge + 12, stored_member(warc_record(
            "response", "https://example.org/bare",
            "bare body no http wrapper é")), "warc"),
        # WET-style shard: two conversion records (extracted text, one
        # CJK), plus a warcinfo lead — ll15/ll16 ingest the conversions
        (edge + 13, stored_member(warc_record("warcinfo", None, "wet: true\r\n"))
         + stored_member(warc_record(
             "conversion", "https://example.org/wet/1",
             "extracted page text 東京 ok"))
         + stored_member(warc_record(
             "conversion", "https://example.org/wet/2",
             "plain wet text two")), "warc"),
        # status line present but unparseable status (letters): NULL
        # status in m14, ingest drops it (cannot verify 200)
        (edge + 14, stored_member(warc_record(
            "response", "https://example.org/odd",
            b"HTTP/1.1 OK\r\nContent-Type: text/html\r\n\r\nbody")), "warc"),
        # REAL HTML pages (ll19: the HTML-aware ingest leg) — 200
        # text/html bodies that are actual markup: script/style blocks
        # whose content would poison a naive tag-strip, comments, nav
        # boilerplate, entities, and multi-byte UTF-8 body text
        (edge + 15, stored_member(warc_record(
            "response", "https://example.org/html/1",
            http_payload(html_page("première page — café", 15)))), "warc"),
        # html + plain members in ONE shard: only the html body is
        # extracted; the text/plain body must pass through verbatim
        (edge + 16, stored_member(warc_record(
            "response", "https://example.org/html/2",
            http_payload(html_page("東京 second page", 16))))
         + stored_member(warc_record(
             "response", "https://example.org/plain/2",
             http_payload("plain <not-a-tag> body &amp; untouched",
                          ctype="text/plain"))), "warc"),
        # charset parameter on the content type: the ';'-stripped field
        # is still text/html, so extraction applies
        (edge + 17, stored_member(warc_record(
            "response", "https://example.org/html/3",
            http_payload(html_page("emoji \U0001f600 page", 17),
                         ctype="text/html; charset=utf-8"))), "warc"),
    ]
    return rows


AVI_OUT = OUT.replace("media_headers.parquet", "avi_frames.parquet")

N_AVI = 36


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    """One RIFF chunk: fourcc, LE size, data, pad byte when odd."""
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _riff_list(subtype: bytes, children: bytes) -> bytes:
    return _riff_chunk(b"LIST", subtype + children)


def avi_frame(w: int, h: int, seed: int) -> bytes:
    """One uncompressed '00db' frame: raw bottom-up BGR24 rows padded
    to 4-byte boundaries (the DIB convention), deterministic pixels."""
    stride = (3 * w + 3) // 4 * 4
    rows = []
    for r in range(h):
        row = bytearray()
        for c in range(w):
            row += bytes([
                (seed * 7 + r * 31 + c * 13) % 256,   # B
                (seed * 11 + r * 17 + c * 3) % 256,   # G
                (seed * 5 + r * 29 + c * 23) % 256,   # R
            ])
        row += b"\x00" * (stride - 3 * w)
        rows.append(bytes(row))
    return b"".join(rows)


def avi_bytes(
    w: int,
    h: int,
    frames: list[bytes],
    compressed_idx: tuple[int, ...] = (),
    junk_in_movi: bytes | None = None,
    no_avih: bool = False,
    truncate_last: int = 0,
) -> bytes:
    """Minimal well-formed AVI: RIFF('AVI ') → LIST hdrl (avih + one
    'vids'/'DIB ' strl) → LIST movi with '00db' (uncompressed) /
    '00dc' (compressed placeholder) frame chunks.  ``junk_in_movi``
    injects a non-frame chunk (odd sizes exercise word-alignment);
    ``truncate_last`` drops bytes off the end (walk must stop with
    prior frames intact)."""
    avih = struct.pack(
        "<14I", 40000, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = b"vids" + b"DIB " + struct.pack("<12I", *([0] * 12))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0)
    hdrl_children = (b"" if no_avih else _riff_chunk(b"avih", avih)) + _riff_list(
        b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    )
    movi_children = b""
    if junk_in_movi is not None:
        movi_children += _riff_chunk(b"JUNK", junk_in_movi)
    for i, fr in enumerate(frames):
        cc = b"00dc" if i in compressed_idx else b"00db"
        movi_children += _riff_chunk(cc, fr)
    body = (
        b"AVI "
        + _riff_list(b"hdrl", hdrl_children)
        + _riff_list(b"movi", movi_children)
        + _riff_chunk(b"idx1", b"\x00" * 16)
    )
    out = b"RIFF" + struct.pack("<I", len(body)) + body
    return out[: len(out) - truncate_last] if truncate_last else out


def build_avi_rows() -> list[tuple[int, bytes, str]]:
    """Uncompressed-AVI fixture (m15 + the m02 real-decode leg): tiny
    multi-frame 24bpp DIB videos plus the edges — compressed '00dc'
    frames interleaved (frame numbering keeps counting, stats only for
    '00db'), an odd-size JUNK chunk inside movi (aligned jumps), a
    decoy 'movi'/'00db' byte string INSIDE frame pixel data, a
    truncated final frame, a missing avih (frames walk, NULL dims and
    stats), non-AVI RIFF (WAVE) and junk."""
    rows: list[tuple[int, bytes, str]] = []
    for i in range(N_AVI):
        mid = 9900 + i
        if i % 9 == 8:
            rows.append((mid, f"not-an-avi-{i}".encode("ascii") * 2, "raw"))
            continue
        w = 1 + i % 5
        h = 1 + (i * 3) % 4
        n_frames = 1 + i % 3
        frames = [avi_frame(w, h, seed=i * 10 + k) for k in range(n_frames)]
        compressed = (1,) if (i % 4 == 2 and n_frames > 1) else ()
        rows.append(
            (
                mid,
                avi_bytes(
                    w, h, frames,
                    compressed_idx=compressed,
                    junk_in_movi=b"J" * 7 if i % 5 == 3 else None,
                ),
                "avi",
            )
        )
    edge = 9900 + N_AVI
    decoy = avi_frame(4, 2, seed=99)
    # plant 'movi' + '00db' fourcc bytes INSIDE the pixel data: the
    # aligned walk must jump the whole frame, never re-sync on them
    decoy = decoy[:4] + b"movi" + b"00db" + decoy[12:]
    rows += [
        (edge, avi_bytes(4, 2, [avi_frame(4, 2, 1), decoy, avi_frame(4, 2, 2)]),
         "avi"),
        # truncated INTO the movi LIST (40 bytes: idx1 + part of frame
        # 1): the LIST's declared size now overruns the payload, so the
        # bounded walk refuses it outright — a truncated file's sizes
        # cannot be trusted, and all three paths (expression, SQL twin,
        # python kernel) agree on zero frames
        (edge + 1, avi_bytes(3, 3, [avi_frame(3, 3, 5), avi_frame(3, 3, 6)],
                             truncate_last=40), "avi"),
        # no avih: frames enumerate with NULL dims and stats
        (edge + 2, avi_bytes(2, 2, [avi_frame(2, 2, 7)], no_avih=True), "avi"),
        # all-compressed video: frames enumerate as 00dc only → no rows
        (edge + 3, avi_bytes(2, 2, [avi_frame(2, 2, 8)], compressed_idx=(0,)),
         "avi"),
        # RIFF but WAVE: not this kernel's domain
        (edge + 4, b"RIFF" + struct.pack("<I", 12) + b"WAVEfmt " + b"\x00" * 4,
         "raw"),
        # dims past the pixel budget: frames emit with NULL stats
        (edge + 5, avi_bytes(100, 100, [b"\x00" * ((3 * 100 + 3) // 4 * 4 * 100)]),
         "avi"),
        # truncation confined to the TRAILING idx1 chunk: movi is fully
        # present, so every frame still decodes
        (edge + 6, avi_bytes(2, 3, [avi_frame(2, 3, 11), avi_frame(2, 3, 12)],
                             truncate_last=10), "avi"),
    ]
    return rows


def main() -> None:
    _write(build_rows(), "image", OUT)
    _write(build_audio_rows(), "audio", AUDIO_OUT)
    _write(build_legacy_rows(), "image", LEGACY_OUT)
    _write(build_mp3_rows(), "audio", MP3_OUT)
    _write(build_mp4_rows(), "video", MP4_OUT)
    _write(build_tiff_rows(), "image", TIFF_OUT)
    _write(build_gzip_rows(), "archive", GZIP_OUT)
    _write(build_bmp_pixel_rows(), "image", BMPPX_OUT)
    _write(build_wav_pcm_rows(), "audio", WAVPCM_OUT)
    _write(build_warc_rows(), "archive", WARC_OUT)
    _write(build_avi_rows(), "video", AVI_OUT)


if __name__ == "__main__":
    main()

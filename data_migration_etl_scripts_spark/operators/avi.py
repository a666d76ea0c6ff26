"""AVI (RIFF) container with MJPEG video — the real-video analog of
the still-image codecs: container walk + per-frame baseline JPEG
through `operators/jpeg.py`. RIFF is a pure structural format (fourcc
chunk walk, even-byte padding, LIST nesting) with zero tabulated spec
data, so like FLAC it is EXACT end to end under this repo's codec
policy. Motion-JPEG is the one mainstream video codec that is just
"a JPEG per frame" — no inter-frame prediction, no CABAC — which
makes it the honest first rung of real video decode; H.264/H.265
remain the documented ffmpeg plug point.

Reference parity note: the reference ETL repo has no media handling;
this exists for the LLM-data-pipeline addendum (frame extraction over
binary video columns at corpus scale — `multimodal.extract_frames`
dispatches RIFF/AVI payloads here).

Exact structure implemented (public AVI/RIFF layout):
  - 'RIFF' size 'AVI ' / LIST chunks, even-size padding
  - LIST hdrl: avih (MainAVIHeader: usec/frame, total frames, dims),
    per-stream LIST strl with strh (fccType/handler, scale/rate) and
    strf (BITMAPINFOHEADER for video)
  - LIST movi: '##dc'/'##db' chunks hold one MJPEG frame each, chunk
    stream number matched to the vids stream; non-video chunks (e.g.
    '##wb' audio) are skipped by size
  - idx1 written on encode (offset/size per frame, AVIIF_KEYFRAME);
    tolerated but not required on decode (MJPEG needs no index)

Frame timing comes from strh dwScale/dwRate (fps = rate/scale),
falling back to avih usec/frame. Decode is resilient to unknown
chunks (skip by size) but loud on structural corruption."""

from __future__ import annotations

import struct

from data_migration_etl_scripts_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode,
)

_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def avi_encode_mjpeg(
    frames: list[list[list[tuple[int, int, int]]]],
    fps: int = 10,
    quality: int = 85,
) -> bytes:
    """Pixel frames (rows of (r, g, b)) -> an AVI/MJPEG stream any
    mainstream player decodes. One baseline JPEG per frame via
    `operators/jpeg.py`; strh carries dwScale=1/dwRate=fps; idx1
    written with every frame flagged keyframe (MJPEG property)."""
    if not frames:
        raise ValueError("AVI: need at least one frame")
    height = len(frames[0])
    width = len(frames[0][0])
    if any(len(f) != height or len(f[0]) != width for f in frames):
        raise ValueError("AVI: frames must share dimensions")

    payloads = [jpeg_encode(f, quality=quality) for f in frames]
    maxbuf = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxbuf * fps,      # dwMaxBytesPerSec (upper bound)
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        maxbuf,            # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,        # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG",
        0, 0, 0, 0,        # flags, priority, language, initial frames
        1, fps,            # dwScale, dwRate -> fps
        0, len(frames),    # dwStart, dwLength (frames)
        maxbuf,            # dwSuggestedBufferSize
        0,                 # dwQuality (driver default)
        0,                 # dwSampleSize (0 = variable)
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx_entries = []
    for p in payloads:
        # offset convention: from the start of the 'movi' fourcc
        idx_entries.append((len(movi_body), len(p)))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)

    idx1 = b"".join(
        struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, off, size)
        for off, size in idx_entries
    )
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) honoring even padding."""
    while pos + 8 <= end:
        fourcc = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError("AVI: chunk overruns its parent")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def avi_decode_frames(
    b: bytes, max_frames: int = 1 << 30
) -> tuple[int, int, int, list[tuple[int, list[list[tuple[int, int, int]]]]]]:
    """AVI/MJPEG bytes -> (width, height, fps_milli, frames) with
    ``frames`` a list of (t_ms, pixel rows) and ``fps_milli`` the
    frame rate in millihertz (exact rational rate*1000//scale).
    Non-video streams are skipped; non-MJPEG video raises at the
    ffmpeg plug point."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("AVI: bad RIFF/AVI magic")
    riff_size = struct.unpack_from("<I", b, 4)[0]
    end = min(len(b), 8 + riff_size)

    usec_per_frame = None
    scale_rate = None
    vids_stream = None
    handler = None
    stream_no = -1
    movi_ranges = []

    def parse_hdrl(start: int, stop: int) -> None:
        nonlocal usec_per_frame, scale_rate, vids_stream, handler, stream_no
        for fourcc, body, size in _walk_chunks(b, start, stop):
            if fourcc == b"avih":
                usec_per_frame = struct.unpack_from("<I", b, body)[0]
            elif fourcc == b"LIST" and b[body:body + 4] == b"strl":
                stream_no += 1
                for fc2, bd2, sz2 in _walk_chunks(b, body + 4, body + size):
                    if fc2 == b"strh":
                        fcc_type, fcc_handler = struct.unpack_from(
                            "<4s4s", b, bd2
                        )
                        if fcc_type == b"vids" and vids_stream is None:
                            vids_stream = stream_no
                            handler = fcc_handler
                            dw_scale, dw_rate = struct.unpack_from(
                                "<II", b, bd2 + 20
                            )
                            if dw_scale:
                                scale_rate = (dw_scale, dw_rate)

    for fourcc, body, size in _walk_chunks(b, 12, end):
        if fourcc == b"LIST":
            ltype = b[body:body + 4]
            if ltype == b"hdrl":
                parse_hdrl(body + 4, body + size)
            elif ltype == b"movi":
                movi_ranges.append((body + 4, body + size))
        # idx1 and unknown chunks: skipped by size (MJPEG needs no index)

    if vids_stream is None:
        raise ValueError("AVI: no video (vids) stream")
    if handler not in (b"MJPG", b"mjpg", b"dmb1"):
        raise NotImplementedError(
            f"AVI: codec {handler!r} needs ffmpeg — plug the kernel in here"
        )
    if not movi_ranges:
        raise ValueError("AVI: no movi data")

    if scale_rate:
        fps_milli = scale_rate[1] * 1000 // scale_rate[0]
    elif usec_per_frame:
        fps_milli = 1_000_000_000 // usec_per_frame
    else:
        raise ValueError("AVI: no frame timing in headers")

    want = (b"%02ddc" % vids_stream, b"%02ddb" % vids_stream)
    frames = []
    width = height = None
    for start, stop in movi_ranges:
        for fourcc, body, size in _walk_chunks(b, start, stop):
            if fourcc == b"LIST":  # 'rec ' grouping — recurse one level
                for fc2, bd2, sz2 in _walk_chunks(b, body + 4, body + size):
                    if fc2 in want:
                        frames.append(b[bd2:bd2 + sz2])
            elif fourcc in want:
                frames.append(b[body:body + size])
            if len(frames) >= max_frames:
                break
        if len(frames) >= max_frames:
            break

    out = []
    for i, payload in enumerate(frames):
        w, h, rows = jpeg_decode(payload)
        if width is None:
            width, height = w, h
        elif (w, h) != (width, height):
            raise ValueError("AVI: frame dimensions changed mid-stream")
        t_ms = i * 1_000_000 // fps_milli
        out.append((t_ms, rows))
    if width is None:
        raise ValueError("AVI: video stream has no frames")
    return width, height, fps_milli, out

"""Real-decode multimodal kernels: stdlib BMP/WAV codecs round-trip
through the Arrow-batched mapInPandas plumbing (decoder="real")."""

from __future__ import annotations

import math

import pytest

from data_migration_etl_scripts_spark.operators import multimodal as mm


def test_bmp_roundtrip_pure():
    px = [[(x * 10, y * 10, (x + y)) for x in range(5)] for y in range(3)]
    w, h, back = mm.bmp_decode(mm.bmp_encode(px))
    assert (w, h) == (5, 3)
    assert back == px


def test_wav_roundtrip_pure():
    samples = [math.sin(2 * math.pi * 440 * t / 8000) for t in range(2000)]  # 250ms
    dur_ms, mono = mm.wav_decode(mm.wav_encode(samples))
    assert dur_ms == 250
    assert len(mono) == 2000
    assert abs(mono[500] - samples[500]) < 1e-3


def test_extract_features_real_kernel(spark):
    media = mm.synthetic_real_media(spark, n=8)
    out = {r.media_id: r for r in mm.extract_features(media, dim=6, decoder="real").collect()}
    assert len(out) == 8
    img = out[0]
    assert img.feature[0] == 8.0 and img.feature[1] == 8.0  # width, height lead
    aud = out[1]
    assert abs(aud.feature[0] - 0.1) < 1e-6   # 100 ms duration
    assert aud.feature[1] == 800.0            # sample count
    assert aud.feature[2] > 0.5               # sine RMS ~ 0.707


def test_resize_images_real_kernel(spark):
    media = mm.synthetic_real_media(spark, n=2).where("media_type = 'image'")
    out = mm.resize_images(media, width=4, height=2, decoder="real").collect()
    assert len(out) == 1
    w, h, rows = mm.bmp_decode(bytes(out[0].content))
    assert (w, h) == (4, 2)
    assert len(rows) == 2 and len(rows[0]) == 4


def test_audio_features_real_kernel(spark):
    media = mm.synthetic_real_media(spark, n=4).where("media_type = 'audio'")
    out = {r.media_id: r for r in mm.audio_features(media, n_mfcc=4, decoder="real").collect()}
    assert set(out) == {1, 3}
    assert out[1].duration_ms == 100
    assert len(out[1].mfcc) == 4
    # constant-frequency sine: every band carries the same RMS energy
    assert max(out[1].mfcc) - min(out[1].mfcc) < 0.05


def test_real_kernel_raises_on_compressed(spark):
    fake = mm.synthetic_media(spark, n=3)  # md5 noise: not BMP/WAV magic
    with pytest.raises(Exception, match="PIL|ffmpeg|NotImplemented"):
        mm.extract_features(fake, dim=4, decoder="real").collect()


def test_png_roundtrip_pure():
    px = [[(x * 17 % 256, y * 31 % 256, (x * y + 7) % 256) for x in range(9)]
          for y in range(5)]
    w, h, back = mm.png_decode(mm.png_encode(px))
    assert (w, h) == (9, 5)
    assert back == px


def _png_with_filter(rows, ftype, channels=3, color_type=2):
    """Build a PNG whose every scanline uses filter ``ftype`` by applying
    the filter forward (decode applies the inverse)."""
    import struct
    import zlib

    width, height = len(rows[0]), len(rows)
    stride = width * channels
    flat = [bytes(v for px in row for v in px[:channels]) if channels >= 3
            else bytes(px[0] for px in row) for row in rows]
    raw = bytearray()
    prev = bytes(stride)
    for line in flat:
        raw.append(ftype)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ftype == 0:
                f = line[i]
            elif ftype == 1:
                f = (line[i] - a) & 0xFF
            elif ftype == 2:
                f = (line[i] - b) & 0xFF
            elif ftype == 3:
                f = (line[i] - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                f = (line[i] - pred) & 0xFF
            raw.append(f)
        prev = line

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (mm._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filter_types(ftype):
    px = [[(x * 13 % 256, (x + y * 5) % 256, (250 - x * y) % 256)
           for x in range(7)] for y in range(4)]
    w, h, back = mm.png_decode(_png_with_filter(px, ftype))
    assert (w, h) == (7, 4)
    assert back == px


def test_png_decode_grayscale():
    px = [[(v * 40 % 256,) * 3 for v in range(6)] for _ in range(2)]
    gray = _png_with_filter(px, 1, channels=1, color_type=0)
    w, h, back = mm.png_decode(gray)
    assert (w, h) == (6, 2)
    assert back == px


def test_png_decode_rejects_exotic_color_type():
    # 16-bit/palette/interlaced all decode as of r6; a reserved color
    # type still raises the explicit plug-point error, never garbage
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 7, 0, 0, 0)  # color type 7

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    bad = mm._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="PIL"):
        mm.png_decode(bad)


def test_extract_features_real_kernel_png(spark):
    # synthetic_real_media alternates BMP (id % 4 == 0) and PNG images;
    # the real kernel must decode both to identical per-pixel features
    media = mm.synthetic_real_media(spark, n=8)
    out = {r.media_id: r for r in
           mm.extract_features(media, dim=6, decoder="real").collect()}
    png_row = out[2]  # PNG-encoded image
    assert png_row.feature[0] == 8.0 and png_row.feature[1] == 8.0
    # same pixel generator as the BMPs modulo the per-id offsets: the
    # channel-mean features must be real numbers in (0, 1]
    assert all(0.0 < v <= 1.0 for v in png_row.feature[2:5])


def test_resize_real_kernel_accepts_png(spark):
    media = mm.synthetic_real_media(spark, n=4).where("media_id = 2")
    out = mm.resize_images(media, width=3, height=3, decoder="real").collect()
    w, h, rows = mm.bmp_decode(bytes(out[0].content))
    assert (w, h) == (3, 3)


def test_gif_roundtrip_pure_including_interlace_and_width_growth():
    import random

    rng = random.Random(9)
    pal = [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(16)]
    px = [[pal[rng.randrange(16)] for _ in range(40)] for _ in range(30)]
    for interlace in (False, True):
        w, h, back = mm.gif_decode(mm.gif_encode(px, interlace=interlace))
        assert (w, h) == (40, 30)
        assert back == px
    # 256-color noise crosses several LZW code-width boundaries, and a
    # big enough image saturates the 4096-entry table (frozen-table path)
    pal256 = [(i, (i * 7) % 256, (i * 13) % 256) for i in range(256)]
    big = [[pal256[rng.randrange(256)] for _ in range(120)] for _ in range(100)]
    assert mm.gif_decode(mm.gif_encode(big))[2] == big


def test_gif_decode_skips_extension_blocks():
    px = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (10, 20, 30)]]
    blob = bytearray(mm.gif_encode(px))
    # splice a Graphic Control Extension before the image descriptor
    at = blob.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = bytes(blob[:at]) + gce + bytes(blob[at:])
    assert mm.gif_decode(patched)[2] == px


def test_image_decode_dispatches_gif(spark):
    media = mm.synthetic_real_media(spark, n=6)  # ids 0/2/4 = bmp/png/gif
    out = {r.media_id: r for r in mm.extract_features(media, dim=6, decoder="real").collect()}
    for i in (0, 2, 4):
        assert out[i].feature[0] == 8.0 and out[i].feature[1] == 8.0
    # the three containers hold the SAME pixel recipe modulo i-offsets;
    # feature vectors must come from pixels, not container bytes
    assert out[4].n_bytes != out[2].n_bytes != out[0].n_bytes


def test_gif_animation_roundtrip_with_patch_frames():
    base = [[(x * 20 % 256, y * 20 % 256, 7) for x in range(10)] for y in range(8)]
    frames = [base]
    for f in range(1, 4):
        fr = [row[:] for row in frames[-1]]
        fr[f][f] = (255, 0, f * 50)
        frames.append(fr)
    blob = mm.gif_encode_frames(frames, delay_ms=120)
    w, h, got = mm.gif_decode_frames(blob)
    assert (w, h) == (10, 8) and len(got) == 4
    assert [f for _, f in got] == frames
    assert all(d == 120 for d, _ in got)
    # patch encoding actually happened: animated blob much smaller than
    # four independently-encoded full frames
    assert len(blob) < 4 * len(mm.gif_encode(base))


def test_extract_frames_real_samples_every_nth(spark):
    media = mm.synthetic_video_media(spark, n=3)
    out = mm.extract_frames(media, every_n=2, decoder="real").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == {0, 1, 2}
    for mid, rows in by_id.items():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == [0, 2]  # 4 frames, every 2nd
        for r in rows:
            fw, fh, px = mm.bmp_decode(bytes(r.frame_bmp))
            assert (fw, fh) == (r.width, r.height) == (8, 8)
        # the sampled frames differ (the moving block moved)
        assert rows[0].frame_bmp != rows[1].frame_bmp
    # t_ms accumulates the per-frame delays
    assert {r.t_ms for r in by_id[0]} == {0, 200}  # start-of-display times


def test_extract_frames_fake_is_deterministic(spark):
    media = mm.synthetic_media(spark, n=4).where("media_type = 'video'")
    a = sorted(map(tuple, mm.extract_frames(media, decoder="fake").collect()))
    b = sorted(map(tuple, mm.extract_frames(media, decoder="fake").collect()))
    assert a == b and len(a) > 0


def test_extract_frames_real_raises_on_nongif_video(spark):
    media = mm.synthetic_media(spark, n=6).where("media_type = 'video'")
    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        mm.extract_frames(media, decoder="real").collect()


# ------------------------------- PNG: palette / Adam7 / 16-bit (r6)


def _chunk(ctype, data):
    import struct
    import zlib

    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _ihdr(w, h, depth, color_type, interlace=0):
    import struct

    return struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)


def test_png_palette_4bit_decodes():
    import zlib

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    w, h = 5, 3  # odd width: last nibble of each scanline is padding
    idx = [[(x + y) % 4 for x in range(w)] for y in range(h)]
    raw = bytearray()
    for row in idx:
        raw.append(0)  # filter None
        for i in range(0, w, 2):
            hi = row[i] << 4
            lo = row[i + 1] if i + 1 < w else 0
            raw.append(hi | lo)
    blob = (mm._PNG_SIG + _chunk(b"IHDR", _ihdr(w, h, 4, 3))
            + _chunk(b"PLTE", bytes(v for c in pal for v in c))
            + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))
    gw, gh, rows = mm.png_decode(blob)
    assert (gw, gh) == (w, h)
    assert rows == [[pal[v] for v in row] for row in idx]


def test_png_palette_8bit_with_sub_filter():
    import zlib

    pal = [(i, 255 - i, i * 3 % 256) for i in range(16)]
    w, h = 6, 2
    idx = [[(x * y + x) % 16 for x in range(w)] for y in range(h)]
    raw = bytearray()
    for row in idx:
        raw.append(1)  # Sub filter over the index bytes (bpp=1)
        prev = 0
        for v in row:
            raw.append((v - prev) & 0xFF)
            prev = v
    blob = (mm._PNG_SIG + _chunk(b"IHDR", _ihdr(w, h, 8, 3))
            + _chunk(b"PLTE", bytes(v for c in pal for v in c))
            + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))
    _, _, rows = mm.png_decode(blob)
    assert rows == [[pal[v] for v in row] for row in idx]


def test_png_16bit_truecolor_takes_high_byte():
    import zlib

    w, h = 3, 2
    px16 = [[((x * 1000 + 90) % 65536, (y * 30000) % 65536, 65535)
             for x in range(w)] for y in range(h)]
    raw = bytearray()
    for row in px16:
        raw.append(0)
        for r, g, b in row:
            raw += bytes((r >> 8, r & 255, g >> 8, g & 255, b >> 8, b & 255))
    blob = (mm._PNG_SIG + _chunk(b"IHDR", _ihdr(w, h, 16, 2))
            + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))
    _, _, rows = mm.png_decode(blob)
    assert rows == [[(r >> 8, g >> 8, b >> 8) for r, g, b in row] for row in px16]


def test_png_gray_1bit():
    import zlib

    w, h = 10, 2
    bits = [[(x + y) % 2 for x in range(w)] for y in range(h)]
    raw = bytearray()
    for row in bits:
        raw.append(0)
        byte, n, acc = 0, 0, bytearray()
        for v in row:
            byte = (byte << 1) | v
            n += 1
            if n == 8:
                acc.append(byte)
                byte, n = 0, 0
        if n:
            acc.append(byte << (8 - n))
        raw += acc
    blob = (mm._PNG_SIG + _chunk(b"IHDR", _ihdr(w, h, 1, 0))
            + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))
    _, _, rows = mm.png_decode(blob)
    assert rows == [[(255, 255, 255) if v else (0, 0, 0) for v in row]
                    for row in bits]


def _adam7_interlace_rgb(px):
    """Hand-interlace an RGB image: per Adam7 pass, extract the
    sub-image and emit filter-0 scanlines (the decoder must invert)."""
    h, w = len(px), len(px[0])
    raw = bytearray()
    for x0, dx, y0, dy in mm._ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for j in range(ph):
            raw.append(0)
            y = y0 + j * dy
            for i in range(pw):
                raw += bytes(px[y][x0 + i * dx])
    return bytes(raw)


def test_png_adam7_interlaced_truecolor():
    import zlib

    w, h = 11, 9  # odd dims exercise empty/ragged passes
    px = [[((x * 23 + y) % 256, (y * 17) % 256, (x ^ y) % 256)
           for x in range(w)] for y in range(h)]
    raw = _adam7_interlace_rgb(px)
    blob = (mm._PNG_SIG + _chunk(b"IHDR", _ihdr(w, h, 8, 2, interlace=1))
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    gw, gh, rows = mm.png_decode(blob)
    assert (gw, gh) == (w, h)
    assert rows == px


def test_png_adam7_tiny_image_skips_empty_passes():
    import zlib

    px = [[(9, 8, 7)]]  # 1x1: only pass 1 has pixels
    raw = _adam7_interlace_rgb(px)
    blob = (mm._PNG_SIG + _chunk(b"IHDR", _ihdr(1, 1, 8, 2, interlace=1))
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert mm.png_decode(blob) == (1, 1, px)


@pytest.mark.parametrize("sampwidth", [1, 2, 3, 4])
def test_wav_decode_all_pcm_widths(sampwidth):
    import io
    import math
    import struct
    import wave

    n, rate = 800, 8000
    samples = [0.5 * math.sin(2 * math.pi * 440 * t / rate) for t in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        frames = bytearray()
        for s in samples:
            if sampwidth == 1:
                frames.append(max(0, min(255, int(s * 127) + 128)))
            elif sampwidth == 2:
                frames += struct.pack("<h", int(s * 32767))
            elif sampwidth == 3:
                v = int(s * ((1 << 23) - 1)) & 0xFFFFFF
                frames += bytes((v & 255, (v >> 8) & 255, (v >> 16) & 255))
            else:
                frames += struct.pack("<i", int(s * ((1 << 31) - 1)))
        w.writeframes(bytes(frames))
    dur_ms, mono = mm.wav_decode(buf.getvalue())
    assert dur_ms == 100 and len(mono) == n
    tol = 0.02 if sampwidth == 1 else 1e-4
    assert abs(mono[500] - samples[500]) < tol


def _float_wav(samples, rate=8000, bits=32, nch=1):
    import struct

    fmt = struct.pack("<HHIIHH", 3, nch, rate, rate * nch * bits // 8,
                      nch * bits // 8, bits)
    data = b"".join(
        struct.pack("<f" if bits == 32 else "<d", s) for s in samples
    )
    body = (b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


@pytest.mark.parametrize("bits", [32, 64])
def test_wav_decode_ieee_float(bits):
    import math

    n, rate = 800, 8000
    samples = [0.5 * math.sin(2 * math.pi * 440 * t / rate) for t in range(n)]
    blob = _float_wav(samples, rate=rate, bits=bits)
    dur_ms, mono = mm.wav_decode(blob)
    assert dur_ms == 100 and len(mono) == n
    tol = 1e-6 if bits == 32 else 1e-12
    assert all(abs(m - s) < tol for m, s in zip(mono, samples))
    # full dispatch path keeps the true rate
    rate2, mono2 = mm.audio_decode_rate(blob)
    assert rate2 == rate and mono2 == mono


def test_wav_decode_ieee_float_stereo_downmix():
    left = [0.5, -0.25, 0.75]
    right = [0.1, 0.05, -0.25]
    inter = [v for pair in zip(left, right) for v in pair]
    blob = _float_wav(inter, rate=8000, bits=32, nch=2)
    _, mono = mm.wav_decode(blob)
    assert all(abs(m - (l + r) / 2) < 1e-6
               for m, l, r in zip(mono, left, right))

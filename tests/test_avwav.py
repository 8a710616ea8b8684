"""WAV-PCM and AVI-MJPEG codecs (sources/wavcodec, sources/avicodec)
and the real audio/video paths of the multimodal operators."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.multimodal import (
    audio_features,
    sample_frames,
)
from cerberus_cpp_spark.sources.avicodec import (
    decode_frame,
    demux_avi_mjpeg,
    encode_avi_mjpeg,
    sniff_avi,
    synth_clip,
)
from cerberus_cpp_spark.sources.clipgen import (
    audio_clip_frame,
    video_clip_frame,
)
from cerberus_cpp_spark.sources.jpegcodec import encode_jpeg
from cerberus_cpp_spark.sources.imagegen import synth_pixels
from cerberus_cpp_spark.sources.wavcodec import (
    decode_wav,
    encode_wav,
    sniff_wav,
    synth_pcm,
)


# -- WAV --------------------------------------------------------------------

def test_wav_roundtrip_mono_and_stereo():
    s = synth_pcm(7, 12345)
    rate, arr = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and arr.shape == (12345, 1)
    assert np.array_equal(arr[:, 0], s)
    st = np.stack([s, (-s).astype(np.int16)], axis=1)
    rate, arr2 = decode_wav(encode_wav(st, 8000))
    assert rate == 8000 and np.array_equal(arr2, st)


def test_wav_8bit_pcm_decodes():
    # hand-build an 8-bit PCM file (unsigned samples)
    raw = bytes([128, 255, 0, 130])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, arr = decode_wav(data)
    assert rate == 8000
    assert list(arr[:, 0]) == [0, 127 << 8, -128 << 8, 2 << 8]


def test_wav_compressed_rejected():
    s = synth_pcm(1, 100)
    data = bytearray(encode_wav(s))
    # flip the fmt audio-format tag to 85 (MP3)
    fmt_at = data.find(b"fmt ") + 8
    struct.pack_into("<H", data, fmt_at, 85)
    with pytest.raises(ValueError, match="compressed WAV"):
        decode_wav(bytes(data))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00JUNK")
    assert not sniff_wav(b"\xff\xd8\xff")
    assert sniff_wav(encode_wav(s))


def test_synth_pcm_integer_closed_form():
    # the waveform must stay pure integer arithmetic (oracle contract)
    s = synth_pcm(5, 1000)
    i = np.arange(1000, dtype=np.int64)
    p1, p2 = 20 + 5 % 41, 50 + 5 % 97
    expect = ((i % p1) * 16000 // p1 - 8000) + ((i % p2) * 8000 // p2 - 4000)
    assert np.array_equal(s.astype(np.int64), expect)


# -- AVI --------------------------------------------------------------------

def test_avi_roundtrip():
    frames = [encode_jpeg(synth_pixels(i, 16, 12), quality=95)
              for i in range(4)]
    avi = encode_avi_mjpeg(frames, width=16, height=12, fps=24)
    assert sniff_avi(avi)
    fps, out = demux_avi_mjpeg(avi)
    assert fps == 24.0 and len(out) == 4
    assert [bytes(f) for f in out] == frames
    assert decode_frame(out[2]).shape == (12, 16, 3)


def test_avi_odd_sized_frames_word_aligned():
    # RIFF chunks pad odd payloads; the demux must still see exact bytes
    frames = [b"\xff\xd8\xff" + bytes([i]) * 7 for i in range(3)]  # len 10
    frames = [f[:9] for f in frames]  # odd length
    avi = encode_avi_mjpeg(frames, width=8, height=8)
    _, out = demux_avi_mjpeg(avi)
    assert [bytes(f) for f in out] == frames


def test_avi_non_mjpeg_rejected():
    frames = [encode_jpeg(synth_pixels(1, 8, 8))]
    avi = bytearray(encode_avi_mjpeg(frames, width=8, height=8))
    at = avi.find(b"vidsMJPG")
    avi[at + 4:at + 8] = b"H264"
    with pytest.raises(ValueError, match="unsupported"):
        demux_avi_mjpeg(bytes(avi))
    with pytest.raises(ValueError):
        demux_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")


def test_synth_clip_deterministic():
    a = synth_clip(9, 3, 10, 8)
    b = synth_clip(9, 3, 10, 8)
    assert a == b
    fps, frames = demux_avi_mjpeg(a)
    assert len(frames) == 3
    # frames differ (per-frame seed shift)
    assert frames[0] != frames[1]


# -- Spark operators (real decode paths) ------------------------------------

def test_audio_features_real_wav(spark):
    clips = audio_clip_frame(spark, 40, partitions=4)
    rows = {r["clip_id"]: r for r in audio_features(clips).collect()}
    assert len(rows) == 40
    for i in (0, 13, 39):
        n = 1000 + (i % 7) * 500
        w = synth_pcm(i, n).astype(np.int64)
        r = rows[f"clip-{i:06d}"]
        assert r["sample_rate"] == 16000
        assert r["n_samples"] == n
        assert r["sumsq"] == int((w * w).sum())
        assert r["zero_crossings"] == int(((w[:-1] * w[1:]) < 0).sum())
        assert r["duration_sec"] == pytest.approx(n / 16000.0)
        assert r["rms"] == pytest.approx(
            float(np.sqrt((w * w).sum() / n)))


def test_audio_features_non_wav_still_raises(spark):
    junk = spark.createDataFrame(
        [("c1", bytearray(b"\x00\x01\x02mp3junk"))],
        "clip_id string, bytes binary")
    with pytest.raises(Exception) as exc:
        audio_features(junk).collect()
    assert "audio decode unavailable" in str(exc.value)


def test_sample_frames_real_avi(spark):
    clips = video_clip_frame(spark, 30, partitions=4)
    rows = sample_frames(clips, every_n=2, max_frames=8).collect()
    by_clip: dict = {}
    for r in rows:
        by_clip.setdefault(r["clip_id"], []).append(r)
    assert len(by_clip) == 30
    for i in (0, 7, 29):
        rs = sorted(by_clip[f"clip-{i:06d}"],
                    key=lambda r: r["frame_idx"])
        n_frames = 2 + i % 5
        assert [r["frame_idx"] for r in rs] == list(
            range(0, n_frames, 2))
        for r in rs:
            assert r["frame_w"] == 8 + i % 5
            assert r["frame_h"] == 8 + i % 4
            assert r["ts_sec"] == pytest.approx(r["frame_idx"] / 30.0)
            # emitted frame is a standalone decodable JPEG
            px = decode_frame(bytes(r["frame"]))
            assert px.shape == (8 + i % 4, 8 + i % 5, 3)


def test_sample_frames_mixed_payload_raises_for_non_avi(spark):
    wav = encode_wav(synth_pcm(1, 100))
    mixed = spark.createDataFrame(
        [("c1", bytearray(wav))], "clip_id string, bytes binary")
    with pytest.raises(Exception) as exc:
        sample_frames(mixed).collect()
    assert "video decode unavailable" in str(exc.value)


# -- corruption hygiene (all three decoders) --------------------------------

def test_fuzz_corruption_raises_only_valueerror():
    """Random byte corruption / truncation must yield ValueError (or
    a clean decode), never IndexError/KeyError/struct.error/hangs —
    executor-side decode probes rely on uniform failure handling."""
    import random

    from cerberus_cpp_spark.sources.jpegcodec import decode_jpeg
    from cerberus_cpp_spark.sources.imagegen import synth_pixels

    rng = random.Random(1234)
    jpeg = encode_jpeg(synth_pixels(2, 24, 16), quality=95)
    wav = encode_wav(synth_pcm(2, 400))
    avi = synth_clip(2, 3, 10, 10)
    for blob, dec in ((jpeg, decode_jpeg),
                      (wav, decode_wav),
                      (avi, demux_avi_mjpeg)):
        for trial in range(150):
            b = bytearray(blob)
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            if trial % 5 == 0:
                b = b[:rng.randrange(10, len(b))]
            try:
                dec(bytes(b))
            except ValueError:
                pass


def test_wav_zero_sample_rate_rejected():
    # structurally valid PCM with rate=0 must raise ValueError, not
    # reach callers that divide by the rate (review finding)
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00\x01\x00\x02")
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_fuzz_png_and_webp_corruption_valueerror_only():
    """PNG and webp (real VP8L) decoders share the uniform-ValueError
    contract (zlib/struct errors translated — review finding: a
    corrupt PNG previously escaped with zlib.error and aborted the
    whole pixel_phash job). Webp corruption starts past the 28 header
    bits: a dimension flip is a VALID (just huge) image, exercised
    separately in test_webpcodec."""
    import random

    from cerberus_cpp_spark.sources.imagegen import (
        decode_image,
        encode_png,
        encode_webp,
        synth_pixels,
    )

    rng = random.Random(99)
    png = encode_png(synth_pixels(3, 20, 16))
    webp = encode_webp(synth_pixels(3, 20, 16))
    for blob in (png, webp):
        for trial in range(150):
            b = bytearray(blob)
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(25, len(b))] = rng.randrange(256)
            if trial % 5 == 0:
                b = b[:rng.randrange(12, len(b))]
            try:
                decode_image(bytes(b))
            except ValueError:
                pass

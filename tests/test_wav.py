"""WAV (RIFF PCM) decode + feature extraction: golden round trips and
refusal paths (multimodal/wav.py)."""

import math
import struct

import pytest

from comic_text_detector_spark.multimodal.wav import (
    decode_audio_features,
    parse_wav,
    synthesize_wav,
    wav_features,
    wav_frame_energy,
)


def test_roundtrip_16bit_stereo():
    c0 = [0, 100, -100, 32767, -32768, 5]
    c1 = [7, -7, 0, 1, -1, 2]
    data = synthesize_wav([c0, c1], 44100, 16)
    p = parse_wav(data)
    assert p["sample_rate"] == 44100
    assert p["channels"] == 2
    assert p["bits"] == 16
    assert [c.tolist() for c in p["frames"]] == [c0, c1]  # de-interleave exact


def test_roundtrip_8bit_offset():
    # 8-bit WAV stores unsigned with +128 offset; parse de-offsets
    c0 = [-128, -1, 0, 1, 127]
    p = parse_wav(synthesize_wav([c0], 8000, 8))
    assert p["bits"] == 8
    assert [c.tolist() for c in p["frames"]] == [c0]


def test_odd_data_chunk_padding():
    # 3 frames of 8-bit mono = odd payload; RIFF pads to even — a chunk
    # AFTER data must still be reachable, and the pad byte is not a sample
    c0 = [1, 2, 3]
    wav = synthesize_wav([c0], 8000, 8)
    assert len(wav) % 2 == 0
    p = parse_wav(wav)
    assert [c.tolist() for c in p["frames"]] == [c0]


def test_extra_chunks_tolerated():
    # LIST/INFO chunk between fmt and data (common in the wild)
    c0 = [10, -10]
    wav = synthesize_wav([c0], 8000, 16)
    # splice a LIST chunk right before 'data'
    i = wav.index(b"data")
    spliced = wav[:i] + b"LIST" + struct.pack("<I", 4) + b"INFO" + wav[i:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert [c.tolist() for c in parse_wav(spliced)["frames"]] == [c0]


def test_refusals():
    assert parse_wav(None) is None
    assert parse_wav(b"") is None
    assert parse_wav(b"RIFFxxxxWAVE") is None  # no fmt/data
    wav = synthesize_wav([[1, 2]], 8000, 16)
    # non-PCM format code (3 = IEEE float) refused, not misread
    i = wav.index(b"fmt ") + 8
    assert parse_wav(wav[:i] + b"\x03" + wav[i + 1 :]) is None
    # zero sample rate refused
    j = wav.index(b"fmt ") + 12
    assert parse_wav(wav[:j] + b"\x00" * 4 + wav[j + 4 :]) is None


def test_truncated_data_clips_whole_frames():
    c0 = [1, 2, 3, 4]
    c1 = [5, 6, 7, 8]
    wav = synthesize_wav([c0, c1], 8000, 16)
    # drop the last 5 bytes: declared size now exceeds payload; the last
    # partial frame (and the whole frame it straddles) must vanish
    p = parse_wav(wav[:-5])
    assert [c.tolist() for c in p["frames"]] == [[1, 2], [5, 6]]


def test_features_integer_exact():
    c0 = [3, -4, 0, 12]
    c1 = [1, 1, 1, 1]
    p = parse_wav(synthesize_wav([c0, c1], 1000, 16))
    f = wav_features(p)
    assert f["n_frames"] == 4
    assert f["duration_ms"] == 4  # 4 frames @ 1 kHz
    assert f["sum_sq"] == 9 + 16 + 0 + 144 + 4
    assert f["peak"] == 12
    # sign flips on channel 0 only: 3→-4 flips; -4→0 and 0→12 do not
    assert f["zero_crossings"] == 1
    assert f["rms_milli"] == math.floor(math.sqrt(173 / 8) * 1000)


def test_empty_clip():
    p = parse_wav(synthesize_wav([[]], 8000, 16))
    f = wav_features(p)
    assert f["n_frames"] == 0 and f["rms_milli"] == 0 and f["peak"] == 0


@pytest.mark.usefixtures("spark")
def test_spark_kernels(spark):
    import pandas as pd

    rows = [
        ("good", synthesize_wav([[100, -100, 100, -100, 7]], 8000, 16)),
        ("junk", b"not a wav at all"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [r[0] for r in rows],
                      "media": [r[1] for r in rows]})
    )
    feats = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    assert feats["good"]["ok"] and feats["good"]["zero_crossings"] == 4
    assert feats["good"]["sum_sq"] == 4 * 10000 + 49
    assert not feats["junk"]["ok"]

    frames = wav_frame_energy(df, frame_len=4).collect()
    # junk emits nothing; good → one full frame + one partial
    by_idx = {r["frame_idx"]: r for r in frames}
    assert len(frames) == 2
    assert by_idx[0]["n"] == 4 and by_idx[0]["energy"] == 40000
    assert by_idx[1]["n"] == 1 and by_idx[1]["energy"] == 49

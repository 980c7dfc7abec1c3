"""PCM WAV codec + audio feature-extraction tests.

The codec layer (operators/audio.py) runs without Spark; the e2e test
runs q_media_audio_features at smoke scale and checks the decoded
signal statistics against the closed-form synthesis (the DuckDB oracle
re-checks the same surface at driver time)."""

from __future__ import annotations

import numpy as np
import pytest

from dd_ops_ocr_spark.operators.audio import (
    _chunk,
    audio_features,
    decode_wav,
    encode_wav,
    is_wav,
    wav_info,
)

from tests.conftest import SF_SMOKE

SF = SF_SMOKE


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    for n, ch, rate in [(1, 1, 8000), (500, 1, 44100), (777, 2, 22050)]:
        s = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
        payload = encode_wav(s, rate)
        assert is_wav(payload)
        assert wav_info(payload) == (rate, ch, n)
        out, r = decode_wav(payload)
        assert r == rate
        assert (out == s).all()


def test_wav_mono_1d_input():
    s = np.array([5, -5, 5], dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert out.shape == (3, 1)
    assert (out[:, 0] == s).all()


def test_wav_tolerant_reader_extra_chunks():
    """LIST/INFO, fact, and unknown chunks before/after fmt+data are
    skipped; odd-length chunks keep word alignment."""
    s = np.arange(-10, 11, dtype=np.int16)
    base = encode_wav(s, 8000)
    fmt_and_data = base[12:]
    # both skipped chunks have ODD bodies, so the walker must step over
    # their pad bytes to find fmt/data at all — removing the word
    # alignment from the shared RIFF walker fails this test
    payload = _chunk(
        b"RIFF",
        b"WAVE"
        + _chunk(b"LIST", b"INFOsoftware-xy")  # 15 bytes -> pad byte
        + _chunk(b"junk", b"\x07" * 3)  # odd mid-stream chunk
        + fmt_and_data
        + _chunk(b"fact", b"\x15\x00\x00\x00"),
    )
    assert wav_info(payload) == (8000, 1, 21)
    out, _ = decode_wav(payload)
    assert (out[:, 0] == s).all()


def test_wav_8bit_pcm_widens():
    """8-bit PCM is unsigned per spec; decode centers and widens it."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255])
    payload = _chunk(b"RIFF", b"WAVE" + _chunk(b"fmt ", fmt)
                     + _chunk(b"data", data))
    out, rate = decode_wav(payload)
    assert rate == 8000
    assert out[:, 0].tolist() == [-32768, 0, 32512]


def test_wav_error_and_seam_paths():
    import struct

    with pytest.raises(ValueError):
        wav_info(b"RIFF\x04\x00\x00\x00AVI ")  # not WAVE
    with pytest.raises(ValueError):
        wav_info(_chunk(b"RIFF", b"WAVE"))  # no fmt/data
    # float PCM (format 3) is the documented injection seam
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    payload = _chunk(b"RIFF", b"WAVE" + _chunk(b"fmt ", fmt)
                     + _chunk(b"data", b"\x00" * 8))
    with pytest.raises(NotImplementedError):
        wav_info(payload)
    # chunk overrunning the container must raise, not over-read
    bad = _chunk(b"RIFF", b"WAVE" + b"data\xff\xff\xff\x0fAB")
    with pytest.raises(ValueError):
        wav_info(bad)
    with pytest.raises(ValueError):
        encode_wav(np.zeros((4, 1), dtype=np.int32), 8000)


def test_audio_features_known_signal():
    """A hand-built square wave: every feature has a closed form."""
    amp, half, n, rate = 2000, 4, 40, 8000
    i = np.arange(n)
    s = np.where((i // half) % 2 == 0, amp, -amp).astype(np.int16)
    f = audio_features(encode_wav(s, rate))
    assert f == {
        "sample_rate": rate,
        "n_channels": 1,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "peak": amp,
        "rms": amp,
        "zero_crossings": (n - 1) // half,
    }


def test_media_audio_features_end_to_end(spark):
    """Spark e2e at smoke scale: decoded-signal features equal the
    md5-derived synthesis parameters for every clip."""
    from dd_ops_ocr_spark.operators.multimodal import (
        _media_with_payload,
        media_audio_features,
        synth_audio_params,
    )

    media = _media_with_payload(spark, SF, fmt="wav").limit(60)
    out = media_audio_features(media).toPandas()
    assert len(out) > 0
    for _, row in out.iterrows():
        rate, n, amp, half, ch = synth_audio_params(row["media_ref"])
        assert row["sample_rate"] == rate
        assert row["n_channels"] == ch
        assert row["n_samples"] == n
        assert row["duration_ms"] == n * 1000 // rate
        assert row["peak"] == amp and row["rms"] == amp
        assert row["zero_crossings"] == (n - 1) // half


def test_audio_peak_full_scale_negative():
    """int16 -32768 has no int16 absolute value: peak must widen before
    abs (regression for the np.abs overflow)."""
    s = np.array([[-32768], [100]], dtype=np.int16)
    f = audio_features(encode_wav(s, 8000))
    assert f["peak"] == 32768


def test_wav_truncated_fmt_raises_value_error():
    """A short fmt chunk must stay inside the ValueError contract, not
    escape as struct.error."""
    payload = _chunk(
        b"RIFF",
        b"WAVE" + _chunk(b"fmt ", b"\x01\x00\x01\x00")  # 4 of 16 bytes
        + _chunk(b"data", b"\x00\x00"),
    )
    with pytest.raises(ValueError):
        wav_info(payload)


def test_media_audio_features_quarantine_mixed(spark):
    """Warn-and-continue audio decode: clean clips keep their exact
    feature surface, corrupt clips become one null-feature quarantine
    row each."""
    import pandas as pd

    from dd_ops_ocr_spark.operators.multimodal import (
        media_audio_features_quarantined,
        synth_audio_params,
        synth_wav_payload,
    )

    good = synth_wav_payload("aq_ref")
    rate, n, amp, half, ch = synth_audio_params("aq_ref")
    rows = [
        ("good", good),
        ("garbage", b"RIFFxxxx not wave data"),
        ("truncated", good[:10]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_ref", "payload"])
    )
    out = {r["media_ref"]: r
           for r in media_audio_features_quarantined(df).collect()}
    g = out["good"]
    assert g["error"] is None
    assert (g["sample_rate"], g["n_samples"], g["peak"], g["rms"]) == (
        rate, n, amp, amp
    )
    for ref in ("garbage", "truncated"):
        q = out[ref]
        assert q["error"] is not None and q["sample_rate"] is None


def test_media_audio_quarantine_all_corrupt_batch_still_quarantines(spark):
    """Corruption clusters in real corpora (one bad producer shard lands
    contiguously): an all-corrupt batch is legitimate data, not decoder
    breakage, and must quarantine row-by-row rather than kill the task
    (discrimination is by exception CLASS — DECODE_ERRORS — never by
    how much of the batch failed)."""
    import pandas as pd

    from dd_ops_ocr_spark.operators.multimodal import (
        media_audio_features_quarantined,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": [f"r{i}" for i in range(5)],
                "payload": [b"not a wav"] * 5,
            }
        )
    ).coalesce(1)  # one multi-row batch, every payload corrupt
    rows = media_audio_features_quarantined(df).collect()
    assert len(rows) == 5
    assert all(
        r["error"] is not None and r["sample_rate"] is None for r in rows
    )
    one = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["solo"], "payload": [b"zz"]})
    ).coalesce(1)
    rows = media_audio_features_quarantined(one).collect()
    assert len(rows) == 1 and rows[0]["error"] is not None

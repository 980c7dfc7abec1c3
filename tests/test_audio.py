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
    # MPEG-in-WAV (format 0x50) is the documented injection seam
    # (G.711 mu/A-law decode natively since the companding extension)
    fmt = struct.pack("<HHIIHH", 0x50, 1, 8000, 8000, 1, 0)
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


# ---------------------------------------------------- extended codec matrix

def test_wav_codec_matrix_roundtrip_exact():
    """pcm24 / float32 / EXTENSIBLE-pcm16 all recover int16 sources
    bit-exactly, and the parsed codec label reports the dispatch."""
    from dd_ops_ocr_spark.operators.audio import (
        _parse,
        encode_wav_extensible,
        encode_wav_float32,
        encode_wav_pcm24,
    )

    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, (513, 2)).astype(np.int16)
    for enc, label in [
        (encode_wav_pcm24, "pcm24"),
        (encode_wav_float32, "float32"),
        (encode_wav_extensible, "extensible/pcm16"),
    ]:
        p = enc(s, 22050)
        assert _parse(p).codec_label == label
        assert wav_info(p) == (22050, 2, 513)
        out, rate = decode_wav(p)
        assert rate == 22050 and (out == s).all(), label


def test_wav_float64_decode():
    """float64 streams decode through the same rint(x*32767) map (no
    float64 encoder in the module — build the container by hand)."""
    from dd_ops_ocr_spark.operators.audio import _chunk as chunk
    import struct

    s = np.array([0, 100, -32768, 32767], np.int16)
    data = (s.astype(np.float64) / 32767.0).astype("<f8").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 8, 8, 64)
    payload = chunk(
        b"RIFF", b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"data", data)
    )
    out, rate = decode_wav(payload)
    # -32768/32767 stores slightly below -1.0; the clip keeps it exact
    assert rate == 8000 and (out[:, 0] == s).all()


def test_wav_extensible_unknown_subformat():
    from dd_ops_ocr_spark.operators.audio import encode_wav_extensible

    p = bytearray(encode_wav_extensible(np.zeros(4, np.int16), 8000))
    # corrupt one byte of the subformat GUID tail (fmt body starts at 20)
    p[20 + 30] ^= 0xFF
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(p))


def _adpcm_decode_scalar(payload: bytes):
    """Independent scalar IMA ADPCM referee (textbook per-sample loop)
    the vectorized decoder must match bit-for-bit."""
    from dd_ops_ocr_spark.operators.audio import _INDEX_ADJ, _STEP, _parse

    hdr = _parse(payload)
    d0, d1 = hdr.data_span
    ba, spb = hdr.block_align, hdr.samples_per_block
    out = []
    for b0 in range(d0, d1, ba):
        pred = int(np.frombuffer(payload[b0:b0 + 2], "<i2")[0])
        idx = payload[b0 + 2]
        out.append(pred)
        nibs = []
        for byte in payload[b0 + 4: b0 + ba]:
            nibs += [byte & 0xF, byte >> 4]
        for nv in nibs:
            step = int(_STEP[idx])
            delta = nv & 7
            diff = step >> 3
            if delta & 4:
                diff += step
            if delta & 2:
                diff += step >> 1
            if delta & 1:
                diff += step >> 2
            pred = pred - diff if nv & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(_INDEX_ADJ[delta])))
            out.append(pred)
    return np.array(out[: hdr.n_samples], np.int16)


def test_adpcm_vectorized_matches_scalar_referee():
    from dd_ops_ocr_spark.operators.audio import encode_wav_adpcm

    rng = np.random.default_rng(5)
    for n, ba in [(1, 64), (120, 64), (505, 256), (1300, 128)]:
        sig = rng.integers(-12000, 12000, n).astype(np.int16)
        p = encode_wav_adpcm(sig, 16000, block_align=ba)
        vec, rate = decode_wav(p)
        assert rate == 16000 and vec.shape == (n, 1)
        assert (vec[:, 0] == _adpcm_decode_scalar(p)).all(), (n, ba)


def test_adpcm_block_constant_signal_exact():
    """The oracle-bearing construction: constant +-amp per block decodes
    bit-exactly (predictor carries the first sample, zero diffs at the
    block's chosen step stay zero)."""
    from dd_ops_ocr_spark.operators.audio import encode_wav_adpcm

    for ba in (64, 128, 256):
        spb = (ba - 4) * 2 + 1
        blocks = np.array([2200, -2200, 2200, -2200], np.int16)
        sig = np.repeat(blocks, spb)
        out, _ = decode_wav(encode_wav_adpcm(sig, 8000, block_align=ba))
        assert (out[:, 0] == sig).all()
        f = audio_features(encode_wav_adpcm(sig, 8000, block_align=ba))
        assert f["peak"] == f["rms"] == 2200
        assert f["zero_crossings"] == 3


def test_adpcm_reconstruction_bound_on_sine():
    """Lossy but adaptive: a smooth signal reconstructs within a small
    multiple of the working step size (the per-block start-index
    heuristic keeps block seams from spiking)."""
    from dd_ops_ocr_spark.operators.audio import encode_wav_adpcm

    t = np.arange(4000)
    sig = (9000 * np.sin(t / 30)).astype(np.int16)
    out, _ = decode_wav(encode_wav_adpcm(sig, 16000))
    err = np.abs(out[:, 0].astype(int) - sig.astype(int))
    assert err.max() < 200 and err.mean() < 40


def test_adpcm_fact_truncation_partial_final_block():
    """n not a multiple of samples_per_block: the final block is padded
    on encode and the fact chunk trims decode back to exactly n."""
    from dd_ops_ocr_spark.operators.audio import encode_wav_adpcm

    sig = np.arange(-300, 400, 7, dtype=np.int16)  # n=100, spb=121
    p = encode_wav_adpcm(sig, 8000, block_align=64)
    assert wav_info(p) == (8000, 1, 100)
    out, _ = decode_wav(p)
    assert out.shape == (100, 1)


def test_adpcm_error_contract():
    from dd_ops_ocr_spark.operators.audio import encode_wav_adpcm

    with pytest.raises(ValueError):  # per-channel budget must be 4k >= 8
        encode_wav_adpcm(np.zeros((8, 2), np.int16), 8000, block_align=12)
    p = bytearray(encode_wav_adpcm(np.zeros(200, np.int16), 8000,
                                   block_align=64))
    # corrupt the first block's stored step index past the ladder
    data_off = p.rindex(b"data") + 8
    p[data_off + 2] = 99
    with pytest.raises(ValueError):
        decode_wav(bytes(p))


def test_adpcm_stereo_matches_per_channel_mono():
    """Stereo blocks are the per-channel mono encodings interleaved
    (4-byte headers per channel, 4-byte nibble groups cycling the
    channels): decoding channel c of a stereo encode at block_align=2k
    must be BIT-IDENTICAL to decoding a mono encode of that channel at
    block_align=k — the same blocks, routed through the interleave."""
    from dd_ops_ocr_spark.operators.audio import encode_wav_adpcm

    rng = np.random.default_rng(7)
    for n, ba in [(120, 128), (505, 512), (1300, 64)]:
        st = rng.integers(-20000, 20000, (n, 2)).astype(np.int16)
        got, rate = decode_wav(encode_wav_adpcm(st, 16000, block_align=ba))
        assert rate == 16000 and got.shape == (n, 2)
        for c in range(2):
            mono, _ = decode_wav(
                encode_wav_adpcm(st[:, c], 16000, block_align=ba // 2)
            )
            assert (got[:, c] == mono[:, 0]).all(), (n, ba, c)


def test_g711_involution_and_level_exactness():
    """encode(decode(code)) == code for all 256 codes of both laws —
    mu-law excepting 0x7F, whose negative zero canonicalizes to 0xFF —
    and every reconstruction level survives a decode->encode->decode
    round trip bit-exactly (the property the SQL oracle leans on)."""
    from dd_ops_ocr_spark.operators.audio import (
        _ALAW_DEC,
        _ULAW_DEC,
        _alaw_encode,
        _ulaw_encode,
    )

    codes = np.arange(256, dtype=np.uint8)
    ue = _ulaw_encode(_ULAW_DEC[codes])
    assert all(ue[c] == c for c in range(256) if c != 0x7F)
    assert ue[0x7F] == 0xFF  # negative zero -> canonical positive zero
    assert (_alaw_encode(_ALAW_DEC[codes]) == codes).all()
    for dec, enc in ((_ULAW_DEC, _ulaw_encode), (_ALAW_DEC, _alaw_encode)):
        levels = dec[codes]
        assert (dec[enc(levels)] == levels).all()


def test_g711_quantization_bound_and_monotonic():
    """Arbitrary int16 reconstructs within half the widest segment step
    (512), and decode(encode(x)) is monotone non-decreasing in x."""
    from dd_ops_ocr_spark.operators.audio import (
        _ALAW_DEC,
        _ULAW_DEC,
        _alaw_encode,
        _ulaw_encode,
    )

    x = np.arange(-32768, 32768, dtype=np.int16)
    for dec, enc, clip in (
        (_ULAW_DEC, _ulaw_encode, 32635),
        (_ALAW_DEC, _alaw_encode, 32767),
    ):
        r = dec[enc(x)].astype(np.int32)
        err = np.abs(r - np.clip(x, -clip, clip).astype(np.int32))
        assert err.max() <= 512
        assert (np.diff(r) >= 0).all()


def test_g711_wav_roundtrip_and_info():
    from dd_ops_ocr_spark.operators.audio import (
        _ALAW_DEC,
        _ULAW_DEC,
        encode_wav_alaw,
        encode_wav_ulaw,
        wav_info,
    )

    from dd_ops_ocr_spark.operators.audio import _alaw_encode, _ulaw_encode

    rng = np.random.default_rng(11)
    x = rng.integers(-32000, 32000, (311, 2)).astype(np.int16)
    for encf, rawf, dec in (
        (encode_wav_ulaw, _ulaw_encode, _ULAW_DEC),
        (encode_wav_alaw, _alaw_encode, _ALAW_DEC),
    ):
        p = encf(x, 22050)
        assert wav_info(p) == (22050, 2, 311)
        got, rate = decode_wav(p)
        assert rate == 22050 and got.shape == (311, 2)
        # container decode equals the raw-law quantization of the input
        assert (got == dec[rawf(x)]).all()


def test_g711_extensible_wrapping_decodes():
    """WAVE_FORMAT_EXTENSIBLE with a KSDATAFORMAT mu-law subformat GUID
    dispatches through the same tag extraction as wrapped PCM — the
    G.711 rows needed no extra plumbing, and the codec label records
    the wrapping."""
    import struct

    from dd_ops_ocr_spark.operators.audio import (
        _KS_GUID_TAIL,
        _ULAW_DEC,
        _ulaw_encode,
        audio_codec_features,
        wav_info,
    )
    from dd_ops_ocr_spark.operators.riff import chunk as _chunk

    x = np.arange(-300, 300, 7, dtype=np.int16)[:, None]
    data = _ulaw_encode(x).tobytes()
    ext = struct.pack("<HHI", 22, 8, 1) + struct.pack("<H", 7) + _KS_GUID_TAIL
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, 8) + ext
    p = _chunk(b"RIFF", b"WAVE" + _chunk(b"fmt ", fmt)
               + _chunk(b"fact", struct.pack("<I", len(x)))
               + _chunk(b"data", data))
    assert wav_info(p) == (8000, 1, len(x))
    got, rate = decode_wav(p)
    assert rate == 8000
    assert (got == _ULAW_DEC[np.frombuffer(data, np.uint8)][:, None]).all()
    assert audio_codec_features(p)["codec"] == "extensible/ulaw"


def test_adpcm_header_byte_rate_is_compressed_rate():
    """nAvgBytesPerSec must carry the COMPRESSED byte rate
    (rate * block_align / samples_per_block, round-half-up), not the
    PCM formula — external tools trust this field for duration and
    bitrate estimates."""
    import struct

    from dd_ops_ocr_spark.operators.audio import encode_wav_adpcm

    p = encode_wav_adpcm(np.zeros(1000, np.int16), 8000, block_align=256)
    fmt_off = p.index(b"fmt ") + 8
    tag, ch, rate, avg, ba, bits = struct.unpack_from("<HHIIHH", p, fmt_off)
    spb = struct.unpack_from("<H", p, fmt_off + 18)[0]
    assert (tag, ch, rate, ba, bits) == (0x11, 1, 8000, 256, 4)
    assert spb == 2 * (256 - 4) + 1  # 505 samples per 256-byte block
    assert avg == (8000 * 256 + spb // 2) // spb  # ~4055, not 2,048,000


def test_audio_codec_features_surface():
    from dd_ops_ocr_spark.operators.audio import (
        audio_codec_features,
        encode_wav_adpcm,
        encode_wav_pcm24,
    )

    s = np.repeat(np.array([900, -900], np.int16), 121)
    f = audio_codec_features(encode_wav_adpcm(s, 8000, block_align=64))
    assert f["codec"] == "ima-adpcm" and f["samples_per_block"] == 121
    assert f["peak"] == f["rms"] == 900 and f["zero_crossings"] == 1
    f2 = audio_codec_features(encode_wav_pcm24(s, 8000))
    assert f2["codec"] == "pcm24" and f2["samples_per_block"] == 1
    assert f2["peak"] == 900

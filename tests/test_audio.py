"""Pure-stdlib WAV codec: round trips (16/8-bit, mono/stereo),
decimation, planted-oracle arithmetic, error contracts, and the Spark
``extract_audio_features`` plumbing (null tolerance, Arrow batch shape).
"""

from __future__ import annotations

import random

import pytest

from ekati_spark.operators.audio import (
    PLANT_RATE,
    WAV_SIG,
    decimate_wav,
    decode_wav,
    encode_wav,
    planted_wav,
    wav_stats,
)


@pytest.mark.parametrize("sampwidth", [1, 2])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip(sampwidth, channels):
    rng = random.Random(sampwidth * 10 + channels)
    lo, hi = (-128, 127) if sampwidth == 1 else (-32768, 32767)
    n = 8 * channels
    samples = [rng.randint(lo, hi) for _ in range(n)]
    rate, ch, w, out = decode_wav(
        encode_wav(samples, 44100, channels=channels, sampwidth=sampwidth)
    )
    assert (rate, ch, w) == (44100, channels, sampwidth)
    assert out == samples


def test_planted_matches_oracle_arithmetic():
    for doc_id in (0, 1, 7, 96, 97, 12345):
        b = planted_wav(doc_id)
        assert b.startswith(WAV_SIG)
        rate, ch, w, samples = decode_wav(b)
        n = 64 + doc_id % 97
        expect = [(doc_id * 131 + i * 17) % 4096 - 2048 for i in range(n)]
        assert (rate, ch, w) == (PLANT_RATE, 1, 2)
        assert samples == expect
        st = wav_stats(b)
        assert st["n_samples"] == n
        assert st["duration_ms"] == n * 1000 // PLANT_RATE
        assert st["peak_abs"] == max(abs(s) for s in expect)
        assert st["sum_abs"] == sum(abs(s) for s in expect)
        assert st["sum_sq"] == sum(s * s for s in expect)
        assert st["zero_crossings"] == sum(
            1
            for i in range(1, n)
            if (expect[i] < 0) != (expect[i - 1] < 0)
        )


def test_decimate_keeps_every_kth_frame():
    samples = list(range(-10, 10))
    d = decimate_wav(encode_wav(samples, 8000), 3)
    rate, ch, w, out = decode_wav(d)
    assert rate == 8000 // 3
    assert out == samples[::3]
    # stereo: frames (pairs) decimate together, phase preserved
    stereo = [1, -1, 2, -2, 3, -3, 4, -4]
    d2 = decimate_wav(encode_wav(stereo, 8000, channels=2), 2)
    assert decode_wav(d2)[3] == [1, -1, 3, -3]


def test_error_contracts():
    with pytest.raises(ValueError):
        decode_wav(b"\x89PNG not audio")
    with pytest.raises(ValueError):
        decode_wav(b"")
    with pytest.raises(ValueError):
        encode_wav([1, 2], sampwidth=4)
    # truncated container
    with pytest.raises((ValueError, EOFError)):
        decode_wav(planted_wav(3)[:20])


def test_zero_crossing_sign_convention():
    # -1 -> 0 flips (0 is non-negative); 0 -> 1 does not; 1 -> -1 does
    b = encode_wav([-1, 0, 1, -1], 8000)
    assert wav_stats(b)["zero_crossings"] == 2


def test_extract_audio_features_null_tolerance(spark):
    from ekati_spark.operators.multimodal import extract_audio_features

    rows = [
        (1, planted_wav(1)),
        (2, None),
        (3, b"not a wav at all"),
        (4, planted_wav(4)[:25]),  # truncated
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert out[1]["n_samples"] == 64 + 1 % 97
    assert out[1]["sample_rate"] == PLANT_RATE
    for bad in (2, 3, 4):
        assert out[bad]["n_samples"] is None
        assert out[bad]["zero_crossings"] is None
    assert "content" not in extract_audio_features(df).columns


def test_encode_rejects_ragged_frames():
    with pytest.raises(ValueError):
        encode_wav([1, 2, 3], 8000, channels=2)


def test_zero_rate_header_is_a_value_error():
    """A crafted header with framerate 0 must raise the contract error
    type (ValueError), not ZeroDivisionError — extract_audio_features'
    per-row guard only absorbs ValueError/EOFError."""
    import io
    import struct

    good = planted_wav(1)
    # RIFF fmt chunk: sample rate lives 4 bytes into the fmt body + 4
    # (after audio_format + channels); find 'fmt ' and zero the rate
    i = good.index(b"fmt ")
    rate_off = i + 8 + 4
    bad = good[:rate_off] + struct.pack("<I", 0) + good[rate_off + 4:]
    with pytest.raises((ValueError, EOFError)):
        wav_stats(bad)


def test_fuzzed_bytes_keep_the_error_contract():
    """Arbitrary/corrupted payloads may only raise ValueError/EOFError
    (the types extract_audio_features maps to null rows) — never
    ZeroDivisionError / struct.error / IndexError."""
    import random

    rng = random.Random(7)
    base = planted_wav(5)
    for trial in range(300):
        if trial % 3 == 0:
            b = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        else:
            b = bytearray(base[: rng.randrange(1, len(base) + 1)])
            for _ in range(rng.randrange(1, 6)):
                if b:
                    b[rng.randrange(len(b))] = rng.randrange(256)
            b = bytes(b)
        try:
            wav_stats(b)
        except (ValueError, EOFError):
            pass


def test_fingerprint_perceptual_properties():
    """wav_fingerprint groups what md5 cannot: 2x-decimated audio keeps
    the fingerprint (energy ratios survive uniform downsampling) while
    distinct envelopes differ; byte digests differ in every case."""
    import hashlib

    from ekati_spark.operators.audio import decimate_wav, wav_fingerprint

    def envelope(pattern, reps=64, amp=1000):
        # |samples| follow the given per-segment amplitude pattern
        s = []
        for a in pattern:
            s += [a * amp, -a * amp] * reps
        return encode_wav(s, 8000)

    rising = envelope([1, 2, 4, 8, 16, 24, 30, 32])
    falling = envelope([32, 30, 24, 16, 8, 4, 2, 1])
    spike = envelope([1, 1, 1, 32, 32, 1, 1, 1])
    for wav in (rising, falling, spike):
        assert wav_fingerprint(wav) == wav_fingerprint(decimate_wav(wav, 2))
        assert hashlib.md5(wav).digest() != hashlib.md5(
            decimate_wav(wav, 2)
        ).digest()
    fps = {wav_fingerprint(w) for w in (rising, falling, spike)}
    assert len(fps) == 3

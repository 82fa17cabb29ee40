"""Pure-stdlib WAV (RIFF PCM) codec for the multimodal audio seam.

The reference stores media payloads as opaque typed blobs
(``/root/reference/src/ahghee.grpc/types.proto:35-37`` — ``metabytes``:
``TypeBytes{typeiri, bytes}``); audio decode itself has no reference
analog, so this implements the standard RIFF/WAVE PCM container directly
(``wave`` + ``struct``, both stdlib): enough of a decoder to recover
sample rate, channel count, and the raw PCM samples from real WAV bytes
without any audio library, plus an encoder for fixtures and planted
round-trip oracles, plus an integer decimation transform.

Scope (documented, asserted loudly): uncompressed PCM, 8/16-bit
samples, any channel count / sample rate. Compressed codecs (MP3, AAC,
float WAV) raise ``ValueError`` and the caller maps the row to null
features rather than failing the Arrow batch — the same contract as
``operators.png``.

Every statistic this module reports is INTEGER arithmetic on the PCM
samples (peak / sum of |s| / sum of s² / negative-sign flips), so a SQL
oracle can replay a planted signal bit-exactly — no float accumulation
order to worry about.

Scale note: decode runs inside ``mapInPandas`` workers, per-row
independent — throughput scales linearly with partitions; payload bytes
never shuffle. A deployment with soundfile/librosa swaps a faster
decode in without touching the Spark plumbing.
"""

from __future__ import annotations

import io
import struct
import wave

WAV_SIG = b"RIFF"


def encode_wav(
    samples: list[int],
    sample_rate: int = 8000,
    channels: int = 1,
    sampwidth: int = 2,
) -> bytes:
    """PCM samples → WAV bytes. 16-bit samples are signed ints in
    [-32768, 32767]; 8-bit are signed values stored unsigned-biased
    (+128) per the WAV spec. Interleaved frames when ``channels > 1``
    (``samples`` length must be a multiple of ``channels``)."""
    if channels > 1 and len(samples) % channels:
        raise ValueError(
            f"{len(samples)} samples do not fill whole {channels}-channel "
            "frames"
        )
    if sampwidth == 2:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    elif sampwidth == 1:
        frames = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise ValueError(f"unsupported sampwidth {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """WAV bytes → (sample_rate, channels, sampwidth, samples).

    Samples come back as signed ints regardless of on-disk width
    (8-bit values are un-biased by -128), interleaved across channels
    in frame order. Non-PCM payloads raise ``ValueError``."""
    if not data or not data.startswith(WAV_SIG):
        raise ValueError("not a RIFF/WAV payload")
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            rate = w.getframerate()
            channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, OSError, RuntimeError) as e:
        # compressed / malformed / truncated container — wave's chunk
        # parser surfaces some truncations as OSError("cannot seek")
        # or a bare RuntimeError from its internal Chunk.seek;
        # normalize everything to the ValueError contract (both found
        # by the byte-fuzz test)
        raise ValueError(str(e)) from e
    if rate <= 0 or channels <= 0:
        # a crafted header with zero rate/channels must surface as the
        # contract error type, not ZeroDivisionError inside wav_stats
        # (which would fail the whole Arrow batch in
        # extract_audio_features' safe() wrapper)
        raise ValueError(f"invalid WAV header: rate={rate} channels={channels}")
    n = len(raw) // sampwidth
    if sampwidth == 2:
        samples = list(struct.unpack(f"<{n}h", raw[: n * 2]))
    elif sampwidth == 1:
        samples = [b - 128 for b in raw[:n]]
    else:
        raise ValueError(f"unsupported sampwidth {sampwidth}")
    return rate, channels, sampwidth, samples


PLANT_RATE = 8000


def planted_wav(doc_id: int) -> bytes:
    """Deterministic mono 16-bit fixture WAV for round-trip oracles.

    Sample count and every sample value are pure arithmetic on
    ``doc_id``, so a SQL oracle can predict exactly what a correct
    decode recovers (queries/llm.py::l61):

        n    = 64 + doc_id % 97
        s[i] = (doc_id*131 + i*17) % 4096 - 2048
    """
    n = 64 + doc_id % 97
    samples = [(doc_id * 131 + i * 17) % 4096 - 2048 for i in range(n)]
    return encode_wav(samples, sample_rate=PLANT_RATE)


def decimate_wav(data: bytes, factor: int) -> bytes:
    """Integer downsample: keep every ``factor``-th sample (per channel
    phase preserved for mono; multichannel decimates frames), re-encode
    at ``rate // factor``. Pure index arithmetic — deterministic in any
    environment, the audio analog of ``png.resize_png``."""
    rate, channels, sampwidth, samples = decode_wav(data)
    if not 1 <= factor < rate:
        # factor 0 would slice with step 0; factor >= rate would encode
        # framerate 0 — both must fail under the module's documented
        # ValueError contract, not a raw wave.Error/ValueError from the
        # encoder internals.
        raise ValueError(
            f"decimate factor must satisfy 1 <= factor < rate "
            f"(got factor={factor}, rate={rate})"
        )
    frames = [
        samples[i : i + channels] for i in range(0, len(samples), channels)
    ]
    kept = [s for f in frames[::factor] for s in f]
    return encode_wav(
        kept, sample_rate=rate // factor, channels=channels, sampwidth=sampwidth
    )


def wav_stats(data: bytes) -> dict:
    """Integer signal statistics of a decoded WAV (all exact):

    - ``n_samples``: per-channel frame count
    - ``duration_ms``: n_samples * 1000 // rate (integer floor)
    - ``peak_abs`` / ``sum_abs`` / ``sum_sq``: over all samples
    - ``zero_crossings``: count of i ≥ 1 where sign-negativity flips
      ((s[i] < 0) != (s[i-1] < 0)) — first sample contributes 0,
      matching a SQL ``lag``-based replay where the first row's NULL
      comparison drops out.
    """
    rate, channels, _, samples = decode_wav(data)
    n_frames = len(samples) // max(channels, 1)
    flips = sum(
        1
        for i in range(1, len(samples))
        if (samples[i] < 0) != (samples[i - 1] < 0)
    )
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "n_samples": n_frames,
        "duration_ms": n_frames * 1000 // rate,
        "peak_abs": max((abs(s) for s in samples), default=0),
        "sum_abs": sum(abs(s) for s in samples),
        "sum_sq": sum(s * s for s in samples),
        "zero_crossings": flips,
    }


def wav_fingerprint(data: bytes, n_windows: int = 16) -> int:
    """Perceptual audio fingerprint — the WAV analog of png.dhash_words:
    split the signal into ``n_windows`` equal index ranges (window of
    sample i = i*n_windows // n, pure integer arithmetic), take each
    window's |s| energy sum, and emit one bit per adjacent-window
    comparison (bit w = 1 iff energy[w] > energy[w+1]) packed into an
    int. Comparing energy RATIOS rather than values makes the
    fingerprint invariant to uniform decimation/volume-ish changes
    where byte-level digests differ (proven on controlled envelope
    fixtures in tests/test_audio.py — the planted sawtooth corpus is
    deliberately NOT used: its energy profiles are all one family, the
    wrong testbed for a perceptual hash). All integer arithmetic."""
    _, channels, _, samples = decode_wav(data)
    n = len(samples)
    if n == 0:
        return 0
    energy = [0] * n_windows
    for i, s in enumerate(samples):
        energy[i * n_windows // n] += abs(s)
    fp = 0
    for w in range(n_windows - 1):
        if energy[w] > energy[w + 1]:
            fp |= 1 << w
    return fp

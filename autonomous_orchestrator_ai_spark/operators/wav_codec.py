"""Pure-Python WAV (RIFF/PCM) codec — the no-library baseline AUDIO format
for the multimodal pipeline (companion to bmp_codec.py; same vendoring
strategy as sources/avro_codec.py: implement the public spec subset so one
real audio format is testable end-to-end without ffmpeg/soundfile).

Implements uncompressed integer PCM (format tag 1), 8/16-bit, any channel
count and sample rate, tolerant of extra chunks (LIST/fact) before and
after `data`. Float PCM, ADPCM, and extensible-format WAVs are out of
scope and raise loudly — the mapInPandas slot is where a real cluster
wires ffmpeg for those.
"""

from __future__ import annotations

import struct


def encode_wav(
    sample_rate: int, channels: int, samples: list[int], bits: int = 16
) -> bytes:
    """Encode interleaved integer samples as a PCM WAV file."""
    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    if channels <= 0 or sample_rate <= 0:
        raise ValueError("channels and sample_rate must be positive")
    if len(samples) % channels != 0:
        raise ValueError("sample count not divisible by channel count")
    if bits == 16:
        payload = struct.pack(f"<{len(samples)}h", *samples)
    else:
        # 8-bit WAV is unsigned with a 128 bias
        payload = bytes((s + 128) & 0xFF for s in samples)
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(blob: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a PCM WAV into (sample_rate, channels, bits, interleaved
    samples as signed ints). Raises ValueError outside the supported
    subset — loud, never silently wrong audio."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _brate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag != 1:
        raise ValueError(f"unsupported format tag {tag}; only integer PCM")
    if bits == 16:
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[: 2 * n]))
    elif bits == 8:
        samples = [b - 128 for b in data]
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return rate, channels, bits, samples


def audio_stats(
    rate: int, channels: int, samples: list[int], bits: int
) -> dict:
    """Per-clip descriptor from decoded PCM: duration, RMS level, peak,
    zero-crossing rate (all on the mono mixdown, full-scale-normalized) —
    the cheap audio-quality features a corpus filter keys on."""
    full_scale = float(1 << (bits - 1))
    n_frames = len(samples) // channels if channels else 0
    if n_frames == 0:
        return {
            "duration_ms": 0, "rms": 0.0, "peak": 0.0, "zcr": 0.0,
            "n_frames": 0,
        }
    mono = [
        sum(samples[i * channels : (i + 1) * channels]) / channels / full_scale
        for i in range(n_frames)
    ]
    rms = (sum(x * x for x in mono) / n_frames) ** 0.5
    peak = max(abs(x) for x in mono)
    crossings = sum(
        1 for i in range(1, n_frames) if (mono[i - 1] < 0) != (mono[i] < 0)
    )
    return {
        "duration_ms": int(n_frames * 1000 / rate),
        "rms": rms,
        "peak": peak,
        "zcr": crossings / max(n_frames - 1, 1),
        "n_frames": n_frames,
    }

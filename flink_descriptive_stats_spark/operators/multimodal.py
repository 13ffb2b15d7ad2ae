"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content in a Spark pipeline is an opaque ``binary`` column
plus typed metadata; decode / feature-extraction runs as Arrow-batched
pandas iterators (mapInPandas), never row-at-a-time Python.

Decode support is format-tiered: UNCOMPRESSED formats decode for real with
zero native dependencies — P6/P3 PPM and 24-bit BMP via numpy
(``decode_image``), RIFF/WAV PCM via struct (``decode_wav``) — while
compressed formats (JPEG/PNG/MP3/...) raise NotImplementedError (no
PIL/opencv/ffmpeg in this container) and the feature extractor falls back
to deterministic byte statistics with a ``decoded`` flag. The Spark-side
plumbing (schema, batch iteration, partitioning) is identical either way.

Scale notes: payloads stay columnar (parquet binary) end to end; metadata
extraction is builtin-expression-only (oracle-checkable); feature extraction
batches through Arrow with spark.sql.execution.arrow.maxRecordsPerBatch
bounding memory; the output schema is declared up front so Catalyst can
prune unselected features.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("id bigint, n_bytes bigint, byte_sum bigint, "
                  "head_byte int, tail_byte int, feature array<double>")


def attach_binary_payload(df: DataFrame, content_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Stand-in ingest: content -> binary payload + typed metadata struct.
    (With real images this is spark.read.format('binaryFile') providing
    path/length/content.)"""
    payload = F.encode(F.col(content_col), "UTF-8")
    meta = F.struct(
        F.octet_length(F.col(content_col)).cast("bigint").alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
        F.md5(payload).alias("checksum"),
    )
    return df.select(F.col(id_col).alias("id"), payload.alias("payload"),
                     meta.alias("meta"))


def payload_metadata(df: DataFrame, content_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Flat, oracle-checkable view of the ingest metadata."""
    d = attach_binary_payload(df, content_col, id_col)
    return d.select("id", F.col("meta.n_bytes").alias("n_bytes"),
                    F.col("meta.mime").alias("mime"),
                    F.col("meta.checksum").alias("checksum"))


def _decode_ppm(payload: bytes) -> np.ndarray:
    """P6 (binary) / P3 (ascii) PPM -> uint8 ndarray (H, W, 3)."""
    parts: list[bytes] = []
    i = 0
    # header = 4 whitespace-separated tokens (comments allowed): magic,
    # width, height, maxval
    while len(parts) < 4 and i < len(payload):
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        parts.append(payload[i:j])
        i = j
    magic, w, h, maxval = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if magic == b"P6":
        data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                             offset=i + 1)
    elif magic == b"P3":
        data = np.array(payload[i:].split()[:w * h * 3], dtype=np.uint8)
    else:
        raise ValueError(f"not a PPM payload: {magic!r}")
    return data.reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> uint8 ndarray (H, W, 3) in RGB order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off, = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp, = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    stride = (w * 3 + 3) & ~3            # rows padded to 4 bytes
    rows = []
    flip = h > 0                          # positive height = bottom-up
    h = abs(h)
    for r in range(h):
        start = off + r * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3,
                            offset=start).reshape(w, 3)
        rows.append(row[:, ::-1])         # BGR -> RGB
    img = np.stack(rows)
    return img[::-1] if flip else img


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode for uncompressed formats (P6/P3 PPM, 24-bit BMP)
    -> uint8 ndarray (H, W, 3). Compressed formats need PIL/opencv (absent
    in this container) and raise NotImplementedError — callers fall back to
    byte-level features (see extract_features)."""
    try:
        if payload[:2] in (b"P6", b"P3"):
            return _decode_ppm(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
    except struct.error as e:
        # a truncated/malformed container header is a DATA defect: it
        # must degrade like any other undecodable payload, never crash
        # an Arrow task (the "decode failure degrades" contract)
        raise ValueError(f"truncated image header: {e}") from e
    raise NotImplementedError(
        "only uncompressed PPM/BMP decode natively; JPEG/PNG/... require "
        "PIL/opencv, not available in this container")


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3) -> binary P6 PPM bytes (round-trips decode_image)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize (nearest-neighbor, pure numpy index math) for
    decodable payloads; re-encoded as P6 PPM. Same NotImplementedError
    contract as decode_image for compressed inputs."""
    img = decode_image(payload)
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_ppm(img[ys][:, xs])


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAV PCM decode (pure struct/numpy): returns (sample_rate,
    n_channels, samples int16 ndarray shaped (frames, channels))."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i = 12
    rate = channels = None
    data = None
    try:
        while i + 8 <= len(payload):
            cid = payload[i:i + 4]
            size, = struct.unpack_from("<I", payload, i + 4)
            body = payload[i + 8:i + 8 + size]
            if cid == b"fmt ":
                fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
                bits, = struct.unpack_from("<H", body, 14)
                if fmt != 1 or bits != 16:
                    raise NotImplementedError(
                        f"only 16-bit PCM WAV (got fmt={fmt}, bits={bits})")
            elif cid == b"data":
                data = np.frombuffer(body, dtype="<i2")
            i += 8 + size + (size & 1)    # chunks are 2-byte aligned
    except struct.error as e:
        # same degrade-never-crash contract as decode_image
        raise ValueError(f"truncated WAV chunk header: {e}") from e
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, channels, data.reshape(-1, channels)


def sample_frames(df: DataFrame, content_col: str = "text",
                  id_col: str = "doc_id", frame_size: int = 64,
                  stride: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: treat the content as
    consecutive fixed-size frames, keep every ``stride``-th frame, emit
    (id, frame_idx, frame_len, frame_md5).

    Entirely JVM-side — sequence + explode for the sampled indices,
    substr slicing, md5 checksum — so it is oracle-checkable and keeps
    Python out of the hot path; a real video pipeline swaps the substr
    slice for a decoder UDF with the same dataflow. Frames are defined on
    the character domain here because the stand-in payloads are text
    (Spark and DuckDB agree on code-point substring semantics); with real
    ``binary`` payloads the same plan uses byte offsets.

    Scale: output rows = ceil(payload/frame_size)/stride per doc — the
    explode fans out before any shuffle, and there is no shuffle at all.
    """
    c = F.col(content_col)
    n_frames = F.ceil(F.length(c) / F.lit(float(frame_size))).cast("int")
    d = (df.select(F.col(id_col).alias("id"), c.alias("__content"),
                   n_frames.alias("__nf"))
         .where(F.col("__nf") > 0))
    idx = F.explode(F.sequence(F.lit(0), F.col("__nf") - 1, F.lit(stride)))
    d = d.select("id", "__content", idx.alias("frame_idx"))
    frame = F.col("__content").substr(
        F.col("frame_idx") * frame_size + 1, F.lit(frame_size))
    return d.select("id", "frame_idx",
                    F.length(frame).cast("bigint").alias("frame_len"),
                    F.md5(frame).alias("frame_md5"))


IMAGE_FEATURE_SCHEMA = ("id bigint, decoded boolean, width int, height int, "
                        "mean_r double, mean_g double, mean_b double, "
                        "n_bytes bigint")
AUDIO_FEATURE_SCHEMA = ("id bigint, decoded boolean, sample_rate int, "
                        "n_channels int, duration_s double, rms double, "
                        "zero_cross_rate double, n_bytes bigint")


def image_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "id") -> DataFrame:
    """Arrow-batched REAL image features over a binary column: decodable
    payloads (PPM/BMP) emit (width, height, per-channel means) with
    decoded=true; compressed/garbage payloads degrade to decoded=false
    rows instead of failing the batch — the production-robust shape."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                # NULL payload -> empty bytes -> the decoder raises and
                # the row degrades to decoded=false (never a task crash)
                b = b"" if p is None else bytes(p)
                try:
                    img = decode_image(b)
                    m = img.reshape(-1, 3).mean(axis=0)
                    rows.append((int(i), True, int(img.shape[1]),
                                 int(img.shape[0]), float(m[0]), float(m[1]),
                                 float(m[2]), len(b)))
                except (NotImplementedError, ValueError, IndexError):
                    rows.append((int(i), False, None, None, None, None,
                                 None, len(b)))
            yield pd.DataFrame(rows, columns=[
                "id", "decoded", "width", "height", "mean_r", "mean_g",
                "mean_b", "n_bytes"])

    return (df.select(id_col, payload_col)
            .mapInPandas(batches, IMAGE_FEATURE_SCHEMA))


def audio_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "id") -> DataFrame:
    """Arrow-batched REAL audio features over a binary column: 16-bit PCM
    WAV payloads emit (sample_rate, channels, duration, RMS, zero-crossing
    rate); undecodable payloads degrade to decoded=false rows."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                # NULL payload -> empty bytes -> the decoder raises and
                # the row degrades to decoded=false (never a task crash)
                b = b"" if p is None else bytes(p)
                try:
                    rate, ch, samples = decode_wav(b)
                    x = samples.astype(np.float64)
                    mono = x.mean(axis=1)
                    zc = (np.signbit(mono[1:]) != np.signbit(mono[:-1])
                          ).mean() if len(mono) > 1 else 0.0
                    rows.append((int(i), True, int(rate), int(ch),
                                 len(samples) / float(rate),
                                 float(np.sqrt((x ** 2).mean())), float(zc),
                                 len(b)))
                except (NotImplementedError, ValueError, struct.error,
                        IndexError):
                    rows.append((int(i), False, None, None, None, None,
                                 None, len(b)))
            yield pd.DataFrame(rows, columns=[
                "id", "decoded", "sample_rate", "n_channels", "duration_s",
                "rms", "zero_cross_rate", "n_bytes"])

    return (df.select(id_col, payload_col)
            .mapInPandas(batches, AUDIO_FEATURE_SCHEMA))


def _fake_features(payload: bytes) -> tuple[int, int, int, int, list[float]]:
    """Deterministic stand-in for decode+embed: byte statistics."""
    n = len(payload)
    s = sum(payload)
    head = payload[0] if n else -1
    tail = payload[-1] if n else -1
    feature = [float(n % 251), float(s % 997), float(head), float(tail)]
    return n, s, head, tail, feature


def extract_features(df: DataFrame, content_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload
    (mapInPandas): (id, n_bytes, byte_sum, head_byte, tail_byte,
    feature array<double>)."""
    d = attach_binary_payload(df, content_col, id_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [(int(i), *(_fake_features(
                        b"" if p is None else bytes(p))))
                    for i, p in zip(pdf["id"], pdf["payload"])]
            yield pd.DataFrame(rows, columns=["id", "n_bytes", "byte_sum",
                                              "head_byte", "tail_byte",
                                              "feature"])

    return d.select("id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


SPECTRAL_FEATURE_SCHEMA = (
    "id bigint, decoded boolean, sample_rate int, n_fft int, "
    "spectral_centroid_hz double, spectral_rolloff_hz double, "
    "spectral_bandwidth_hz double, dominant_freq_hz double")


def audio_spectral_features(df: DataFrame, payload_col: str = "payload",
                            id_col: str = "id",
                            n_fft: int = 1024) -> DataFrame:
    """Arrow-batched REAL spectral features over 16-bit PCM WAV payloads
    (numpy rFFT — no external DSP libs): spectral centroid (brightness),
    85% rolloff, bandwidth (spread around the centroid), and the dominant
    frequency — the speech/music/noise triage features an audio-curation
    pipeline screens on before expensive ASR. The first ``n_fft`` mono
    samples feed one rFFT per clip (deterministic — no windowing RNG);
    clips shorter than n_fft are zero-padded; undecodable payloads
    degrade to decoded=false rows (never a task failure).

    Scale shape: identical to audio_features — binary columns stay
    columnar, the UDF is Arrow-batched mapInPandas, per-row cost is one
    O(n_fft log n_fft) transform."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                # NULL payload -> empty bytes -> the decoder raises and
                # the row degrades to decoded=false (never a task crash)
                b = b"" if p is None else bytes(p)
                try:
                    rate, ch, samples = decode_wav(b)
                    mono = samples.astype(np.float64).mean(axis=1)
                    seg = np.zeros(n_fft)
                    seg[:min(len(mono), n_fft)] = mono[:n_fft]
                    mag = np.abs(np.fft.rfft(seg))
                    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
                    tot = mag.sum()
                    if tot <= 0:
                        rows.append((int(i), True, int(rate), n_fft,
                                     0.0, 0.0, 0.0, 0.0))
                        continue
                    centroid = float((freqs * mag).sum() / tot)
                    cum = np.cumsum(mag)
                    roll = float(freqs[int(np.searchsorted(
                        cum, 0.85 * tot))])
                    bw = float(np.sqrt(
                        (((freqs - centroid) ** 2) * mag).sum() / tot))
                    dom = float(freqs[int(mag.argmax())])
                    rows.append((int(i), True, int(rate), n_fft,
                                 centroid, roll, bw, dom))
                except (NotImplementedError, ValueError, struct.error,
                        IndexError):
                    rows.append((int(i), False, None, None, None, None,
                                 None, None))
            yield pd.DataFrame(rows, columns=[
                "id", "decoded", "sample_rate", "n_fft",
                "spectral_centroid_hz", "spectral_rolloff_hz",
                "spectral_bandwidth_hz", "dominant_freq_hz"])

    return (df.select(id_col, payload_col)
            .mapInPandas(batches, SPECTRAL_FEATURE_SCHEMA))


TEXTURE_FEATURE_SCHEMA = (
    "id bigint, decoded boolean, width int, height int, "
    "edge_density double, mean_gradient double, luma_entropy double, "
    "luma_contrast double")


def image_texture_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "id",
                           edge_threshold: float = 24.0) -> DataFrame:
    """Arrow-batched REAL texture/complexity features over decodable
    (PPM/BMP) images — the blank-scan / screenshot / photo triage an
    image-curation pipeline runs before expensive captioning:

    - edge_density: fraction of pixels whose gradient magnitude exceeds
      ``edge_threshold`` (finite-difference gradients, no kernels libs)
    - mean_gradient: average gradient magnitude (overall busyness)
    - luma_entropy: Shannon entropy (bits) of the 256-bin luma histogram
      (near 0 = flat/synthetic fill, high = natural texture)
    - luma_contrast: std of luma

    Same production-robust shape as image_features: numpy only,
    undecodable payloads degrade to decoded=false rows."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                # NULL payload -> empty bytes -> the decoder raises and
                # the row degrades to decoded=false (never a task crash)
                b = b"" if p is None else bytes(p)
                try:
                    img = decode_image(b).astype(np.float64)
                    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                            + 0.114 * img[..., 2])
                    gy, gx = np.gradient(luma)
                    gmag = np.hypot(gx, gy)
                    hist = np.bincount(
                        np.clip(luma, 0, 255).astype(np.int64).ravel(),
                        minlength=256)
                    ps = hist / hist.sum()
                    ps = ps[ps > 0]
                    rows.append((
                        int(i), True, int(luma.shape[1]),
                        int(luma.shape[0]),
                        float((gmag > edge_threshold).mean()),
                        float(gmag.mean()),
                        float(-(ps * np.log2(ps)).sum()),
                        float(luma.std())))
                except (NotImplementedError, ValueError, IndexError):
                    rows.append((int(i), False, None, None, None, None,
                                 None, None))
            yield pd.DataFrame(rows, columns=[
                "id", "decoded", "width", "height", "edge_density",
                "mean_gradient", "luma_entropy", "luma_contrast"])

    return (df.select(id_col, payload_col)
            .mapInPandas(batches, TEXTURE_FEATURE_SCHEMA))


# ---------------------------------------------------------------- image
# perceptual hashing (round 7): the DEDUP primitive for the image
# modality — text has MinHash/SimHash, embeddings have LSH/SemDeDup,
# images get the published DCT perceptual hash (pHash; same construction
# as the open imagehash library: resize -> luma -> 2-D DCT-II -> top-left
# 8x8 low-frequency block -> median threshold -> 64-bit code). Re-encoded
# or lightly-edited copies of an image land within a few Hamming bits.

def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the direct O(n^3) matrix form — n=32
    here, trivial next to Arrow batch transfer)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    C = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    C[0] /= np.sqrt(2.0)
    return C


def phash64(img: np.ndarray, hash_size: int = 8,
            highfreq_factor: int = 4) -> int:
    """64-bit DCT perceptual hash of an (h, w, 3) uint8 image. Pure
    numpy, deterministic: luma -> nearest-neighbor resize to
    (hash_size*highfreq_factor)^2 -> DCT-II -> top-left hash_size^2
    block -> bit = coefficient > median. Returned as a SIGNED 64-bit
    value so it stores in a Spark bigint."""
    n = hash_size * highfreq_factor
    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])
    ys = np.linspace(0, luma.shape[0] - 1, n).round().astype(int)
    xs = np.linspace(0, luma.shape[1] - 1, n).round().astype(int)
    small = luma[np.ix_(ys, xs)]
    C = _dct_matrix(n)
    low = (C @ small @ C.T)[:hash_size, :hash_size]
    bits = (low > np.median(low)).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_phash(df: DataFrame, payload_col: str = "payload",
                id_col: str = "id") -> DataFrame:
    """(id, decoded, phash) over a binary image column: the 64-bit DCT
    perceptual hash for every decodable payload (PPM/BMP — the honest
    no-PIL decode boundary), decoded=false degradation for the rest.
    ONE Arrow mapInPandas pass, nothing shuffles; the hash is the
    content-defined key every downstream image-dedup step joins on."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:       # NULL payload: degrade, not crash
                    rows.append((int(i), False, None))
                    continue
                try:
                    rows.append((int(i), True,
                                 phash64(decode_image(bytes(p)))))
                except (NotImplementedError, ValueError, IndexError):
                    rows.append((int(i), False, None))
            yield pd.DataFrame(rows, columns=["id", "decoded", "phash"])

    return (df.select(id_col, payload_col)
            .mapInPandas(batches, "id bigint, decoded boolean, "
                                  "phash bigint"))


def auto_bands(max_hamming: int) -> int:
    """The smallest divisor of 64 giving >= max_hamming + 1 bands — the
    pigeonhole-exhaustive geometry for a 64-bit code at the given
    threshold (a pair differing in d <= max_hamming bits touches at
    most d bands, so at d+1 bands one band always agrees). The price is
    band WIDTH: n_bands bands are 64/n_bands bits wide, so each band
    has only 2^(64/n_bands) possible values — at 16+ bands the bucket
    key space collapses (65k / 16 values) and max_bucket starts
    dropping everything on a large corpus. Practical guaranteed-recall
    territory for 64-bit codes is max_hamming <= 7 (8 bands of 8 bits);
    beyond that, prefer the measured-recall route
    (hamming_calibration) over brute banding."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63]: {max_hamming}")
    for b in (1, 2, 4, 8, 16, 32, 64):
        if b >= max_hamming + 1:
            return b
    return 64


def hamming_neardup_pairs(hashes: DataFrame, max_hamming: int = 6,
                          n_bands: int | str = 4,
                          max_bucket: int = 1024,
                          group_col: str | None = None) -> DataFrame:
    """The shared banded Hamming candidate funnel over any (id, phash)
    64-bit signature frame (the SimHash near-pair plan re-expressed as
    a reusable step — image pHash and the audio fingerprint both feed
    it): split the code into ``n_bands`` contiguous bands, equi-join
    ids sharing a band value (by pigeonhole EXHAUSTIVE for hamming <=
    n_bands-1; above that the same high-recall heuristic every
    banded-LSH step here uses), cap pathological bands at
    ``max_bucket`` ids (all-black thumbnails / silence — the
    boilerplate skew cap, visible as dropped buckets, not silent
    O(n^2)), then the EXACT bit_count(xor) recheck JVM-side. Only
    (id, 64-bit) rows ever shuffle.

    ``n_bands="auto"`` picks the guaranteed-recall geometry via
    auto_bands (smallest 64-divisor >= max_hamming + 1) — see there for
    the band-width/bucket-cardinality price; the integer default stays
    4 (the measured-recall heuristic every banded step here uses,
    quantifiable per corpus with hamming_calibration).

    ``group_col`` (r11): when named (a column of ``hashes``), the
    funnel keys by (group, band, value) instead of (band, value) —
    cross-group pairs are IMPOSSIBLE by key construction and the
    bucket cap applies per group, so running N groups through one
    call is row-for-row identical to N separate per-group funnels
    while paying ONE job (the by-source media triage's shape: all
    sources in one keyed pass)."""
    if n_bands == "auto":
        n_bands = auto_bands(max_hamming)
    if 64 % n_bands:
        raise ValueError(f"n_bands must divide 64 (got {n_bands}): "
                         "uneven bands would leave uncovered bits and "
                         "silently drop candidates")
    width = 64 // n_bands
    mask = (1 << width) - 1
    gcols = [group_col] if group_col else []
    keys = gcols + ["band", "val"]
    bands = hashes.select(
        "id", "phash", *gcols, F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.expr(f"shiftrightunsigned(phash, {b * width}) "
                            f"& {mask}").alias("val"))
            for b in range(n_bands)])).alias("bk")) \
        .select("id", "phash", *gcols, F.col("bk.band").alias("band"),
                F.col("bk.val").alias("val"))
    ok = (bands.groupBy(*keys)
          .agg(F.count(F.lit(1)).alias("__n"))
          .where(F.col("__n") <= max_bucket)
          .select(*keys))
    bands = bands.join(ok, keys, "semi")
    a = bands.select(F.col("id").alias("id_a"),
                     F.col("phash").alias("pa"), *keys)
    b = bands.select(F.col("id").alias("id_b"),
                     F.col("phash").alias("pb"), *keys)
    cand = (a.join(b, keys)
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "pa", "pb").distinct())
    return (cand.withColumn("hamming",
                            F.expr("bit_count(pa ^ pb)"))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
            .orderBy("id_a", "id_b"))


def hamming_calibration(hashes: DataFrame, max_hamming: int = 6,
                        n_bands: int | str = 4, max_bucket: int = 1024,
                        max_sample: int = 2048) -> DataFrame:
    """Measured recall of the banded Hamming funnel against exhaustive
    O(n^2) ground truth on a bounded deterministic sample — the
    minhash_calibration analogue for the 64-bit-signature family
    (image pHash / audio fingerprint / SimHash codes all feed the same
    funnel). The funnel is pigeonhole-EXHAUSTIVE only for hamming <=
    n_bands - 1; pairs differing in n_bands..max_hamming bits spread
    across every band are heuristically recalled, and an operator
    raising max_hamming (say to 16 at the default 4 bands) should SEE
    that recall cost on a sample BEFORE a 100 TB run commits to the
    geometry. Output per distance d in 0..max_hamming: (hamming,
    n_true_pairs, n_found_pairs, recall) — recall NULL where no true
    pair exists at that distance.

    Cost shape: the sample is the lowest ``max_sample`` ids (bounded,
    deterministic); the FUNNEL side runs the real hamming_neardup_pairs
    subplan on that sample (same banding/cap code path the production
    run uses); ground truth is one bounded driver-side numpy popcount
    over the sample's 64-bit codes (chunked XOR + unpackbits — at the
    default 2048 sample that is 2M pair popcounts, metadata-scale).
    Rows-only by nature (the ground-truth matrix is no SQL engine's);
    pytest pins recall == 1.0 below the pigeonhole bound and the
    measured drop above it."""
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    # Materialize the sample ONCE and feed both sides from the same
    # collected rows: orderBy(id).limit is not a stable selection under
    # duplicate/tied ids, so evaluating it in two independent jobs
    # (collect for ground truth, then the funnel) could hand each side
    # different rows and make recall disagree (even exceed 1).
    proj = hashes.select("id", "phash")
    rows = proj.orderBy("id").limit(max_sample).collect()
    sample = hashes.sparkSession.createDataFrame(rows, proj.schema)
    h = np.array([r["phash"] for r in rows],
                 dtype=np.int64).astype(np.uint64)
    n = len(h)
    true_counts = np.zeros(max_hamming + 1, dtype=np.int64)
    chunk = 256
    for lo in range(0, n, chunk):
        X = (h[lo:lo + chunk, None] ^ h[None, :])
        bits = np.unpackbits(X.view(np.uint8).reshape(len(X), n, 8),
                             axis=2).sum(axis=2, dtype=np.int64)
        for d in range(max_hamming + 1):
            # count only i < j (upper triangle in global indexing)
            eq = bits == d
            jj = np.arange(n)[None, :]
            ii = (lo + np.arange(len(X)))[:, None]
            true_counts[d] += int((eq & (ii < jj)).sum())
    found = hamming_neardup_pairs(
        sample, max_hamming=max_hamming, n_bands=n_bands,
        max_bucket=max_bucket)
    fc = {int(r["hamming"]): int(r["n"])
          for r in found.groupBy("hamming")
          .agg(F.count(F.lit(1)).alias("n")).collect()}
    out = []
    for d in range(max_hamming + 1):
        t, g = int(true_counts[d]), fc.get(d, 0)
        out.append((d, t, g, sig6_py(g / t) if t else None))
    return hashes.sparkSession.createDataFrame(
        out, "hamming int, n_true_pairs bigint, n_found_pairs bigint, "
             "recall string")


def image_neardup_pairs(df: DataFrame, max_hamming: int = 6,
                        n_bands: int | str = 4, max_bucket: int = 1024,
                        payload_col: str = "payload",
                        id_col: str = "id") -> DataFrame:
    """Near-duplicate image pairs: (id_a, id_b, hamming) for decodable
    payloads whose pHashes differ in <= ``max_hamming`` of 64 bits —
    re-encodes, slight crops/noise of the same picture. One Arrow hash
    pass, then the shared hamming_neardup_pairs funnel."""
    hs = image_phash(df, payload_col=payload_col, id_col=id_col) \
        .where(F.col("decoded")).select("id", "phash")
    # the funnel references its input three times (bucket-cap agg +
    # both join sides): checkpoint so the Arrow decode pass runs once
    return hamming_neardup_pairs(hs.localCheckpoint(),
                                 max_hamming=max_hamming,
                                 n_bands=n_bands, max_bucket=max_bucket)


def audio_fingerprint64(rate: int, samples: np.ndarray) -> int:
    """64-bit audio fingerprint: the Haitsma-Kalker sign-of-energy-
    difference construction ("A Highly Robust Audio Fingerprint
    System", ISMIR 2002) on a 17-frame x 5-band energy grid —
    bit(n, m) = [ (E[n+1,m] - E[n+1,m+1]) - (E[n,m] - E[n,m+1]) > 0 ],
    16 x 4 = 64 bits. Signs of band-energy differences survive
    re-encoding and additive noise; absolute levels do not. Pure
    numpy; deterministic."""
    mono = samples.astype(np.float64).mean(axis=1)
    n_frames, n_bands_ = 17, 5
    if len(mono) < n_frames * 2:
        mono = np.pad(mono, (0, n_frames * 2 - len(mono)))
    flen = len(mono) // n_frames
    # all 17 frames in ONE batched rfft (the per-frame loop was the
    # measured hot spot at corpus scale), band sums via one matmul
    frames = mono[:n_frames * flen].reshape(n_frames, flen)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    n_bins = power.shape[1]
    edges = np.unique(np.round(
        np.logspace(0, np.log10(n_bins), n_bands_ + 1)).astype(int))
    while len(edges) < n_bands_ + 1:           # degenerate tiny frames
        edges = np.append(edges, edges[-1] + 1)
    ind = np.zeros((n_bins, n_bands_))
    for m in range(n_bands_):
        lo, hi = edges[m], max(edges[m + 1], edges[m] + 1)
        ind[lo:min(hi, n_bins), m] = 1.0
    E = power @ ind                            # (n_frames, n_bands)
    D = E[:, :-1] - E[:, 1:]                   # in-frame band diffs
    bits = ((D[1:] - D[:-1]) > 0).flatten()    # 16 x 4 sign bits
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_fingerprint(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "id") -> DataFrame:
    """(id, decoded, phash) over a binary audio column: the 64-bit
    Haitsma-Kalker fingerprint for every decodable WAV payload,
    decoded=false degradation for the rest. ONE Arrow pass; the
    column is named ``phash`` so the frame feeds the shared
    hamming_neardup_pairs funnel directly."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:       # NULL payload: degrade, not crash
                    rows.append((int(i), False, None))
                    continue
                try:
                    rate, _, samples = decode_wav(bytes(p))
                    rows.append((int(i), True,
                                 audio_fingerprint64(rate, samples)))
                except (NotImplementedError, ValueError, IndexError,
                        struct.error):
                    rows.append((int(i), False, None))
            yield pd.DataFrame(rows, columns=["id", "decoded", "phash"])

    return (df.select(id_col, payload_col)
            .mapInPandas(batches, "id bigint, decoded boolean, "
                                  "phash bigint"))


def audio_neardup_pairs(df: DataFrame, max_hamming: int = 8,
                        n_bands: int | str = 4, max_bucket: int = 1024,
                        payload_col: str = "payload",
                        id_col: str = "id") -> DataFrame:
    """Near-duplicate audio pairs — re-encoded / noise-overlaid copies
    of the same clip: the audio twin of image_neardup_pairs, one Arrow
    fingerprint pass into the shared banded Hamming funnel."""
    hs = audio_fingerprint(df, payload_col=payload_col, id_col=id_col) \
        .where(F.col("decoded")).select("id", "phash")
    # same three-branch funnel input as image_neardup_pairs: one decode
    return hamming_neardup_pairs(hs.localCheckpoint(),
                                 max_hamming=max_hamming,
                                 n_bands=n_bands, max_bucket=max_bucket)


def media_fingerprints(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "id") -> DataFrame:
    """(id, kind, decoded, phash) over a MIXED binary payload column in
    ONE Arrow pass: each row's container magic bytes are sniffed
    in-batch (P6/P3/BM -> image, RIFF....WAVE -> audio) and dispatched
    to that modality's decoder + 64-bit fingerprint (DCT pHash /
    Haitsma-Kalker); unknown containers and NULL payloads degrade to
    (kind='unknown', decoded=false), malformed payloads of a recognized
    container keep their sniffed kind with decoded=false (the triage
    distinction between "not media" and "broken media"). This is the
    single-scan primitive under the mixed-modality dataset card and
    media_dedup_corpus(kind='auto'): the payload BYTES are read once,
    and everything downstream — per-modality funnels, summaries, keep
    sets — works on the tiny (id, 64-bit) fingerprint frame. The same
    magic-byte dispatch as decode_image/decode_wav themselves, so a
    single-kind pass over a pure column produces identical hashes
    (pytest-pinned)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    rows.append((int(i), "unknown", False, None))
                    continue
                b = bytes(p)
                if b[:2] in (b"P6", b"P3", b"BM"):
                    kind = "image"
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    kind = "audio"
                else:
                    rows.append((int(i), "unknown", False, None))
                    continue
                try:
                    if kind == "image":
                        h = phash64(decode_image(b))
                    else:
                        rate, _, samples = decode_wav(b)
                        h = audio_fingerprint64(rate, samples)
                    rows.append((int(i), kind, True, h))
                except (NotImplementedError, ValueError, IndexError,
                        struct.error):
                    rows.append((int(i), kind, False, None))
            yield pd.DataFrame(
                rows, columns=["id", "kind", "decoded", "phash"])

    return (df.select(id_col, payload_col)
            .mapInPandas(batches, "id bigint, kind string, "
                                  "decoded boolean, phash bigint"))


def media_dedup_corpus(df: DataFrame, kind: str = "image",
                       max_hamming: int | None = None,
                       n_bands: int | str = 4, max_bucket: int = 1024,
                       payload_col: str = "payload",
                       id_col: str = "id") -> DataFrame:
    """The near-dup-DEDUPLICATED media corpus: one representative (the
    lowest id) per perceptual-hash near-dup cluster — the image/audio
    twin of dedup.dedup_corpus, closing the pipeline from pairs to an
    actionable keep set. Pairs come from the modality's fingerprint +
    the shared Hamming funnel; transitive links collapse via the same
    large-star/small-star connected-components step text dedup uses
    (O(log n) rounds, edge-list-sized work); undecodable payloads are
    their own singletons (kept — failing to decode is a triage signal,
    not a dedup decision).

    ``kind="auto"`` (r9): a MIXED payload column — the keep-set twin of
    dataset_card's media_kind='auto'. One media_fingerprints pass
    sniffs each row's container and fingerprints it with its own
    modality's hash; per-modality funnels (each at its own default
    threshold unless ``max_hamming`` overrides both) feed ONE
    connected-components step over the union of pair lists (cross-kind
    pairs cannot exist — the funnels never mix kinds). Unknown
    containers are kept as singletons like undecodable payloads. A
    pure single-kind column through 'auto' keeps exactly what the
    explicit kind keeps (pytest-pinned)."""
    from flink_descriptive_stats_spark.operators.dedup import \
        connected_components_star
    if kind == "image":
        hs = image_phash(df, payload_col=payload_col, id_col=id_col)
    elif kind == "audio":
        hs = audio_fingerprint(df, payload_col=payload_col,
                               id_col=id_col)
    elif kind == "auto":
        hs = media_fingerprints(df, payload_col=payload_col,
                                id_col=id_col)
    else:
        raise ValueError(f"unknown media kind: {kind!r}")
    # The fingerprint frame feeds three plan branches (funnel pairs, CC
    # node list, undecodable singletons): materialize it once so the
    # payload Arrow pass runs ONCE, not per branch — the same
    # localCheckpoint discipline connected_components_star applies to
    # its edge list. The checkpointed frame is (id, 64-bit)-scale,
    # never the bytes.
    hs = hs.localCheckpoint()
    if kind == "auto":
        dec = hs.where(F.col("decoded"))
        per_kind = []
        for k, mh_k in (("image", 6), ("audio", 8)):
            per_kind.append(hamming_neardup_pairs(
                dec.where(F.col("kind") == k).select("id", "phash"),
                max_hamming=mh_k if max_hamming is None else max_hamming,
                n_bands=n_bands, max_bucket=max_bucket))
        pairs = per_kind[0].unionByName(per_kind[1])
        dec = dec.select("id", "phash")
    else:
        mh = ((6 if kind == "image" else 8)
              if max_hamming is None else max_hamming)
        dec = hs.where(F.col("decoded")).select("id", "phash")
        pairs = hamming_neardup_pairs(dec, max_hamming=mh,
                                      n_bands=n_bands,
                                      max_bucket=max_bucket)
    labels = connected_components_star(
        pairs.select(F.col("id_a").alias("u"),
                     F.col("id_b").alias("v")),
        dec.select("id"))
    reps = (labels.where(F.col("id") == F.col("cluster_id"))
            .select(F.col("id").alias(id_col)))
    undecodable = hs.where(~F.col("decoded")) \
        .select(F.col("id").alias(id_col))
    return df.join(reps.unionByName(undecodable), id_col, "semi")

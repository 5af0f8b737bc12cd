"""Multimodal columns: opaque binary payloads + typed metadata (SURVEY add-on).

Image/audio/video live as ``large_binary`` columns with metadata struct
columns; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The decode kernels themselves are STUBBED
(``decoder="fake"`` — this container has no image/audio libs; a real
deployment passes ``decoder="pil"``/"av" and the import-gated branch
raises ``NotImplementedError`` if the lib is missing). The Ray-side
plumbing — schemas, batch sizing for large binary rows, actor
``__init__`` state, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("media_type", pa.string()),      # image | audio | video
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("width", pa.int32()),            # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic fake payloads for media refs (the sandbox 'blob store')."""
    types, payloads, widths, heights, durs = [], [], [], [], []
    for r in refs:
        h = hashlib.blake2b(f"{seed}|{r}".encode(), digest_size=16).digest()
        t = ("image", "audio", "video")[h[0] % 3]
        types.append(t)
        payloads.append(h * (8 + h[1] % 8))  # 128-256 bytes of deterministic noise
        widths.append(64 + h[2] * 4 if t != "audio" else 0)
        heights.append(64 + h[3] * 4 if t != "audio" else 0)
        durs.append(1000 + h[4] * 100 if t != "image" else 0)
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "media_type": pa.array(types, pa.string()),
                     "payload": pa.array(payloads, pa.large_binary()),
                     "width": pa.array(widths, pa.int32()),
                     "height": pa.array(heights, pa.int32()),
                     "duration_ms": pa.array(durs, pa.int32())}).cast(MEDIA_SCHEMA)


class MediaFeatureStage:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``__init__`` loads the decoder ONCE per actor (model-weights
    analogue). Use small ``batch_size`` (e.g. 32) with this stage —
    payload bytes dominate block size. Emits a fixed-width float32
    feature vector + decoded metadata.
    """

    FEATURE_DIM = 16

    def __init__(self, decoder: str = "fake"):
        if decoder != "fake":
            try:  # pragma: no cover - import-gated real path
                raise ImportError(decoder)
            except ImportError as e:
                raise NotImplementedError(
                    f"decoder '{decoder}' not available in this environment; "
                    "use decoder='fake' (deterministic stub)") from e
        self.decoder = decoder

    def _features(self, payload: bytes) -> np.ndarray:
        # deterministic fake "embedding": bytes -> blake2b -> 16 floats in [0,1)
        h = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM * 4).digest()
        u = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
        return (u / 2**32).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self._features(p or b"") for p in payloads]
        out = batch.drop_columns(["payload"])  # features replace heavy bytes
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32())))


class ImageResizeStage:
    """Resize plumbing: validates metadata, computes target dims, stubs pixels."""

    def __init__(self, max_side: int = 256, decoder: str = "fake"):
        self.max_side = max_side
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy().astype(np.float64)
        h = batch.column("height").to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(np.maximum(w, h), 1))
        return (batch
                .append_column("out_width", pa.array((w * scale).astype(np.int32)))
                .append_column("out_height", pa.array((h * scale).astype(np.int32))))


class FrameSampleStage:
    """Video frame-sampling plumbing: 1 row per sampled frame timestamp."""

    def __init__(self, fps: float = 1.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        types = batch.column("media_type").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        o_ref, o_ts = [], []
        for r, t, d in zip(refs, types, durs):
            if t != "video" or not d:
                continue
            step = int(1000 / self.fps)
            for ts in range(0, int(d), step):
                o_ref.append(r)
                o_ts.append(ts)
        return pa.table({"media_ref": pa.array(o_ref, pa.string()),
                         "frame_ts_ms": pa.array(o_ts, pa.int32())})


# ---------------------------------------------------------------------------
# REAL image decode: P6 PPM (pure numpy — no image libs needed)
# ---------------------------------------------------------------------------

def encode_ppm(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary P6 PPM."""
    h, w = rgb.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary P6 PPM to an (h, w, 3) uint8 array — a REAL
    image decoder with zero external deps (the import-gated PIL path
    stays for formats that need it). Handles whitespace and ``#``
    comments per the netpbm spec; raises ValueError on malformed
    input."""
    if payload[:2] != b"P6":
        raise ValueError("decode_ppm: not a P6 PPM")
    # tokenize header: magic, width, height, maxval (comments skipped)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("decode_ppm: only maxval 255 supported")
    need = w * h * 3
    raw = payload[pos:pos + need]
    if len(raw) != need:
        raise ValueError("decode_ppm: truncated pixel data")
    return np.frombuffer(raw, np.uint8).reshape(h, w, 3)


def synth_ppm_table(refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic REAL P6 payloads per media ref (the sandbox 'blob
    store' for the decode path): size and pixel pattern are pure
    functions of (seed, ref)."""
    payloads, widths, heights = [], [], []
    for r in refs:
        hsh = hashlib.blake2b(f"{seed}|ppm|{r}".encode(),
                              digest_size=16).digest()
        w = 8 + hsh[0] % 25
        h = 8 + hsh[1] % 25
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack([
            (xx * (1 + hsh[2]) + hsh[3]) % 256,
            (yy * (1 + hsh[4]) + hsh[5]) % 256,
            ((xx + yy) * (1 + hsh[6]) + hsh[7]) % 256,
        ], axis=-1).astype(np.uint8)
        payloads.append(encode_ppm(rgb))
        widths.append(w)
        heights.append(h)
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "payload": pa.array(payloads, pa.large_binary()),
                     "width": pa.array(widths, pa.int32()),
                     "height": pa.array(heights, pa.int32())})


class ImageStatsStage:
    """Actor-pool/worker-singleton stage: REAL decode (P6 PPM, pure
    numpy) + per-image statistics — decoded width/height, per-channel
    means (integer pixel sums / pixel count: ONE division, exact), and
    an 8-bin integer-luma histogram (luma = (r*299 + g*587 + b*114)
    // 1000, bin = luma // 32 — all-integer, bit-reproducible). Use
    small ``batch_size``: payload bytes dominate block size."""

    def __init__(self, decoder: str = "ppm"):
        if decoder != "ppm":  # pragma: no cover - import-gated
            raise NotImplementedError(
                "only the dependency-free ppm decoder ships in-sandbox")
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        out = {"media_ref": refs, "width": [], "height": [],
               "mean_r": [], "mean_g": [], "mean_b": []}
        hist = np.zeros((len(refs), 8), np.int64)
        for i, payload in enumerate(batch.column("payload").to_pylist()):
            img = decode_ppm(payload)
            h, w = img.shape[:2]
            out["width"].append(w)
            out["height"].append(h)
            px = img.reshape(-1, 3).astype(np.int64)
            npx = px.shape[0]
            sums = px.sum(axis=0)
            out["mean_r"].append(float(sums[0]) / float(npx))
            out["mean_g"].append(float(sums[1]) / float(npx))
            out["mean_b"].append(float(sums[2]) / float(npx))
            luma = (px[:, 0] * 299 + px[:, 1] * 587
                    + px[:, 2] * 114) // 1000
            hist[i] = np.bincount(luma // 32, minlength=8)[:8]
        t = pa.table({
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "width": pa.array(out["width"], pa.int32()),
            "height": pa.array(out["height"], pa.int32()),
            "mean_r": pa.array(out["mean_r"], pa.float64()),
            "mean_g": pa.array(out["mean_g"], pa.float64()),
            "mean_b": pa.array(out["mean_b"], pa.float64())})
        for b in range(8):
            t = t.append_column(f"luma_{b}", pa.array(hist[:, b]))
        return t


# ---------------------------------------------------------------------------
# REAL audio decode: PCM16 WAV (pure numpy — no audio libs needed)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode mono int16 samples as a canonical 44-byte-header PCM WAV."""
    import struct
    data = samples.astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                   rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(payload: bytes):
    """Decode a PCM16 mono WAV to (samples: int16 array, rate) — a
    REAL audio decoder with zero external deps. Walks RIFF chunks (so
    LIST/INFO chunks before ``data`` are fine); raises ValueError on
    non-PCM16-mono input."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE stream")
    pos, rate, nch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, nch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                raise ValueError("decode_wav: only PCM supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("decode_wav: missing fmt or data chunk")
    if nch != 1 or bits != 16:
        raise ValueError("decode_wav: only 16-bit mono supported")
    return np.frombuffer(data, "<i2"), rate


def synth_wav_table(refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic REAL PCM16 payloads per media ref (sawtooth +
    hash-seeded phase/period; length and content are pure functions
    of (seed, ref))."""
    payloads, rates, nsamp = [], [], []
    for r in refs:
        hsh = hashlib.blake2b(f"{seed}|wav|{r}".encode(),
                              digest_size=16).digest()
        n = 256 + hsh[0] * 16
        period = 16 + hsh[1] % 64
        phase = hsh[2]
        t = np.arange(n, dtype=np.int64)
        s = ((((t + phase) % period) * 2048 // period) - 1024) \
            .astype(np.int16)
        payloads.append(encode_wav(s, rate=8000 * (1 + hsh[3] % 2)))
        rates.append(8000 * (1 + hsh[3] % 2))
        nsamp.append(n)
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "payload": pa.array(payloads, pa.large_binary())})


class AudioStatsStage:
    """Worker-singleton stage: REAL WAV decode + per-clip statistics —
    sample count, rate, duration_ms (integer), peak (integer), RMS
    (integer sum of squares / n, then ONE sqrt — correctly-rounded
    IEEE, bit-reproducible), and zero-crossing count (integer)."""

    def __init__(self, decoder: str = "wav"):
        if decoder != "wav":  # pragma: no cover - import-gated
            raise NotImplementedError(
                "only the dependency-free wav decoder ships in-sandbox")

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        ns, rs, dur, peak, rms, zc = [], [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            s, rate = decode_wav(payload)
            x = s.astype(np.int64)
            n = len(x)
            ns.append(n)
            rs.append(rate)
            dur.append(n * 1000 // rate)
            peak.append(int(np.abs(x).max()) if n else 0)
            rms.append(float(np.sqrt(float(int((x * x).sum()))
                                     / float(n))) if n else 0.0)
            zc.append(int(((x[1:] < 0) != (x[:-1] < 0)).sum())
                      if n > 1 else 0)
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "n_samples": pa.array(ns, pa.int64()),
            "rate": pa.array(rs, pa.int64()),
            "duration_ms": pa.array(dur, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
            "rms": pa.array(rms, pa.float64()),
            "zero_crossings": pa.array(zc, pa.int64())})


# ---------------------------------------------------------------------------
# REAL video decode: YUV4MPEG2 (y4m, C444 8-bit — pure numpy)
# ---------------------------------------------------------------------------

def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (n, h, w, 3) uint8 YUV444 frames as a YUV4MPEG2 stream."""
    n, h, w = frames.shape[:3]
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for f in frames:
        out.append(b"FRAME\n")
        # y4m stores planar: full Y plane, then U, then V
        out.append(f[:, :, 0].tobytes())
        out.append(f[:, :, 1].tobytes())
        out.append(f[:, :, 2].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """Decode a YUV4MPEG2 (C444 8-bit) stream to ((n, h, w, 3) uint8
    frames, fps) — a REAL video decoder with zero external deps.
    Raises ValueError on non-C444 or malformed streams."""
    nl = payload.index(b"\n")
    head = payload[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError("decode_y4m: not a YUV4MPEG2 stream")
    w = h = fps = None
    colorspace = b"C420jpeg"  # y4m default when absent
    for tok in head[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
        elif tok[:1] == b"C":
            colorspace = tok
    if w is None or h is None:
        raise ValueError("decode_y4m: missing W/H header")
    if colorspace != b"C444":
        raise ValueError("decode_y4m: only C444 supported")
    plane = w * h
    pos, frames = nl + 1, []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("decode_y4m: bad FRAME marker")
        pos = fnl + 1
        raw = payload[pos:pos + 3 * plane]
        if len(raw) != 3 * plane:
            raise ValueError("decode_y4m: truncated frame")
        yuv = np.frombuffer(raw, np.uint8).reshape(3, h, w)
        frames.append(np.stack([yuv[0], yuv[1], yuv[2]], axis=-1))
        pos += 3 * plane
    return (np.stack(frames) if frames
            else np.zeros((0, h, w, 3), np.uint8)), fps


def synth_y4m_table(refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic REAL y4m payloads per media ref: frame count,
    dims and a per-frame drifting gradient are pure functions of
    (seed, ref)."""
    payloads = []
    for r in refs:
        hsh = hashlib.blake2b(f"{seed}|y4m|{r}".encode(),
                              digest_size=16).digest()
        n = 4 + hsh[0] % 21
        w = 8 + hsh[1] % 9
        h = 8 + hsh[2] % 9
        fi = np.arange(n, dtype=np.int64)[:, None, None]
        yy, xx = np.mgrid[0:h, 0:w]
        frames = np.stack([
            (xx[None] * (1 + hsh[3]) + fi * 7 + hsh[4]) % 256,
            (yy[None] * (1 + hsh[5]) + fi * 11 + hsh[6]) % 256,
            ((xx + yy)[None] * (1 + hsh[7]) + fi * 13) % 256,
        ], axis=-1).astype(np.uint8)
        payloads.append(encode_y4m(frames, fps=25))
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "payload": pa.array(payloads, pa.large_binary())})


class VideoFrameSampleStage:
    """Worker-singleton stage: REAL y4m decode + every-k-th frame
    sampling (the multimodal brief's frame-sample op) — emits one row
    per SAMPLED frame with (media_ref, frame_idx, n_frames, fps,
    width, height, mean_y): mean luma is an integer pixel sum / count,
    ONE division, exact."""

    def __init__(self, every_k: int = 5, decoder: str = "y4m"):
        if decoder != "y4m":  # pragma: no cover - import-gated
            raise NotImplementedError(
                "only the dependency-free y4m decoder ships in-sandbox")
        self.k = int(every_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, fidx, nfr, fpss, ws, hs, my = [], [], [], [], [], [], []
        for ref, payload in zip(batch.column("media_ref").to_pylist(),
                                batch.column("payload").to_pylist()):
            frames, fps = decode_y4m(payload)
            n, h, w = frames.shape[:3]
            for i in range(0, n, self.k):
                y = frames[i, :, :, 0].astype(np.int64)
                refs.append(ref)
                fidx.append(i)
                nfr.append(n)
                fpss.append(fps)
                ws.append(w)
                hs.append(h)
                my.append(float(int(y.sum())) / float(h * w))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "n_frames": pa.array(nfr, pa.int64()),
            "fps": pa.array(fpss, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_y": pa.array(my, pa.float64())})


def ahash64(rgb: np.ndarray) -> int:
    """64-bit AVERAGE perceptual hash (aHash) of an (h, w, 3) uint8
    image, ALL-INTEGER: integer luma (299r + 587g + 114b), 8×8
    nearest-neighbor downsample (pure copies — no resample
    arithmetic), bit i set iff sample_i·64 > Σ samples (the
    cross-multiplied mean comparison — no division anywhere, so the
    hash is exactly reproducible on any platform)."""
    h, w = rgb.shape[:2]
    luma = (rgb[..., 0].astype(np.int64) * 299
            + rgb[..., 1].astype(np.int64) * 587
            + rgb[..., 2].astype(np.int64) * 114)
    ys = (np.arange(8, dtype=np.int64) * h) // 8
    xs = (np.arange(8, dtype=np.int64) * w) // 8
    samp = luma[np.ix_(ys, xs)].ravel()
    total = int(samp.sum())
    bits = (samp * 64 > total).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum()
               .view(np.int64))


class ImageAHashStage:
    """Worker-singleton stage: REAL P6 decode + 64-bit integer aHash
    per payload — the perceptual fingerprint feeding image near-dup
    (the visual sibling of simhash over text)."""

    def __init__(self, decoder: str = "ppm"):
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for payload in batch.column("payload").to_pylist():
            hashes.append(ahash64(decode_ppm(payload)))
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "ahash": pa.array(hashes, pa.int64())})


def synth_ppm_table_planted(refs: list[str], n_images: int = 64,
                            seed: int = 42) -> pa.Table:
    """Blob store WITH PLANTED DUPLICATES: each ref maps to one of
    ``n_images`` canonical images via md5(ref) — the controlled
    corpus for grading image dedup end-to-end (the near_dup_lsh
    planted-corpus precedent)."""
    import hashlib as _hl
    cids = [int.from_bytes(_hl.md5(r.encode()).digest()[8:],
                           "little") % n_images for r in refs]
    uniq = sorted(set(cids))
    canon = synth_ppm_table([f"img{c:04d}" for c in uniq], seed=seed)
    by_id = dict(zip(uniq, canon.column("payload").to_pylist()))
    payloads = [by_id[c] for c in cids]
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "payload": pa.array(payloads, pa.large_binary())})


def image_dedup_groups(blob_ds, num_partitions: int = 16):
    """EXACT perceptual dedup: group images by 64-bit aHash, emit one
    row per distinct image (rep_ref = lexicographically smallest ref,
    n_refs = group size) — the image-side content-hash dedup service
    (the crawl's text content-hash dedup, stages/dedup.py, applied to
    pixels through a REAL decoder).

    Scale shape: decode + hash in ``map_batches`` (worker-local
    decoder), then ONE hash-keyed exchange groups O(distinct images)
    rows; min-ref/count reduce inside the partitions."""
    import pandas as pd

    from .shuffles import int_part_map

    hashed = blob_ds.map_batches(ImageAHashStage(),
                                 batch_format="pyarrow", batch_size=32)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "ahash": np.array([], np.int64),
                "rep_ref": np.array([], object),
                "n_refs": np.array([], np.int64)})
        g = df.groupby("ahash", sort=True)
        return pd.DataFrame({
            "ahash": np.array(list(g.groups), np.int64),
            "rep_ref": g["media_ref"].min().to_numpy(),
            "n_refs": g.size().to_numpy(np.int64)})

    return int_part_map(hashed, "ahash", per_partition,
                        num_partitions=num_partitions)


def synth_y4m_table_scenes(refs: list[str], seed: int = 42,
                           n_scenes_max: int = 4) -> pa.Table:
    """synth_y4m_table twin that PLANTS abrupt scene cuts: each ref's
    stream has 1..n_scenes_max scenes; frames drift gently within a
    scene (small successive SAD) and jump to a fresh hash-derived
    base at each cut (large SAD). Scene count/positions are pure
    functions of (seed, ref) so tests can recompute the planted
    truth."""
    payloads = []
    for r in refs:
        hsh = hashlib.blake2b(f"{seed}|scenes|{r}".encode(),
                              digest_size=24).digest()
        n_scenes = 1 + hsh[0] % n_scenes_max
        w = 8 + hsh[1] % 9
        h = 8 + hsh[2] % 9
        frames = []
        for si in range(n_scenes):
            ln = 3 + hsh[3 + si] % 5
            base = int(hsh[8 + si]) * 97 % 251
            yy, xx = np.mgrid[0:h, 0:w]
            for fi in range(ln):
                frames.append(np.stack([
                    (xx * 2 + base + fi) % 256,
                    (yy * 3 + base * 2 + fi) % 256,
                    ((xx + yy) + base * 3 + fi) % 256,
                ], axis=-1).astype(np.uint8))
        payloads.append(encode_y4m(np.stack(frames), fps=25))
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "payload": pa.array(payloads, pa.large_binary())})


class VideoSceneStage:
    """Worker-singleton stage: REAL y4m decode + scene-cut detection
    by EXACT integer SAD on the Y plane — a cut at frame t whenever
    sum|Y_t − Y_{t−1}| > thresh_per_px · h · w. Emits one row per
    detected cut (media_ref, cut_idx, sad) plus a sentinel row
    (cut_idx = -1, sad = n_frames) per stream so fully-smooth videos
    still report their frame count. Integer arithmetic only —
    deterministic across partitionings."""

    def __init__(self, thresh_per_px: int = 30):
        self.thresh = int(thresh_per_px)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, cuts, sads = [], [], []
        for ref, payload in zip(
                batch.column("media_ref").to_pylist(),
                batch.column("payload").to_pylist()):
            frames, _fps = decode_y4m(payload)
            n = len(frames)
            refs.append(ref)
            cuts.append(-1)
            sads.append(n)
            if n < 2:
                continue
            y = frames[:, :, :, 0].astype(np.int64)
            sad = np.abs(y[1:] - y[:-1]).sum(axis=(1, 2))
            lim = self.thresh * y.shape[1] * y.shape[2]
            for i in np.flatnonzero(sad > lim):
                refs.append(ref)
                cuts.append(int(i) + 1)
                sads.append(int(sad[i]))
        return pa.table({"media_ref": pa.array(refs, pa.string()),
                         "cut_idx": pa.array(cuts, pa.int64()),
                         "sad": pa.array(sads, pa.int64())})


class AudioFingerprintStage:
    """Worker-singleton stage: REAL RIFF/WAV decode + spectral-peak
    landmark fingerprints (the Shazam shape): 256-sample frames, hop
    128, rfft magnitude per frame, peak bin per frame (ties -> lower
    bin), landmark hash = peak[i] * 4096 + peak[i+1] for consecutive
    frames. FFT magnitudes are floats but only the ARGMAX is kept, so
    the fingerprint is deterministic for a given numpy. Emits
    (media_ref, frame_idx, fp_hash)."""

    def __init__(self, frame: int = 256, hop: int = 128):
        self.frame = int(frame)
        self.hop = int(hop)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, hashes = [], [], []
        for ref, payload in zip(
                batch.column("media_ref").to_pylist(),
                batch.column("payload").to_pylist()):
            samples, _rate = decode_wav(payload)
            x = np.asarray(samples, np.float64)
            F, H = self.frame, self.hop
            if len(x) < F + H:
                continue
            n_frames = (len(x) - F) // H + 1
            idx = (np.arange(F)[None, :]
                   + H * np.arange(n_frames)[:, None])
            mags = np.abs(np.fft.rfft(x[idx], axis=1))
            mags[:, 0] = 0.0  # ignore DC
            peaks = np.argmax(mags, axis=1)
            for i in range(n_frames - 1):
                refs.append(ref)
                idxs.append(i)
                hashes.append(int(peaks[i]) * 4096 + int(peaks[i + 1]))
        return pa.table({"media_ref": pa.array(refs, pa.string()),
                         "frame_idx": pa.array(idxs, pa.int64()),
                         "fp_hash": pa.array(hashes, pa.int64())})

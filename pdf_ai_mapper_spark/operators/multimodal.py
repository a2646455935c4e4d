"""Multimodal column operators: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing — schemas, batch iteration, partitioning,
column pruning — is real and tested; the codec kernels themselves are
pluggable, mirroring ``kernels.ocr``: the image/audio libraries are
absent in this runtime, so the default kernels handle the deterministic
stub formats the fixtures emit (PNG header parse; WAV-style header
parse; frame-sampling over a length-prefixed frame container) and a
production deployment swaps in PIL/ffmpeg-backed callables with the
same signatures via ``set_media_kernels``.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

# --------------------------------------------------------------- kernels

PNG_MAGIC = b'\x89PNG\r\n\x1a\n'


def stub_image_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, bit_depth) from a PNG IHDR — a real header
    parse, not a fake (PNG spec §11.2.2)."""
    if not data or not data.startswith(PNG_MAGIC):
        raise ValueError('not a PNG')
    w, h = struct.unpack('>II', data[16:24])
    depth = data[24]
    return int(w), int(h), int(depth)


def stub_image_resize(data: bytes, w: int, h: int) -> bytes:
    """Stub decode→resize→encode. Real kernel: PIL Image.resize.
    Deterministic placeholder keeps the byte-shape contract (returns a
    synthesized header-only PNG of the target size)."""
    if not data or not data.startswith(PNG_MAGIC):
        raise ValueError('not a PNG')
    ihdr = struct.pack('>IIBBBBB', w, h, data[24], 0, 0, 0, 0)
    import zlib
    chunk = struct.pack('>I', len(ihdr)) + b'IHDR' + ihdr + struct.pack(
        '>I', zlib.crc32(b'IHDR' + ihdr) & 0xFFFFFFFF)
    return PNG_MAGIC + chunk


def stub_image_features(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic feature vector from payload bytes (stands in for a
    CNN/CLIP embedding; real kernel raises NotImplementedError until a
    model runtime is wired in). Rolling-hash byte histogram, L2-ish
    normalized."""
    acc = [0] * dim
    h = 2166136261
    for i, byte in enumerate(data[:4096]):
        h = ((h ^ byte) * 16777619) & 0xFFFFFFFF
        acc[i % dim] += (h % 1000) / 1000.0
    norm = sum(x * x for x in acc) ** 0.5 or 1.0
    return [round(x / norm, 6) for x in acc]


def stub_audio_meta(data: bytes) -> tuple[int, int, float]:
    """(sample_rate, channels, duration_s) from a RIFF/WAVE header."""
    if len(data) < 44 or data[:4] != b'RIFF' or data[8:12] != b'WAVE':
        raise ValueError('not a WAV')
    channels, rate = struct.unpack('<HI', data[22:28])
    byte_rate, = struct.unpack('<I', data[28:32])
    data_len = len(data) - 44
    return int(rate), int(channels), round(data_len / max(byte_rate, 1), 6)


def stub_video_frame_sample(data: bytes, every_n: int) -> list[bytes]:
    """Sample every n-th frame from a length-prefixed frame container
    (4-byte big-endian length + payload per frame) — the deterministic
    stand-in for ffmpeg keyframe extraction."""
    frames = []
    pos, idx = 0, 0
    while pos + 4 <= len(data):
        (ln,) = struct.unpack('>I', data[pos:pos + 4])
        frame = data[pos + 4:pos + 4 + ln]
        if idx % every_n == 0:
            frames.append(frame)
        pos += 4 + ln
        idx += 1
    return frames


_KERNELS: dict[str, Callable] = {
    'image_meta': stub_image_meta,
    'image_resize': stub_image_resize,
    'image_features': stub_image_features,
    'audio_meta': stub_audio_meta,
    'video_frames': stub_video_frame_sample,
}


def set_media_kernels(**kernels: Callable) -> None:
    """Swap in production codecs (PIL/ffmpeg/torch) by name."""
    for name, fn in kernels.items():
        if name not in _KERNELS:
            raise KeyError(name)
        _KERNELS[name] = fn


# --------------------------------------------------------------- operators

IMAGE_META_SCHEMA = ('id long, width int, height int, bit_depth int, '
                     'n_bytes long, decode_error string')


def image_metadata(df: DataFrame, id_col: str = 'id',
                   payload_col: str = 'payload') -> DataFrame:
    """Decode image headers per Arrow batch → typed metadata rows.
    Errors become a nullable column, never task failures."""
    def gen(batches: Iterator) -> Iterator:
        import pandas as pd
        meta = _KERNELS['image_meta']
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, depth = meta(bytes(data) if data is not None else b'')
                    rows.append((int(i), w, h, depth,
                                 len(data) if data is not None else 0, None))
                except Exception as e:
                    rows.append((int(i), None, None, None,
                                 len(data) if data is not None else 0, str(e)))
            yield pd.DataFrame(rows, columns=['id', 'width', 'height',
                                              'bit_depth', 'n_bytes',
                                              'decode_error'])

    return df.select(id_col, payload_col).mapInPandas(gen, IMAGE_META_SCHEMA)


def image_embeddings(df: DataFrame, id_col: str = 'id',
                     payload_col: str = 'payload', dim: int = 8) -> DataFrame:
    """Payload → feature vector (array<double>), batched."""
    def gen(batches: Iterator) -> Iterator:
        import pandas as pd
        feat = _KERNELS['image_features']
        for pdf in batches:
            yield pd.DataFrame({
                'id': pdf[id_col].astype('int64'),
                'embedding': [feat(bytes(d) if d is not None else b'', dim)
                              for d in pdf[payload_col]],
            })
    return df.select(id_col, payload_col).mapInPandas(
        gen, 'id long, embedding array<double>')


def audio_metadata(df: DataFrame, id_col: str = 'id',
                   payload_col: str = 'payload') -> DataFrame:
    def gen(batches: Iterator) -> Iterator:
        import pandas as pd
        meta = _KERNELS['audio_meta']
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rate, ch, dur = meta(bytes(data) if data is not None else b'')
                    rows.append((int(i), rate, ch, dur, None))
                except Exception as e:
                    rows.append((int(i), None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=['id', 'sample_rate', 'channels',
                                              'duration_s', 'decode_error'])
    return df.select(id_col, payload_col).mapInPandas(
        gen, 'id long, sample_rate int, channels int, duration_s double, '
             'decode_error string')


def video_sampled_frames(df: DataFrame, every_n: int = 2,
                         id_col: str = 'id',
                         payload_col: str = 'payload') -> DataFrame:
    """One output row per sampled frame (id, frame_idx, frame bytes) —
    the exploding shape a frame-level feature extractor consumes."""
    def gen(batches: Iterator) -> Iterator:
        import pandas as pd
        sample = _KERNELS['video_frames']
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[payload_col]):
                try:
                    for k, frame in enumerate(
                            sample(bytes(data) if data is not None else b'', every_n)):
                        rows.append((int(i), k, frame))
                except Exception:
                    pass
            yield pd.DataFrame(rows, columns=['id', 'frame_idx', 'frame'])
    return df.select(id_col, payload_col).mapInPandas(
        gen, 'id long, frame_idx int, frame binary')

"""Native TFRecord container I/O — no TensorFlow dependency.

Record framing (the TFRecord on-disk format):
    uint64 length | uint32 masked_crc32c(length) | bytes data |
    uint32 masked_crc32c(data)
with crc32c masked as ((crc >> 15 | crc << 17) + 0xa282ead8) mod 2^32.

Used by the Waymo preprocessing path (data/waymo_preprocess.py) so the
framework can ingest .tfrecord sequence files without the TF runtime;
format-compatibility with tf.data.TFRecordDataset is pinned by
tests/test_waymo_tfrecord.py when TF is importable.
"""

from __future__ import annotations

import struct

try:
    import google_crc32c

    def _crc32c(data: bytes) -> int:
        return google_crc32c.value(data)
except ImportError:  # slow pure-python fallback
    _TABLE = []

    def _mk_table():
        poly = 0x82F63B78
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _TABLE.append(c)

    _mk_table()

    def _crc32c(data: bytes) -> int:
        crc = 0xFFFFFFFF
        for b in data:
            crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def write_tfrecord(path, records):
    """records: iterable of bytes."""
    with open(path, "wb") as f:
        for rec in records:
            hdr = struct.pack("<Q", len(rec))
            f.write(hdr)
            f.write(struct.pack("<I", _masked_crc(hdr)))
            f.write(rec)
            f.write(struct.pack("<I", _masked_crc(rec)))


def read_tfrecord(path, verify_crc: bool = False):
    """Yields record bytes."""
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                return
            (length,) = struct.unpack("<Q", hdr)
            hcrc_b = f.read(4)
            data = f.read(length)
            dcrc_b = f.read(4)
            if len(hcrc_b) < 4 or len(data) < length or len(dcrc_b) < 4:
                raise IOError("truncated tfrecord")
            (hcrc,) = struct.unpack("<I", hcrc_b)
            (dcrc,) = struct.unpack("<I", dcrc_b)
            if verify_crc and (_masked_crc(hdr) != hcrc
                               or _masked_crc(data) != dcrc):
                raise IOError("tfrecord crc mismatch")
            yield data

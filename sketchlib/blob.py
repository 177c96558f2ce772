"""Versioned sketch blob format (SURVEY.md Appendix B).

``header = b'SKB1' + sketch_id:u8 + version:u8 + cfg_len:u16le`` followed by
the config JSON (utf-8) and the payload bytes. Blobs are the unit that flows
through Spark as a ``BinaryType`` column; byte-equality of blobs is the
strongest form of the merge-associativity contract (Bloom/HLL/CMS/MinHash).
"""

from __future__ import annotations

import struct

from sketchlib.config import _Cfg, SketchConfigError

MAGIC = b"SKB1"
VERSION = 1

SKETCH_IDS = {
    "bloom": 1,
    "hll": 2,
    "cms": 3,
    "kll": 4,
    "tdigest": 5,
    "minhash": 6,
    "cuckoo": 7,
}
ID_TO_NAME = {v: k for k, v in SKETCH_IDS.items()}

_HDR = struct.Struct("<4sBBH")


def pack(sketch: str, cfg: _Cfg, payload: bytes) -> bytes:
    cfg_json = cfg.to_json().encode("utf-8")
    if len(cfg_json) > 0xFFFF:
        raise SketchConfigError("config JSON too large")
    return _HDR.pack(MAGIC, SKETCH_IDS[sketch], VERSION, len(cfg_json)) + cfg_json + payload


def unpack(blob: bytes) -> tuple[str, _Cfg, bytes]:
    """Return (sketch_name, config, payload)."""
    if len(blob) < _HDR.size:
        raise SketchConfigError("blob too short")
    magic, sid, ver, cfg_len = _HDR.unpack_from(blob, 0)
    if magic != MAGIC:
        raise SketchConfigError(f"bad magic {magic!r}")
    if ver != VERSION:
        raise SketchConfigError(f"unsupported blob version {ver}")
    if sid not in ID_TO_NAME:
        raise SketchConfigError(f"unknown sketch id {sid}")
    off = _HDR.size
    if len(blob) < off + cfg_len:
        raise SketchConfigError(
            f"blob truncated: header says {cfg_len} config bytes, "
            f"{len(blob) - off} available")
    try:
        cfg = _Cfg.from_json(blob[off : off + cfg_len].decode("utf-8"))
    except (UnicodeDecodeError, ValueError, KeyError, TypeError) as e:
        raise SketchConfigError(f"corrupt blob config: {e!r}") from e
    return ID_TO_NAME[sid], cfg, blob[off + cfg_len :]

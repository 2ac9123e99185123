"""Minimal pure-Python CBOR codec (RFC 8949 subset).

Closes the one reference surface this engine documented as N/A: the
``cbors_to_samples`` / ``cbors2_to_samples`` readers
(``webdataset-private/webdataset/cborsiterators.py:6-51``) need only
``cbor.load(stream)`` in a loop — the container has no cbor library, so
this module implements the needed subset directly (~150 lines, no
dependency, executor-safe):

- unsigned/negative integers (all width encodings)
- byte strings / text strings (definite and indefinite length)
- arrays / maps (definite and indefinite length)
- false/true/null, float16/32/64 (floats always encode as 64-bit)
- tags are decoded transparently (the tag number is dropped, the inner
  value returned) — matching what ``cbor.load`` callers see for the
  common timestamp/bignum-free payloads

Encoding is canonical-enough for round-trips and tests: smallest-width
integer heads, definite lengths, float64.
"""

from __future__ import annotations

import io
import struct

_BREAK = object()


def cbor_encode(obj) -> bytes:
    """Encode ``obj`` (int/bytes/str/list/dict/bool/None/float) to CBOR."""
    out = io.BytesIO()
    _encode(obj, out)
    return out.getvalue()


def _head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    for ai, fmt in ((24, ">B"), (25, ">H"), (26, ">I"), (27, ">Q")):
        try:
            return bytes([(major << 5) | ai]) + struct.pack(fmt, arg)
        except struct.error:
            continue
    raise ValueError(f"integer too large for CBOR head: {arg}")


def _encode(obj, out: io.BytesIO) -> None:
    if obj is False:
        out.write(b"\xf4")
    elif obj is True:
        out.write(b"\xf5")
    elif obj is None:
        out.write(b"\xf6")
    elif isinstance(obj, int):
        if obj >= 0:
            out.write(_head(0, obj))
        else:
            out.write(_head(1, -1 - obj))
    elif isinstance(obj, float):
        out.write(b"\xfb" + struct.pack(">d", obj))
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        out.write(_head(2, len(b)) + b)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out.write(_head(3, len(b)) + b)
    elif isinstance(obj, (list, tuple)):
        out.write(_head(4, len(obj)))
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, dict):
        out.write(_head(5, len(obj)))
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    else:
        raise TypeError(f"cannot CBOR-encode {type(obj).__name__}")


def _read_exact(stream, n: int) -> bytes:
    b = stream.read(n)
    if b is None or len(b) < n:
        # NOT EOFError: clean end-of-stream is only legal at an item
        # boundary; mid-item exhaustion is corruption and must not
        # terminate cbor_iter() silently (that would drop data)
        raise ValueError("truncated CBOR item")
    return b


def cbor_load(stream):
    """Decode ONE CBOR item from a binary stream.

    Raises ``EOFError`` at clean end-of-stream (the loop-termination
    contract of the reference's ``cbor.load`` usage); a stream exhausted
    MID-item raises ``ValueError`` — truncation is corruption, not EOF."""
    first = stream.read(1)
    if not first:
        raise EOFError("end of CBOR stream")
    val = _decode(first[0], stream)
    if val is _BREAK:
        raise ValueError("unexpected CBOR break code outside indefinite item")
    return val


def _decode_arg(ai: int, stream) -> int | None:
    """Additional-info field → argument value (None = indefinite)."""
    if ai < 24:
        return ai
    if ai == 24:
        return _read_exact(stream, 1)[0]
    if ai == 25:
        return struct.unpack(">H", _read_exact(stream, 2))[0]
    if ai == 26:
        return struct.unpack(">I", _read_exact(stream, 4))[0]
    if ai == 27:
        return struct.unpack(">Q", _read_exact(stream, 8))[0]
    if ai == 31:
        return None
    raise ValueError(f"reserved CBOR additional info {ai}")


def _float16(h: int) -> float:
    # struct has native binary16 since 3.6 via 'e'
    return struct.unpack(">e", struct.pack(">H", h))[0]


def _decode(initial: int, stream):
    major, ai = initial >> 5, initial & 0x1F
    if major == 7:
        if ai == 20:
            return False
        if ai == 21:
            return True
        if ai in (22, 23):  # null / undefined
            return None
        if ai == 25:
            return _float16(struct.unpack(">H", _read_exact(stream, 2))[0])
        if ai == 26:
            return struct.unpack(">f", _read_exact(stream, 4))[0]
        if ai == 27:
            return struct.unpack(">d", _read_exact(stream, 8))[0]
        if ai == 31:
            return _BREAK
        if ai < 24 or ai == 24:  # simple values
            _decode_arg(ai, stream)
            return None
        raise ValueError(f"unsupported CBOR simple/float encoding {ai}")
    arg = _decode_arg(ai, stream)
    if major == 0:
        return arg
    if major == 1:
        return -1 - arg
    if major == 2 or major == 3:
        if arg is None:  # indefinite: concatenation of definite chunks
            parts = []
            while True:
                b = _read_exact(stream, 1)[0]
                if b == 0xFF:
                    break
                if b >> 5 != major:
                    raise ValueError("mixed-type chunk in indefinite string")
                parts.append(_read_exact(stream, _decode_arg(b & 0x1F, stream)))
            raw = b"".join(parts)
        else:
            raw = _read_exact(stream, arg)
        return raw if major == 2 else raw.decode("utf-8")
    if major == 4:
        if arg is None:
            out = []
            while True:
                item = _decode(_read_exact(stream, 1)[0], stream)
                if item is _BREAK:
                    return out
                out.append(item)
        return [_decode(_read_exact(stream, 1)[0], stream) for _ in range(arg)]
    if major == 5:
        d = {}
        if arg is None:
            while True:
                k = _decode(_read_exact(stream, 1)[0], stream)
                if k is _BREAK:
                    return d
                d[k] = _decode(_read_exact(stream, 1)[0], stream)
        for _ in range(arg):
            k = _decode(_read_exact(stream, 1)[0], stream)
            d[k] = _decode(_read_exact(stream, 1)[0], stream)
        return d
    if major == 6:  # tag: drop the number, return the tagged value
        return _decode(_read_exact(stream, 1)[0], stream)
    raise ValueError(f"unsupported CBOR major type {major}")


def cbor_iter(stream):
    """Yield every CBOR item in a stream until clean EOF (the reference's
    ``while True: cbor.load(stream)`` loop, cborsiterators.py:13-18)."""
    while True:
        try:
            yield cbor_load(stream)
        except EOFError:
            return

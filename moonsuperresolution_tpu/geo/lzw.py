"""TIFF-variant LZW codec.

The reference leans on GDAL for LZW GeoTIFF I/O (process_full_tiles.py:521,
COMPRESS=LZW PREDICTOR=2); this environment has no GDAL, so the codec is
implemented here: a C++ implementation (native/lzw.cpp, loaded via ctypes)
with a pure-Python fallback so the framework works without a compiler.

TIFF LZW specifics: MSB-first bit packing, code width grows 9->12 bits with
the *early-change* convention (width bumps one code early), ClearCode=256,
EOI=257.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_CLEAR = 256
_EOI = 257

_lib = None
_lib_tried = False


def _native_lib():
    """Load (building if necessary) the native codec."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    root = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    root = os.path.abspath(root)
    so_path = os.path.join(root, "libmoonsr.so")
    src_path = os.path.join(root, "lzw.cpp")
    try:
        if not os.path.exists(so_path) or (
            os.path.exists(src_path)
            and os.path.getmtime(src_path) > os.path.getmtime(so_path)
        ):
            if not os.path.exists(src_path):
                return None
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, src_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.lzw_decode.restype = ctypes.c_longlong
        lib.lzw_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_char), ctypes.c_longlong,
        ]
        lib.lzw_encode.restype = ctypes.c_longlong
        lib.lzw_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_char), ctypes.c_longlong,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def decode(data: bytes, expected_size: int) -> bytes:
    lib = _native_lib()
    if lib is not None:
        out = ctypes.create_string_buffer(expected_size)
        n = lib.lzw_decode(data, len(data), out, expected_size)
        if n >= 0:
            return out.raw[:n]
        # fall through to the Python path on error
    return _decode_py(data, expected_size)


def encode(data: bytes) -> bytes:
    lib = _native_lib()
    if lib is not None:
        # worst case: ~1.5 bytes per input byte + slack
        cap = len(data) + (len(data) >> 1) + 1024
        out = ctypes.create_string_buffer(cap)
        n = lib.lzw_encode(data, len(data), out, cap)
        if n >= 0:
            return out.raw[:n]
    return _encode_py(data)


# --------------------------------------------------------------------------
# Pure-Python fallback
# --------------------------------------------------------------------------


def _decode_py(data: bytes, expected_size: int) -> bytes:
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    bitpos = 0
    nbits = 9
    prev: bytes | None = None
    total_bits = len(data) * 8
    while bitpos + nbits <= total_bits:
        byte_idx = bitpos >> 3
        chunk = int.from_bytes(data[byte_idx : byte_idx + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - nbits - (bitpos & 7))) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == _EOI:
            break
        if code == _CLEAR:
            reset()
            nbits = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early-change: bump width one entry early
        if len(table) + 1 >= (1 << nbits) and nbits < 12:
            nbits += 1
        if len(out) >= expected_size:
            break
    return bytes(out)


def _encode_py(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    accbits = 0

    def put(code: int, nbits: int):
        nonlocal acc, accbits
        acc = (acc << nbits) | code
        accbits += nbits
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    nbits = 9
    put(_CLEAR, nbits)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        put(table[w], nbits)
        table[wc] = next_code
        next_code += 1
        # early change on the encoder side too
        if next_code + 1 > (1 << nbits):
            if nbits < 12:
                nbits += 1
            else:
                put(_CLEAR, nbits)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                nbits = 9
        w = c
    if w:
        put(table[w], nbits)
    put(_EOI, nbits)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)

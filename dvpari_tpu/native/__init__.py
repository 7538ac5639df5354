"""ctypes loader for the native host backend (libdvpari_native.so).

Builds on demand with cmake+ninja (toolchain is baked into the image);
falls back cleanly to the pure-python host oracle when unavailable so
the framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_HERE, "build")
_LIB_PATH = os.path.join(_BUILD, "libdvpari_native.so")

_lib = None


def _stale() -> bool:
    """Rebuild when any source is newer than the built library."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for fname in os.listdir(_HERE):
        if fname.endswith((".cpp", ".h", ".txt")):
            if os.path.getmtime(os.path.join(_HERE, fname)) > lib_mtime:
                return True
    return False


def build(force: bool = False) -> str:
    if not force and not _stale():
        return _LIB_PATH
    os.makedirs(_BUILD, exist_ok=True)
    subprocess.run(
        ["cmake", "-S", _HERE, "-B", _BUILD, "-G", "Ninja",
         "-DCMAKE_BUILD_TYPE=Release"],
        check=True, capture_output=True,
    )
    subprocess.run(["ninja", "-C", _BUILD], check=True, capture_output=True)
    return _LIB_PATH


_load_failed = False


def load() -> "ctypes.CDLL | None":
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    try:
        path = build()
        lib = ctypes.CDLL(path)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i8p = ctypes.POINTER(ctypes.c_int8)
        lib.dv_fe_mul.argtypes = [u64p, u64p, u64p]
        lib.dv_fe_inv.argtypes = [u64p, u64p]
        lib.dv_fe_trace.argtypes = [u64p]
        lib.dv_fe_trace.restype = ctypes.c_int
        lib.dv_fe_halftrace.argtypes = [u64p, u64p]
        lib.dv_pt_add.argtypes = [u64p, u64p, u64p]
        lib.dv_pt_double.argtypes = [u64p, u64p]
        lib.dv_pt_batch_affine.argtypes = [u64p, ctypes.c_int64, u64p, u8p]
        lib.dv_pt_decode_bulk.argtypes = [u8p, ctypes.c_int64, u64p, u8p]
        lib.dv_pt_decode_bulk.restype = ctypes.c_int64
        lib.dv_pt_encode_bulk.argtypes = [u64p, u8p, ctypes.c_int64, u8p]
        lib.dv_tnaf_recode_bulk.argtypes = [u8p, ctypes.c_int64, i8p, i8p]
        lib.dv_tnaf_recode_bulk.restype = ctypes.c_int64
    except Exception:
        # any failure (missing toolchain, foreign-arch prebuilt .so, missing
        # core symbol) falls back to the pure-python host codec
        _load_failed = True
        return None
    # newer exports bind individually: an older .so missing one of them
    # degrades ONLY that fast path (callers hasattr-check), not the whole
    # native backend
    try:
        u32p_ = ctypes.POINTER(ctypes.c_uint32)
        lib.dv_tnaf_recode_masks.argtypes = [u8p, ctypes.c_int64, u32p_, u32p_]
        lib.dv_tnaf_recode_masks.restype = ctypes.c_int64
    except Exception:
        pass
    try:
        i64p = ctypes.POINTER(ctypes.c_int64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.dv_r1cs_meta.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
        ]
        lib.dv_r1cs_meta.restype = ctypes.c_int
        lib.dv_r1cs_parse.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u32p,
            u32p, u32p, u32p, u32p, u32p, u32p,
        ]
        lib.dv_r1cs_parse.restype = ctypes.c_int
    except Exception:
        pass
    try:
        lib.dv_zpoly_coeffs.argtypes = [u8p, ctypes.c_int64, u8p, u8p]
        lib.dv_zpoly_coeffs.restype = ctypes.c_int64
    except Exception:
        pass
    try:
        lib.dv_pt_smul.argtypes = [u8p, u64p, ctypes.c_uint8, u64p, u8p]
        lib.dv_pt_decode.argtypes = [u8p, u64p, u8p]
        lib.dv_pt_decode.restype = ctypes.c_int
    except Exception:
        pass
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


# --- numpy-facing helpers --------------------------------------------------

def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def fe_int_to_words(x: int) -> np.ndarray:
    return np.frombuffer(int(x).to_bytes(32, "little"), dtype=np.uint64).copy()


def fe_words_to_int(w: np.ndarray) -> int:
    return int.from_bytes(w.tobytes(), "little")


def decode_bulk(data: bytes):
    """30-byte records -> (xy uint64[n,8], inf uint8[n]); raises on invalid."""
    lib = load()
    assert lib is not None
    n = len(data) // 30
    raw = np.frombuffer(data, dtype=np.uint8)
    xy = np.zeros((n, 8), dtype=np.uint64)
    inf = np.zeros(n, dtype=np.uint8)
    bad = lib.dv_pt_decode_bulk(_u8p(raw), n, _u64p(xy), _u8p(inf))
    if bad:
        raise ValueError(f"{bad} invalid point records")
    return xy, inf


def r1cs_parse_rows(data, rows_off: int):
    """Bulk-parse the row section of a gnark dump starting at rows_off.

    Returns (counts uint32[n_rows, 3], [(wires, cids)] for L, R, O) or
    None when the native backend is unavailable.
    """
    lib = load()
    if lib is None or not hasattr(lib, "dv_r1cs_meta"):
        return None
    raw = np.frombuffer(data, dtype=np.uint8)
    n_rows = ctypes.c_int64()
    terms = (ctypes.c_int64 * 3)()
    rc = lib.dv_r1cs_meta(
        _u8p(raw), len(raw), rows_off, ctypes.byref(n_rows), terms
    )
    if rc:
        raise ValueError("malformed gnark R1CS dump")
    n = n_rows.value
    counts = np.zeros((n, 3), dtype=np.uint32)
    mats = [
        (np.zeros(terms[k], dtype=np.uint32), np.zeros(terms[k], dtype=np.uint32))
        for k in range(3)
    ]
    u32p = ctypes.POINTER(ctypes.c_uint32)
    as32 = lambda a: a.ctypes.data_as(u32p)
    lib.dv_r1cs_parse(
        _u8p(raw), len(raw), rows_off, as32(counts),
        as32(mats[0][0]), as32(mats[0][1]), as32(mats[1][0]), as32(mats[1][1]),
        as32(mats[2][0]), as32(mats[2][1]),
    )
    return counts, mats


def pt_decode(data: bytes):
    """30-byte record -> ((x, y) | None, is_valid) via the native codec;
    NotImplemented when the export is unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "dv_pt_decode"):
        return NotImplemented
    raw = np.frombuffer(bytes(data), dtype=np.uint8)
    xy = np.zeros(8, dtype=np.uint64)
    inf = np.zeros(1, dtype=np.uint8)
    ok = lib.dv_pt_decode(_u8p(raw), _u64p(xy), _u8p(inf))
    if not ok:
        return None, False
    if inf[0]:
        return None, True
    return (fe_words_to_int(xy[:4]), fe_words_to_int(xy[4:])), True


def pt_smul(k: int, x: int, y: int):
    """[k]P for an affine python-int point; returns (x, y) or None.

    Native double-and-add (dv_pt_smul) -- used by the O(1) verifier,
    whose two scalar muls otherwise run the pure-python oracle at
    seconds each (reference: src/srs.rs:374-428 is effectively instant).
    Returns NotImplemented when the native backend lacks the export.
    """
    lib = load()
    if lib is None or not hasattr(lib, "dv_pt_smul"):
        return NotImplemented
    k30 = np.frombuffer(
        (int(k)).to_bytes(30, "little"), dtype=np.uint8
    ).copy()
    xy = np.concatenate([fe_int_to_words(x), fe_int_to_words(y)])
    out = np.zeros(8, dtype=np.uint64)
    inf = np.zeros(1, dtype=np.uint8)
    lib.dv_pt_smul(
        _u8p(k30), _u64p(xy), ctypes.c_uint8(0), _u64p(out), _u8p(inf)
    )
    if inf[0]:
        return None
    return fe_words_to_int(out[:4]), fe_words_to_int(out[4:])


def encode_bulk(xy: np.ndarray, inf: np.ndarray) -> bytes:
    lib = load()
    assert lib is not None
    n = len(inf)
    out = np.zeros(30 * n, dtype=np.uint8)
    xy = np.ascontiguousarray(xy, dtype=np.uint64)
    inf = np.ascontiguousarray(inf, dtype=np.uint8)
    lib.dv_pt_encode_bulk(_u64p(xy), _u8p(inf), n, _u8p(out))
    return out.tobytes()

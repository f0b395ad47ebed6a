"""Build + load the native rANS library (g++ → shared object, ctypes)."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

_SRC = Path(__file__).parent / "csrc" / "rans.cpp"
_BUILD_DIR = Path(
    os.environ.get("RDEIC_TPU_BUILD_DIR", Path(__file__).parent / "_build")
)

_lib = None


def _source_hash() -> str:
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]


def build_library(force: bool = False) -> Path:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    so_path = _BUILD_DIR / f"librans_{_source_hash()}.so"
    if so_path.exists() and not force:
        return so_path
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-march=native",
        str(_SRC),
        "-o",
        str(so_path),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build_library()))

    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.rans_encode_with_indexes.restype = ctypes.c_int
    lib.rans_encode_with_indexes.argtypes = [
        i32p, i32p, ctypes.c_int, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
    ]
    lib.rans_decoder_new.restype = ctypes.c_void_p
    lib.rans_decoder_new.argtypes = [u8p, ctypes.c_int]
    lib.rans_decoder_free.restype = None
    lib.rans_decoder_free.argtypes = [ctypes.c_void_p]
    lib.rans_decode_stream.restype = ctypes.c_int
    lib.rans_decode_stream.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int, i32p,
    ]
    lib.rans_decode_with_indexes.restype = ctypes.c_int
    lib.rans_decode_with_indexes.argtypes = [
        u8p, ctypes.c_int, i32p, ctypes.c_int, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int, i32p,
    ]
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.rans_num_buckets.restype = ctypes.c_int
    lib.rans_num_buckets.argtypes = []
    lib.rans_build_buckets.restype = None
    lib.rans_build_buckets.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int, u16p,
    ]
    lib.rans_decode_stream_bucketed.restype = ctypes.c_int
    lib.rans_decode_stream_bucketed.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int, u16p, i32p,
    ]
    lib.rans_encode_interleaved.restype = ctypes.c_int
    lib.rans_encode_interleaved.argtypes = [
        i32p, i32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int,
        i32p, i32p, i32p, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, i32p,
    ]
    # v2 shared-stream interleaved format
    lib.rans_lanes_to_shared.restype = ctypes.c_int
    lib.rans_lanes_to_shared.argtypes = [
        u8p, i32p, ctypes.c_int, i32p, ctypes.c_int, i32p, ctypes.c_int,
        i32p, i32p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
    ]
    lib.rans_encode_interleaved_shared.restype = ctypes.c_int
    lib.rans_encode_interleaved_shared.argtypes = [
        i32p, i32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int,
        i32p, i32p, i32p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
    ]
    lib.rans_shared_decoder_new.restype = ctypes.c_void_p
    lib.rans_shared_decoder_new.argtypes = [u8p, ctypes.c_int, ctypes.c_int]
    lib.rans_shared_decoder_free.restype = None
    lib.rans_shared_decoder_free.argtypes = [ctypes.c_void_p]
    lib.rans_shared_decode_pass.restype = ctypes.c_int
    lib.rans_shared_decode_pass.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int, i32p,
    ]
    lib.rans_build_lut.restype = None
    lib.rans_build_lut.argtypes = [i32p, i32p, ctypes.c_int, ctypes.c_int, u16p]
    lib.rans_decode_stream_lut.restype = ctypes.c_int
    lib.rans_decode_stream_lut.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int, u16p, i32p,
    ]
    _lib = lib
    return lib

"""Generate libLerc reference fixtures for tests/test_lerc.py.

Drives the system libLerc.so.4 (the encoder GDAL/Esri products use)
over a version x dtype x shape x mask x maxZError matrix; each case
stores the encoded blob (.lerc) plus the reference decode (.npz:
values + mask) under tests/fixtures/lerc/ — committed so the decoder
tests validate against the reference implementation without the
library at test time.
"""
from __future__ import annotations

import ctypes
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
FIXDIR = ROOT / "tests" / "fixtures" / "lerc"
LIB = "/usr/lib/x86_64-linux-gnu/libLerc.so.4"

DT = {np.dtype("i1"): 0, np.dtype("u1"): 1, np.dtype("i2"): 2,
      np.dtype("u2"): 3, np.dtype("i4"): 4, np.dtype("u4"): 5,
      np.dtype("f4"): 6, np.dtype("f8"): 7}


def load():
    L = ctypes.CDLL(LIB)
    L.lerc_encodeForVersion.restype = ctypes.c_uint
    L.lerc_encodeForVersion.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_double, ctypes.c_char_p,
        ctypes.c_uint, ctypes.POINTER(ctypes.c_uint)]
    L.lerc_decode.restype = ctypes.c_uint
    L.lerc_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_uint, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint, ctypes.c_void_p]
    return L


def enc(L, arr, version, maxerr=0.0, mask=None):
    h, w = arr.shape
    arr = np.ascontiguousarray(arr)
    out = ctypes.create_string_buffer(4 * arr.nbytes + 8192)
    n = ctypes.c_uint(0)
    mb = None if mask is None else np.ascontiguousarray(
        mask.astype(np.uint8)).tobytes()
    rc = L.lerc_encodeForVersion(
        arr.ctypes.data_as(ctypes.c_void_p), version, DT[arr.dtype],
        1, w, h, 1, 0 if mb is None else 1, mb, maxerr, out,
        len(out), ctypes.byref(n))
    assert rc == 0, f"encode rc={rc}"
    return out.raw[:n.value]


def dec(L, blob, h, w, dtype):
    dtype = np.dtype(dtype)
    arr = np.zeros((h, w), dtype=dtype)
    mask = ctypes.create_string_buffer(h * w)
    rc = L.lerc_decode(blob, len(blob), 1, mask, 1, w, h, 1,
                       DT[dtype], arr.ctypes.data_as(ctypes.c_void_p))
    assert rc == 0, f"decode rc={rc}"
    m = np.frombuffer(mask.raw, dtype=np.uint8).reshape(h, w)
    return arr, m.astype(bool)


def cases():
    rng = np.random.default_rng(2026)
    m1 = np.ones((17, 23), bool)
    m1[3:6, 4:19] = False
    m2 = np.ones((16, 16), bool)
    m2[2, :] = False
    m2[5:8, 0:4] = False
    skew = rng.choice(np.arange(40),
                      p=np.arange(40, 0, -1.0)
                      / np.arange(40, 0, -1.0).sum(),
                      size=(24, 24)).astype(np.uint8)
    out = []
    for v in (2, 3, 4, 5, 6):
        out += [
            (f"v{v}_u1_grad", (np.arange(17 * 23).reshape(17, 23)
                               % 16).astype(np.uint8), v, 0.0, None),
            (f"v{v}_u1_huff", skew, v, 0.0, None),
            (f"v{v}_u1_huffmask", rng.choice(
                [0, 5, 250], p=[.7, .2, .1],
                size=(16, 16)).astype(np.uint8), v, 0.0, m2),
            (f"v{v}_i1_huff", rng.choice(
                [0, 3, 250], p=[.8, .15, .05],
                size=(16, 16)).astype(np.uint8).view(np.int8),
                v, 0.0, None),
            (f"v{v}_i2_rand", rng.integers(
                -500, 500, (17, 23)).astype(np.int16), v, 0.0, m1),
            (f"v{v}_u4_big", rng.integers(
                0, 3_000_000, (23, 31)).astype(np.uint32), v, 0.0,
                None),
            (f"v{v}_f4_q", (rng.standard_normal((20, 30))
                            * 50).astype(np.float32), v, 0.01, None),
            (f"v{v}_f8_q", (rng.standard_normal((20, 30))
                            * 50).astype(np.float64), v, 0.001, m1
                if v % 2 else None),
            (f"v{v}_const", np.full((12, 12), 42, np.int16), v, 0.0,
                None),
            (f"v{v}_lut", np.where(
                np.arange(64).reshape(8, 8) == 13, 9,
                7).astype(np.uint8), v, 0.0, None),
        ]
    return out


def main():
    L = load()
    FIXDIR.mkdir(parents=True, exist_ok=True)
    for name, arr, v, me, mask in cases():
        blob = enc(L, arr, v, me, mask)
        ref, refm = dec(L, blob, *arr.shape, arr.dtype)
        (FIXDIR / f"{name}.lerc").write_bytes(blob)
        np.savez_compressed(FIXDIR / f"{name}.npz", values=ref,
                            mask=refm)
        print(f"{name}: {len(blob)}B")


if __name__ == "__main__":
    sys.exit(main())

"""Generate reference-CLI zstd fixtures for tests/test_zstd.py.

Each case stores the payload (.raw) and the reference zstd CLI's
compressed stream (.zst) under tests/fixtures/zstd/ — committed so
the decode tests validate against the reference implementation
without needing the CLI at test time. Payloads are seeded and the
CLI is pinned single-threaded, so regeneration is deterministic for
a given zstd version (v1.5.7 in the build sandbox).
"""
from __future__ import annotations

import pathlib
import shutil
import subprocess
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
FIXDIR = ROOT / "tests" / "fixtures" / "zstd"


def zstd_cli() -> str:
    for cand in ("/root/miniconda/bin/zstd", shutil.which("zstd")):
        if cand and pathlib.Path(cand).exists():
            return cand
    raise SystemExit("no zstd CLI available")


def payloads() -> dict:
    rng = np.random.default_rng(99)
    return {
        "text": b"the quick brown fox jumps over the lazy dog. " * 60,
        "repet": b"ABCD" * 4000,
        "rle": b"\x07" * 50000,
        "random": rng.bytes(20000),
        "mixed": b"".join([rng.bytes(100), b"Z" * 1000,
                           rng.bytes(3000), b"pattern" * 500]),
        "floats": (np.sin(np.arange(15000) * 0.01) * 1000
                   ).astype("<f4").tobytes(),
        "multiblock": b"lorem ipsum dolor sit amet " * 9000,
        "json": (b'{"key": 123, "list": [1,2,3], "s": "value"}\n'
                 * 1500),
    }


CASES = [  # (payload, level-args, suffix)
    ("text", ["-3"], "l3"),
    ("text", ["-19"], "l19"),
    ("text", ["--fast=3"], "fast"),
    ("repet", ["-3"], "l3"),
    ("rle", ["-3"], "l3"),
    ("random", ["-3"], "l3"),
    ("mixed", ["-9"], "l9"),
    ("mixed", ["-3", "--no-check"], "nochk"),
    ("floats", ["-9"], "l9"),
    ("multiblock", ["-3"], "l3"),
    ("json", ["-19"], "l19"),
]


def main() -> None:
    cli = zstd_cli()
    FIXDIR.mkdir(parents=True, exist_ok=True)
    data = payloads()
    for pname, p in data.items():
        (FIXDIR / f"{pname}.raw").write_bytes(p)
    for pname, args, suffix in CASES:
        c = subprocess.run([cli, "-T1", *args, "-c"],
                           input=data[pname], capture_output=True,
                           check=True).stdout
        (FIXDIR / f"{pname}_{suffix}.zst").write_bytes(c)
        print(f"{pname}_{suffix}: raw {len(data[pname])}B "
              f"zst {len(c)}B")


if __name__ == "__main__":
    sys.exit(main())

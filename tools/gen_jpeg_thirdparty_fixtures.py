"""Generate libjpeg-turbo cross-validation fixtures for the JPEG codec.

Requires gcc + libjpeg headers (present in the build sandbox); the
outputs are committed under tests/fixtures/jpeg_thirdparty/ so the
test suite itself never needs the toolchain. Each case stores the
turbo-encoded .jpg stream plus turbo's exact quantized-coefficient
dump (.coef, the ``dumpcoef`` format of tools/jpeg_thirdparty.c).

These are genuinely independent vectors: libjpeg-turbo's entropy
codecs (Huffman AND the T.81 Annex D arithmetic coder) share no code
or authorship with the repo's pure-python implementation, so a
mirrored encoder/decoder bug cannot survive them.
"""
from __future__ import annotations

import pathlib
import subprocess
import sys
import zlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
FIXDIR = ROOT / "tests" / "fixtures" / "jpeg_thirdparty"
HARNESS = pathlib.Path("/tmp/jpeg_thirdparty")


def build_harness() -> pathlib.Path:
    if HARNESS.exists():
        return HARNESS
    jh = pathlib.Path("/tmp/jh")
    jh.mkdir(exist_ok=True)
    (jh / "jconfig.h").write_text(
        "#define JPEG_LIB_VERSION 62\n#define BITS_IN_JSAMPLE 8\n"
        "#define HAVE_PROTOTYPES 1\n#define HAVE_UNSIGNED_CHAR 1\n"
        "#define HAVE_UNSIGNED_SHORT 1\n#define HAVE_STDDEF_H 1\n"
        "#define HAVE_STDLIB_H 1\n")
    subprocess.run(
        ["gcc", "-O2", f"-I{jh}", "-o", str(HARNESS),
         str(ROOT / "tools" / "jpeg_thirdparty.c"), "-ljpeg"],
        check=True)
    return HARNESS


def make_image(kind: str, w: int, h: int, nc: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "gradient":
        base = (np.add.outer(np.arange(h) * 2, np.arange(w) * 3) % 256)
        img = np.stack([(base + 40 * c) % 256 for c in range(nc)], axis=-1)
    elif kind == "noise":
        img = rng.integers(0, 256, size=(h, w, nc))
    elif kind == "flat":
        img = np.full((h, w, nc), 128)
        img[h // 3:2 * h // 3, w // 4:w // 2] = 200
    elif kind == "mixed":
        img = rng.integers(0, 256, size=(h, w, nc))
        img[: h // 2] = (np.add.outer(np.arange(h // 2), np.arange(w)) % 256)[
            ..., None]
    else:
        raise ValueError(kind)
    return np.ascontiguousarray(img.astype(np.uint8))


CASES = [
    # name, kind, w, h, nc, arith, prog, quality, restart, h2v2
    ("gray_grad_seq_arith", "gradient", 64, 48, 1, 1, 0, 85, 0, 0),
    ("gray_grad_prog_arith", "gradient", 64, 48, 1, 1, 1, 85, 0, 0),
    ("gray_odd_noise_arith", "noise", 17, 23, 1, 1, 0, 70, 0, 0),
    ("gray_odd_noise_prog_arith", "noise", 17, 23, 1, 1, 1, 70, 0, 0),
    ("gray_flat_seq_arith", "flat", 40, 40, 1, 1, 0, 90, 0, 0),
    ("gray_rst_seq_arith", "mixed", 64, 48, 1, 1, 0, 80, 3, 0),
    ("gray_rst_prog_arith", "mixed", 64, 48, 1, 1, 1, 80, 2, 0),
    ("rgb_h2v2_seq_arith", "gradient", 32, 24, 3, 1, 0, 85, 0, 1),
    ("rgb_h2v2_prog_arith", "gradient", 32, 24, 3, 1, 1, 85, 0, 1),
    ("rgb_h1v1_seq_arith", "noise", 19, 13, 3, 1, 0, 75, 0, 0),
    ("rgb_h2v2_rst_prog_arith", "mixed", 48, 32, 3, 1, 1, 80, 2, 1),
    ("rgb_q50_seq_arith", "noise", 24, 16, 3, 1, 0, 50, 0, 1),
    ("gray_q95_seq_arith", "noise", 32, 32, 1, 1, 0, 95, 0, 0),
    # Huffman twins — independent vectors for the EXISTING decoder
    ("gray_grad_seq_huff", "gradient", 64, 48, 1, 0, 0, 85, 0, 0),
    ("gray_grad_prog_huff", "gradient", 64, 48, 1, 0, 1, 85, 0, 0),
    ("rgb_h2v2_prog_huff", "gradient", 32, 24, 3, 0, 1, 85, 0, 1),
    ("rgb_h2v2_rst_seq_huff", "mixed", 48, 32, 3, 0, 0, 80, 3, 1),
]


def main() -> None:
    harness = build_harness()
    FIXDIR.mkdir(parents=True, exist_ok=True)
    for (name, kind, w, h, nc, arith, prog, qual, rst, h2v2) in CASES:
        img = make_image(kind, w, h, nc,
                         seed=zlib.crc32(name.encode()) & 0xFFFF)
        enc = subprocess.run(
            [str(harness), "encode", str(w), str(h), str(nc), str(arith),
             str(prog), str(qual), str(rst), str(h2v2)],
            input=img.tobytes(), capture_output=True, check=True)
        jpg = enc.stdout
        dump = subprocess.run([str(harness), "dumpcoef"], input=jpg,
                              capture_output=True, check=True)
        (FIXDIR / f"{name}.jpg").write_bytes(jpg)
        (FIXDIR / f"{name}.coef").write_bytes(dump.stdout)
        print(f"{name}: jpg {len(jpg)}B coef {len(dump.stdout)}B")
    print(f"wrote {len(CASES)} fixture pairs to {FIXDIR}")


if __name__ == "__main__":
    sys.exit(main())

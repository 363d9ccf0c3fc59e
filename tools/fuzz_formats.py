"""Exhaustive corruption campaign over every binary-format parser.

The distributed ingest decodes UNTRUSTED granule bytes inside
executors, so the contract is: corrupt input raises a loud python
exception (a failed task) — never a hang, never an unbounded
allocation, never a silently wrong parse of a field the mutation hit.
The strided hypothesis tests in tests/ pin this contract in CI time;
THIS script is the exhaustive offline sweep (every byte position ×
several flip deltas, every truncation point) that found the round-11
guards: the TIFF tag-size format-string stall, the 49 GB corrupt-dims
allocation, the EA/FA element-count overruns, the StopIteration
escape, zero-denominator RATIONALs, float-retyped offset tags, the
unhashable grid_mapping, and the zero-channel WAV division.

Run: python tools/fuzz_formats.py [deltas-per-position]
Exit code 1 if any mutant hangs (>3 s) or raises outside the allowed
loud set.
"""

from __future__ import annotations

import os
import pathlib
import signal
import struct
import sys
import time
import zlib
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ALLOWED = (
    ValueError, NotImplementedError, KeyError, IndexError,
    struct.error, OverflowError, MemoryError, EOFError,
    UnicodeDecodeError, zlib.error,
)


class _Timeout(Exception):
    pass


def _alarm(sig, frame):
    raise _Timeout()


def scan(label: str, base: bytes, parse, deltas) -> list:
    bad = []
    t0 = time.time()
    for pos in range(len(base)):
        for delta in deltas:
            m = bytearray(base)
            m[pos] = (m[pos] + delta) % 256
            if m[pos] == base[pos]:
                continue
            signal.alarm(3)
            try:
                parse(bytes(m))
            except _Timeout:
                bad.append(("HANG flip", pos, delta))
            except ALLOWED:
                pass
            except Exception as ex:
                bad.append((f"BAD {type(ex).__name__} flip", pos, delta))
            finally:
                signal.alarm(0)
        signal.alarm(3)
        try:
            parse(base[:pos])
        except _Timeout:
            bad.append(("HANG trunc", pos))
        except ALLOWED:
            pass
        except Exception as ex:
            bad.append((f"BAD {type(ex).__name__} trunc", pos))
        finally:
            signal.alarm(0)
    status = "CLEAN" if not bad else f"{len(bad)} FINDINGS {bad[:5]}"
    print(f"{label}: {len(base)}B {time.time() - t0:.1f}s {status}",
          flush=True)
    return bad


def main():
    deltas = (1, 128, 255) if len(sys.argv) < 2 else tuple(
        range(1, 256, max(1, 255 // int(sys.argv[1]))))
    signal.signal(signal.SIGALRM, _alarm)

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    from test_binary_raster import _demo_nc, _oldjpeg_ifd, \
        tiff_bytes_jpeg, tiff_bytes_strips, tiff_bytes_tiles

    def _oldjpeg_lossless_fixture(**enc_kw) -> bytes:
        from pyresample_spark.sources.jpeg import encode_lossless_jpeg

        img = ((np.arange(8)[:, None] * 37
                + np.arange(12)[None, :] * 11) % 251).astype("u1")
        stream = encode_lossless_jpeg(img, predictor=4, **enc_kw)
        buf, _ = _oldjpeg_ifd(
            8, 12, 1,
            [(512, 3, 1, 14, None), (513, 4, 1, None, None),
             (514, 4, 1, len(stream), None)],
            {513: stream}, strips=None)
        return buf

    def _oldjpeg_percomp_fixture() -> bytes:
        # per-component predictors/point-transforms + per-component
        # DC tables (r17 surface): tags 517/518 arrays, 520 pointer
        # array, 3-component entropy strip, photometric RGB
        from test_binary_raster import _jpeg_stream_parts

        from pyresample_spark.sources.jpeg import encode_lossless_jpeg

        img = ((np.arange(6)[:, None, None] * 37
                + np.arange(8)[None, :, None] * 11
                + np.arange(3)[None, None, :] * 73) % 251).astype("u1")
        preds, pts = [1, 4, 6], [0, 1, 0]
        stream = encode_lossless_jpeg(img, predictor=preds,
                                      point_transform=pts)
        _, huffs, entropy = _jpeg_stream_parts(stream)
        dcs = [bytes(huffs[(0, th)]) for th in range(3)]
        buf, _ = _oldjpeg_ifd(
            6, 8, 3,
            [(512, 3, 1, 14, None),
             (517, 3, 3, None, struct.pack("<3H", *preds)),
             (518, 3, 3, None, struct.pack("<3H", *pts)),
             (520, 4, 3, None, None)],
            {520: dcs}, strips=[entropy], rows_per_strip=6)
        b = bytearray(buf)
        i = b.find(struct.pack("<HHI", 262, 3, 1))
        b[i + 8:i + 10] = struct.pack("<H", 2)  # photometric RGB
        return bytes(b)

    from pyresample_spark.sources.jpeg import (
        decode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    def _prog_rst_fixture() -> bytes:
        img = ((np.arange(24)[:, None] * 13
                + np.arange(24)[None, :] * 7) % 251).astype("u1")
        return encode_progressive_jpeg(img, quant=16,
                                       restart_interval=2)

    def _arith_seq_rst_fixture() -> bytes:
        from pyresample_spark.sources.jpeg_arith import \
            encode_sequential_arith
        img = ((np.arange(24)[:, None] * 13
                + np.arange(24)[None, :] * 7) % 251).astype("u1")
        return encode_sequential_arith(img, quant=16,
                                       restart_interval=2)

    def _arith_prog_fixture() -> bytes:
        from pyresample_spark.sources.jpeg_arith import \
            encode_progressive_arith
        img = ((np.arange(24)[:, None] * 11
                + np.arange(24)[None, :] * 5) % 253).astype("u1")
        return encode_progressive_arith(
            img, quant=16, cond={("dc", 0): (1, 2), ("ac", 0): 12})

    from pyresample_spark.operators.multimodal import (
        decode_ppm,
        decode_ppm_container,
        decode_wav_pcm16,
        encode_ppm,
        encode_wav_pcm16,
    )
    from pyresample_spark.sources.binary_raster import (
        area_from_geotiff,
        geotiff_bytes,
        load_cf_area_nc3,
        nc_var_data,
        parse_netcdf3,
        tiff_pixels,
    )
    from pyresample_spark.sources.hdf5 import (
        H5ObjectRef,
        H5RegionRef,
        hdf5_grid_bytes,
        load_cf_area_h5,
        parse_hdf5,
    )
    from pyresample_spark.sources.gtx import (
        demo_gtx_grid_bytes,
        parse_gtx,
    )
    from pyresample_spark.sources.nadcon import (
        demo_nadcon_grid_bytes,
        parse_nadcon,
    )
    from pyresample_spark.sources.ntv2 import (
        demo_ntv2_grid_bytes,
        demo_ntv2_multi_grid_bytes,
        parse_ntv2,
    )

    from pyresample_spark.sources.binary_raster import parse_tiff_ifds

    arr = (np.arange(60, dtype="f4").reshape(6, 10)) * 1.5

    def cog_walk(buf):
        for k, _ in enumerate(parse_tiff_ifds(buf)):
            tiff_pixels(buf, k)

    def nc_parse(buf):
        nc = parse_netcdf3(buf)
        for v in nc["vars"].values():
            nc_var_data(buf, v)

    def h5_parse(buf):
        for v in parse_hdf5(buf).values():
            _ = v["data"]

    def h5_grid(**kw):
        xs = np.arange(16) + 0.5
        ys = -(np.arange(12) + 0.5)
        data = ((np.arange(12)[:, None] * 31
                 + np.arange(16)[None, :] * 17) % 97 + 0.5).astype("<f8")
        return hdf5_grid_bytes(
            {
                "x": (xs.astype(float), {"CLASS": "DIMENSION_SCALE"}),
                "y": (ys.astype(float), {"CLASS": "DIMENSION_SCALE"}),
                "crs": (None, {"proj4": "eqc"}),
                "band": (data, {"grid_mapping": "crs"}),
            },
            chunks={"band": (5, 7)}, deflate=True, **kw,
        )

    cases = [
        ("tiff-deflate", tiff_bytes_strips(arr, rows_per_strip=3,
                                           compress=8), tiff_pixels),
        ("tiff-lzw-pred3", tiff_bytes_tiles(arr, tile=(4, 4), compress=5,
                                            predictor=3), tiff_pixels),
        # new-style JPEG strips with hoisted JPEGTables: marker walk,
        # Huffman/DQT tables, entropy bit reader under corruption
        ("tiff-jpeg", tiff_bytes_jpeg(
            np.repeat(np.repeat(
                (np.arange(12).reshape(3, 4) * 20) % 256, 8, 0), 8, 1
            ).astype("u1"), rows_per_strip=8, hoist_dqt=True),
            tiff_pixels),
        # 12-bit JPEG strips (r16): 16-bit DQT path, SOF1, uint16
        # samples, declared-vs-decoded precision cross-check
        ("tiff-jpeg12", tiff_bytes_jpeg(
            np.repeat(np.repeat(
                (np.arange(12).reshape(3, 4) * 331) % 4096, 8, 0), 8, 1
            ).astype("<u2"), rows_per_strip=16, precision=12),
            tiff_pixels),
        # old-style (comp 6) TILED complete streams (r16): tiled
        # routing + per-tile synthesis fallback under corruption
        ("tiff-oldjpeg-tiled", tiff_bytes_jpeg(
            np.repeat(np.repeat(
                (np.arange(8).reshape(2, 4) * 20) % 256, 16, 0), 16, 1
            ).astype("u1"), tile=(16, 16), compress_tag=6),
            tiff_pixels),
        # old-style LOSSLESS (process 14, SOF3 DPCM) interchange
        # stream (r16): predictor walk + modulo arithmetic under
        # corruption
        ("tiff-oldjpeg-lossless", _oldjpeg_lossless_fixture(),
            tiff_pixels),
        # restart intervals in lossless scans (r17: the T.81 H.1.1
        # Ra-first-line state machine) under corruption
        ("tiff-oldjpeg-lossless-rst",
            _oldjpeg_lossless_fixture(restart_interval=5), tiff_pixels),
        # per-component predictors/Pt + per-component DC tables (r17)
        ("tiff-oldjpeg-lossless-percomp", _oldjpeg_percomp_fixture(),
            tiff_pixels),
        # progressive (SOF2, r17): multi-scan segment loop, EOB runs,
        # successive-approximation state tracking under corruption
        ("tiff-jpeg-progressive", geotiff_bytes(
            np.repeat(np.repeat(
                (np.arange(12).reshape(3, 4) * 20) % 256, 8, 0), 8, 1
            ).astype("u1"), 1.0, 1.0, 0.0, 0.0,
            compress="jpeg_progressive", rows_per_strip=8),
            tiff_pixels),
        # raw progressive stream with quantization + restart markers:
        # RST/EOB-run resets and AC refinement correction bits
        ("jpeg-progressive-rst", _prog_rst_fixture(),
            decode_baseline_jpeg),
        # arithmetic-coded streams (SOF9/SOF10, r17 continuation):
        # DAC grammar, QM-coder zero-feed at truncation, statistics
        # resets at restarts, magnitude-walk overflow guards
        ("jpeg-arith-seq-rst", _arith_seq_rst_fixture(),
            decode_baseline_jpeg),
        ("jpeg-arith-prog", _arith_prog_fixture(),
            decode_baseline_jpeg),
        # a libjpeg-turbo-authored arithmetic stream: independent
        # encoder grammar (zero-dropped flushes, empty restart
        # segments) under corruption
        ("jpeg-arith-turbo", (pathlib.Path(__file__).parent.parent
                              / "tests" / "fixtures" / "jpeg_thirdparty"
                              / "rgb_h2v2_rst_prog_arith.jpg"
                              ).read_bytes(),
            decode_baseline_jpeg),
        # LERC blobs (r17 continuation): Lerc2 header grammar, RLE
        # masks, microblock/LUT/Huffman sections, per-version layout
        ("lerc-v2-huff",
            (pathlib.Path(__file__).parent.parent / "tests"
             / "fixtures" / "lerc" / "v2_u1_huff.lerc").read_bytes(),
            lambda b: __import__(
                "pyresample_spark.sources.lerc",
                fromlist=["lerc_decode_blob"]).lerc_decode_blob(b)),
        ("lerc-v5-f4",
            (pathlib.Path(__file__).parent.parent / "tests"
             / "fixtures" / "lerc" / "v5_f4_q.lerc").read_bytes(),
            lambda b: __import__(
                "pyresample_spark.sources.lerc",
                fromlist=["lerc_decode_blob"]).lerc_decode_blob(b)),
        # a libtiff-written LERC TIFF through the raster reader
        ("tiff-lerc",
            (pathlib.Path(__file__).parent.parent / "tests"
             / "fixtures" / "lerc" / "libtiff_lerc_f4.tif"
             ).read_bytes(),
            tiff_pixels),
        # GDAL-registered ZSTD compression (tag 50000, r17 cont.)
        ("tiff-zstd", geotiff_bytes(arr, 1.0, 1.0, 0.0, 6.0,
                                    compress="zstd",
                                    rows_per_strip=3),
            tiff_pixels),
        ("tiff-packbits", tiff_bytes_strips(
            (arr * 0).astype("u2"), rows_per_strip=3, compress=32773),
            tiff_pixels),
        ("bigtiff", geotiff_bytes(arr, 1.0, 1.0, 0.0, 6.0, compress=True,
                                  rows_per_strip=3, bigtiff=True),
            tiff_pixels),
        ("geotiff-area", geotiff_bytes(arr, 0.5, 0.25, 10.0, 50.0,
                                       compress=True),
            lambda b: area_from_geotiff(b, "t")),
        # multi-IFD COG chain: next-IFD pointers, per-level dims,
        # NewSubfileType — walk EVERY level under corruption
        ("cog-chain", geotiff_bytes(arr, 1.0, 1.0, 0.0, 6.0,
                                    compress=True, overviews=2),
            cog_walk),
        ("nc1", _demo_nc(), nc_parse),
        ("nc5", _demo_nc(version=5), nc_parse),
        ("nc-area", _demo_nc(), load_cf_area_nc3),
        ("hdf5-v0", h5_grid(), h5_parse),
        ("hdf5-v2-fa-dense", h5_grid(superblock=2,
                                     chunk_index="fixed_array",
                                     dense_links=True), h5_parse),
        ("hdf5-ea", h5_grid(superblock=2,
                            chunk_index="extensible_array"), h5_parse),
        # szip chunks: size prefix, cd values, Rice bit grammar
        # (ID/FS/split/second-extension/zero-run) under corruption
        ("hdf5-szip-nn", hdf5_grid_bytes(
            {"band": (((np.arange(12)[:, None] * 31
                        + np.arange(16)[None, :] * 17) % 97
                       ).astype("<u2"), {})},
            chunks={"band": (5, 7)}, deflate=False,
            szip={"ppb": 8, "option": "nn"}), h5_parse),
        ("hdf5-scaleoffset", hdf5_grid_bytes(
            {"band": ((((np.arange(12)[:, None] * 23
                         + np.arange(16)[None, :] * 7) % 83) / 4.0
                       - 9.25).astype("<f8"), {})},
            chunks={"band": (5, 7)}, deflate=False,
            scaleoffset={"factor": 2, "fill": -999.0}), h5_parse),
        # zstd chunks (filter 32015, r17 continuation): frame/block
        # headers, FSE table descriptions, Huffman weights, backward
        # bitstreams and xxhash64 checksums under corruption
        ("hdf5-zstd", hdf5_grid_bytes(
            {"band": (((np.arange(12)[:, None] * 37
                        + np.arange(16)[None, :] * 23) % 521
                       ).astype("<u2"), {})},
            chunks={"band": (5, 7)}, deflate=False, zstd=True),
            h5_parse),
        # a reference-CLI zstd frame (real FSE/Huffman sections)
        # driven through the raw decoder
        ("zstd-cli-frame",
            (pathlib.Path(__file__).parent.parent / "tests"
             / "fixtures" / "zstd" / "mixed_l9.zst").read_bytes(),
            lambda b: __import__(
                "pyresample_spark.sources.zstd",
                fromlist=["zstd_decompress"]
            ).zstd_decompress(b, 1 << 20)),
        # nbit chunks: cd-values datatype tree + fixed-stride bit
        # matrix under corruption (r16, VERDICT item 3/8)
        ("hdf5-nbit", hdf5_grid_bytes(
            {"band": (((np.arange(12)[:, None] * 131
                        + np.arange(16)[None, :] * 29) % 4096
                       ).astype("<u2"), {})},
            chunks={"band": (5, 7)}, deflate=False,
            nbit={"precision": 12}), h5_parse),
        # nbit one-byte branch (r17: begin_i == end_i, precision bits
        # re-anchored at offset%8) under corruption
        ("hdf5-nbit-1byte", hdf5_grid_bytes(
            {"band": ((((np.arange(12)[:, None] * 7
                         + np.arange(16)[None, :] * 3) % 16) << 2
                       ).astype("u1"), {})},
            chunks={"band": (5, 7)}, deflate=False,
            nbit={"precision": 4, "offset": 2}), h5_parse),
        # lzf chunks (filter 32000, r17): the three-rule LZ77 byte
        # grammar + bounded output under corruption
        ("hdf5-lzf", hdf5_grid_bytes(
            {"band": (((np.arange(12)[:, None] * 37
                        + np.arange(16)[None, :] * 11) % 251
                       ).astype("<u2"), {})},
            chunks={"band": (5, 7)}, deflate=False,
            lzf=True, shuffle=True), h5_parse),
        # lz4 chunks (filter 32004, r17): block grammar + BE framing
        # + raw-stored-block dispatch under corruption
        ("hdf5-lz4", hdf5_grid_bytes(
            {"band": (((np.arange(12)[:, None] * 41
                        + np.arange(16)[None, :] * 19) % 509
                       ).astype("<u2"), {})},
            chunks={"band": (5, 7)}, deflate=False,
            lz4=True), h5_parse),
        # bitshuffle chunks (filter 32008, r17): bit-transpose blocks
        # + LZ4 framing + %8 leftover tail under corruption
        ("hdf5-bitshuffle", hdf5_grid_bytes(
            {"band": (((np.arange(12)[:, None] * 43
                        + np.arange(16)[None, :] * 23) % 769
                       ).astype("<u2"), {})},
            chunks={"band": (5, 7)}, deflate=False,
            bitshuffle={"block": 16}), h5_parse),
        ("hdf5-szip-ec-fletcher", hdf5_grid_bytes(
            {"band": (((np.arange(12)[:, None] * 31
                        + np.arange(16)[None, :] * 17) % 97
                       ).astype("<u4"), {})},
            chunks={"band": (5, 7)}, deflate=False, fletcher32=True,
            szip={"ppb": 16, "option": "ec"}), h5_parse),
        ("hdf5-area", h5_grid(), load_cf_area_h5),
        # CF numeric grid-mapping attrs (float64 attr messages + the
        # cf_gm translation) under corruption
        ("hdf5-cf-attrs", hdf5_grid_bytes({
            "x": ((np.arange(8.0) * 25000 + 12500 - 9e6),
                  {"CLASS": "DIMENSION_SCALE"}),
            "y": ((9e6 - np.arange(6.0) * 25000 - 12500),
                  {"CLASS": "DIMENSION_SCALE"}),
            "crs": (None, {
                "grid_mapping_name": "lambert_azimuthal_equal_area",
                "latitude_of_projection_origin": 90.0,
                "longitude_of_projection_origin": 0.0,
                "semi_major_axis": 6378137.0,
                "inverse_flattening": 298.257223563}),
            "band": (np.arange(48.0).reshape(6, 8),
                     {"grid_mapping": "crs"}),
        }), load_cf_area_h5),
        # object/region-reference tables: gheap IDs + serialized
        # selections under corruption (class 7 datatypes)
        ("hdf5-refs", hdf5_grid_bytes({
            "band_a": (np.arange(12.0).reshape(3, 4), {}),
            "qa_refs": (H5ObjectRef(["band_a", "band_a"]), {}),
            "qa_regions": (H5RegionRef([
                ("band_a", {"type": "hyperslab",
                            "blocks": [((0, 0), (2, 2))]}),
                ("band_a", {"type": "all"}),
            ]), {}),
        }), h5_parse),
        # NTv2 grid-shift files: header records, bounds/increment
        # consistency, float32 node block under corruption
        ("ntv2", demo_ntv2_grid_bytes(), parse_ntv2),
        ("ntv2-multi", demo_ntv2_multi_grid_bytes(), parse_ntv2),
        # NADCON .las/.los pair: header/dims/row-word/pair-consistency
        # guards under corruption of EACH file of the pair
        ("nadcon-las", demo_nadcon_grid_bytes()[0],
         lambda b: parse_nadcon(b, demo_nadcon_grid_bytes()[1])),
        ("nadcon-los", demo_nadcon_grid_bytes()[1],
         lambda b: parse_nadcon(demo_nadcon_grid_bytes()[0], b)),
        # GTX vertical grid: header dims/origin plausibility +
        # truncation guards under corruption
        ("gtx", demo_gtx_grid_bytes(), parse_gtx),
        ("ppm", encode_ppm(17, 11, (50, 100, 150)), decode_ppm),
        ("ppm-container",
         encode_ppm(17, 11, (50, 100, 150)) * 2, decode_ppm_container),
        ("wav", encode_wav_pcm16(16000, [100, -5, 32767, -32768] * 40),
         decode_wav_pcm16),
    ]
    findings = Counter()
    for label, base, parse in cases:
        for f in scan(label, base, parse, deltas):
            findings[label] += 1
    if findings:
        print(f"TOTAL FINDINGS: {dict(findings)}")
        sys.exit(1)
    print("ALL CLEAN")


if __name__ == "__main__":
    main()

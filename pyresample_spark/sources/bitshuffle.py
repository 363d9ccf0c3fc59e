"""Bitshuffle codec: the registered HDF5 filter 32008.

Bitshuffle (the kitware/Masui filter modern detector and L1 archives
ship via hdf5plugin, usually composed with LZ4) transposes the BITS
of a block of elements so that the k-th bits of all elements lie
contiguously — after which byte compressors see long constant runs.
The transform of one block of n elements (n a multiple of 8) of
``elem_size`` bytes equals the pure-numpy reference published in the
bitshuffle project's own test suite:

    bits = np.unpackbits(block_bytes).reshape(n, elem_size * 8)
    out  = np.packbits(bits.transpose().ravel())

i.e. unpack MSB-first per byte, transpose the (element, bit) matrix,
repack. This module implements exactly that (tests reproduce the
reference expression independently and compare).

Chunk layout (bshuf_h5filter.c / bitshuffle.c):

- cd_values: (major, minor, elem_size, block_size_in_elements,
  compression) with compression 0 = none, 2 = LZ4.
- blocking (bshuf_blocked): full blocks of ``block_size`` elements,
  then one trailing block of the remaining count rounded DOWN to a
  multiple of 8, then ``size % 8`` leftover elements UNTRANSFORMED.
- compression 2: a 12-byte header (8-byte big-endian total
  uncompressed size, 4-byte big-endian block size in BYTES) followed
  by one LZ4 block per bitshuffle block, each prefixed with its
  4-byte big-endian compressed size; the ``size % 8`` leftover bytes
  follow raw after the last block. The header block size makes the
  decode independent of the writer's default-block-size heuristic.
- compression 0: no header — the chunk is the transformed bytes. A
  zero cd block size means "the writer's runtime default"; decoding
  that would require reproducing bitshuffle's default-size heuristic
  bit-for-bit, so it raises loudly instead (the LZ4 variant, which
  real products use, is unaffected).
"""

from __future__ import annotations

import struct

import numpy as np

from pyresample_spark.sources.lz4 import lz4_block_decompress


def trans_bit_elem(block: bytes, elem_size: int) -> bytes:
    """Bit-transpose one block (len(block) = n*elem_size, n % 8 == 0)."""
    n = len(block) // elem_size
    bits = np.unpackbits(np.frombuffer(block, dtype=np.uint8)
                         .reshape(n, elem_size * 8 // 8), axis=1)
    return np.packbits(bits.reshape(n, elem_size * 8).T).tobytes()


def untrans_bit_elem(block: bytes, elem_size: int) -> bytes:
    """Inverse bit-transpose (transpose back)."""
    n = len(block) // elem_size
    nbits = elem_size * 8
    bits = np.unpackbits(np.frombuffer(block, dtype=np.uint8))
    return np.packbits(bits.reshape(nbits, n).T).tobytes()


def _block_spans(total_elems: int, block_elems: int):
    """(start, n_elems) per bitshuffle block (bshuf_blocked): full
    blocks, a trailing multiple-of-8 block, leftover handled by the
    caller."""
    count = total_elems - total_elems % 8
    spans = []
    ii = 0
    while ii + block_elems <= count:
        spans.append((ii, block_elems))
        ii += block_elems
    if count - ii:
        spans.append((ii, count - ii))
    return spans


def bitshuffle_decode(raw: bytes, elem_size: int, block_elems: int,
                      compression: int, max_out: int) -> bytes:
    """Undo the filter-32008 transform for one chunk."""
    if elem_size <= 0:
        raise ValueError(f"bitshuffle element size {elem_size}")
    if compression == 2:  # bitshuffle + LZ4 (the shipped combination)
        if len(raw) < 12:
            raise ValueError("bitshuffle-LZ4 chunk too short")
        total = struct.unpack_from(">Q", raw, 0)[0]
        bsize_b = struct.unpack_from(">I", raw, 8)[0]
        if total > max_out:
            raise ValueError(
                f"bitshuffle declared size {total} exceeds the "
                f"chunk's true byte size {max_out}")
        if total % elem_size:
            raise ValueError(
                f"bitshuffle size {total} not a multiple of element "
                f"size {elem_size}")
        if bsize_b % (8 * elem_size):
            raise ValueError(
                f"bitshuffle header block size {bsize_b} not a "
                f"multiple of 8 elements")
        nelem = total // elem_size
        be = bsize_b // elem_size if bsize_b else nelem - nelem % 8
        out = bytearray()
        pos = 12
        for _start, ne in _block_spans(nelem, max(be, 8)):
            if pos + 4 > len(raw):
                raise ValueError("bitshuffle truncated block header")
            csize = struct.unpack_from(">I", raw, pos)[0]
            pos += 4
            ub = ne * elem_size
            if pos + csize > len(raw):
                raise ValueError("bitshuffle block past chunk end")
            dec = lz4_block_decompress(raw[pos:pos + csize], ub)
            pos += csize
            if len(dec) != ub:
                raise ValueError(
                    f"bitshuffle block decoded to {len(dec)} bytes, "
                    f"expected {ub}")
            out += untrans_bit_elem(dec, elem_size)
        left = (nelem % 8) * elem_size
        if left:
            if pos + left > len(raw):
                raise ValueError("bitshuffle truncated leftover bytes")
            out += raw[pos:pos + left]
        return bytes(out)
    if compression == 0:  # plain bitshuffle, no framing
        if block_elems == 0:
            raise NotImplementedError(
                "bitshuffle without compression and with the default "
                "block size (cd block 0) needs the writer's runtime "
                "block-size heuristic — outside the subset (the "
                "LZ4-composed variant real products ship carries the "
                "block size in the chunk header and decodes natively)")
        if block_elems % 8:
            raise ValueError(
                f"bitshuffle cd block size {block_elems} not a "
                "multiple of 8")
        if len(raw) > max_out:
            raise ValueError("bitshuffle chunk exceeds declared size")
        if len(raw) % elem_size:
            raise ValueError(
                f"bitshuffle chunk size {len(raw)} not a multiple of "
                f"element size {elem_size}")
        nelem = len(raw) // elem_size
        out = bytearray()
        for start, ne in _block_spans(nelem, block_elems):
            b0 = start * elem_size
            out += untrans_bit_elem(raw[b0:b0 + ne * elem_size],
                                    elem_size)
        left = (nelem % 8) * elem_size
        if left:
            out += raw[-left:]
        return bytes(out)
    raise NotImplementedError(
        f"bitshuffle compression flag {compression} (0 = none and "
        "2 = LZ4 decode natively; 3 = zstd needs the lib)")


def bitshuffle_encode(raw: bytes, elem_size: int, block_elems: int,
                      compression: int) -> bytes:
    """Fixture twin of :func:`bitshuffle_decode`."""
    from pyresample_spark.sources.lz4 import lz4_block_compress

    if len(raw) % elem_size:
        raise ValueError("payload not a multiple of element size")
    if block_elems == 0 or block_elems % 8:
        raise ValueError("encoder needs an explicit multiple-of-8 "
                         "block size")
    nelem = len(raw) // elem_size
    if compression == 2:
        out = bytearray(struct.pack(">QI", len(raw),
                                    block_elems * elem_size))
        for start, ne in _block_spans(nelem, block_elems):
            b0 = start * elem_size
            enc = lz4_block_compress(
                trans_bit_elem(raw[b0:b0 + ne * elem_size], elem_size))
            out += struct.pack(">I", len(enc)) + enc
        left = (nelem % 8) * elem_size
        if left:
            out += raw[-left:]
        return bytes(out)
    if compression == 0:
        out = bytearray()
        for start, ne in _block_spans(nelem, block_elems):
            b0 = start * elem_size
            out += trans_bit_elem(raw[b0:b0 + ne * elem_size],
                                  elem_size)
        left = (nelem % 8) * elem_size
        if left:
            out += raw[-left:]
        return bytes(out)
    raise ValueError(f"encoder compression flag {compression}")

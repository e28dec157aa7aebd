#!/usr/bin/env python3
"""Engine-independent validation of ZarrSource's written stores.

Usage: python3 tools/zarr_crosscheck.py <storeDir> <var> <expected.csv>

Decodes every chunk of <storeDir>/<var> with stock python only (json,
zlib, struct — no zarr/numcodecs needed): parses .zarray, undoes the
blosc v1 container (header, block offset table, per-stream csize
prefixes, byte-shuffle) for blosc-zlib chunks or inflates plain zlib
chunks, and compares the assembled array against <expected.csv>
(flat C-order doubles, one per line). This is the independent decoder
the JVM writer is validated against — if the frame layout or shuffle
were wrong, this script (sharing no code with the writer) would not
reproduce the values. Driver-side only, NOT part of the shipped
library.
"""
import json
import struct
import sys
import zlib
from pathlib import Path


def unshuffle(buf: bytes, typesize: int) -> bytes:
    n = len(buf) // typesize
    body = n * typesize
    out = bytearray(len(buf))
    for b in range(typesize):
        out[b:body:typesize] = buf[b * n:(b + 1) * n]
    out[body:] = buf[body:]
    return bytes(out)


def lz4_decompress_block(src: bytes, expected: int) -> bytes:
    """Pure-python lz4 block-format decoder (token nibbles, 255-run
    extensions, 2-byte LE offsets, overlapping-copy match semantics)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i:i + lit]
        i += lit
        if i >= n:  # literals-only last sequence
            break
        off = struct.unpack_from("<H", src, i)[0]
        i += 2
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        for k in range(mlen):  # byte-wise: offsets < mlen overlap-copy
            out.append(out[start + k])
    assert len(out) == expected, f"lz4 stream gave {len(out)}/{expected}"
    return bytes(out)


def blosc_decode(frame: bytes) -> bytes:
    flags, typesize = frame[2], frame[3]
    nbytes, blocksize, _cbytes = struct.unpack_from("<iii", frame, 4)
    shuffled = flags & 0x1
    memcpyed = flags & 0x2
    dont_split = flags & 0x10
    codec = (flags >> 5) & 0x7
    if memcpyed:
        return frame[16:16 + nbytes]
    assert codec in (1, 3), \
        f"cross-check only decodes lz4/zlib payloads, got {codec}"
    if blocksize <= 0:
        blocksize = nbytes
    nblocks = (nbytes + blocksize - 1) // blocksize
    split = (not dont_split) and codec in (0, 1) and 1 < typesize <= 16 \
        and blocksize // typesize >= 128
    out = bytearray(nbytes)
    for j in range(nblocks):
        bstart = struct.unpack_from("<i", frame, 16 + 4 * j)[0]
        neblock = min(blocksize, nbytes - j * blocksize)
        nstreams = typesize if split else 1
        stream_len = neblock // nstreams
        block = bytearray(neblock)
        pos = bstart
        for s in range(nstreams):
            csize = struct.unpack_from("<i", frame, pos)[0]
            pos += 4
            payload = frame[pos:pos + csize]
            if csize == stream_len:
                dec = payload
            elif codec == 1:
                dec = lz4_decompress_block(payload, stream_len)
            else:
                dec = zlib.decompress(payload)
            block[s * stream_len:(s + 1) * stream_len] = dec
            pos += csize
        if shuffled:
            block = bytearray(unshuffle(bytes(block), typesize))
        out[j * blocksize:j * blocksize + neblock] = block
    return bytes(out)


def main(store, var, expected_csv):
    adir = Path(store) / var
    meta = json.loads((adir / ".zarray").read_text())
    assert meta["dtype"] == "<f8", "cross-check covers <f8 arrays"
    shape, chunks = meta["shape"], meta["chunks"]
    comp = meta.get("compressor") or {}
    want = [float(line) for line in Path(expected_csv).read_text().split()]

    def grid(dims):
        out = [[]]
        for n in dims:
            out = [p + [i] for p in out for i in range(n)]
        return out

    nchunks = [(s + c - 1) // c for s, c in zip(shape, chunks)]
    got = {}
    for cidx in grid(nchunks):
        f = adir / ".".join(str(i) for i in cidx)
        if not f.exists():
            continue
        raw = f.read_bytes()
        if comp.get("id") == "blosc":
            data = blosc_decode(raw)
        elif comp.get("id") == "zlib":
            data = zlib.decompress(raw)
        else:
            data = raw
        vals = struct.unpack(f"<{len(data) // 8}d", data)
        # C-order walk of the chunk, keep in-bounds elements
        for flat in range(len(vals)):
            rem, idx = flat, []
            for c in reversed(chunks):
                idx.append(rem % c)
                rem //= c
            idx = idx[::-1]
            gidx = [ci * c + i for ci, c, i in zip(cidx, chunks, idx)]
            if all(g < s for g, s in zip(gidx, shape)):
                flat_g = 0
                for g, s in zip(gidx, shape):
                    flat_g = flat_g * s + g
                got[flat_g] = vals[flat]
    assert len(got) == len(want), f"{len(got)} values vs {len(want)} expected"
    bad = [i for i in range(len(want)) if got[i] != want[i]]
    assert not bad, f"value mismatch at flat indices {bad[:5]}"
    print(f"PASS {var}: {len(want)} values decoded independently, all exact")


# ---------------------------------------------------------------- gen-lz4
# Independent lz4+shuffle SPLIT fixture generator (round-13 closest
# achievable evidence for the numcodecs/xarray default compressor:
# zarr/numcodecs still won't install in this sandbox, so instead of a
# real xarray-written store we hand-build blosc-lz4 frames with a pure
# python lz4 BLOCK-format compressor that shares zero code with the
# JVM reader or the jpountz library — if ZarrSource's frame layout,
# split predicate, shuffle order or lz4 sequence decoding were wrong,
# this store would not read back).


def lz4_compress_block(src: bytes) -> bytes:
    """Minimal greedy lz4 block-format compressor (spec-conformant:
    token nibbles, 255-run length extensions, 2-byte LE offsets,
    literals-only last sequence, last 5 bytes literal, no match
    starting in the final 12 bytes)."""
    n = len(src)
    out = bytearray()

    def put_len(first: int, extra: int):
        if extra >= 15:
            rem = extra - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)

    def emit(lit: bytes, off: int = 0, mlen: int = 0):
        lit_tok = min(len(lit), 15)
        m_tok = min(mlen - 4, 15) if mlen else 0
        out.append((lit_tok << 4) | m_tok)
        if len(lit) >= 15:
            rem = len(lit) - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(lit)
        if mlen:
            out.extend(struct.pack("<H", off))
            if mlen - 4 >= 15:
                rem = mlen - 4 - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    i = anchor = 0
    while i + 4 <= n - 12:  # matches may not start in the last 12 bytes
        best_len, best_off = 0, 0
        for j in range(max(0, i - 65535), i):
            if src[j:j + 4] == src[i:i + 4]:
                ln = 4
                while i + ln < n - 5 and src[j + ln] == src[i + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_off = ln, i - j
        if best_len >= 4:
            emit(src[anchor:i], best_off, best_len)
            i += best_len
            anchor = i
        else:
            i += 1
    emit(src[anchor:n])  # literals-only last sequence
    return bytes(out)


def shuffle(buf: bytes, typesize: int) -> bytes:
    n = len(buf) // typesize
    body = n * typesize
    out = bytearray(len(buf))
    for b in range(typesize):
        out[b * n:(b + 1) * n] = buf[b:body:typesize]
    out[body:] = buf[body:]
    return bytes(out)


def blosc_lz4_frame(chunk: bytes, typesize: int, blocksize: int) -> bytes:
    nbytes = len(chunk)
    nblocks = (nbytes + blocksize - 1) // blocksize
    flags = 0x1 | (1 << 5)  # shuffle on, codec lz4, DONT_SPLIT clear
    split = 1 < typesize <= 16 and blocksize // typesize >= 128
    assert split, "fixture intends the SPLIT path"
    offsets, body = [], bytearray()
    base = 16 + 4 * nblocks
    compressed_streams = 0
    for j in range(nblocks):
        offsets.append(base + len(body))
        neblock = min(blocksize, nbytes - j * blocksize)
        block = shuffle(chunk[j * blocksize:j * blocksize + neblock],
                        typesize)
        stream_len = neblock // typesize
        for s in range(typesize):
            plane = block[s * stream_len:(s + 1) * stream_len]
            comp = lz4_compress_block(plane)
            if len(comp) < stream_len:
                body += struct.pack("<i", len(comp)) + comp
                compressed_streams += 1
            else:  # stored raw: csize == stream length
                body += struct.pack("<i", stream_len) + plane
    assert compressed_streams > 0, \
        "fixture must exercise real lz4 decoding, not only stored-raw"
    frame = bytearray([2, 1, flags, typesize])
    frame += struct.pack("<iii", nbytes, blocksize,
                         base + len(body))
    for off in offsets:
        frame += struct.pack("<i", off)
    frame += body
    # self-check with the independent decoder above
    assert blosc_decode(bytes(frame)) == chunk
    return bytes(frame)


def gen_lz4(dest: str):
    adir = Path(dest)
    adir.mkdir(parents=True, exist_ok=True)
    shape, chunk_len, typesize, blocksize = 400, 256, 8, 1024
    vals = [(i % 32) * 0.5 for i in range(shape)]
    meta = {
        "zarr_format": 2, "shape": [shape], "chunks": [chunk_len],
        "dtype": "<f8", "order": "C", "fill_value": 0.0,
        "filters": None,
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                       "shuffle": 1, "blocksize": blocksize},
    }
    (adir / ".zarray").write_text(json.dumps(meta))
    for ci in range((shape + chunk_len - 1) // chunk_len):
        part = vals[ci * chunk_len:(ci + 1) * chunk_len]
        part += [0.0] * (chunk_len - len(part))  # zarr pads edge chunks
        chunk = struct.pack(f"<{chunk_len}d", *part)
        (adir / str(ci)).write_bytes(
            blosc_lz4_frame(chunk, typesize, blocksize))
    print(f"wrote lz4+shuffle SPLIT fixture at {adir} "
          f"({shape} doubles, blocksize {blocksize})")


if __name__ == "__main__":
    if sys.argv[1] == "gen-lz4":
        gen_lz4(sys.argv[2])
    else:
        main(sys.argv[1], sys.argv[2], sys.argv[3])

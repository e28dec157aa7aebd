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


def blosc_decode(frame: bytes) -> bytes:
    flags, typesize = frame[2], frame[3]
    nbytes, blocksize, _cbytes = struct.unpack_from("<iii", frame, 4)
    shuffled = flags & 0x1
    memcpyed = flags & 0x2
    dont_split = flags & 0x10
    codec = (flags >> 5) & 0x7
    if memcpyed:
        return frame[16:16 + nbytes]
    assert codec == 3, f"cross-check only decodes zlib payloads, got {codec}"
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
            dec = payload if csize == stream_len else zlib.decompress(payload)
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


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])

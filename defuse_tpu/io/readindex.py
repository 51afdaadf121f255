"""O(1) read lookup via the binary ``.fqi`` offset index.

Same layout the reference's ``ReadIndex`` consumes
(``tools/ReadIndex.cpp:67-129``): for fragment ids 0..N-1, two packed
little-endian int64s per fragment — the byte offset of the fragment's
fastq record in the end-1 and end-2 files.  The evidence viewer
(``defuse_get_reads.pl`` equivalent) seeks instead of scanning the whole
library when the index exists.
"""

from __future__ import annotations

import pathlib
import struct


class ReadIndex:
    RECORD = struct.Struct("<qq")

    def __init__(self, prefix: str):
        prefix = str(prefix)
        self._fqi = open(prefix + ".fqi", "rb")
        self._fastq = [open(prefix + ".1.fastq", "rb"),
                       open(prefix + ".2.fastq", "rb")]

    def close(self):
        self._fqi.close()
        for fh in self._fastq:
            fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def get(self, fragment: int, end: int) -> str:
        """Read sequence for (fragment, end 0/1); '' when out of range."""
        rec = self.get_record(fragment, end)
        return rec[1] if rec else ""

    def get_record(self, fragment: int, end: int):
        """Full fastq record (header, sequence, comment, quality) for
        (fragment, end 0/1) with trailing newlines stripped, or None
        when out of range — the seek protocol of
        ``get_fusion_fastq.pl:output_reads_to_fastq``."""
        self._fqi.seek(fragment * self.RECORD.size)
        raw = self._fqi.read(self.RECORD.size)
        if len(raw) < self.RECORD.size:
            return None
        offset = self.RECORD.unpack(raw)[end]
        fh = self._fastq[end]
        fh.seek(offset)
        header = fh.readline()
        if not header.startswith(b"@"):
            return None
        # defensive: offset 0 is also the miss marker for absent ends
        if int(header[1:].rsplit(b"/", 1)[0]) != fragment:
            return None
        return tuple(
            [header.rstrip(b"\n").decode()]
            + [fh.readline().rstrip(b"\n").decode() for _ in range(3)])

    @staticmethod
    def build(fastq1: str, fastq2: str, fqi_path: str) -> None:
        """Write the index for integer-renamed paired fastqs."""
        offsets = [{}, {}]
        n = 0
        for end, path in ((0, fastq1), (1, fastq2)):
            pos = 0
            with open(path, "rb") as fh:
                while True:
                    start = pos
                    header = fh.readline()
                    if not header:
                        break
                    pos += len(header)
                    for _ in range(3):
                        pos += len(fh.readline())
                    frag = int(header[1:].rsplit(b"/", 1)[0])
                    offsets[end][frag] = start
                    n = max(n, frag + 1)
        with open(fqi_path, "wb") as out:
            for frag in range(n):
                out.write(ReadIndex.RECORD.pack(
                    offsets[0].get(frag, 0), offsets[1].get(frag, 0)))


def exists(prefix: str) -> bool:
    p = pathlib.Path(str(prefix) + ".fqi")
    return p.exists()

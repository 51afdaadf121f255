"""Device verification produces identical alignments to the numpy path."""

import random

from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.ops.verify_batch import DeviceVerifier


def test_device_verifier_matches_numpy():
    rng = random.Random(21)
    seqs = {"A": "".join(rng.choice("ACGT") for _ in range(8000)),
            "B": "".join(rng.choice("ACGT") for _ in range(5000))}
    index = SeedIndex(seqs)
    reads = []
    for _ in range(40):
        src = seqs[rng.choice("AB")]
        p = rng.randint(0, len(src) - 50)
        read = list(src[p:p + 50])
        for _ in range(rng.randint(0, 2)):
            i = rng.randrange(50)
            read[i] = rng.choice([c for c in "ACGT" if c != read[i]])
        reads.append("".join(read))

    plain = index.align_batch(reads)
    dev = index.align_batch(reads, verify_fn=DeviceVerifier(batch=512))

    def norm(res):
        return [sorted((a.ref, a.pos, a.strand, a.mismatches)
                       for a in hits) for hits in res]

    assert norm(plain) == norm(dev)

"""Large-genome scale tests (slow; opt-in via RUN_SLOW=1)."""

import os
import time

import numpy as np
import pytest

slow = pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                          reason="set RUN_SLOW=1 for scale tests")


@slow
def test_chr20_scale_index_and_align(tmp_path):
    from lariat_tpu.align.engine import AlignmentEngine, encode_read
    from lariat_tpu.index import fmindex
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    glen = 64_000_000
    g = bases[rng.integers(0, 4, glen)]
    fasta = tmp_path / "c20.fa"
    with open(fasta, "w") as f:
        f.write(">chr20s\n")
        s = g.tobytes().decode()
        for i in range(0, len(s), 1 << 20):
            f.write(s[i:i + (1 << 20)] + "\n")
    t0 = time.time()
    fm = fmindex.build_index(str(fasta), sa_intv=8)
    assert time.time() - t0 < 300
    eng = AlignmentEngine(fm)
    genome = g.tobytes()
    for i in range(10):
        pos = int(rng.integers(0, glen - 151))
        regs = eng.align1(encode_read(genome[pos:pos + 151]))
        assert eng.interpret_align(regs[0]).offset == pos

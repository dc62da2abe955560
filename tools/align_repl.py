#!/usr/bin/env python3
"""Interactive read-pair aligner demo (equivalent of gobwa_example/main.go).

Reads two sequences per round from stdin, prints every candidate alignment
for each (contig, offset, strand, score) like the reference REPL
(gobwa_example/main.go:16-60).

Usage: python tools/align_repl.py <genome.fa or index prefix>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lariat_tpu.align.engine import AlignmentEngine  # noqa: E402
from lariat_tpu.cli import load_reference  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: align_repl.py <genome.fa>")
        return 1
    print(f"Loading reference {sys.argv[1]} ...")
    engine = AlignmentEngine(load_reference(sys.argv[1]))
    print("Ready. Enter read1 then read2 (empty line to quit).")
    while True:
        try:
            r1 = input("read1> ").strip().upper()
            if not r1:
                return 0
            r2 = input("read2> ").strip().upper()
        except EOFError:
            return 0
        ea1, ea2 = engine.align_pair(r1.encode(), r2.encode(), score_delta=25)
        for label, eas in (("read1", ea1), ("read2", ea2)):
            print(f"{label}: {len(eas)} candidates")
            for ea in eas:
                strand = "-" if ea.reversed_ else "+"
                print(f"  {ea.contig}:{ea.offset}{strand} score={ea.score} "
                      f"readspan=[{ea.read_s},{ea.read_e})")


if __name__ == "__main__":
    sys.exit(main())

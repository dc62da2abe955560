"""Alignment pair scoring (reference inference/lariat.go:590-624, 1102-1133)."""

from __future__ import annotations

from typing import Optional

from .types import Alignment


def is_pair(read1: Alignment, read2: Alignment) -> bool:
    """Proper-pair test: opposite strands, same contig, -35 <= dist < 750
    (lariat.go:1102-1133)."""
    if read1.reversed_ == read2.reversed_ or read1.contig != read2.contig:
        return False
    if read1.reversed_:
        forward, reverse = read2, read1
    else:
        forward, reverse = read1, read2
    dist = reverse.pos - forward.pos
    return -35 <= dist < 750


def _part(a: Alignment) -> float:
    """Per-alignment term of scoreAlignment (cached; all terms are exact
    multiples of 0.5 so the cached partial sum is bit-identical to the
    sequential accumulation)."""
    p = a.score_part
    if p is None:
        p = a.mismatches * -2.0 + a.indels * -3.0
        if a.soft_clipped > 0:
            p -= 5.0 * a.soft_clipped
            p -= a.soft_clipped_length * 0.5
        a.score_part = p
    return p


def score_alignment(aln: Optional[Alignment], mate: Optional[Alignment],
                    log_molecule_penalty: float,
                    improper_pair_penalty: float) -> float:
    """scoreAlignment (lariat.go:599-624): mismatch -2, indel -3, soft clip
    -5/side -0.5/base, improper-pair penalty, molecule penalty."""
    score = 0.0
    if aln is not None:
        score += _part(aln)
    if mate is not None:
        score += _part(mate)
    if mate is None or aln is None or not is_pair(aln, mate):
        score += improper_pair_penalty
    if aln is not None and not aln.active_molecule:
        score += log_molecule_penalty
    return score


def pseudo_count_alignment_score(aln: Alignment,
                                 log_molecule_penalty: float) -> float:
    """psuedoCountAlignmentScore (lariat.go:590-597): hypothetical unmapped
    25bp-alignment hypothesis."""
    pseudo_len = 25.0
    score = 0.0
    score -= 10.0                                       # max soft-clip sides
    score -= (len(aln.read_seq) - pseudo_len) * 0.5     # soft-clip length
    score += log_molecule_penalty
    return score

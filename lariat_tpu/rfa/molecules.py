"""Molecule calling: 1-D clustering + per-molecule best-alignment tables.

Equivalents of inferMolecules (lariat.go:1370-1408),
markBestAlignmentForReadInMolecule (lariat.go:1410-1463), scrapMolecules
(lariat.go:1061-1086), setMoleculeDifferences (lariat.go:570-588) and
setMoleculeConfidences (lariat.go:1048-1059).
"""

from __future__ import annotations

from typing import List

from .scoring import score_alignment
from .types import Alignment, CandidateMolecule, SwapOrderedMap

MOLECULE_GAP = 50000


def infer_molecules(positions: List[List[Alignment]]) -> List[CandidateMolecule]:
    """Greedy 1-D clustering: new molecule at gaps > 50 kb (lariat.go:1376)."""
    out: List[CandidateMolecule] = []
    molecule_num = 0
    current = None
    for plist in positions:
        for i, aln in enumerate(plist):
            if i == 0 or aln.pos - plist[i - 1].pos > MOLECULE_GAP:
                if i > 0:
                    current.stop = plist[i - 1].pos
                current = CandidateMolecule(
                    id=molecule_num, chrom=aln.contig, start=aln.pos)
                aln_map = SwapOrderedMap()
                aln_map.set(aln.id, aln)
                current.alignments.set(aln.read_id, aln_map)
                out.append(current)
                molecule_num += 1
            else:
                aln_map = current.alignments.get(aln.read_id)
                if aln_map is not None:
                    aln_map.set(aln.id, aln)
                else:
                    aln_map = SwapOrderedMap()
                    aln_map.set(aln.id, aln)
                    current.alignments.set(aln.read_id, aln_map)
        if plist:
            current.stop = plist[-1].pos
    return out


def mark_best_alignment_for_read_in_molecule(
        molecules: List[CandidateMolecule],
        improper_pair_penalty: float) -> None:
    """Per molecule per read: best pair-scored alignment + active sets."""
    for molecule in molecules:
        active_alignments = SwapOrderedMap()
        best_for_read = SwapOrderedMap()
        for read_id in molecule.alignments.keys():
            alignments = molecule.alignments.get(read_id)
            best_score = -float("inf")
            best_alignment = None
            for alignment_id in alignments.keys():
                alignment = alignments.get(alignment_id)
                mate_alignments = molecule.alignments.get(alignment.mate_id)
                if mate_alignments is not None and len(mate_alignments) > 0:
                    for mate_id2 in mate_alignments.keys():
                        mate = mate_alignments.get(mate_id2)
                        score = score_alignment(alignment, mate, 0.0,
                                                improper_pair_penalty)
                        if score > best_score:
                            best_score = score
                            best_alignment = alignment
                else:
                    if alignment.log_alignment_probability > best_score:
                        best_score = alignment.log_alignment_probability
                        best_alignment = alignment
                if alignment.active:
                    active_alignments.set(read_id, alignment)
            if best_alignment.active:
                active_alignments.set(read_id, best_alignment)
            best_for_read.set(read_id, best_alignment)
        for aln in active_alignments.values():
            for loc in aln.mismatch_locs:
                molecule.mismatch_locs[loc] = molecule.mismatch_locs.get(loc, 0) + 1
        molecule.active_alignments = active_alignments
        molecule.best_alignment_for_read = best_for_read


def scrap_molecules(molecules: List[CandidateMolecule]
                    ) -> List[CandidateMolecule]:
    """Drop empty molecules; renumber molecule_id on member alignments."""
    kept: List[CandidateMolecule] = []
    count = 0
    for mol in molecules:
        if len(mol.active_alignments) > 0:
            kept.append(mol)
            for read_id in mol.alignments.keys():
                amap = mol.alignments.get(read_id)
                for aid in amap.keys():
                    amap.get(aid).molecule_id = count
            count += 1
        else:
            for read_id in mol.alignments.keys():
                amap = mol.alignments.get(read_id)
                for aid in amap.keys():
                    amap.get(aid).molecule_id = -1
    return kept


def set_molecule_differences(molecules: List[CandidateMolecule],
                             set_bad: bool) -> None:
    for mol in molecules:
        differences = 0
        for aln in mol.active_alignments.values():
            differences += aln.mismatches
        n = len(mol.active_alignments)
    # (loop split keeps reference behavior: differences uses len at call time)
        if set_bad and n and differences / n > 1.5:
            for aln in mol.active_alignments.values():
                aln.bad_molecule = True
        mol.differences = differences / n if n else float("nan")
        for aln in mol.active_alignments.values():
            aln.molecule_difference = mol.differences


def molecule_confidence(mol: CandidateMolecule, num_active: int) -> float:
    return num_active / len(mol.best_alignment_for_read)


def set_molecule_confidences(molecules: List[CandidateMolecule]) -> None:
    for mol in molecules:
        mol.molecule_confidence = molecule_confidence(
            mol, len(mol.active_alignments))
        for aln in mol.active_alignments.values():
            if aln.soft_clipped > 0:
                mol.soft_clipped += 1
            aln.molecule_confidence = mol.molecule_confidence

"""FASTA-derived predicted spectral libraries
(reference: ann_solo/reader.py:941-1020).

Reads protein sequences, performs in-silico digestion, and predicts target
and decoy spectra for the resulting peptides via the Koina/Prosit remote
service (ann_solo_tpu.prosit).  When the prediction server is unreachable
(this framework also runs in zero-egress environments), a deterministic
local fragment-ion predictor stands in: b/y ions with mobile-proton-flavored
intensity heuristics -- clearly marked, and only used as a fallback.
"""

from __future__ import annotations

import logging
from typing import Iterator, List

import numpy as np

from ann_solo_tpu.decoy import _shuffle
from ann_solo_tpu.io import masses
from ann_solo_tpu.models.spectrum import ION_TYPE_CODES, Spectrum

logger = logging.getLogger(__name__)


def read_fasta_proteins(filename: str) -> List[str]:
    """Protein sequences from a FASTA file."""
    proteins: List[str] = []
    current: List[str] = []
    with open(filename) as f_in:
        for line in f_in:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if current:
                    proteins.append("".join(current))
                current = []
            else:
                current.append(line)
    if current:
        proteins.append("".join(current))
    return proteins


def _predicted_spectrum(
    peptide: str,
    charge: int,
    identifier: str,
    is_decoy: bool,
) -> Spectrum:
    """Deterministic local b/y-ion prediction (Prosit fallback)."""
    proteoform = masses.parse_proforma(peptide)
    frags = masses.theoretical_fragments(
        proteoform, "by", max_charge=min(charge, 2)
    )
    mz, intensity = [], []
    ann_type, ann_index, ann_charge = [], [], []
    n = len(proteoform.sequence)
    for label, frag_mz in sorted(frags.items(), key=lambda kv: kv[1]):
        ion, chg = label.split("^")
        idx = int(ion[1:])
        # Mid-sequence fragments are most intense (simple HCD prior).
        rel = idx / n
        base = np.exp(-(((rel - 0.5) / 0.35) ** 2))
        if ion[0] == "y":
            base *= 1.4  # y ions dominate tryptic HCD spectra
        if int(chg) > 1:
            base *= 0.35
        mz.append(frag_mz)
        intensity.append(base)
        ann_type.append(ION_TYPE_CODES[ion[0]])
        ann_index.append(idx)
        ann_charge.append(int(chg))
    return Spectrum(
        identifier=identifier,
        precursor_mz=proteoform.precursor_mz(charge),
        precursor_charge=charge,
        mz=np.asarray(mz),
        intensity=np.asarray(intensity),
        ann_type=np.asarray(ann_type, np.uint8),
        ann_index=np.asarray(ann_index, np.int16),
        ann_charge=np.asarray(ann_charge, np.uint8),
        peptide=peptide,
        is_decoy=is_decoy,
    )


def read_fasta(filename: str, config) -> Iterator[Spectrum]:
    """Generate target + decoy predicted spectra from a FASTA file.

    Mirrors the reference pipeline (reader.py:941-1020): digest -> enumerate
    (peptide, charge, collision energy) -> predict targets -> shuffle
    peptides -> predict decoys.
    """
    proteins = read_fasta_proteins(filename)
    peptides = sorted(
        set().union(
            *[
                masses.cleave(
                    protein, config.protease, config.missed_cleavages
                )
                for protein in proteins
            ]
        )
    )
    logger.info(
        "Digested %d proteins into %d peptides", len(proteins),
        len(peptides),
    )
    jobs: List[tuple] = []
    for collision_energy in config.collision_energies:
        for charge in range(
            config.min_precursor_charge, config.max_precursor_charge + 1
        ):
            for peptide in peptides:
                jobs.append((peptide, charge, collision_energy))

    try:
        from ann_solo_tpu.prosit import get_predictions

        yield from _predict_remote(jobs, get_predictions, config)
        return
    except Exception as e:  # network unavailable / koinapy missing
        logger.warning(
            "Prosit/Koina prediction unavailable (%s); using the local "
            "fragment-ion predictor", e,
        )
    for i, (peptide, charge, _ce) in enumerate(jobs):
        yield _predicted_spectrum(peptide, charge, str(i), False)
    for i, (peptide, charge, _ce) in enumerate(jobs):
        decoy_peptide, _ = _shuffle(peptide)
        yield _predicted_spectrum(
            decoy_peptide, charge, f"DECOY_{i}", True
        )


def _predict_remote(jobs, get_predictions, config) -> Iterator[Spectrum]:
    """Targets then decoys via the Koina client (reference
    reader.py:985-1020)."""
    peptides = [j[0] for j in jobs]
    charges = [j[1] for j in jobs]
    energies = [j[2] for j in jobs]
    precursor_mz = [
        masses.precursor_mz(p, c) for p, c in zip(peptides, charges)
    ]
    offset = 0
    for batch in get_predictions(peptides, charges, energies, config):
        for idx in range(len(batch["intensities"])):
            i = offset + idx
            spectrum = Spectrum(
                identifier=str(i),
                precursor_mz=precursor_mz[i],
                precursor_charge=charges[i],
                mz=np.asarray(batch["mz"][idx], np.float64),
                intensity=np.asarray(batch["intensities"][idx], np.float64),
                peptide=peptides[i],
                is_decoy=False,
            )
            yield spectrum
        offset += len(batch["intensities"])
    decoys = [_shuffle(p)[0] for p in peptides]
    offset = 0
    for batch in get_predictions(decoys, charges, energies, config):
        for idx in range(len(batch["intensities"])):
            i = offset + idx
            spectrum = Spectrum(
                identifier=f"DECOY_{i}",
                precursor_mz=precursor_mz[i],
                precursor_charge=charges[i],
                mz=np.asarray(batch["mz"][idx], np.float64),
                intensity=np.asarray(batch["intensities"][idx], np.float64),
                peptide=decoys[i],
                is_decoy=True,
            )
            yield spectrum
        offset += len(batch["intensities"])

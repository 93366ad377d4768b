"""Synthetic peptide spectrum factories for tests.

The implementation lives in `ann_solo_tpu.synthdata` (shared with the
quality benchmark, ann_solo_tpu.quality); this shim keeps the historical
`from synth import ...` test imports working.
"""

from ann_solo_tpu.synthdata import (  # noqa: F401
    AMINO_ACIDS,
    MOD_MASSES,
    MOD_WEIGHTS,
    make_corpus,
    make_library,
    modified_query,
    noisy_query,
    peptide_spectrum,
    random_mod_mass,
    random_peptide,
)

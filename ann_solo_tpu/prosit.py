"""Koina/Prosit remote spectrum prediction client
(reference: ann_solo/prosit.py).

Predicts fragment spectra for peptides via a Koina gRPC server.  The koinapy
dependency is optional; importing this module without it raises on first
use, and ann_solo_tpu.io.fasta falls back to its local predictor.  (The
reference version also has a latent bug -- it uses pandas without importing
it, prosit.py:42 -- fixed here.)
"""

from __future__ import annotations

import logging
from typing import Dict, Iterator, List

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def get_predictions(
    peptides: List[str],
    precursor_charges: List[int],
    collision_energies: List[int],
    config,
) -> Iterator[Dict[str, np.ndarray]]:
    """Predict spectra for peptide batches (reference prosit.py:9-64).

    Yields one dict per batch with 'intensities', 'mz', and 'annotation'
    lists, grouped per peptide.
    """
    from koinapy import Koina  # optional dependency

    batch_size = int(config.prosit_batch_size)
    model = Koina(config.prosit_model_name, config.prosit_server_url)
    for i in range(0, len(peptides), batch_size):
        inputs = pd.DataFrame(
            {
                "peptide_sequences": peptides[i : i + batch_size],
                "precursor_charges": precursor_charges[i : i + batch_size],
                "collision_energies": collision_energies[
                    i : i + batch_size
                ],
            }
        )
        predictions = model.predict(inputs)
        grouped = (
            predictions.groupby(
                [
                    "peptide_sequences",
                    "precursor_charges",
                    "collision_energies",
                ],
                sort=False,
            )
            .agg({"intensities": list, "mz": list, "annotation": list})
            .reset_index()
        )
        yield grouped.to_dict(orient="list")

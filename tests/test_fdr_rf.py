"""Random-forest semi-supervised rescoring smoke test (slower path)."""

import numpy as np

from ann_solo_tpu import fdr

from test_fdr import FakeConfig, _make_synthetic_ssms


def test_rf_model_separates_targets():
    ssms = _make_synthetic_ssms(n_targets=150, n_decoys=150)
    scored = fdr.score_ssms(ssms, 0.05, "rf", config=FakeConfig())
    q = np.asarray([s.q for s in scored])
    is_decoy = np.asarray([s.is_decoy for s in scored])
    assert np.isnan(q[is_decoy]).all()
    assert (q[~is_decoy] < 0.05).mean() > 0.7

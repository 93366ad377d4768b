"""FDR / rescoring tests, including the reference's golden q-value test
(src/tests/utils_test.py:10-80)."""

import numpy as np
import pytest

from ann_solo_tpu import fdr
from ann_solo_tpu.models.spectrum import Spectrum, SpectrumSpectrumMatch


class FakeConfig:
    _values = {
        "min_mz": 11, "max_mz": 2010, "bin_size": 0.04,
    }

    def __getattr__(self, key):
        return self._values[key]

    def __getitem__(self, key):
        return self._values[key]


def test_tdc_qvalues_convention():
    # 12 SSMs sorted descending by score; decoys at ranks 4,5,9,10,12.
    scores = np.arange(12, 0, -1, dtype=float)
    is_target = np.asarray(
        [True, True, True, False, False, True, True, True, False, False,
         True, False]
    )
    q = fdr.tdc_qvalues(scores, is_target)
    expected = [
        1 / 3, 1 / 3, 1 / 3, 1 / 2, 1 / 2, 1 / 2, 1 / 2, 1 / 2,
        2 / 3, 5 / 7, 5 / 7, 6 / 7,
    ]
    np.testing.assert_allclose(q, expected)


def test_tdc_qvalues_ties_share_threshold():
    scores = np.asarray([5.0, 5.0, 4.0, 3.0])
    is_target = np.asarray([True, False, True, True])
    q = fdr.tdc_qvalues(scores, is_target)
    # At score 5: 2 targets? no -- 1 target 1 decoy -> (1+1)/1 = 2 -> clip 1.
    assert q[0] == q[1]


def test_score_ssms_golden():
    """Port of the reference golden test (utils_test.py)."""
    mz = np.asarray(
        [138.066, 235.119, 398.182, 511.266, 640.309, 755.336,
         175.119, 290.146, 419.188, 532.273, 695.336, 792.389]
    )
    intensity = np.asarray(
        [0.03675187, 0.41731364, 0.00473946, 0.00332476, 0.00320261,
         0.00670335, 0.40390085, 0.09983288, 0.01661951, 0.05734070,
         0.22102276, 0.77388125]
    )
    peak_matches = np.asarray([(i, i) for i in range(len(mz))])
    intensity = intensity / np.linalg.norm(intensity)
    spec1 = Spectrum("query", 465.227, 2, mz, intensity)
    ssms = []
    for i in range(12):
        intensity_new = np.copy(intensity)
        intensity_new[-1] *= 1 + i / 100
        intensity_new /= np.linalg.norm(intensity_new)
        spec2 = Spectrum("HPYLEDR", 465.227, 2, mz, intensity_new)
        spec2.peptide = "HPYLEDR"
        spec2.is_decoy = i in [3, 4, 8, 9, 11]
        ssms.append(SpectrumSpectrumMatch(spec1, spec2, peak_matches))

    q_values = [
        1 / 3, 1 / 3, 1 / 3, np.nan, np.nan, 1 / 2, 1 / 2, 1 / 2,
        np.nan, np.nan, 5 / 7, np.nan,
    ]
    scored = fdr.score_ssms(ssms, 0.33, None, config=FakeConfig())
    np.testing.assert_array_equal(q_values, [ssm.q for ssm in scored])


def _make_synthetic_ssms(n_targets=300, n_decoys=300, seed=5):
    """Synthetic SSMs where targets have higher cosine than decoys."""
    rng = np.random.default_rng(seed)
    ssms = []
    k = 20
    for i in range(n_targets + n_decoys):
        is_decoy = i >= n_targets
        mz = np.sort(rng.uniform(150, 1200, k))
        q_int = rng.uniform(0.1, 1.0, k)
        q_int /= np.linalg.norm(q_int)
        noise = 0.9 if is_decoy else 0.1
        l_int = q_int * (1 - noise) + rng.uniform(0.1, 1.0, k) * noise
        l_int /= np.linalg.norm(l_int)
        n_match = rng.integers(5, k) if is_decoy else k
        matches = np.column_stack(
            [np.arange(n_match), np.arange(n_match)]
        )
        query = Spectrum(f"q{i}", 500.0 + i * 0.01, 2, mz, q_int)
        library = Spectrum(f"l{i}", 500.0 + i * 0.01 - 0.001, 2, mz, l_int)
        library.peptide = f"PEPTIDEK{i}"
        library.is_decoy = is_decoy
        ssms.append(SpectrumSpectrumMatch(query, library, matches))
    return ssms


@pytest.mark.parametrize("model", ["svm", None])
def test_score_ssms_separates_targets(model):
    ssms = _make_synthetic_ssms()
    scored = fdr.score_ssms(ssms, 0.05, model, config=FakeConfig())
    q = np.asarray([s.q for s in scored])
    is_decoy = np.asarray([s.is_decoy for s in scored])
    # Most targets should be confidently identified; decoys keep NaN.
    assert np.isnan(q[is_decoy]).all()
    frac_identified = (q[~is_decoy] < 0.05).mean()
    assert frac_identified > 0.8


def test_ssm_groups():
    # Two tight mass-difference clusters (0 Da and ~16 Da) + noise.
    rng = np.random.default_rng(2)
    ssms = []
    diffs = np.concatenate(
        [
            rng.normal(0.0, 0.01, 200),
            rng.normal(15.995, 0.01, 150),
            rng.uniform(30, 60, 30),
        ]
    )
    for i, d in enumerate(diffs):
        query = Spectrum(f"q{i}", 500.0 + d / 2, 2,
                         np.linspace(100, 1000, 10), np.ones(10))
        library = Spectrum(f"l{i}", 500.0, 2,
                           np.linspace(100, 1000, 10), np.ones(10))
        ssms.append(SpectrumSpectrumMatch(query, library))
    groups = fdr._get_ssm_groups(ssms, min_group_size=100)
    # The two planted clusters each form one group; sparse diffs -> residual.
    g0 = groups[:200]
    g16 = groups[200:350]
    assert len(np.unique(g0)) == 1 and g0[0] != -1
    assert len(np.unique(g16)) == 1 and g16[0] != -1
    assert g0[0] != g16[0]
    assert (groups[350:] == -1).all()

"""Golden/oracle tests for the batched similarity features.

The reference validates every metric against hand-computed values
(src/tests/spectrum_similarity_test.py); here a straightforward per-SSM
NumPy oracle implements the same formulas (reference
spectrum_similarity.py:81-651) and the batched implementation must agree
on random partial-match batches -- including rows whose match list is
shorter than the batch max with peak 0 matched (the padded-lane regression
from round 1).
"""

import numpy as np
import pytest
import scipy.stats

from ann_solo_tpu.models.similarity import MatchBlock, batch_features


class _Cfg:
    min_mz = 11
    max_mz = 2010
    bin_size = 0.04


def _oracle_features(q_int, l_int, q_mz, l_mz, matches):
    """Per-SSM reference formulas over explicit matched/unmatched sets."""
    mq = [m[0] for m in matches]
    mc = [m[1] for m in matches]
    q_m = q_int[mq]
    l_m = l_int[mc]
    uq = np.array([q_int[i] for i in range(len(q_int)) if i not in mq])
    ul = np.array([l_int[j] for j in range(len(l_int)) if j not in mc])
    sum_uq = uq.sum() if len(uq) else 0.0
    sum_ul = ul.sum() if len(ul) else 0.0
    out = {}
    out["cosine"] = float(np.dot(q_m, l_m))
    out["n_matched_peaks"] = float(len(matches))
    out["frac_n_peaks_query"] = len(matches) / len(q_int)
    out["frac_n_peaks_lib"] = len(matches) / len(l_int)
    out["frac_int_query"] = q_m.sum() / q_int.sum()
    out["frac_int_lib"] = l_m.sum() / l_int.sum()
    out["mse_mz"] = float(((q_mz[mq] - l_mz[mc]) ** 2).mean())
    out["mse_int"] = float(((q_m - l_m) ** 2).mean())
    out["manhattan"] = float(np.abs(q_m - l_m).sum() + sum_uq + sum_ul)
    out["euclidean"] = float(
        np.sqrt(
            ((q_m - l_m) ** 2).sum()
            + (np.asarray(uq) ** 2).sum()
            + (np.asarray(ul) ** 2).sum()
        )
    )
    cheb = np.abs(q_m - l_m).max() if len(matches) else 0.0
    if len(uq):
        cheb = max(cheb, uq.max())
    if len(ul):
        cheb = max(cheb, ul.max())
    out["chebyshev"] = float(cheb)
    out["braycurtis"] = float(
        (np.abs(q_m - l_m).sum() + sum_uq + sum_ul)
        / (np.abs(q_m + l_m).sum() + sum_uq + sum_ul)
    )
    with np.errstate(invalid="ignore"):
        ratio = np.abs(q_m - l_m) / (q_m + l_m)
    out["canberra"] = float(
        np.nan_to_num(ratio).sum()
        + (np.asarray(uq) != 0).sum()
        + (np.asarray(ul) != 0).sum()
    )
    out["ruzicka"] = float(
        np.minimum(q_m, l_m).sum()
        / (np.maximum(q_m, l_m).sum() + sum_uq + sum_ul)
    )
    x = np.concatenate([q_m, np.zeros(len(ul))])
    y = np.concatenate([l_m, ul])
    if len(x) >= 2 and np.std(x) > 0 and np.std(y) > 0:
        out["pearsonr"] = float(scipy.stats.pearsonr(x, y)[0])
        sp = scipy.stats.spearmanr(x, y)[0]
        out["spearmanr"] = float(sp) if not np.isnan(sp) else 0.0
    return out


def _random_batch(rng, b=6, k=8):
    q_mz = np.sort(rng.uniform(100, 1500, (b, k)), axis=1)
    l_mz = np.sort(rng.uniform(100, 1500, (b, k)), axis=1)
    q_int = rng.uniform(0.1, 1.0, (b, k))
    l_int = rng.uniform(0.1, 1.0, (b, k))
    q_int /= np.linalg.norm(q_int, axis=1, keepdims=True)
    l_int /= np.linalg.norm(l_int, axis=1, keepdims=True)
    n = np.full(b, k)
    matches = []
    for i in range(b):
        # Variable-length one-to-one matches; even rows match peak (0, 0)
        # so short rows exercise the padded-lane path.
        m = int(rng.integers(1, k - 1))
        if i % 2 == 0:
            mq = [0] + (1 + rng.permutation(k - 1)[: m - 1]).tolist()
            mc = [0] + (1 + rng.permutation(k - 1)[: m - 1]).tolist()
        else:
            mq = rng.permutation(k)[:m].tolist()
            mc = rng.permutation(k)[:m].tolist()
        matches.append(list(zip(mq, mc)))
    max_m = max(len(m) for m in matches)
    match_q = np.full((b, max_m), -1)
    match_c = np.full((b, max_m), -1)
    for i, m in enumerate(matches):
        for j, (a, c) in enumerate(m):
            match_q[i, j] = a
            match_c[i, j] = c
    return q_mz, q_int, l_mz, l_int, n, match_q, match_c, matches


def test_matched_peak0_short_row_masks():
    """Padded match lanes must not clear a real match on peak index 0."""
    q_mz = np.array([[100.0, 200.0], [100.0, 200.0]])
    q_int = np.array([[0.5, 0.5], [0.6, 0.4]])
    n = np.array([2, 2])
    match_q = np.array([[0, -1], [0, 1]])
    match_c = np.array([[0, -1], [0, 1]])
    blk = MatchBlock(
        q_mz, q_int, n, q_mz, q_int, n, match_q, match_c
    )
    np.testing.assert_array_equal(blk.q_unmatched[0], [False, True])
    np.testing.assert_array_equal(blk.l_unmatched[0], [False, True])
    np.testing.assert_array_equal(blk.q_unmatched[1], [False, False])
    feats = batch_features(blk, _Cfg())
    # manhattan row 0: |0.5-0.5| + 0.5 (unmatched q) + 0.5 (unmatched l).
    assert feats["manhattan"][0] == pytest.approx(1.0)
    # ruzicka row 0: 0.5 / (0.5 + 0.5 + 0.5).
    assert feats["ruzicka"][0] == pytest.approx(1 / 3)


def test_batch_features_match_per_ssm_oracle():
    rng = np.random.default_rng(7)
    for trial in range(3):
        q_mz, q_int, l_mz, l_int, n, match_q, match_c, matches = (
            _random_batch(rng)
        )
        blk = MatchBlock(
            q_mz, q_int, n, l_mz, l_int, n, match_q, match_c
        )
        feats = batch_features(blk, _Cfg())
        for i, m in enumerate(matches):
            ref = _oracle_features(q_int[i], l_int[i], q_mz[i], l_mz[i], m)
            for name, expected in ref.items():
                assert feats[name][i] == pytest.approx(
                    expected, rel=1e-9, abs=1e-12
                ), f"trial {trial} row {i} feature {name}"


def test_all_match_identical_spectra():
    """Identical unit-norm spectra, full match: cosine 1, distances 0."""
    rng = np.random.default_rng(3)
    k = 6
    mz = np.sort(rng.uniform(100, 1500, (2, k)), axis=1)
    intensity = rng.uniform(0.1, 1, (2, k))
    intensity /= np.linalg.norm(intensity, axis=1, keepdims=True)
    idx = np.tile(np.arange(k), (2, 1))
    blk = MatchBlock(
        mz, intensity, [k, k], mz, intensity, [k, k], idx, idx
    )
    feats = batch_features(blk, _Cfg())
    np.testing.assert_allclose(feats["cosine"], 1.0, atol=1e-9)
    np.testing.assert_allclose(feats["manhattan"], 0.0, atol=1e-12)
    np.testing.assert_allclose(feats["euclidean"], 0.0, atol=1e-12)
    np.testing.assert_allclose(feats["braycurtis"], 0.0, atol=1e-12)
    np.testing.assert_allclose(feats["ruzicka"], 1.0, atol=1e-12)
    np.testing.assert_allclose(feats["frac_n_peaks_query"], 1.0)
    np.testing.assert_allclose(feats["frac_int_lib"], 1.0)
    np.testing.assert_allclose(feats["entropy_unweighted"], 1.0, atol=1e-9)


def test_no_match_row():
    rng = np.random.default_rng(4)
    k = 5
    mz = np.sort(rng.uniform(100, 1500, (1, k)), axis=1)
    intensity = rng.uniform(0.1, 1, (1, k))
    intensity /= np.linalg.norm(intensity, axis=1, keepdims=True)
    none = np.full((1, 1), -1)
    blk = MatchBlock(
        mz, intensity, [k], mz, intensity, [k], none, none
    )
    feats = batch_features(blk, _Cfg())
    assert feats["cosine"][0] == 0.0
    assert feats["n_matched_peaks"][0] == 0.0
    assert np.isinf(feats["manhattan"][0])
    assert np.isinf(feats["mse_mz"][0])
    assert feats["braycurtis"][0] == 1.0
    assert feats["ruzicka"][0] == 0.0
